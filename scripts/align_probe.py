"""Duration-source alignment probe (round 3): score every NAR duration
source against the synthetic corpus's ORACLE phoneme grid.

The corpus renders each phoneme as a fixed-length tone
(data/dataset.py::synth_audio, --phoneme_dur), so the true frame->token
assignment is known exactly: frame f belongs to token floor(f / fpp)
with fpp = phoneme_dur * sr / hop. For a trained teacher checkpoint this
probe measures, per duration source (the `--nar_dur_source` choices of
train/fastspeech.py plus both CTC blank-run attribution rules):

  - frame-assignment accuracy: fraction of frames attributed to the
    right phoneme (misassigned frames become cross-phoneme regression
    blur in the distilled NAR mel head),
  - mean |boundary error| and signed boundary error in frames.

This is the measurement that localized the round-3 diagnosis chain:
ga_weight=0 teachers have DIFFUSE cross-attention (argmax/mas acc ~2%),
the CTC head is audio-grounded (acc 0.80), and blank_split recovers the
boundary frames the all-to-preceding rule misattributes (0.80 -> 0.90).

Run (chip): python scripts/align_probe.py \
  --teacher /root/rehearsal_f/teacher_ckpt [--shard .../full_train.unsh]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--shard", default="/root/rehearsal_f/full_train.unsh")
ap.add_argument("--teacher", default="/root/rehearsal_f/teacher_ckpt")
ap.add_argument("--bs", type=int, default=16)
ap.add_argument("--heldout", type=int, default=512,
                help="probe batches are drawn from the held-out tail "
                     "(the teacher never saw them)")
ap.add_argument("--phoneme_dur", type=float, default=0.04,
                help="corpus tone length (sets the UNIFORM oracle grid "
                     "for constant-duration corpora)")
ap.add_argument("--oracle_durs", default="",
                help="oracle_durs.npz sidecar from corpus_rehearsal "
                     "--dur_jitter: per-utterance true per-phoneme sample "
                     "counts (overrides the uniform grid)")
ap.add_argument("--metadata", default="",
                help="corpus metadata.csv (maps shard position -> fid "
                     "for the sidecar; default: <shard dir>/metadata.csv)")
ap.add_argument("--ctc_weight", type=float, default=0.5,
                help="must match the teacher's training config")
ap.add_argument("--sources", default="ctc,ctc_split,argmax,mas,soft,uniform")
A = ap.parse_args()

from unast_tpu.train.config import (apply_runtime_flags,
                                    model_config_from_args,
                                    parse_with_config)
from unast_tpu.train.checkpoint import load_ckp
from unast_tpu.train.steps import init_train_state
from unast_tpu.data.batching import BatchIterator
from unast_tpu.data.shard import PackedShardDataset, SubsetShard
from unast_tpu.models import ctc as CT
from unast_tpu.models import fastspeech as F
from unast_tpu.models import networks as N
from unast_tpu.models import unast as U
from unast_tpu import nn

args = parse_with_config([
    "--use_discriminator", "false",
    "--max_mel_len", "816", "--max_text_len", "304",
    "--data_mel_len", "816", "--data_text_len", "304",
    "--compute_dtype", "bfloat16", "--ctc_weight", str(A.ctc_weight),
    "--fast_prng", "true"])
apply_runtime_flags(args)
cfg = model_config_from_args(args)

full = PackedShardDataset(A.shard)
held = SubsetShard(full, np.arange(len(full) - A.heldout, len(full)))
template = init_train_state(jax.random.PRNGKey(0), cfg, args)
_, t_per, ts, _ = load_ckp(A.teacher, template)
print(f"teacher: {A.teacher} (held-out PER at save time: {t_per})")

idx = np.arange(len(full) - A.bs, len(full))  # held-out tail, identified
b = full.collate_batch(idx, 304, 816)
mel = jnp.asarray(b["mel"])
mel_len = jnp.asarray(b["mel_len"])
text = jnp.asarray(b["text"])
text_len = jnp.asarray(b["text_len"])

HOP = 275
oracle_bounds = None  # per-row cumulative phoneme end samples
if A.oracle_durs:
    meta = A.metadata or os.path.join(os.path.dirname(A.shard),
                                      "metadata.csv")
    fids = [l.split("|")[0] for l in open(meta) if l.strip()]
    assert len(fids) == len(full), (len(fids), len(full))
    durs = np.load(A.oracle_durs)
    oracle_bounds = [np.cumsum(durs[fids[i]].astype(np.int64))
                     for i in idx]


@jax.jit
def ctc_durs(params, state, mel, mel_len, text, text_len):
    (mem, pad), _ = N.speech_encode(params["speech_m"], state["speech_m"],
                                    nn.Ctx.eval(), cfg, mel, mel_len)
    logits = nn.linear(params["speech_m"]["ctc_head"],
                       mem).astype(jnp.float32)
    lp = jax.nn.log_softmax(logits, axis=-1)
    return (CT.ctc_forced_align(lp, ~pad, text, text_len),
            CT.ctc_forced_align(lp, ~pad, text, text_len,
                                blank_split=True))


@jax.jit
def attn_durs(params, state, mel, mel_len, text, text_len):
    ws = []
    U.tts(params, state, nn.Ctx.eval(), cfg, text, text_len, mel,
          mel_len, cross_weights_out=ws)
    attn = jnp.stack(ws)
    return (F.durations_from_attention(attn, mel_len, text_len),
            F.mas_durations(attn, mel_len, text_len),
            F.durations_from_attention(attn, mel_len, text_len, soft=True))


fpp = A.phoneme_dur * 22050 / HOP  # uniform-grid frames per phoneme


def oracle_frames(i, u, t):
    """(per-frame oracle token [t], oracle boundary frames [u-1])."""
    if oracle_bounds is not None:
        cum = oracle_bounds[i][:u]  # end sample of each phoneme
        orc = np.searchsorted(cum, np.arange(t, dtype=np.int64) * HOP,
                              side="right")
        return np.minimum(orc, u - 1), cum[:-1] / HOP
    orc = np.minimum((np.arange(t) / fpp).astype(np.int64), u - 1)
    return orc, np.arange(1, u) * fpp


def score(dur, name):
    accs, b_ab, b_sgn = [], [], []
    for i in range(dur.shape[0]):
        u = int(text_len[i])
        t = int(mel_len[i])
        d = np.maximum(dur[i, :u].astype(np.int64), 0)
        orc, ob = oracle_frames(i, u, t)
        pred = np.repeat(np.arange(u), d)
        pred = np.concatenate(
            [pred, np.full(max(0, t - len(pred)), u - 1)])[:t]
        accs.append(float((pred == orc).mean()))
        cb = np.cumsum(d)[:-1]
        ob = np.round(ob)
        m = min(len(cb), len(ob))
        b_ab.append(float(np.abs(cb[:m] - ob[:m]).mean()))
        b_sgn.append(float((cb[:m] - ob[:m]).mean()))
    row = {"source": name, "frame_acc": round(float(np.mean(accs)), 3),
           "abs_boundary_err": round(float(np.mean(b_ab)), 2),
           "signed_boundary_err": round(float(np.mean(b_sgn)), 2)}
    print(f"{name}: frame acc {row['frame_acc']:.3f}  "
          f"|berr| {row['abs_boundary_err']:.2f}  "
          f"signed {row['signed_boundary_err']:.2f}")
    return row


want = set(A.sources.split(","))
rows = []
if want & {"ctc", "ctc_split"}:
    base, split = ctc_durs(ts.params, ts.net_state, mel, mel_len,
                           text, text_len)
    if "ctc" in want:
        rows.append(score(np.asarray(base), "ctc"))
    if "ctc_split" in want:
        rows.append(score(np.asarray(split), "ctc_split"))
if want & {"argmax", "mas", "soft"}:
    am, mas, soft = attn_durs(ts.params, ts.net_state, mel, mel_len,
                              text, text_len)
    if "argmax" in want:
        rows.append(score(np.asarray(am), "argmax"))
    if "mas" in want:
        rows.append(score(np.asarray(mas), "mas"))
    if "soft" in want:
        rows.append(score(np.asarray(soft), "soft"))
if "uniform" in want:
    # model-free baseline: T/U frames per token. On a constant-duration
    # corpus (--dur_jitter 0) this matches the oracle grid by
    # construction — near-1.0 acc here means the duration task is
    # degenerate and model sources must be judged on a jittered corpus.
    uni = np.zeros((mel.shape[0], text.shape[1]), np.int64)
    for i in range(uni.shape[0]):
        u, t = int(text_len[i]), int(mel_len[i])
        uni[i, :u] = t // u
        uni[i, :t % u] += 1
    rows.append(score(uni, "uniform"))
print("RESULT", json.dumps({"teacher": A.teacher, "rows": rows}))
