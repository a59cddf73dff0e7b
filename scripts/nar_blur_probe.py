"""Localize the NAR round-trip blur (round 4): is the FastSpeech decoder
unable to emit sharp per-phoneme content, or is the duration/alignment
conditioning feeding it mush?

On TRAIN utterances of the uniform-duration formant corpus the true
alignment is an exact grid (every phoneme = phoneme_dur_s * sr samples),
so we can run the SAME trained NAR model under three duration sources:

  oracle     — the exact uniform grid;
  ctc        — the teacher's CTC forced alignment (what distillation used);
  predicted  — the NAR model's own duration predictor (serving path).

and score each output at phoneme-CENTER frames against (a) the gold mel
(MSE) and (b) a nearest-template classifier built from gold center frames
(identity accuracy). Gold-vs-gold accuracy calibrates the classifier.

Run (chip): python scripts/nar_blur_probe.py [--n 16]
"""
import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--shard", default="/root/rehearsal/full_train.unsh")
ap.add_argument("--teacher", default="/root/rehearsal/teacher_ckpt")
ap.add_argument("--nar", default="/root/rehearsal/nar_pv.pkl")
ap.add_argument("--n", type=int, default=16)
ap.add_argument("--phoneme_dur", type=float, default=0.08)
ap.add_argument("--ctc_weight", type=float, default=0.5)
A = ap.parse_args()

from unast_tpu.train.config import (apply_runtime_flags,
                                    model_config_from_args,
                                    parse_with_config)
from unast_tpu.train.checkpoint import load_ckp
from unast_tpu.train.steps import init_train_state
from unast_tpu.data.shard import PackedShardDataset
from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.models import ctc as CT
from unast_tpu.models import fastspeech as F
from unast_tpu.models import networks as N
from unast_tpu import nn

args = parse_with_config([
    "--use_discriminator", "false",
    "--max_mel_len", "816", "--max_text_len", "304",
    "--data_mel_len", "816", "--data_text_len", "304",
    "--compute_dtype", "bfloat16",
    "--ctc_weight", str(A.ctc_weight), "--fast_prng", "true"])
apply_runtime_flags(args)
cfg = model_config_from_args(args)

full = PackedShardDataset(A.shard)
items = [full[i] for i in range(A.n)]
TM, TT = cfg.max_mel_len, cfg.max_text_len
B = len(items)
mel = np.zeros((B, TM, P.num_mels), np.float32)
mlen = np.zeros((B,), np.int32)
txt = np.zeros((B, TT), np.int32)
tlen = np.zeros((B,), np.int32)
for j, it in enumerate(items):
    m, g = it["mel"], it["ids"]
    t = min(TM, m.shape[0])
    mel[j, :t] = m[:t]
    mlen[j] = t
    L = min(TT, len(g))
    txt[j, :L] = g[:L]
    tlen[j] = L

template = init_train_state(jax.random.PRNGKey(0), cfg, args)
_, _, ts, _ = load_ckp(A.teacher, template)
from unast_tpu.models.fastspeech import load_nar_pickle
nar_params, nar_state = load_nar_pickle(A.nar)

spp = A.phoneme_dur * P.sr          # samples per phoneme (exact grid)
fpp = spp / P.hop_length            # frames per phoneme (non-integer)


def oracle_durs(n_tok):
    bounds = np.round(np.arange(n_tok + 1) * fpp).astype(np.int32)
    return np.diff(bounds)


# duration sources ----------------------------------------------------------
durs = {}
o = np.zeros((B, TT), np.int32)
for j in range(B):
    o[j, :tlen[j]] = oracle_durs(int(tlen[j]))
durs["oracle"] = jnp.asarray(o)

ectx = nn.Ctx.eval()
(mem, pad), _ = N.speech_encode(ts.params["speech_m"],
                                ts.net_state["speech_m"], ectx, cfg,
                                jnp.asarray(mel), jnp.asarray(mlen))
logits = nn.linear(ts.params["speech_m"]["ctc_head"], mem).astype(
    jnp.float32)
durs["ctc"] = CT.ctc_forced_align(
    jax.nn.log_softmax(logits, axis=-1), ~pad, jnp.asarray(txt),
    jnp.asarray(tlen), blank_split=True)

logd, _, _ = F.predict_variances(nar_params, nar_state, cfg,
                                 jnp.asarray(txt), jnp.asarray(tlen))
tv = (np.arange(TT)[None] < tlen[:, None])
durs["predicted"] = jnp.asarray(
    np.maximum(np.round(np.expm1(np.asarray(logd))), 1.0) * tv
).astype(jnp.int32)

# duration fidelity vs oracle
for k in ("ctc", "predicted"):
    err = np.abs(np.asarray(durs[k]) - o)[tv]
    print(f"dur[{k}] vs oracle: mean|err| {err.mean():.3f} frames, "
          f"p95 {np.percentile(err, 95):.1f}")

# center-frame template bank from GOLD --------------------------------------
def centers_from(durs_row, n_tok):
    ends = np.cumsum(durs_row[:n_tok])
    starts = ends - durs_row[:n_tok]
    return ((starts + ends) // 2).astype(np.int64), ends[-1]


bank = {}
for j in range(B):
    c, _ = centers_from(o[j], int(tlen[j]))
    for tok, fr in zip(txt[j, :tlen[j]], c):
        if fr < mlen[j]:
            bank.setdefault(int(tok), []).append(mel[j, fr])
ids_sorted = sorted(bank)
T_bank = np.stack([np.mean(bank[i], axis=0) for i in ids_sorted])


def classify(frames):
    d = ((frames[:, None, :] - T_bank[None]) ** 2).sum(-1)
    return np.asarray(ids_sorted)[d.argmin(1)]


def score(out_mels, durs_used):
    """Accuracy of nearest-template id at each phoneme center + MSE of
    center frames vs gold center frames (only rows where the output grid
    == the oracle grid are MSE-comparable; accuracy needs no gold)."""
    accs, mses = [], []
    du = np.asarray(durs_used)
    for j in range(B):
        n = int(tlen[j])
        c_out, total = centers_from(du[j], n)
        keep = c_out < min(TM, int(total))
        if not keep.any():
            continue
        frames = out_mels[j][c_out[keep]]
        pred = classify(frames)
        accs.append((pred == txt[j, :n][keep]).mean())
        c_gold, _ = centers_from(o[j], n)
        k2 = keep & (c_gold < mlen[j])
        if k2.any():
            mses.append(float(np.mean(
                (out_mels[j][c_out[k2]] - mel[j][c_gold[k2]]) ** 2)))
    return float(np.mean(accs)), float(np.mean(mses))


# gold calibration
gold_acc, _ = score(mel, o)
print(f"gold center-frame template acc: {gold_acc:.3f}")

infer = jax.jit(lambda p, s, t, tl, d: F.fastspeech_forward(
    p, s, nn.Ctx.eval(), cfg, t, tl, durations=d, max_len=TM)[0][1])
res = {"gold_acc": round(gold_acc, 4)}
for k, d in durs.items():
    out = np.asarray(infer(nar_params, nar_state, jnp.asarray(txt),
                           jnp.asarray(tlen), d), np.float32)
    acc, mse = score(out, np.asarray(d))
    res[f"nar_{k}_acc"] = round(acc, 4)
    res[f"nar_{k}_center_mse"] = round(mse, 5)
    print(f"NAR[{k}]: center acc {acc:.3f}  center MSE {mse:.4f}")
print("RESULT", json.dumps(res))
