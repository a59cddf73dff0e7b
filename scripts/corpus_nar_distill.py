"""Corpus-scale NAR distillation (round 3, chained from
scripts/corpus_convergence.py): distill FastSpeech from the
corpus-scale-trained AR teacher (hybrid CTC head) over the 12.5k
real-transcript shard, CTC forced-alignment durations, and evaluate on
the SAME held-out tail the teacher never saw:

  - predicted lengths vs gold (the round-2 measured-broken axis — the
    ctc source fixed it at train_n 32/48; this is the 12k-scale proof),
  - free-running NAR mel MSE vs gold.

Run (chip): python scripts/corpus_nar_distill.py
  [--steps 3000] [--teacher /root/rehearsal/teacher_ckpt/model_best.ckpt]
  [--shard /root/rehearsal/full_train.unsh] [--dur_source ctc]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--shard", default="/root/rehearsal/full_train.unsh")
ap.add_argument("--teacher",
                default="/root/rehearsal/teacher_ckpt/model_best.ckpt")
ap.add_argument("--steps", type=int, default=3000)
ap.add_argument("--heldout", type=int, default=512)
ap.add_argument("--eval_every", type=int, default=1000)
ap.add_argument("--bs", type=int, default=32)
ap.add_argument("--lr", type=float, default=3e-4)
ap.add_argument("--dur_source", default="ctc",
                choices=["ctc", "mas", "soft", "argmax", "uniform",
                         "oracle"],
                help="'oracle' reads per-token SAMPLE durations from "
                     "--oracle_durs (e.g. the trim-offset-corrected "
                     "sidecar from scripts/fix_noisy_oracle.py), converts "
                     "to frames on the cumulative grid, and rides them in "
                     "with each batch — required on --realism corpora "
                     "where the uniform split is no longer exact")
ap.add_argument("--ctc_weight", type=float, default=0.5,
                help="must match the teacher's training config (shapes "
                     "the checkpoint template)")
ap.add_argument("--fast_prng", default="true")
ap.add_argument("--compute_dtype", default="bfloat16", choices=["float32", "bfloat16"])
ap.add_argument("--prenet_drop", type=float, default=0.1,
                help="NAR text-prenet dropout (see the 0.5-collapse note below); 0 is right for deterministic synthetic corpora")
ap.add_argument("--drop", type=float, default=0.1,
                help="NAR encoder/decoder dropout")
ap.add_argument("--small", action="store_true",
                help="tiny dims/caps for a CPU plumbing smoke (pairs "
                     "with corpus_convergence.py --small)")
ap.add_argument("--save_path", default="",
                help="pickle the distilled (params, net_state) — the "
                     "Synthesizer(nar_pv=...) serving artifact")
ap.add_argument("--oracle_durs", default="",
                help="oracle_durs.npz sidecar (corpus_rehearsal "
                     "--dur_jitter): also score the trained duration "
                     "PREDICTOR per token on held-out text against the "
                     "true durations, vs the best-constant baseline and "
                     "the per-id noise floor")
A = ap.parse_args()

from unast_tpu.train.config import (apply_runtime_flags,
                                    model_config_from_args,
                                    parse_with_config)
from unast_tpu.train.checkpoint import load_ckp
from unast_tpu.train.fastspeech import (eval_nar_mse, init_fs_state,
                                        make_distill_step)
from unast_tpu.train.steps import init_train_state
from unast_tpu.data.batching import BatchIterator
from unast_tpu.data.shard import PackedShardDataset
from unast_tpu.data.shard import SubsetShard

CAPS = ("112", "32") if A.small else ("816", "304")
SMALL = ["--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
         "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
         "--nhead", "2"] if A.small else []
args = parse_with_config(SMALL + [
    "--use_discriminator", "false",
    "--max_mel_len", CAPS[0], "--max_text_len", CAPS[1],
    "--data_mel_len", CAPS[0], "--data_text_len", CAPS[1],
    "--train_batch_size", str(A.bs),
    "--sched_type", "multistep", "--lr", str(A.lr),
    "--optim_type", "adamw", "--compute_dtype", A.compute_dtype,
    "--ctc_weight", str(A.ctc_weight),
    # 'oracle' is handled here (durations ride in with the batch; the
    # in-step source is never consulted) — pass a valid config value
    "--nar_dur_source",
    ("uniform" if A.dur_source == "oracle" else A.dur_source),
    "--fast_prng", A.fast_prng,
    # FastSpeech-style regularization: the reference TextPrenet's 0.5
    # dropout is calibrated for the AR model (whose decoder also sees
    # the teacher-forced mel prefix); in the NAR model the text prenet
    # is the ONLY information source and 0.5 forces a conditional-mean
    # (blurred) regression -- measured round 4: a 2-layer micro-model
    # that cannot even memorize 4 utterances at 0.5 fits them 18x
    # better at dropout ~0.1.
    "--t_pre_drop", str(A.prenet_drop),
    "--e_drop", str(A.drop), "--d_drop", str(A.drop)])
apply_runtime_flags(args)
cfg = model_config_from_args(args)

full = PackedShardDataset(A.shard)
n = len(full)
train_ds = SubsetShard(full, np.arange(0, n - A.heldout))
held_ds = SubsetShard(full, np.arange(n - A.heldout, n))
print(f"shard: {n} items -> distill on {len(train_ds)}, "
      f"held-out {len(held_ds)}; durations: {A.dur_source}")

oracle_frames = None
if A.dur_source == "oracle":
    assert A.oracle_durs, "--dur_source oracle requires --oracle_durs"
    _meta = os.path.join(os.path.dirname(A.shard), "metadata.csv")
    _fids = [ln.split("|")[0] for ln in open(_meta, encoding="utf-8")
             if ln.strip()]
    assert len(_fids) == n, (len(_fids), n)
    _dz = np.load(A.oracle_durs)
    _hop = 275.0  # AudioParams hop (derived, audio/params.py)
    oracle_frames = []
    for _i in range(n):
        _d = _dz[_fids[_i]].astype(np.int64)
        _fb = np.round(np.cumsum(_d) / _hop).astype(np.int32)
        oracle_frames.append(np.diff(np.concatenate([[0], _fb]))
                             .astype(np.int32))
    print(f"oracle frame durations loaded for {n} rows "
          f"(mean total {np.mean([f.sum() for f in oracle_frames]):.0f} "
          f"frames)")

t_template = init_train_state(jax.random.PRNGKey(0), cfg, args)
_, t_per, t_ts, _ = load_ckp(A.teacher, t_template)
print(f"teacher: {A.teacher} (held-out PER at save time: {t_per})")

fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
step = jax.jit(make_distill_step(cfg, cfg, args), donate_argnums=(0,))
class OracleBatchIterator(BatchIterator):
    """BatchIterator that also packs the per-row oracle FRAME durations
    (train subset indices == global rows [0, n-heldout))."""

    def next_batch(self):
        idx = self._next_indices()
        b = dict(self.ds.collate_batch(idx, self.text_len, self.mel_len))
        durs = np.zeros((len(idx), self.text_len), np.int32)
        for j, si in enumerate(idx):
            fr = oracle_frames[int(train_ds.idx[int(si)])]
            L = min(self.text_len, len(fr))
            durs[j, :L] = fr[:L]
        b["durs"] = durs
        return b


if A.dur_source == "oracle":
    it = OracleBatchIterator(train_ds, A.bs, int(CAPS[1]), int(CAPS[0]),
                             seed=args.seed + 1)
    keys = ("text", "text_len", "mel", "mel_len", "durs")
else:
    it = BatchIterator(train_ds, A.bs, int(CAPS[1]), int(CAPS[0]),
                       seed=args.seed + 1)
    keys = ("text", "text_len", "mel", "mel_len")
rng = jax.random.PRNGKey(2)


def held_eval(fs, n_batches=2):
    ev = BatchIterator(held_ds, A.bs, int(CAPS[1]), int(CAPS[0]), seed=9)
    errs, lens = [], []
    for _ in range(n_batches):
        b = ev.next_batch()
        mse, ls = eval_nar_mse(fs, cfg, b)
        errs.append(mse)
        lens += ls
    ratios = [p / g for p, g in lens if g > 0]
    return (float(np.mean(errs)), lens,
            float(np.median(ratios)), float(np.mean(ratios)))


def dur_quality(fs, n_utts=256):
    """Held-out per-token duration-prediction quality vs the oracle
    sidecar. Returns MAE (frames) for the trained predictor, the
    best-constant baseline (what a 'predict the mean' model achieves —
    the TRIVIAL score on a constant-duration corpus), and the per-id
    floor (the jitter noise no text-conditioned predictor can beat)."""
    from unast_tpu.models import fastspeech as F
    from unast_tpu import nn as unn
    meta = os.path.join(os.path.dirname(A.shard), "metadata.csv")
    fids = [l.split("|")[0] for l in open(meta) if l.strip()]
    durs_npz = np.load(A.oracle_durs)
    n_utts = min(n_utts, A.heldout, len(full))
    idx = np.arange(len(full) - n_utts, len(full))
    b = full.collate_batch(idx, int(CAPS[1]), int(CAPS[0]))

    @jax.jit
    def pred_durs(params, net_state, text, text_len):
        (_, _, _, log_dur), _ = F.fastspeech_forward(
            params, net_state, unn.Ctx.eval(), cfg, text, text_len,
            max_len=int(CAPS[0]))
        return jnp.round(jnp.expm1(log_dur)).astype(jnp.int32)

    pd = np.asarray(pred_durs(fs.params, fs.net_state,
                              jnp.asarray(b["text"]),
                              jnp.asarray(b["text_len"])))
    hop = 275.0
    pred_err, ids_all, orc_all = [], [], []
    for j, i in enumerate(idx):
        u = int(b["text_len"][j])
        orc = durs_npz[fids[i]].astype(np.float64)[:u] / hop
        pred_err.append(np.abs(pd[j, :u] - orc))
        ids_all.append(np.asarray(b["text"][j, :u]))
        orc_all.append(orc)
    pred_err = np.concatenate(pred_err)
    ids_all = np.concatenate(ids_all)
    orc_all = np.concatenate(orc_all)
    const = np.abs(orc_all - orc_all.mean()).mean()
    floor = float(np.mean([np.abs(orc_all[ids_all == k]
                                  - orc_all[ids_all == k].mean()).mean()
                           for k in np.unique(ids_all)
                           if (ids_all == k).sum() > 3]))
    return {"dur_mae_frames": round(float(pred_err.mean()), 3),
            "dur_mae_const_baseline": round(float(const), 3),
            "dur_mae_per_id_floor": round(floor, 3),
            "mean_dur_frames": round(float(orc_all.mean()), 2)}


t0 = time.perf_counter()
hist = []
for i in range(A.steps):
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k]) for k in keys}
    fs, m = step(fs, t_ts.params, t_ts.net_state,
                 jax.random.fold_in(rng, i), batch)
    if i == 0:
        float(m["grad_norm"])
        print(f"first distill step (incl. compile): "
              f"{time.perf_counter() - t0:.1f}s")
    if (i + 1) % A.eval_every == 0:
        mse, lens, med_r, mean_r = held_eval(fs)
        hist.append({"step": i + 1, "heldout_mse": round(mse, 5),
                     "len_ratio_median": round(med_r, 4),
                     "len_ratio_mean": round(mean_r, 4)})
        print(f"step {i + 1}: post {float(m['nar/post']):.4f} dur {float(m['nar/dur']):.4f}  held-out NAR mse {mse:.5f}  "
              f"pred/gold length ratio median {med_r:.3f} "
              f"mean {mean_r:.3f}  sample {lens[:6]}")

if A.save_path:
    from unast_tpu.models.fastspeech import save_nar_pickle
    save_nar_pickle(A.save_path, fs.params, fs.net_state)
    print(f"saved nar_pv -> {A.save_path}")

mse, lens, med_r, mean_r = held_eval(fs, n_batches=4)
within10 = float(np.mean([abs(p / g - 1) <= 0.10
                          for p, g in lens if g > 0]))
result = {"steps": A.steps, "dur_source": A.dur_source,
          "heldout_mse": round(mse, 5),
          "len_ratio_median": round(med_r, 4),
          "len_ratio_mean": round(mean_r, 4),
          "pct_within_10pct": round(within10 * 100, 1),
          "history": hist}
if A.oracle_durs:
    result["dur_quality"] = dur_quality(fs)
    print("duration predictor:", json.dumps(result["dur_quality"]))
print("RESULT", json.dumps(result))
