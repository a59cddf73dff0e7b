"""Decode-lever learnability A/B at corpus scale (VERDICT r4 item 2).

Round 4 measured the back-translation decode levers as timing-only:
`--rf 4 --cm_text_decode ctc` gives a 2.53x epoch speedup
(BENCHMARKS.md), but the convergence gates were never re-run under the
flags, and the ctc pseudo-text lever is known-bad at step 0 (untrained
head). This script proves (or refutes) that the recommended recipe —
engage the cheap cm decode only AFTER a supervised warmup has trained
the hybrid CTC head — actually LEARNS at corpus scale:

  per branch (A = rf1/ar reference shape, B = rf4/ctc recipe):
    1. supervised warmup (sp-only, --ctc_weight 0.5, --ga_weight 0.3 —
       the grounding curriculum) for --warmup steps; held-out greedy PER
       measured before/after;
    2. the FULL 4-objective + discriminator mixture (ae4/cm8/sp4/d4,
       phase-c shape, scripts/corpus_rehearsal.py) for --joint outer
       steps with the branch's cm decode; held-out PER after + the
       joint-phase wall.

The objective being accelerated is the reference's back-translation
loop, /root/reference/src/train.py:261-294. PER is measured with the
same AR greedy serving decode in both branches, so the numbers are
comparable; the cm decode choice only changes the TRAINING-time
pseudo-text path.

Run (chip): python scripts/decode_lever_corpus_ab.py [--warmup 800]
  [--joint 40] [--branch both|a|b]
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
ap.add_argument("--heldout", type=int, default=512)
ap.add_argument("--warmup", type=int, default=800)
ap.add_argument("--joint", type=int, default=40,
                help="outer steps of the full 4-objective mixture "
                     "(~one phase-c epoch at 42)")
ap.add_argument("--bs", type=int, default=16)
ap.add_argument("--lr", type=float, default=3e-4)
ap.add_argument("--eval_batches", type=int, default=2)
ap.add_argument("--branch", default="both", choices=["both", "a", "b"])
ap.add_argument("--b_decode", default="ctc", choices=["ctc", "spec"],
                help="branch B's cm text decode (spec = the fallback)")
ap.add_argument("--small", action="store_true",
                help="tiny dims/caps + synthetic corpus: CPU plumbing "
                     "smoke (no shard needed)")
A = ap.parse_args()

from unast_tpu.train.config import (apply_runtime_flags,
                                    model_config_from_args,
                                    parse_with_config)
from unast_tpu.train.steps import init_train_state, make_train_step
from unast_tpu.data.batching import BatchGetter, BatchIterator
from unast_tpu.data.shard import PackedShardDataset, SubsetShard
from unast_tpu.infer.metrics import compute_per
from unast_tpu.models import unast as U
from unast_tpu import nn

if A.small:
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    train_ds = SyntheticSpeechDataset(size=16, seed=0, phoneme_dur_s=0.04)
    held_ds = SyntheticSpeechDataset(size=8, seed=1, phoneme_dur_s=0.04)
else:
    full = PackedShardDataset(A.shard)
    n = len(full)
    train_ds = SubsetShard(full, np.arange(0, n - A.heldout))
    held_ds = SubsetShard(full, np.arange(n - A.heldout, n))
    print(f"shard: {n} items -> train {len(train_ds)}, "
          f"held {len(held_ds)}")

CAPS = ("112", "32") if A.small else ("816", "304")
ICAPS = ("16", "8") if A.small else ("816", "304")
SMALL = ["--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
         "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
         "--nhead", "2", "--disc_hid", "16",
         "--disc_num_layers", "1"] if A.small else []


def branch_args(rf, cm_decode):
    a = parse_with_config(SMALL + [
        "--use_discriminator", "true",
        "--max_mel_len", CAPS[0], "--max_text_len", CAPS[1],
        "--data_mel_len", CAPS[0], "--data_text_len", CAPS[1],
        "--cm_infer_mel_len", ICAPS[0], "--cm_infer_text_len", ICAPS[1],
        "--ae_steps", "4", "--cm_steps", "8", "--sp_steps", "4",
        "--d_steps", "4", "--train_batch_size", str(A.bs),
        "--sched_type", "multistep", "--lr", str(A.lr),
        "--optim_type", "adamw", "--compute_dtype", "bfloat16",
        "--s_eos_weight", "16", "--ga_weight", "0.3",
        "--ctc_weight", "0.5", "--fast_prng", "true",
        "--reduction_factor", str(rf), "--cm_text_decode", cm_decode])
    return a


def run_branch(name, rf, cm_decode):
    args = branch_args(rf, cm_decode)
    apply_runtime_flags(args)
    cfg = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    bg = BatchGetter(args, train_ds, train_ds, train_ds)

    @jax.jit
    def _asr_infer(params, net_state, mel, mel_len):
        (ids, lens), _ = U.asr(params, net_state, nn.Ctx.eval(), cfg,
                               None, None, mel, mel_len, infer=True)
        return ids, lens

    def eval_per(ts):
        it = BatchIterator(held_ds, A.bs, args.data_text_len,
                           args.data_mel_len, seed=9)
        edits = refs = 0
        for _ in range(A.eval_batches):
            b = it.next_batch()
            ids, lens = _asr_infer(ts.params, ts.net_state,
                                   jnp.asarray(b["mel"]),
                                   jnp.asarray(b["mel_len"]))
            p = compute_per(b["text"], np.asarray(ids), b["text_len"],
                            np.asarray(lens))
            edits += p * np.sum(b["text_len"])
            refs += np.sum(b["text_len"])
        return float(edits / max(1, refs))

    # --- supervised warmup (the recipe's --sp_warmup_steps phase) ---
    wargs = branch_args(rf, cm_decode)
    wargs.ae_steps = wargs.cm_steps = wargs.d_steps = 0
    wargs.sp_steps = 1
    apply_runtime_flags(wargs)
    wstep = jax.jit(make_train_step(cfg, wargs), donate_argnums=(0,))
    rng = jax.random.PRNGKey(11)
    t0 = time.perf_counter()
    for s in range(A.warmup):
        wb = jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(wargs, True))
        ts, m = wstep(ts, jax.random.fold_in(rng, s), wb)
        if s == 0:
            float(m["grad_norm"])
            print(f"[{name}] warmup first step (incl. compile): "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            t0 = time.perf_counter()
        elif (s + 1) % 200 == 0:
            print(f"[{name}] warmup {s + 1}: asr {float(m['sp/asr']):.3f} "
                  f"tts {float(m['sp/tts']):.3f}", flush=True)
    float(m["grad_norm"])
    warm_wall = time.perf_counter() - t0
    per_warm = eval_per(ts)
    print(f"[{name}] after warmup({A.warmup}, {warm_wall:.0f}s): "
          f"held-out PER {per_warm:.4f}", flush=True)

    # --- joint 4-objective mixture with the branch's cm decode ---
    step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))
    rng2 = jax.random.PRNGKey(13)
    t0 = time.perf_counter()
    for s in range(A.joint):
        b = jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(args, True))
        ts, m = step(ts, jax.random.fold_in(rng2, s), b)
        if s == 0:
            float(m["grad_norm"])
            print(f"[{name}] joint first step (incl. compile): "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            t0 = time.perf_counter()
        elif (s + 1) % 10 == 0:
            print(f"[{name}] joint {s + 1}: "
                  + " ".join(f"{k} {float(v):.3f}"
                             for k, v in sorted(m.items())
                             if k in ("sp/asr", "cm/t_cm", "cm/s_cm")),
                  flush=True)
    vals = {k: float(v) for k, v in m.items()}
    joint_wall = time.perf_counter() - t0
    assert all(np.isfinite(v) for v in vals.values()), vals
    per_joint = eval_per(ts)
    print(f"[{name}] after joint({A.joint} outer, {joint_wall:.0f}s): "
          f"held-out PER {per_joint:.4f}", flush=True)
    return {"rf": rf, "cm_text_decode": cm_decode,
            "per_warm": round(per_warm, 4),
            "per_joint": round(per_joint, 4),
            "warmup_wall_s": round(warm_wall, 1),
            "joint_wall_s": round(joint_wall, 1),
            "joint_steps_per_s": round((A.joint - 1) / joint_wall, 3),
            "losses_last": {k: round(v, 4) for k, v in sorted(vals.items())}}


res = {}
if A.branch in ("both", "a"):
    res["a_rf1_ar"] = run_branch("A rf1/ar", 1, "ar")
if A.branch in ("both", "b"):
    res["b_recipe"] = run_branch(f"B rf4/{A.b_decode}", 4, A.b_decode)

if "a_rf1_ar" in res and "b_recipe" in res:
    a, b = res["a_rf1_ar"], res["b_recipe"]
    res["joint_speedup"] = round(a["joint_wall_s"] / b["joint_wall_s"], 2)
    res["gates"] = {
        "b_learns": b["per_joint"] <= b["per_warm"] + 0.02,
        "b_matches_a": b["per_joint"] <= a["per_joint"] + 0.02,
        "b_faster": b["joint_wall_s"] < a["joint_wall_s"],
    }
    print("gates:", json.dumps(res["gates"]))
print("RESULT", json.dumps(res))
