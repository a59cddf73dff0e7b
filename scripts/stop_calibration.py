"""EOS/stop calibration study (VERDICT r1 #9, round-1 STATUS quality lever).

Trains the supervised grounding model per stop pos_weight (s_eos_weight),
then sweeps the greedy-decode stop threshold, measuring:
  - stop-length MAE: |stop_len - gold mel_len| over the eval batch
  - greedy TTS mel MSE over the overlap
  - greedy ASR PER

Run: python scripts/stop_calibration.py [--steps 1200] \
        [--pos_weights 1,5,8] [--thresholds 0.3,0.5,0.7]
Writes a JSON report; headline numbers go to BENCHMARKS.md.
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

from unast_tpu.train.config import parse_with_config, model_config_from_args
from unast_tpu.train.steps import init_train_state, make_train_step
from unast_tpu.data.batching import BatchGetter, BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.infer.metrics import compute_per
from unast_tpu.models import unast as U
from unast_tpu import nn


def train_once(pos_weight: float, steps: int, ds):
    args = parse_with_config([
        "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
        "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
        "--nhead", "2", "--use_discriminator", "false",
        "--max_mel_len", "112", "--max_text_len", "32",
        "--data_mel_len", "112", "--data_text_len", "32",
        "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "2",
        "--d_steps", "0", "--train_batch_size", "8",
        "--sched_type", "multistep", "--lr", "1e-3",
        "--optim_type", "adamw", "--compute_dtype", "bfloat16",
        "--s_eos_weight", str(pos_weight)])
    cfg = model_config_from_args(args)
    bg = BatchGetter(args, ds, ds, ds)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    for s in range(steps):
        batches = jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(args, False))
        ts, m = step(ts, jax.random.fold_in(rng, s), batches)
    return ts, cfg, args


def eval_threshold(ts, cfg, ds, threshold: float):
    cfg_t = cfg.replace(stop_threshold=threshold)
    it = BatchIterator(ds, 8, 32, 112, seed=9)
    b = it.next_batch()
    (_, post, _, stop_lens), _ = U.tts(
        ts.params, ts.net_state, nn.Ctx.eval(), cfg_t,
        jnp.asarray(b["text"]), jnp.asarray(b["text_len"]), None, None,
        infer=True)
    stop_lens = np.asarray(stop_lens)
    gold_lens = np.asarray(b["mel_len"])
    mae = float(np.mean(np.abs(stop_lens - gold_lens)))
    post = np.asarray(post, np.float32)
    errs = []
    for i in range(len(gold_lens)):
        n = min(int(stop_lens[i]), int(gold_lens[i]))
        if n > 0:
            errs.append(np.mean((post[i, :n] - b["mel"][i, :n]) ** 2))
    (ids, lens), _ = U.asr(ts.params, ts.net_state, nn.Ctx.eval(), cfg_t,
                           None, None, jnp.asarray(b["mel"]),
                           jnp.asarray(b["mel_len"]), infer=True)
    per = compute_per(b["text"], np.asarray(ids), b["text_len"],
                      np.asarray(lens))
    return {"threshold": threshold, "stop_len_mae": round(mae, 3),
            "tts_mse": round(float(np.mean(errs)), 5),
            "per": round(float(per), 4),
            "stop_lens": stop_lens.tolist(), "gold_lens": gold_lens.tolist()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--pos_weights", default="1,5,8")
    ap.add_argument("--thresholds", default="0.3,0.5,0.7")
    ap.add_argument("--report", default="/tmp/stop_calibration.json")
    a = ap.parse_args()

    ds = SyntheticSpeechDataset(size=16, seed=0, phoneme_dur_s=0.04)
    results = []
    for pw in [float(x) for x in a.pos_weights.split(",")]:
        t0 = time.time()
        ts, cfg, args = train_once(pw, a.steps, ds)
        rows = [eval_threshold(ts, cfg, ds, th)
                for th in [float(x) for x in a.thresholds.split(",")]]
        for r in rows:
            r["pos_weight"] = pw
            print(json.dumps(r), flush=True)
        results.extend(rows)
        print(f"[pos_weight {pw}] trained {a.steps} steps in "
              f"{time.time() - t0:.0f}s", flush=True)
    best = min(results, key=lambda r: (r["stop_len_mae"], r["tts_mse"]))
    report = {"steps": a.steps, "results": results, "best": best}
    with open(a.report, "w") as f:
        json.dump(report, f, indent=2)
    print("BEST:", json.dumps(best))


if __name__ == "__main__":
    main()
