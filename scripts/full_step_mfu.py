"""MFU accounting for the FULL 4-objective train step (VERDICT r3 item 7).

The round-3 record had MFU only for the supervised step; the actual
training workload is the accumulated ae+cm+sp+disc step at the reference
caps (816 mel frames / 304 text tokens, src/network.py:219,455), whose cm
micro-batches contain in-graph greedy decodes. XLA's cost_analysis counts
a while_loop body exactly ONCE regardless of trip count (verified:
fori_loop(10) and fori_loop(100) over a matmul report identical flops),
so the decode flops are added analytically:

  per decode step, the KV-cached transformer decoder does (matmul-only,
  per batch row): self-attn QKVO 4*2*d^2, cross-attn QO 2*2*d^2, FFN
  2*2*d*ffn per layer, plus attention dots 2*2*d*(t + T_mem) per layer,
  plus the output head. The memory K/V projections are computed once per
  decode (already inside the counted-once body). flops(matmul m*n*k) =
  2*m*n*k. Non-matmul ops (softmax, LN, masks) are bandwidth-, not
  FLOP-relevant and are excluded -- this UNDERcounts flops, so the
  reported MFU is conservative.

Also reported: the cm-decode share of step time (step with cm_steps=0
vs full), which is the denominator story for the --reduction_factor
lever (VERDICT r3 item 5).

Run on the chip: python scripts/full_step_mfu.py [--bs 16] [--rf 1]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, iters=3, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def _cost_flops(step, *args_):
    comp = step.lower(*args_).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def decode_extra_flops(cfg, B, n_steps, T_mem, kind):
    """Analytic matmul flops of (n_steps - 1) KV-cached decoder steps
    (one body execution is already inside cost_analysis)."""
    d, ffn, L = cfg.hidden, cfg.ffn_dim, cfg.num_layers
    if n_steps <= 1:
        return 0.0
    # average self-attention prefix length over the decode
    t_avg = n_steps / 2.0
    per_layer = (2 * 4 * d * d          # self QKVO
                 + 2 * 2 * d * d        # cross QO
                 + 2 * 2 * d * ffn      # FFN
                 + 2 * 2 * d * t_avg    # self dots qk+av
                 + 2 * 2 * d * T_mem)   # cross dots qk+av
    if kind == "speech":
        r = cfg.reduction_factor
        head = (2 * cfg.num_mels * r * cfg.s_pre_hid      # prenet l1 (r frames)
                + 2 * cfg.s_pre_hid * cfg.s_pre_hid
                + 2 * d * (cfg.num_mels * r + r))         # mel+stop head
    else:
        head = 2 * d * 46                                  # vocab logits
    return float(B) * (n_steps - 1) * (L * per_layer + head)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--rf", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--fast_prng", action="store_true")
    args = ap.parse_args()

    import jax
    if args.fast_prng:
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.config import (model_config_from_args,
                                        parse_with_config)
    from unast_tpu.train.steps import init_train_state, make_train_step
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    peak = bench._peak_flops()
    ds = SyntheticSpeechDataset(size=8, seed=0)
    rows = {}
    base_argv = [
        "--use_discriminator", "true",
        "--max_mel_len", "816", "--max_text_len", "304",
        "--data_mel_len", "816", "--data_text_len", "304",
        "--cm_infer_mel_len", "816", "--cm_infer_text_len", "304",
        "--train_batch_size", str(args.bs),
        "--sched_type", "transformer", "--compute_dtype", "bfloat16",
        "--reduction_factor", str(args.rf)]

    for label, mix in (("full", dict(ae=4, cm=8, sp=4, d=4)),
                       ("no_cm", dict(ae=4, cm=0, sp=4, d=4))):
        targs = parse_with_config(base_argv + [
            "--ae_steps", str(mix["ae"]), "--cm_steps", str(mix["cm"]),
            "--sp_steps", str(mix["sp"]), "--d_steps", str(mix["d"])])
        cfg = model_config_from_args(targs)
        ts = init_train_state(jax.random.PRNGKey(0), cfg, targs)
        bg = BatchGetter(targs, ds, ds, ds)
        b = jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(targs, True))
        step = jax.jit(make_train_step(cfg, targs))
        t0 = time.perf_counter()
        base_flops = _cost_flops(step, ts, jax.random.PRNGKey(1), b)
        print(f"[{label}] compile+cost_analysis "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
        extra = 0.0
        if mix["cm"]:
            n_sp_steps = -(-cfg.max_mel_len // cfg.reduction_factor)
            extra = mix["cm"] * (
                decode_extra_flops(cfg, args.bs, n_sp_steps,
                                   T_mem=cfg.max_text_len, kind="speech")
                # text decode cross-attends to the FULL speech-encoder
                # memory (max_mel_len frames): the reduction factor
                # shortens the speech DECODER's step count, not the
                # encoder output length (ADVICE r4)
                + decode_extra_flops(cfg, args.bs, cfg.max_text_len,
                                     T_mem=cfg.max_mel_len, kind="text"))
        dt = _time(lambda: float(
            step(ts, jax.random.PRNGKey(2), b)[1]["grad_norm"]),
            iters=args.iters, warmup=1)
        flops = base_flops + extra
        rows[label] = {
            "step_s": round(dt, 3),
            "cost_analysis_tflop": round(base_flops / 1e12, 3),
            "decode_extra_tflop": round(extra / 1e12, 3),
            "mfu": round(flops / dt / peak, 4),
            "tflops_per_s": round(flops / dt / 1e12, 2),
        }
        print(json.dumps({label: rows[label]}), flush=True)
        del ts, step, b

    if "full" in rows and "no_cm" in rows:
        share = 1 - rows["no_cm"]["step_s"] / rows["full"]["step_s"]
        rows["cm_share_of_step"] = round(share, 3)
    out = {"bs": args.bs, "rf": args.rf,
           "fast_prng": args.fast_prng, **rows}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
