"""Reproduce the BENCHMARKS.md width sweep: supervised fwd+bwd train-step
MFU at growing model widths on one chip. Demonstrates that the ~15% MFU at
the reference's d=256 scale (src/configs/transformer_trans.json) is a
property of the model size, not the framework — d=1024 with --remat
reaches ~44% MFU on a v5e.

Usage: python scripts/width_mfu_sweep.py [--fast_prng] [--points d256,d512,d1024]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POINTS = {
    # name: (hidden, layers, heads, ffn, batch, remat)
    "d256": (256, 4, 4, 1024, 256, False),   # reference flagship scale
    "d512": (512, 6, 8, 2048, 128, False),
    "d1024": (1024, 6, 8, 4096, 32, True),   # needs remat to fit one chip
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast_prng", action="store_true")
    ap.add_argument("--points", default="d256,d512,d1024")
    ap.add_argument("--mel_len", type=int, default=256)
    ap.add_argument("--text_len", type=int, default=128)
    args = ap.parse_args()

    import bench
    import jax
    if args.fast_prng:
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from unast_tpu.train.config import parse_with_config, model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset

    peak = bench._peak_flops()
    for name in args.points.split(","):
        d, nl, nh, ffn, bs, remat = POINTS[name]
        targs = parse_with_config([
            "--train_batch_size", str(bs),
            "--data_mel_len", str(args.mel_len),
            "--data_text_len", str(args.text_len),
            "--max_mel_len", str(args.mel_len),
            "--max_text_len", str(args.text_len),
            "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "1",
            "--d_steps", "0", "--use_discriminator", "false",
            "--compute_dtype", "bfloat16",
            "--remat", str(remat).lower(),
            "--hidden", str(d), "--e_in", str(d), "--t_emb_dim", str(d),
            "--s_pre_hid", str(d), "--ffn_dim", str(ffn),
            "--num_layers", str(nl), "--nhead", str(nh)])
        cfg = model_config_from_args(targs)
        try:
            ts = init_train_state(jax.random.PRNGKey(0), cfg, targs)
            ds = SyntheticSpeechDataset(size=8, seed=0)
            bg = BatchGetter(targs, ds, ds, ds)
            batches = {"sp": jax.tree_util.tree_map(
                jnp.asarray, bg.step_batches(targs, False))["sp"]}
            step = jax.jit(make_train_step(cfg, targs))
            compiled = step.lower(ts, jax.random.PRNGKey(1), batches).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            ts2, m = step(ts, jax.random.PRNGKey(1), batches)
            float(m["grad_norm"])
            dt = bench._time(lambda: float(
                step(ts2, jax.random.PRNGKey(2), batches)[1]["grad_norm"]),
                iters=3, warmup=1)
            print(json.dumps({
                "point": name, "bs": bs, "remat": remat,
                "step_s": round(dt, 4),
                "mfu": round(flops / dt / peak, 4),
                "tflops_per_s": round(flops / dt / 1e12, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"point": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
