"""Wide-model training probe (VERDICT r2 #7): can d=1024/6L training beat
the round-2 44.4% MFU?

Measures, on the real chip at d=1024/6L/ffn4096 (386M params, bf16):
  1. the supervised fwd+bwd step across remat policies ('' = recompute
     everything — the round-2 configuration; 'dots' =
     dots_with_no_batch_dims_saveable — save MXU outputs, recompute only
     bandwidth-bound ops; 'dots_all' = dots_saveable) x batch sizes;
  2. flash (Pallas) vs XLA attention at the d=1024 TRAINING shape
     (B, T256, H8, Dh128), fwd and fwd+bwd (the round-2 probe only ran
     d=256 shapes).

Usage: python scripts/wide_probe.py [--batches 32,48] [--iters 3]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDE = ["--hidden", "1024", "--e_in", "1024", "--t_emb_dim", "1024",
        "--s_pre_hid", "1024", "--ffn_dim", "4096", "--num_layers", "6",
        "--nhead", "8"]


def _time(fn, iters=3, warmup=1):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def probe_steps(batches, iters, prng="threefry", policies=("", "dots",
                                                           "dots_all"),
                attn="xla", tmel=256, ttext=128):
    import jax
    if prng == "rbg":
        # Must precede every PRNGKey creation below; see
        # train.config.apply_runtime_flags.
        jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.config import (model_config_from_args,
                                        parse_with_config)
    from unast_tpu.train.steps import init_train_state, make_train_step

    peak = 197e12  # v5e bf16
    ds = SyntheticSpeechDataset(size=8, seed=0)
    rows = {}
    for bs in batches:
        for policy in policies:
            argv = WIDE + [
                "--train_batch_size", str(bs),
                "--data_mel_len", str(tmel),
                "--data_text_len", str(ttext),
                "--max_mel_len", str(tmel),
                "--max_text_len", str(ttext), "--ae_steps", "0",
                "--cm_steps", "0", "--sp_steps", "1", "--d_steps", "0",
                "--use_discriminator", "false", "--remat", "true",
                "--remat_policy", policy,
                "--attn_impl", attn,
                "--compute_dtype", "bfloat16"]
            args = parse_with_config(argv)
            cfg = model_config_from_args(args)
            label = f"bs{bs}/T{tmel}/{policy or 'none-saveable'}/{prng}/{attn}"
            try:
                ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
                bg = BatchGetter(args, ds, ds, ds)
                b = {"sp": jax.tree_util.tree_map(
                    jnp.asarray, bg.step_batches(args, False))["sp"]}
                step = jax.jit(make_train_step(cfg, args))
                flops = None
                try:
                    comp = step.lower(ts, jax.random.PRNGKey(1), b).compile()
                    ca = comp.cost_analysis()
                    if isinstance(ca, (list, tuple)):
                        ca = ca[0]
                    flops = float(ca.get("flops", 0.0)) or None
                except Exception:
                    pass
                dt = _time(lambda: float(
                    step(ts, jax.random.PRNGKey(2), b)[1]["grad_norm"]),
                    iters=iters, warmup=1)
                rows[label] = {"step_s": round(dt, 4),
                               "frames_per_s": round(bs * tmel / dt, 1)}
                if flops:
                    rows[label]["mfu"] = round(flops / dt / peak, 4)
                    rows[label]["tflops"] = round(flops / dt / 1e12, 1)
                del ts, step, b
            except Exception as e:  # OOM / compile failure is a RESULT
                rows[label] = {"error": repr(e)[:200]}
            print(json.dumps({label: rows[label]}), flush=True)
    return rows


def probe_attention(iters):
    """flash vs XLA at the wide TRAINING shape, chained calls in one jit
    (attn_shape_probe methodology)."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models.transformer import attention_core, padding_bias
    from unast_tpu.ops import flash_attention

    B, T, H, D = 32, 256, 8, 128
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(k2, (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(k3, (B, T, H, D), jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    bias = padding_bias(jnp.zeros((B, T), bool))
    ectx = nn.Ctx.eval()
    n_chain = 16

    def chain(fn):
        @jax.jit
        def run(q, k, v):
            def body(x, _):
                return fn(x, k, v).astype(q.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=n_chain)
            return out
        return run

    def chain_grad(fn):
        @jax.jit
        def run(q, k, v):
            g = jax.grad(lambda x: jnp.sum(fn(x, k, v).astype(jnp.float32)))

            def body(x, _):
                return g(x).astype(q.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=n_chain)
            return out
        return run

    fns = {
        "xla": lambda x, kk, vv: attention_core(x, kk, vv, bias, ectx, 0.0),
        "flash": lambda x, kk, vv: flash_attention(x, kk, vv, lens),
    }
    out = {}
    for name, fn in fns.items():
        for kind, mk in (("fwd", chain), ("fwd+bwd", chain_grad)):
            run = mk(fn)
            dt = _time(lambda: np.asarray(run(q, k, v))[0, 0, 0, 0],
                       iters=iters, warmup=2)
            out[f"{name}/{kind}"] = round(dt / n_chain * 1e6, 1)  # us/call
            print(json.dumps({f"attn B{B} T{T} H{H} D{D} {name} {kind}":
                              out[f"{name}/{kind}"]}), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,48")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--skip_attn", action="store_true")
    ap.add_argument("--prng", default="threefry",
                    choices=["threefry", "rbg"])
    ap.add_argument("--policies", default=",dots,dots_all",
                    help="comma-separated remat policies ('' allowed)")
    ap.add_argument("--attn", default="xla", choices=["xla", "flash"])
    ap.add_argument("--tmel", type=int, default=256,
                    help="mel frames per example (longer T raises "
                         "arithmetic intensity of the bandwidth-bound "
                         "ops -- the VERDICT r3 item 7 probe)")
    ap.add_argument("--ttext", type=int, default=128)
    a = ap.parse_args()
    if not a.skip_attn:
        print("== attention at d=1024 training shape ==")
        probe_attention(a.iters)
    print(f"== d=1024/6L supervised step: remat policy x batch "
          f"({a.prng}, attn={a.attn}) ==")
    probe_steps([int(b) for b in a.batches.split(",")], a.iters,
                prng=a.prng, policies=tuple(a.policies.split(",")),
                attn=a.attn, tmel=a.tmel, ttext=a.ttext)
