"""Probe: flash (Pallas) vs XLA attention at TRAINING shapes (large batch,
short T), fwd and fwd+bwd, to decide whether the train step should route
attention through the kernel. BENCHMARKS.md resolved inference shapes
(B4, T816/4096); the train step runs B256, T256 per micro-batch.

Usage: python scripts/attn_shape_probe.py [--B 256] [--T 256] [--iters 16]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--T", type=int, default=256)
    ap.add_argument("--H", type=int, default=4)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.ops import flash_attention
    from unast_tpu.models.transformer import attention_core, padding_bias

    B, T, H, D = args.B, args.T, args.H, args.D
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(k2, (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(k3, (B, T, H, D), jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    bias = padding_bias(jnp.zeros((B, T), bool))
    ectx = nn.Ctx.eval()
    iters = args.iters

    def chain(fn):
        @jax.jit
        def run(q, k, v):
            def body(x, _):
                return fn(x, k, v).astype(q.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out
        return run

    def chain_grad(fn):
        # fwd+bwd per iteration: grad of sum(attn(q,k,v)) wrt q
        @jax.jit
        def run(q, k, v):
            g = jax.grad(lambda x: jnp.sum(fn(x, k, v).astype(jnp.float32)))

            def body(x, _):
                return g(x).astype(q.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out
        return run

    def timeit(run):
        out = run(q, k, v)
        float(out[0, 0, 0, 0])  # warm + force
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(q, k, v)[0, 0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / iters * 1e6  # us/call

    flash_fn = lambda x, k, v: flash_attention(x, k, v, lens)
    xla_fn = lambda x, k, v: attention_core(x, k, v, bias, ectx, 0.0)

    res = {
        "shape": f"B{B} H{H} T{T} D{D}",
        "fwd_flash_us": round(timeit(chain(flash_fn)), 1),
        "fwd_xla_us": round(timeit(chain(xla_fn)), 1),
        "fwdbwd_flash_us": round(timeit(chain_grad(flash_fn)), 1),
        "fwdbwd_xla_us": round(timeit(chain_grad(xla_fn)), 1),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
