"""Int8 weight-only quantization for the inference path.

TPU-native serving lever the reference has no counterpart for: KV-cached
greedy decode at small batch re-reads every decoder weight from HBM each
of the ~800 steps, so decode is weight-bandwidth-bound — storing weights
as int8 + a per-output-channel f32 scale halves that traffic. The convert
+ scale fuses into the consuming matmul (nn.core.weight), which still runs
on the bf16 MXU: this is a bandwidth optimization, not an int8-MXU path.

Usage:
    qparams = quantize_params(params)          # symmetric per-channel int8
    Synthesizer(params, state, cfg, quantize="int8")   # serving integration

Quantized layout: every >=2-D weight leaf named `w`/`wi`/`wh` in a param
dict becomes {name}_q (int8, same shape) + {name}_scale (f32 over the last
axis = output channels). Biases, norms, and 1-D leaves stay f32. The
symmetric scheme maps the embedding PAD row (exact zeros) to exact zeros.

Training is NOT supported on quantized trees (no STE) — quantize a trained
checkpoint for serving.
"""

import jax
import jax.numpy as jnp

_WEIGHT_KEYS = ("w", "wi", "wh")


def quantize_leaf(w):
    """[.., out]-shaped f32 weight -> (int8 same shape, f32 [out] scale).
    Symmetric per-output-channel: scale = amax/127 over all non-last axes."""
    axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=axes)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_params(params):
    """Recursively replace weight leaves with int8 + scale pairs. All
    nn.core apply fns (linear/conv1d/embedding/cells) and the fused
    attention projections read weights through nn.core.weight, which
    dequantizes transparently — the same forward code serves both trees."""
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            if (k in _WEIGHT_KEYS and hasattr(v, "ndim") and v.ndim >= 2
                    and jnp.issubdtype(v.dtype, jnp.floating)):
                q, scale = quantize_leaf(v)
                out[k + "_q"] = q
                out[k + "_scale"] = scale
            else:
                out[k] = quantize_params(v)
        return out
    if isinstance(params, (list, tuple)):
        t = type(params)
        return t(quantize_params(v) for v in params)
    return params


def dequantize_params(params):
    """Inverse of quantize_params (up to rounding): reconstruct dense f32
    weight leaves from the int8 + scale pairs."""
    if isinstance(params, dict):
        out = {}
        for k, v in params.items():
            if k.endswith("_q"):
                name = k[:-2]
                out[name] = (v.astype(jnp.float32)
                             * params[name + "_scale"].astype(jnp.float32))
            elif k.endswith("_scale") and k[:-6] + "_q" in params:
                continue
            else:
                out[k] = dequantize_params(v)
        return out
    if isinstance(params, (list, tuple)):
        t = type(params)
        return t(dequantize_params(v) for v in params)
    return params


def quantized_bytes(params) -> int:
    """Total parameter bytes of a (possibly quantized) tree."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(params))
