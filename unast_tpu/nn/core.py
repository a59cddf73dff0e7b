"""Functional NN primitives: linear / conv1d / embedding / norm / dropout /
recurrent cells, as pure init/apply pairs over plain dicts.

All layouts are TPU-native: activations are [B, T, C] (channels-last, so the
channel dim rides the 128-wide lane dimension and matmuls hit the MXU);
conv1d uses lax.conv_general_dilated with ('NWC','WIO','NWC').
"""

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Context: rng threading + train flag
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Ctx:
    """Per-forward context. `rng` is a single key; every stochastic op folds
    in a fresh counter value, so one key drives the whole forward pass.

    `aux_losses`: when set to a list by the caller (train/steps.py does so
    for MoE configs), layers append auxiliary scalar losses (e.g. the MoE
    load-balance term) during tracing; the objective sums them. None (the
    default) disables collection — required inside lax loop bodies, where
    an appended tracer would escape its trace."""

    rng: Optional[jax.Array] = None
    train: bool = False
    _counter: int = 0
    aux_losses: Optional[list] = None

    def next_rng(self) -> jax.Array:
        if self.rng is None:
            raise ValueError("Ctx.rng is None but a stochastic op needs randomness")
        self._counter += 1
        return jax.random.fold_in(self.rng, self._counter)

    @staticmethod
    def eval() -> "Ctx":
        return Ctx(rng=None, train=False)


# ---------------------------------------------------------------------------
# Initializers (parity: reference src/module.py:18-73 + torch defaults)
# ---------------------------------------------------------------------------

_GAINS = {
    "linear": 1.0,
    "conv1d": 1.0,
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": math.sqrt(2.0),
}


def calculate_gain(nonlinearity: str, param: float = 0.01) -> float:
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + param ** 2))
    return _GAINS[nonlinearity]


def xavier_uniform(key, shape, gain: float = 1.0, fan_in=None, fan_out=None,
                   dtype=jnp.float32):
    """Xavier/Glorot uniform. For 2-D [out, in] weight; for conv kernels pass
    fan_in/fan_out explicitly."""
    if fan_in is None:
        fan_out_, fan_in_ = shape[0], shape[1]
        if len(shape) > 2:  # [out, in, *kernel] torch layout
            rf = int(jnp.prod(jnp.array(shape[2:])))
            fan_in_, fan_out_ = fan_in_ * rf, fan_out_ * rf
        fan_in, fan_out = fan_in_, fan_out_
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def torch_linear_uniform(key, shape, fan_in, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    a = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------


def linear_init(key, d_in: int, d_out: int, bias: bool = True,
                w_init: str = "linear", torch_default: bool = False):
    """Weight stored [d_in, d_out] (matmul-ready, no transpose on TPU)."""
    kw, kb = jax.random.split(key)
    if torch_default:
        w = torch_linear_uniform(kw, (d_in, d_out), d_in)
    else:
        w = xavier_uniform(kw, (d_in, d_out), calculate_gain(w_init),
                           fan_in=d_in, fan_out=d_out)
    p = {"w": w}
    if bias:
        p["b"] = torch_linear_uniform(kb, (d_out,), d_in)
    return p


def weight(p, dtype, name: str = "w"):
    """Weight view in `dtype`, transparently dequantizing int8 weight-only
    quantization (nn.quant.quantize_params stores {name}_q int8 +
    {name}_scale per-output-channel instead of {name}). The int8 tensor is
    what streams from HBM; the convert+scale fuses into the consuming
    matmul — the point is halved weight bandwidth on the decode path."""
    q = p.get(name + "_q")
    if q is None:
        return p[name].astype(dtype)
    return q.astype(dtype) * p[name + "_scale"].astype(dtype)


def linear(p, x):
    y = jnp.dot(x, weight(p, x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Conv1d — channels-last [B, T, C], kernel [W, Cin, Cout]
# ---------------------------------------------------------------------------


def conv1d_init(key, c_in: int, c_out: int, kernel_size: int,
                bias: bool = True, w_init: str = "linear",
                torch_default: bool = False):
    kw, kb = jax.random.split(key)
    fan_in = c_in * kernel_size
    fan_out = c_out * kernel_size
    if torch_default:
        # torch nn.Conv1d default (kaiming_uniform a=sqrt(5)) reduces to
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
        w = torch_linear_uniform(kw, (kernel_size, c_in, c_out), fan_in)
    else:
        w = xavier_uniform(kw, (kernel_size, c_in, c_out), calculate_gain(w_init),
                           fan_in=fan_in, fan_out=fan_out)
    p = {"w": w}
    if bias:
        p["b"] = torch_linear_uniform(kb, (c_out,), fan_in)
    return p


def conv1d(p, x, padding):
    """x: [B, T, Cin] -> [B, T', Cout]. padding: int (symmetric) or
    (left, right) tuple — (k-1, 0) gives a strictly causal conv."""
    if isinstance(padding, int):
        padding = (padding, padding)
    # Same-dtype in/out keeps the VJP transpose rule happy under bf16; the
    # MXU still accumulates partial products in f32 internally.
    y = jax.lax.conv_general_dilated(
        x, weight(p, x.dtype), window_strides=(1,), padding=[padding],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def embedding_init(key, vocab: int, dim: int, padding_idx: Optional[int] = None):
    w = jax.random.normal(key, (vocab, dim), jnp.float32)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w}


def embedding(p, ids):
    q = p.get("w_q")
    if q is not None:  # take int8 rows, then scale (less HBM read)
        return jnp.take(q, ids, axis=0).astype(jnp.float32) * p["w_scale"]
    return jnp.take(p["w"], ids, axis=0)


# ---------------------------------------------------------------------------
# BatchNorm over the channel axis of [B, T, C] (torch BatchNorm1d semantics:
# statistics over batch AND time, momentum 0.1, eps 1e-5, biased var for
# normalization, unbiased var for the running estimate)
# ---------------------------------------------------------------------------

BN_MOMENTUM = 0.1
BN_EPS = 1e-5


def batchnorm_init(c: int):
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}
    return params, state


def batchnorm(p, s, x, train: bool):
    """x: [B, T, C] or [B, C]. Returns (y, new_state)."""
    axes = tuple(range(x.ndim - 1))
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(1, n - 1))
        new_s = {
            "mean": (1 - BN_MOMENTUM) * s["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * s["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"]
    y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + p["bias"].astype(x.dtype)
    return y, new_s


# ---------------------------------------------------------------------------
# LayerNorm (torch default eps 1e-5)
# ---------------------------------------------------------------------------


def layernorm_init(c: int):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def layernorm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout (inverted, torch semantics)
# ---------------------------------------------------------------------------


def dropout(ctx: Ctx, x, p: float):
    if not ctx.train or p == 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Recurrent cells (torch gate order; U(-1/sqrt(H), 1/sqrt(H)) init)
# ---------------------------------------------------------------------------


def lstm_cell_init(key, d_in: int, hidden: int):
    k = jax.random.split(key, 4)
    a = 1.0 / math.sqrt(hidden)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -a, a)
    return {
        "wi": u(k[0], (d_in, 4 * hidden)),   # input->gates  [i f g o]
        "wh": u(k[1], (hidden, 4 * hidden)),
        "bi": u(k[2], (4 * hidden,)),
        "bh": u(k[3], (4 * hidden,)),
    }


def lstm_cell(p, x, h, c):
    """One step. x: [B, Din]; h, c: [B, H]. Returns (h', c')."""
    gates = (jnp.dot(x, weight(p, x.dtype, "wi")) +
             jnp.dot(h, weight(p, x.dtype, "wh")) +
             (p["bi"] + p["bh"]).astype(x.dtype))
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def gru_cell_init(key, d_in: int, hidden: int):
    k = jax.random.split(key, 4)
    a = 1.0 / math.sqrt(hidden)
    u = lambda kk, shape: jax.random.uniform(kk, shape, jnp.float32, -a, a)
    return {
        "wi": u(k[0], (d_in, 3 * hidden)),   # [r z n]
        "wh": u(k[1], (hidden, 3 * hidden)),
        "bi": u(k[2], (3 * hidden,)),
        "bh": u(k[3], (3 * hidden,)),
    }


def gru_cell(p, x, h):
    """torch GRU semantics: n = tanh(W_in x + b_in + r * (W_hn h + b_hn))."""
    gi = jnp.dot(x, weight(p, x.dtype, "wi")) + p["bi"].astype(x.dtype)
    gh = jnp.dot(h, weight(p, x.dtype, "wh")) + p["bh"].astype(x.dtype)
    ir, iz, in_ = jnp.split(gi, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(in_ + r * hn)
    return (1 - z) * n + z * h
