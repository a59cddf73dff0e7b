"""Minimal functional NN core for the TPU-native UNAST framework.

Design: pure init/apply function pairs over plain nested dicts of jnp arrays.
No module framework — every forward is an explicit function of
(params, inputs, ctx), which makes lax.scan / lax.while_loop decode loops,
KV caches, and pjit sharding trivial (no lifted-transform machinery needed).

BatchNorm running statistics live in a separate `state` tree (mirroring the
params structure) threaded explicitly: apply fns that touch state return
(out, new_state). RNG for dropout/noise is folded from a single per-step key
via a monotone counter in `Ctx` — deterministic under tracing since call
order is static.

Initializer parity targets (distributional, for comparable training
dynamics): reference `src/module.py:18-73` (Xavier-uniform Linear/Conv with
activation gains), torch defaults elsewhere.
"""

from . import quant
from .core import (
    Ctx,
    weight,
    calculate_gain,
    xavier_uniform,
    torch_linear_uniform,
    linear_init,
    linear,
    conv1d_init,
    conv1d,
    embedding_init,
    embedding,
    batchnorm_init,
    batchnorm,
    layernorm_init,
    layernorm,
    dropout,
    lstm_cell_init,
    lstm_cell,
    gru_cell_init,
    gru_cell,
)

__all__ = [
    "Ctx",
    "weight",
    "quant",
    "calculate_gain",
    "xavier_uniform",
    "torch_linear_uniform",
    "linear_init",
    "linear",
    "conv1d_init",
    "conv1d",
    "embedding_init",
    "embedding",
    "batchnorm_init",
    "batchnorm",
    "layernorm_init",
    "layernorm",
    "dropout",
    "lstm_cell_init",
    "lstm_cell",
    "gru_cell_init",
    "gru_cell",
]
