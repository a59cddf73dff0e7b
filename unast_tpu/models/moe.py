"""Mixture-of-Experts FFN with expert parallelism ('ep' mesh axis).

Pure TPU-native addition (the reference is a dense single-device model —
SURVEY.md §2.3): an opt-in Switch/GShard-style sparse FFN that replaces the
dense transformer FFN when ModelConfig.moe_experts > 0. Two execution paths
(ModelConfig.moe_impl), identical routing semantics:

  - 'dispatch' (default): GShard grouped one-hot dispatch. Tokens are
    routed in groups of S (moe_group_size; auto = largest divisor of the
    token count <= 4096) with per-group capacity
    C = ceil(top_k * S / E * capacity_factor); the [G, S, E, C] one-hot
    dispatch/combine tensors turn the layer into einsums that XLA maps onto
    the MXU, and grouping bounds their memory to O(N * S * top_k * cf)
    instead of O(N^2 / E). Tokens past capacity fall through the residual
    connection (standard Switch behavior). Expert-stacked weights [E, ...]
    shard over the mesh's 'ep' axis (parallel/mesh.py); GSPMD inserts the
    all-to-all-style collectives from the dispatch/combine einsums itself.
  - 'ragged': dropless. Flat top-k assignments are sorted by expert id and
    the two projections run as lax.ragged_dot grouped matmuls (the TPU
    MoE primitive); gated outputs scatter-add back per token. Exact — no
    capacity drops — and avoids the one-hot tensors entirely, so it is the
    fast path on a single chip or pure-dp meshes. (The sort/gather layout
    does not decompose over 'ep' under GSPMD; use 'dispatch' there.)

Router: per-token softmax over E experts, top-k selection (k in {1, 2});
top-1 keeps the raw router prob as the gate (Switch), top-k > 1 normalizes
the selected gates (GShard/Mixtral). Aux load-balance loss (Switch eq. 4):
E * sum_e f_e * P_e over valid tokens, surfaced through nn.Ctx.aux_losses
and weighted by --moe_aux_weight in the train step.

Incremental decode (T == 1 steps inside lax.while_loop) uses an exact
dense-combine path instead: every expert runs on the single frame and the
gates combine the outputs — no capacity drops at inference, no aux
collection inside loop bodies (ctx.aux_losses would escape the trace).
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import nn


class MoeOpts(NamedTuple):
    """Jit-static routing options (ModelConfig.moe_opts). Constructed as
    MoeOpts(*moe_opts) inside the layer so plain (top_k, cf) tuples from
    older call sites keep working."""

    top_k: int = 1
    capacity_factor: float = 1.25
    impl: str = "dispatch"
    group_size: int = 0


def moe_init(key, d_model: int, ffn_dim: int, n_experts: int):
    """Router + expert-stacked FFN weights. Each expert is initialized
    exactly like the dense FFN (torch-default Linear init) so E=1 reproduces
    the dense layer's distribution."""
    k_r, k_1, k_2 = jax.random.split(key, 3)
    router = nn.linear_init(k_r, d_model, n_experts, bias=False,
                            torch_default=True)
    stack = lambda ps: jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *ps)
    lin1 = stack([nn.linear_init(k, d_model, ffn_dim, torch_default=True)
                  for k in jax.random.split(k_1, n_experts)])
    lin2 = stack([nn.linear_init(k, ffn_dim, d_model, torch_default=True)
                  for k in jax.random.split(k_2, n_experts)])
    return {"router": router, "lin1": lin1, "lin2": lin2}


def _router_probs(p, x):
    """x: [..., D] -> f32 probs [..., E]."""
    logits = jnp.dot(x, nn.weight(p["router"], x.dtype))
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def _expert_ffn(p, ctx: nn.Ctx, h, dropout_p: float):
    """h: [..., E, C, D] dispatched tokens -> same shape. Mirrors the dense
    transformer _ffn (relu + dropout between the two projections)."""
    w1 = nn.weight(p["lin1"], h.dtype)
    b1 = p["lin1"]["b"].astype(h.dtype)
    y = jax.nn.relu(jnp.einsum("...ecd,edf->...ecf", h, w1,
                               preferred_element_type=jnp.float32
                               ).astype(h.dtype) + b1[..., None, :])
    y = nn.dropout(ctx, y, dropout_p)
    w2 = nn.weight(p["lin2"], h.dtype)
    b2 = p["lin2"]["b"].astype(h.dtype)
    return jnp.einsum("...ecf,efd->...ecd", y, w2,
                      preferred_element_type=jnp.float32
                      ).astype(h.dtype) + b2[..., None, :]


def _top1_round(remaining, valid, counts, capacity: int):
    """One top-1 routing round over `remaining` [G, S, E] probs (capacity
    accounting per group, GShard-style).

    Returns (chosen one-hot pre-drop, gate [G, S] post-drop, dispatch
    [G, S, E, C], updated per-group-per-expert counts [G, E])."""
    g, s, e = remaining.shape
    idx = jnp.argmax(remaining, axis=-1)
    gate = jnp.max(remaining, axis=-1) * valid
    onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32) * valid[..., None]
    # Position of each token within its expert = tokens assigned to that
    # expert earlier in the group (+ tokens from previous rounds).
    pos = jnp.cumsum(onehot, axis=1) - onehot + counts[:, None, :]
    pos_tok = jnp.sum(pos * onehot, axis=-1)
    keep = jnp.logical_and(pos_tok < capacity, gate > 0)
    kept = onehot * keep[..., None].astype(jnp.float32)
    slot = jax.nn.one_hot(pos_tok.astype(jnp.int32), capacity,
                          dtype=jnp.float32)
    dispatch = kept[..., None] * slot[..., None, :]
    counts = counts + jnp.sum(kept, axis=1)
    return onehot, gate * keep.astype(jnp.float32), dispatch, counts


def _auto_group(n: int, group_size: int) -> int:
    """Largest divisor of n <= the requested (or 4096 auto) group size."""
    s = min(n, group_size if group_size > 0 else 4096)
    while n % s:
        s -= 1
    return s


def moe_ffn(p, ctx: nn.Ctx, x, pad_mask, dropout_p: float, opts=MoeOpts()):
    """Sparse FFN over x: [B, T, D]. pad_mask: bool [B, T] True=PAD (PAD
    tokens neither consume capacity nor count toward the aux loss) or None.
    `opts`: MoeOpts or a plain tuple prefix of its fields.

    T == 1 (incremental decode) routes through the exact dense-combine
    path; otherwise the dispatch or ragged path per opts.impl. Appends the
    Switch load-balance aux loss to ctx.aux_losses when the ctx is
    collecting."""
    opts = MoeOpts(*opts)
    if x.shape[1] == 1:
        return _moe_dense(p, ctx, x, dropout_p, opts.top_k)
    b, t, d = x.shape
    n = b * t
    xf = x.reshape(n, d)
    probs = _router_probs(p, xf)                      # [N, E] f32
    valid = (jnp.ones((n,), jnp.float32) if pad_mask is None
             else (~pad_mask).reshape(n).astype(jnp.float32))
    if opts.impl == "ragged":
        out, top1_assign = _moe_ragged(p, ctx, xf, probs, valid,
                                       dropout_p, opts.top_k)
    else:
        out, top1_assign = _moe_dispatch(p, ctx, xf, probs, valid,
                                         dropout_p, opts)

    if ctx.aux_losses is not None:
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        e = probs.shape[-1]
        frac = jnp.sum(top1_assign, axis=0) / n_valid          # f_e
        mean_prob = jnp.sum(probs * valid[:, None], axis=0) / n_valid
        ctx.aux_losses.append(e * jnp.sum(frac * mean_prob))
    return out.reshape(b, t, d)


def _moe_dispatch(p, ctx: nn.Ctx, xf, probs, valid, dropout_p: float,
                  opts: MoeOpts):
    """GShard grouped one-hot dispatch. xf: [N, D]. Returns
    (out [N, D], top-1 assignment one-hot [N, E])."""
    n, d = xf.shape
    e = probs.shape[-1]
    s = _auto_group(n, opts.group_size)
    g = n // s
    cap = max(1, int(math.ceil(
        opts.top_k * s / e * opts.capacity_factor)))

    remaining = (probs * valid[:, None]).reshape(g, s, e)
    valid_g = valid.reshape(g, s)
    counts = jnp.zeros((g, e), jnp.float32)
    rounds = []
    top1_assign = None
    for _ in range(opts.top_k):
        onehot, gate, dispatch, counts = _top1_round(
            remaining, valid_g, counts, cap)
        if top1_assign is None:
            top1_assign = onehot.reshape(n, e)
        rounds.append((gate, dispatch))
        remaining = remaining * (1.0 - onehot)

    if opts.top_k > 1:  # normalize selected gates (GShard); top-1 raw prob
        denom = sum(gt for gt, _ in rounds) + 1e-9
        rounds = [(gt / denom, disp) for gt, disp in rounds]

    combine = sum(gt[..., None, None] * disp
                  for gt, disp in rounds)               # [G, S, E, C]
    dispatch = sum(disp for _, disp in rounds)

    xg = xf.reshape(g, s, d)
    expert_in = jnp.einsum("gsec,gsd->gecd", dispatch.astype(xf.dtype), xg)
    expert_out = _expert_ffn(p, ctx, expert_in, dropout_p)
    out = jnp.einsum("gsec,gecd->gsd", combine.astype(xf.dtype), expert_out)
    return out.reshape(n, d), top1_assign


def _moe_ragged(p, ctx: nn.Ctx, xf, probs, valid, dropout_p: float,
                top_k: int):
    """Dropless sort + lax.ragged_dot path. xf: [N, D]. Returns
    (out [N, D], top-1 assignment one-hot [N, E]).

    Flat [N*k] assignments sorted by expert id give contiguous per-expert
    token runs; ragged_dot(tokens, [E, D, F], group_sizes) runs both
    projections as grouped matmuls on the MXU with no capacity tensors.
    PAD tokens keep a real expert id with gate 0 so that group_sizes sums
    to exactly N*k: every row must belong to a group — ragged_dot leaves
    uncovered rows undefined, and undefined * 0 would be NaN in the
    backward pass."""
    n, d = xf.shape
    e = probs.shape[-1]
    vals, idx = jax.lax.top_k(probs, top_k)            # [N, K]
    if top_k > 1:
        vals = vals / (jnp.sum(vals, axis=-1, keepdims=True) + 1e-9)
    vals = vals * valid[:, None]

    flat_e = idx.reshape(-1)                           # [N*K]
    flat_g = vals.reshape(-1)
    order = jnp.argsort(flat_e)                        # stable
    tok = order // top_k                               # source token ids
    xs = jnp.take(xf, tok, axis=0)                     # [N*K, D]
    group_sizes = jnp.bincount(flat_e, length=e)       # sums to N*K
    bias_e = flat_e[order]
    h = jax.nn.relu(
        jax.lax.ragged_dot(xs, nn.weight(p["lin1"], xs.dtype), group_sizes,
                           preferred_element_type=jnp.float32
                           ).astype(xs.dtype)
        + jnp.take(p["lin1"]["b"].astype(xs.dtype), bias_e, axis=0))
    h = nn.dropout(ctx, h, dropout_p)
    y = (jax.lax.ragged_dot(h, nn.weight(p["lin2"], h.dtype), group_sizes,
                            preferred_element_type=jnp.float32
                            ).astype(h.dtype)
         + jnp.take(p["lin2"]["b"].astype(h.dtype), bias_e, axis=0))
    y = y * flat_g[order, None].astype(y.dtype)
    out = jnp.zeros_like(xf).at[tok].add(y)
    top1_assign = (jax.nn.one_hot(idx[:, 0], e, dtype=jnp.float32)
                   * valid[:, None])
    return out, top1_assign


def _moe_dense(p, ctx: nn.Ctx, x, dropout_p: float, top_k: int):
    """Exact no-drop path for single-step decode: run every expert on every
    token and combine by the top-k gates. x: [B, 1, D]."""
    b, t, d = x.shape
    probs = _router_probs(p, x)                       # [B, T, E] f32
    e = probs.shape[-1]
    vals, idx = jax.lax.top_k(probs, top_k)
    if top_k > 1:
        vals = vals / (jnp.sum(vals, axis=-1, keepdims=True) + 1e-9)
    gates = jnp.sum(jax.nn.one_hot(idx, e, dtype=jnp.float32)
                    * vals[..., None], axis=-2)       # [B, T, E]
    w1 = nn.weight(p["lin1"], x.dtype)
    b1 = p["lin1"]["b"].astype(x.dtype)
    h = jax.nn.relu(jnp.einsum("btd,edf->btef", x, w1) + b1[None, None])
    h = nn.dropout(ctx, h, dropout_p)
    w2 = nn.weight(p["lin2"], x.dtype)
    b2 = p["lin2"]["b"].astype(x.dtype)
    y = jnp.einsum("btef,efd->bted", h, w2) + b2[None, None]
    return jnp.einsum("bte,bted->btd", gates.astype(x.dtype), y)
