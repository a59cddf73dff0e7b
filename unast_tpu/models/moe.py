"""Mixture-of-Experts FFN with expert parallelism ('ep' mesh axis).

Pure TPU-native addition (the reference is a dense single-device model —
SURVEY.md §2.3): an opt-in Switch/GShard-style sparse FFN that replaces the
dense transformer FFN when ModelConfig.moe_experts > 0. Design follows the
standard TPU MoE recipe (GShard/Switch):

  - router: per-token softmax over E experts, top-k selection (k in {1, 2});
    top-1 keeps the raw router prob as the gate (Switch), top-k > 1
    normalizes the selected gates (GShard/Mixtral).
  - capacity-based dispatch: each expert processes at most
    C = ceil(top_k * tokens / E * capacity_factor) tokens; one-hot
    dispatch/combine tensors turn the whole layer into three einsums that
    XLA maps onto the MXU. Tokens past capacity fall through the residual
    connection (standard Switch behavior).
  - expert parallelism: expert-stacked weights [E, ...] are sharded over the
    mesh's 'ep' axis (parallel/mesh.py); GSPMD inserts the all-to-all-style
    collectives from the dispatch/combine einsums itself.
  - aux load-balance loss (Switch eq. 4): E * sum_e f_e * P_e over valid
    tokens, surfaced through nn.Ctx.aux_losses and weighted by
    --moe_aux_weight in the train step.

Incremental decode (T == 1 steps inside lax.while_loop) uses an exact
dense-combine path instead: every expert runs on the single frame and the
gates combine the outputs — no capacity drops at inference, no aux
collection inside loop bodies (ctx.aux_losses would escape the trace).
"""

import math

import jax
import jax.numpy as jnp

from .. import nn


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
    logits = jnp.dot(x, p["router"]["w"].astype(x.dtype))
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def _expert_ffn(p, ctx: nn.Ctx, h, dropout_p: float):
    """h: [E, C, D] dispatched tokens -> [E, C, D]. Mirrors the dense
    transformer _ffn (relu + dropout between the two projections)."""
    w1 = p["lin1"]["w"].astype(h.dtype)
    b1 = p["lin1"]["b"].astype(h.dtype)
    y = jax.nn.relu(jnp.einsum("ecd,edf->ecf", h, w1,
                               preferred_element_type=jnp.float32
                               ).astype(h.dtype) + b1[:, None, :])
    y = nn.dropout(ctx, y, dropout_p)
    w2 = p["lin2"]["w"].astype(h.dtype)
    b2 = p["lin2"]["b"].astype(h.dtype)
    return jnp.einsum("ecf,efd->ecd", y, w2,
                      preferred_element_type=jnp.float32
                      ).astype(h.dtype) + b2[:, None, :]


def _top1_round(remaining, valid, counts, capacity: int):
    """One top-1 routing round over `remaining` [N, E] probs.

    Returns (chosen one-hot pre-drop, gate [N] post-drop, dispatch
    [N, E, C], updated per-expert counts [E])."""
    n, e = remaining.shape
    idx = jnp.argmax(remaining, axis=-1)
    gate = jnp.max(remaining, axis=-1) * valid
    onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32) * valid[:, None]
    # Position of each token within its expert = tokens assigned to that
    # expert earlier in the flat order (+ tokens from previous rounds).
    pos = jnp.cumsum(onehot, axis=0) - onehot + counts[None, :]
    pos_tok = jnp.sum(pos * onehot, axis=-1)
    keep = jnp.logical_and(pos_tok < capacity, gate > 0)
    kept = onehot * keep[:, None].astype(jnp.float32)
    slot = jax.nn.one_hot(pos_tok.astype(jnp.int32), capacity,
                          dtype=jnp.float32)
    dispatch = kept[:, :, None] * slot[:, None, :]
    counts = counts + jnp.sum(kept, axis=0)
    return onehot, gate * keep.astype(jnp.float32), dispatch, counts


def moe_ffn(p, ctx: nn.Ctx, x, pad_mask, dropout_p: float,
            top_k: int = 1, capacity_factor: float = 1.25):
    """Sparse FFN over x: [B, T, D]. pad_mask: bool [B, T] True=PAD (PAD
    tokens neither consume capacity nor count toward the aux loss) or None.

    T == 1 (incremental decode) routes through the exact dense-combine path;
    otherwise capacity-based dispatch. Appends the Switch load-balance aux
    loss to ctx.aux_losses when the ctx is collecting."""
    if x.shape[1] == 1:
        return _moe_dense(p, ctx, x, dropout_p, top_k)
    b, t, d = x.shape
    n = b * t
    e = p["router"]["w"].shape[1]
    cap = max(1, int(math.ceil(top_k * n / e * capacity_factor)))

    xf = x.reshape(n, d)
    probs = _router_probs(p, xf)                      # [N, E] f32
    valid = (jnp.ones((n,), jnp.float32) if pad_mask is None
             else (~pad_mask).reshape(n).astype(jnp.float32))

    remaining = probs * valid[:, None]
    counts = jnp.zeros((e,), jnp.float32)
    rounds = []
    top1_assign = None
    for _ in range(top_k):
        onehot, gate, dispatch, counts = _top1_round(
            remaining, valid, counts, cap)
        if top1_assign is None:
            top1_assign = onehot
        rounds.append((gate, dispatch))
        remaining = remaining * (1.0 - onehot)

    if top_k > 1:  # normalize selected gates (GShard); top-1 keeps raw prob
        denom = sum(g for g, _ in rounds) + 1e-9
        rounds = [(g / denom, disp) for g, disp in rounds]

    combine = sum(g[:, None, None] * disp for g, disp in rounds)  # [N,E,C]
    dispatch = sum(disp for _, disp in rounds)

    expert_in = jnp.einsum("nec,nd->ecd", dispatch.astype(x.dtype), xf)
    expert_out = _expert_ffn(p, ctx, expert_in, dropout_p)
    out = jnp.einsum("nec,ecd->nd", combine.astype(x.dtype), expert_out)

    if ctx.aux_losses is not None:
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        frac = jnp.sum(top1_assign, axis=0) / n_valid          # f_e
        mean_prob = jnp.sum(probs * valid[:, None], axis=0) / n_valid
        ctx.aux_losses.append(e * jnp.sum(frac * mean_prob))
    return out.reshape(b, t, d)


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
    w1 = p["lin1"]["w"].astype(x.dtype)
    b1 = p["lin1"]["b"].astype(x.dtype)
    h = jax.nn.relu(jnp.einsum("btd,edf->btef", x, w1) + b1[None, None])
    h = nn.dropout(ctx, h, dropout_p)
    w2 = p["lin2"]["w"].astype(x.dtype)
    b2 = p["lin2"]["b"].astype(x.dtype)
    y = jnp.einsum("btef,efd->bted", h, w2) + b2[None, None]
    return jnp.einsum("bte,bted->btd", gates.astype(x.dtype), y)
