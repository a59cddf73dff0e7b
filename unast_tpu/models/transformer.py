"""Post-LN transformer encoder/decoder with a KV-cached incremental decode
path.

Parity targets: reference TransformerEncoder/TransformerDecoder wrappers over
torch.nn.Transformer* (src/module.py:270-293; torch 1.8 defaults: post-LN,
ReLU FFN, dropout on attention weights and residuals, eps 1e-5 layernorm).

TPU-native departures:
  - batch-first [B, T, D] throughout (no seq-first transposes);
  - masks are additive float biases computed once per forward;
  - incremental decoding uses preallocated [B, max_len, H, Dh] KV caches and
    a position mask — the reference re-runs the whole decoder over the
    growing prefix every step with no cache (src/network.py:229-243), which
    is O(T^2) full-stack work per sequence; the cache is the single biggest
    inference win (BASELINE.md RTF target).
  - softmax/layernorm accumulate in float32 regardless of compute dtype.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import nn

NEG_INF = -1e9  # finite mask value: keeps fully-masked rows NaN-free


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------


def mha_init(key, d_model: int, nhead: int):
    ks = jax.random.split(key, 4)
    # torch MHA: xavier_uniform over the stacked [3E, E] in-proj (fan_in=E,
    # fan_out=3E), zero in-proj bias; default out-proj with zero bias.
    def in_proj(k):
        w = nn.xavier_uniform(k, (d_model, d_model), 1.0,
                              fan_in=d_model, fan_out=3 * d_model)
        return {"w": w, "b": jnp.zeros((d_model,))}

    out = nn.linear_init(ks[3], d_model, d_model, torch_default=True)
    out["b"] = jnp.zeros((d_model,))
    return {"q": in_proj(ks[0]), "k": in_proj(ks[1]), "v": in_proj(ks[2]),
            "out": out}


def _split_heads(x, nhead: int):
    b, t, d = x.shape
    return x.reshape(b, t, nhead, d // nhead)


def _fused_proj(ps, x):
    """Apply several same-input linear projections as ONE wide matmul.

    `ps` is a list of {"w": [D, D'], "b": [D']} dicts; the weights are
    concatenated along the output dim at apply time (the param tree keeps
    the separate q/k/v entries for torch-checkpoint parity). At d_model=256
    the separate projections are bandwidth-bound — x is re-read from HBM
    per projection — so fusing q/k/v into a [D, 3D] matmul reads the
    activation once and fills the MXU wider."""
    w = jnp.concatenate([nn.weight(p, x.dtype) for p in ps], axis=1)
    b = jnp.concatenate([p["b"] for p in ps])
    y = jnp.dot(x, w) + b.astype(x.dtype)
    return jnp.split(y, len(ps), axis=-1)  # all projections are [D, D]


def attention_core(q, k, v, bias, ctx: nn.Ctx, dropout_p: float,
                   weights_out=None):
    """q: [B, Tq, H, Dh], k/v: [B, Tk, H, Dh], bias: [B|1, 1|H, Tq, Tk] additive.
    Returns [B, Tq, H, Dh]. Scores accumulate in f32. If `weights_out` is a
    list, the pre-dropout f32 attention probs [B, H, Tq, Tk] are appended
    (used by the guided-attention loss, train/losses.py)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(jnp.float32(dh)))
    if bias is not None:
        scores = scores + bias
    w = jax.nn.softmax(scores, axis=-1)
    if weights_out is not None:
        weights_out.append(w)
    w = nn.dropout(ctx, w, dropout_p)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def mha(p, ctx: nn.Ctx, q_in, kv_in, bias, nhead: int, dropout_p: float,
        impl: str = "xla", kv_lens=None, causal: bool = False,
        weights_out=None):
    """Full (non-cached) attention. q_in: [B, Tq, D], kv_in: [B, Tk, D].
    impl='flash' routes through the Pallas flash-attention kernel
    (ops/attention.py) using (kv_lens, causal) instead of the additive bias;
    attention-weight dropout is not applied on that path (and weights_out is
    unavailable — flash never materializes the probs)."""
    if q_in is kv_in:  # self-attention: one [D, 3D] matmul
        q, k, v = _fused_proj([p["q"], p["k"], p["v"]], q_in)
    else:              # cross-attention: q alone + fused [D, 2D] k/v
        q = nn.linear(p["q"], q_in)
        k, v = _fused_proj([p["k"], p["v"]], kv_in)
    q, k, v = (_split_heads(x, nhead) for x in (q, k, v))
    if impl == "flash" and weights_out is None:
        from ..ops import flash_attention
        o = flash_attention(q, k, v, kv_lens, causal=causal)
    else:
        o = attention_core(q, k, v, bias, ctx, dropout_p,
                           weights_out=weights_out)
    b, t, h, dh = o.shape
    return nn.linear(p["out"], o.reshape(b, t, h * dh))


# ---------------------------------------------------------------------------
# Mask/bias builders
# ---------------------------------------------------------------------------


def padding_bias(pad_mask):
    """bool [B, Tk] (True = PAD) -> additive [B, 1, 1, Tk]."""
    return jnp.where(pad_mask, NEG_INF, 0.0)[:, None, None, :].astype(jnp.float32)


def causal_bias(t: int):
    """additive [1, 1, T, T] lower-triangular mask."""
    m = jnp.tril(jnp.ones((t, t), dtype=bool))
    return jnp.where(m, 0.0, NEG_INF)[None, None].astype(jnp.float32)


def chunk_bias(t: int, chunk: int, left_chunks: int):
    """Additive [1, 1, T, T] block-chunk attention mask (WeNet/Emformer
    style): a query frame in chunk cq = q // chunk may attend key frames
    in chunks [cq - left_chunks, cq]. left_chunks < 0 = unlimited left
    context (pure chunk-causal). This is the training-time mask for
    STREAMING CTC ASR (models/ctc.py, infer/streaming.py): inference over
    per-chunk slices with `left_chunks` cached chunks then reproduces the
    full forward exactly."""
    cq = jnp.arange(t) // chunk
    ok = cq[None, :] <= cq[:, None]  # no future chunks
    if left_chunks >= 0:
        ok &= cq[None, :] >= cq[:, None] - left_chunks
    return jnp.where(ok, 0.0, NEG_INF)[None, None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_layer_init(key, d_model: int, nhead: int, ffn_dim: int,
                       moe: int = 0):
    ks = jax.random.split(key, 3)
    p = {
        "attn": mha_init(ks[0], d_model, nhead),
        "ln1": nn.layernorm_init(d_model),
        "ln2": nn.layernorm_init(d_model),
    }
    if moe > 0:
        from . import moe as MoE
        p["moe"] = MoE.moe_init(ks[1], d_model, ffn_dim, moe)
    else:
        p["lin1"] = nn.linear_init(ks[1], d_model, ffn_dim, torch_default=True)
        p["lin2"] = nn.linear_init(ks[2], ffn_dim, d_model, torch_default=True)
    return p


def _ffn(p, ctx: nn.Ctx, x, dropout_p: float, pad_mask=None,
         moe_opts=(1, 1.25)):
    """Dense FFN, or the sparse MoE FFN when the layer carries expert params
    (ModelConfig.moe_experts > 0; models/moe.py)."""
    if "moe" in p:
        from . import moe as MoE
        return MoE.moe_ffn(p["moe"], ctx, x, pad_mask, dropout_p,
                           opts=moe_opts)
    h = nn.dropout(ctx, jax.nn.relu(nn.linear(p["lin1"], x)), dropout_p)
    return nn.linear(p["lin2"], h)


def _has_moe(p) -> bool:
    return "moe" in p["layers"][0]


def _take_aux(inner: nn.Ctx):
    """Sum of aux losses collected by an inner-layer ctx (0 when none).
    Scanned/rematerialized layer bodies use an inner ctx with its OWN aux
    list and return this sum as a body output — appending to the outer
    list from inside a scan/checkpoint region would leak tracers."""
    if inner.aux_losses:
        return sum(inner.aux_losses)
    return jnp.float32(0.0)


def encoder_layer(p, ctx: nn.Ctx, x, bias, nhead: int, dropout_p: float,
                  impl: str = "xla", kv_lens=None, pad_mask=None,
                  moe_opts=(1, 1.25)):
    a = mha(p["attn"], ctx, x, x, bias, nhead, dropout_p,
            impl=impl, kv_lens=kv_lens)
    x = nn.layernorm(p["ln1"], x + nn.dropout(ctx, a, dropout_p))
    f = _ffn(p, ctx, x, dropout_p, pad_mask=pad_mask, moe_opts=moe_opts)
    return nn.layernorm(p["ln2"], x + nn.dropout(ctx, f, dropout_p))


def encoder_init(key, d_model: int, nhead: int, ffn_dim: int, nlayers: int,
                 moe: int = 0):
    ks = jax.random.split(key, nlayers)
    return {"layers": [encoder_layer_init(k, d_model, nhead, ffn_dim, moe=moe)
                       for k in ks]}


def _stack_layers(layers):
    """List of per-layer param dicts -> one dict with leading [L] axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _ckpt(fn, policy: str = ""):
    """jax.checkpoint with a named policy: '' = nothing saveable (max
    recompute, min HBM), 'dots' = dots_with_no_batch_dims_saveable (save
    MXU outputs, recompute only bandwidth-bound ops — the standard TPU
    remat policy), 'dots_all' = dots_saveable."""
    if not policy:
        return jax.checkpoint(fn)
    pol = {"dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
           "dots_all": jax.checkpoint_policies.dots_saveable}[policy]
    return jax.checkpoint(fn, policy=pol)


def _layer_ctx(base, train: bool, li, collect: bool = False):
    """Per-layer ctx for scanned/rematerialized stacks; `base` comes from
    ctx.next_rng() so the fold domain is distinct from every other loop's.
    collect=True gives the inner ctx its own aux list (see _take_aux)."""
    rng = None if base is None else jax.random.fold_in(base, li)
    return nn.Ctx(rng=rng, train=train, aux_losses=[] if collect else None)


def encoder(p, ctx: nn.Ctx, x, pad_mask, nhead: int, dropout_p: float,
            impl: str = "xla", scan_layers: bool = False,
            remat: bool = False, moe_opts=(1, 1.25), pp: int = 1,
            pp_micro: int = 0, remat_policy: str = "",
            extra_bias=None):
    """x: [B, T, D], pad_mask: bool [B, T] True=PAD.

    extra_bias: optional additive [1|B, 1|H, T, T] attention bias summed
    with the padding bias in every layer (e.g. chunk_bias for streaming
    CTC training). Requires impl='xla' (the flash path encodes masking as
    (kv_lens, causal) and cannot express arbitrary biases).

    scan_layers=True runs the stack as a lax.scan over stacked layer params:
    the compiled program contains ONE layer body instead of L inlined copies
    — a large XLA compile-time win for the full training graph.

    remat=True wraps each layer in jax.checkpoint: activations inside the
    layer are recomputed in the backward pass instead of saved — the
    standard TPU HBM lever (trades ~1/3 extra FLOPs for O(L) less
    activation memory), which is what admits large-width training on one
    chip (BENCHMARKS.md width sweep).

    pp > 1 runs the stack as a GPipe pipeline over the mesh's 'pp' axis
    (parallel/pipeline.py::gpipe_stack; MoE stacks fall back to the
    sequential path — their aux-loss collection doesn't thread through
    the tick loop)."""
    bias = padding_bias(pad_mask)
    if extra_bias is not None:
        assert impl != "flash", "extra_bias requires the xla attention path"
        bias = bias + extra_bias
    kv_lens = jnp.sum(~pad_mask, axis=1) if impl == "flash" else None
    collect = ctx.aux_losses is not None and _has_moe(p)
    if pp > 1 and not _has_moe(p):
        from ..parallel.pipeline import gpipe_stack

        def one(lp, lctx, x_mb, bias_mb, kvl_mb, pad_mb):
            return encoder_layer(lp, lctx, x_mb, bias_mb, nhead, dropout_p,
                                 impl=impl,
                                 kv_lens=kvl_mb if impl == "flash" else None,
                                 pad_mask=pad_mb, moe_opts=moe_opts)

        margs = (bias,
                 kv_lens if kv_lens is not None
                 else jnp.zeros((x.shape[0],), jnp.int32),
                 pad_mask)
        return gpipe_stack(_stack_layers(p["layers"]), len(p["layers"]),
                           pp, ctx, x, margs, one, n_micro=pp_micro)
    if not scan_layers:
        if remat:
            rng_base = ctx.next_rng() if ctx.rng is not None else None

            def one(lp, key, x, bias, kv_lens):
                inner = nn.Ctx(rng=key, train=ctx.train,
                               aux_losses=[] if collect else None)
                y = encoder_layer(lp, inner, x, bias, nhead, dropout_p,
                                  impl=impl, kv_lens=kv_lens,
                                  pad_mask=pad_mask, moe_opts=moe_opts)
                return y, _take_aux(inner)

            one = _ckpt(one, remat_policy)
            aux = jnp.float32(0.0)
            for li, lp in enumerate(p["layers"]):
                key = (jax.random.fold_in(rng_base, li)
                       if rng_base is not None else None)
                x, a = one(lp, key, x, bias, kv_lens)
                aux = aux + a
            if collect:
                ctx.aux_losses.append(aux)
            return x
        for lp in p["layers"]:
            x = encoder_layer(lp, ctx, x, bias, nhead, dropout_p,
                              impl=impl, kv_lens=kv_lens,
                              pad_mask=pad_mask, moe_opts=moe_opts)
        return x

    stacked = _stack_layers(p["layers"])
    n = len(p["layers"])
    rng_base = ctx.next_rng() if ctx.rng is not None else None

    def body(x, xs):
        lp, li = xs
        inner = _layer_ctx(rng_base, ctx.train, li, collect=collect)
        y = encoder_layer(lp, inner, x, bias, nhead, dropout_p, impl=impl,
                          kv_lens=kv_lens, pad_mask=pad_mask,
                          moe_opts=moe_opts)
        return y, _take_aux(inner)

    if remat:
        body = _ckpt(body, remat_policy)
    x, aux = jax.lax.scan(body, x, (stacked, jnp.arange(n)))
    if collect:
        ctx.aux_losses.append(jnp.sum(aux))
    return x


# ---------------------------------------------------------------------------
# Decoder (parallel teacher-forced path)
# ---------------------------------------------------------------------------


def decoder_layer_init(key, d_model: int, nhead: int, ffn_dim: int,
                       moe: int = 0):
    ks = jax.random.split(key, 4)
    p = {
        "self": mha_init(ks[0], d_model, nhead),
        "cross": mha_init(ks[1], d_model, nhead),
        "ln1": nn.layernorm_init(d_model),
        "ln2": nn.layernorm_init(d_model),
        "ln3": nn.layernorm_init(d_model),
    }
    if moe > 0:
        from . import moe as MoE
        p["moe"] = MoE.moe_init(ks[2], d_model, ffn_dim, moe)
    else:
        p["lin1"] = nn.linear_init(ks[2], d_model, ffn_dim, torch_default=True)
        p["lin2"] = nn.linear_init(ks[3], ffn_dim, d_model, torch_default=True)
    return p


def decoder_layer(p, ctx: nn.Ctx, x, memory, self_bias, cross_bias,
                  nhead: int, dropout_p: float, impl: str = "xla",
                  tgt_lens=None, mem_lens=None, cross_weights_out=None,
                  pad_mask=None, moe_opts=(1, 1.25)):
    a = mha(p["self"], ctx, x, x, self_bias, nhead, dropout_p,
            impl=impl, kv_lens=tgt_lens, causal=True)
    x = nn.layernorm(p["ln1"], x + nn.dropout(ctx, a, dropout_p))
    a = mha(p["cross"], ctx, x, memory, cross_bias, nhead, dropout_p,
            impl=impl, kv_lens=mem_lens, weights_out=cross_weights_out)
    x = nn.layernorm(p["ln2"], x + nn.dropout(ctx, a, dropout_p))
    f = _ffn(p, ctx, x, dropout_p, pad_mask=pad_mask, moe_opts=moe_opts)
    return nn.layernorm(p["ln3"], x + nn.dropout(ctx, f, dropout_p))


def decoder_init(key, d_model: int, nhead: int, ffn_dim: int, nlayers: int,
                 moe: int = 0):
    ks = jax.random.split(key, nlayers)
    return {"layers": [decoder_layer_init(k, d_model, nhead, ffn_dim, moe=moe)
                       for k in ks]}


def decoder(p, ctx: nn.Ctx, x, memory, tgt_pad_mask, mem_pad_mask,
            nhead: int, dropout_p: float, impl: str = "xla",
            scan_layers: bool = False, cross_weights_out=None,
            remat: bool = False, moe_opts=(1, 1.25), pp: int = 1,
            pp_micro: int = 0, remat_policy: str = ""):
    """Teacher-forced parallel decode. x: [B, Tt, D], memory: [B, Ts, D].
    If `cross_weights_out` is a list, per-layer cross-attention probs
    [B, H, Tt, Ts] (f32) are appended — consumed by the guided-attention
    loss. remat: see encoder (disabled when cross_weights_out is requested
    — the guided-attention loss needs the probs saved). pp > 1: GPipe
    staging over the 'pp' mesh axis (see encoder; falls back to the
    sequential path when cross_weights_out is requested — reassembling
    per-(stage, micro) probs through the tick loop isn't worth the
    memory churn — or when the stack carries MoE aux losses)."""
    t = x.shape[1]
    self_bias = causal_bias(t) + padding_bias(tgt_pad_mask)
    cross_bias = padding_bias(mem_pad_mask)
    tgt_lens = mem_lens = None
    if impl == "flash":
        tgt_lens = jnp.sum(~tgt_pad_mask, axis=1)
        mem_lens = jnp.sum(~mem_pad_mask, axis=1)
    remat = remat and cross_weights_out is None
    collect = ctx.aux_losses is not None and _has_moe(p)
    if pp > 1 and cross_weights_out is None and not _has_moe(p):
        from ..parallel.pipeline import gpipe_stack
        b = x.shape[0]
        sb = jnp.broadcast_to(self_bias,
                              (b,) + self_bias.shape[1:])  # [B, 1, T, T]

        def one(lp, lctx, x_mb, mem_mb, sb_mb, cb_mb, tl_mb, ml_mb, pad_mb):
            flash = impl == "flash"
            return decoder_layer(lp, lctx, x_mb, mem_mb, sb_mb, cb_mb,
                                 nhead, dropout_p, impl=impl,
                                 tgt_lens=tl_mb if flash else None,
                                 mem_lens=ml_mb if flash else None,
                                 pad_mask=pad_mb, moe_opts=moe_opts)

        zeros_b = jnp.zeros((b,), jnp.int32)
        margs = (memory, sb, cross_bias,
                 tgt_lens if tgt_lens is not None else zeros_b,
                 mem_lens if mem_lens is not None else zeros_b,
                 tgt_pad_mask)
        return gpipe_stack(_stack_layers(p["layers"]), len(p["layers"]),
                           pp, ctx, x, margs, one, n_micro=pp_micro)
    if not scan_layers:
        if remat:
            rng_base = ctx.next_rng() if ctx.rng is not None else None

            def one(lp, key, x, memory, self_bias, cross_bias,
                    tgt_lens, mem_lens):
                inner = nn.Ctx(rng=key, train=ctx.train,
                               aux_losses=[] if collect else None)
                y = decoder_layer(lp, inner, x, memory, self_bias,
                                  cross_bias, nhead, dropout_p, impl=impl,
                                  tgt_lens=tgt_lens, mem_lens=mem_lens,
                                  pad_mask=tgt_pad_mask, moe_opts=moe_opts)
                return y, _take_aux(inner)

            one = _ckpt(one, remat_policy)
            aux = jnp.float32(0.0)
            for li, lp in enumerate(p["layers"]):
                key = (jax.random.fold_in(rng_base, li)
                       if rng_base is not None else None)
                x, a = one(lp, key, x, memory, self_bias, cross_bias,
                           tgt_lens, mem_lens)
                aux = aux + a
            if collect:
                ctx.aux_losses.append(aux)
            return x
        for lp in p["layers"]:
            x = decoder_layer(lp, ctx, x, memory, self_bias, cross_bias,
                              nhead, dropout_p, impl=impl,
                              tgt_lens=tgt_lens, mem_lens=mem_lens,
                              cross_weights_out=cross_weights_out,
                              pad_mask=tgt_pad_mask, moe_opts=moe_opts)
        return x

    stacked = _stack_layers(p["layers"])
    n = len(p["layers"])
    rng_base = ctx.next_rng() if ctx.rng is not None else None

    def body(x, xs):
        lp, li = xs
        ws = [] if cross_weights_out is not None else None
        inner = _layer_ctx(rng_base, ctx.train, li, collect=collect)
        y = decoder_layer(lp, inner, x, memory,
                          self_bias, cross_bias, nhead, dropout_p, impl=impl,
                          tgt_lens=tgt_lens, mem_lens=mem_lens,
                          cross_weights_out=ws,
                          pad_mask=tgt_pad_mask, moe_opts=moe_opts)
        return y, ((ws[0] if ws is not None else jnp.zeros((), x.dtype)),
                   _take_aux(inner))

    if remat:
        body = _ckpt(body, remat_policy)
    x, (ws, aux) = jax.lax.scan(body, x, (stacked, jnp.arange(n)))
    if cross_weights_out is not None:
        cross_weights_out.extend(ws)  # stacked [L, B, H, Tt, Ts] unbinds
    if collect:
        ctx.aux_losses.append(jnp.sum(aux))
    return x


# ---------------------------------------------------------------------------
# Incremental decode with KV cache
# ---------------------------------------------------------------------------


class DecodeCache(NamedTuple):
    """Preallocated self-attention KV caches plus precomputed cross-attention
    K/V. All leaves are stacked over layers at axis 0."""

    self_k: jnp.ndarray   # [L, B, max_len, H, Dh]
    self_v: jnp.ndarray   # [L, B, max_len, H, Dh]
    cross_k: jnp.ndarray  # [L, B, Ts, H, Dh]
    cross_v: jnp.ndarray  # [L, B, Ts, H, Dh]


def init_cache(p, memory, max_len: int, nhead: int) -> DecodeCache:
    """Allocate caches and precompute cross-attention K/V once per sequence."""
    b, ts, d = memory.shape
    nlayers = len(p["layers"])
    dh = d // nhead
    kv = [_fused_proj([lp["cross"]["k"], lp["cross"]["v"]], memory)
          for lp in p["layers"]]
    cross_k = jnp.stack([_split_heads(k, nhead) for k, _ in kv])
    cross_v = jnp.stack([_split_heads(v, nhead) for _, v in kv])
    zeros = jnp.zeros((nlayers, b, max_len, nhead, dh), memory.dtype)
    return DecodeCache(zeros, zeros, cross_k, cross_v)


def _decoder_step_layer(lp, ctx: nn.Ctx, x, pos, sk, sv, ck, cv, self_bias,
                        mem_bias, nhead: int, dropout_p: float,
                        moe_opts=(1, 1.25)):
    """One layer of one decode step. sk/sv: [B, max_len, H, Dh] self caches
    for THIS layer; ck/cv: precomputed cross K/V. Returns (x, sk, sv)."""
    q, k_t, v_t = (_split_heads(y, nhead) for y in _fused_proj(
        [lp["self"]["q"], lp["self"]["k"], lp["self"]["v"]], x))
    sk = jax.lax.dynamic_update_slice_in_dim(sk, k_t, pos, axis=1)
    sv = jax.lax.dynamic_update_slice_in_dim(sv, v_t, pos, axis=1)
    a = attention_core(q, sk, sv, self_bias, ctx, dropout_p)
    b_, t_, h_, dh_ = a.shape
    a = nn.linear(lp["self"]["out"], a.reshape(b_, t_, h_ * dh_))
    x = nn.layernorm(lp["ln1"], x + nn.dropout(ctx, a, dropout_p))

    q = _split_heads(nn.linear(lp["cross"]["q"], x), nhead)
    a = attention_core(q, ck, cv, mem_bias, ctx, dropout_p)
    a = nn.linear(lp["cross"]["out"], a.reshape(b_, t_, h_ * dh_))
    x = nn.layernorm(lp["ln2"], x + nn.dropout(ctx, a, dropout_p))

    f = _ffn(lp, ctx, x, dropout_p, moe_opts=moe_opts)
    x = nn.layernorm(lp["ln3"], x + nn.dropout(ctx, f, dropout_p))
    return x, sk, sv


def decoder_step(p, ctx: nn.Ctx, x, pos, cache: DecodeCache, mem_bias,
                 nhead: int, dropout_p: float, scan_layers: bool = False,
                 moe_opts=(1, 1.25)):
    """One decode step. x: [B, 1, D] at position `pos` (traced scalar).
    Attends over cache positions <= pos. Returns (y [B, 1, D], new_cache).

    Cache updates are dynamic_update_slice into the stacked [L, ...] buffers
    (traced position) so XLA keeps them in-place inside the surrounding
    while_loop — never a full-cache copy per step. scan_layers runs the
    layer loop as lax.scan over (stacked params, cache slices)."""
    max_len = cache.self_k.shape[2]
    # Positions > pos are masked out (the cache there is stale zeros).
    pos_ids = jnp.arange(max_len)[None, None, None, :]
    self_bias = jnp.where(pos_ids <= pos, 0.0, NEG_INF).astype(jnp.float32)

    if scan_layers:
        stacked = _stack_layers(p["layers"])
        n = len(p["layers"])
        rng_base = ctx.next_rng() if ctx.rng is not None else None

        def body(x, xs):
            lp, sk, sv, ck, cv, li = xs
            x, sk, sv = _decoder_step_layer(
                lp, _layer_ctx(rng_base, ctx.train, li), x, pos, sk, sv,
                ck, cv, self_bias, mem_bias, nhead, dropout_p,
                moe_opts=moe_opts)
            return x, (sk, sv)

        x, (new_sk, new_sv) = jax.lax.scan(
            body, x, (stacked, cache.self_k, cache.self_v,
                      cache.cross_k, cache.cross_v, jnp.arange(n)))
        return x, DecodeCache(new_sk, new_sv, cache.cross_k, cache.cross_v)

    # Unrolled path: single-position writes into the 5-D stacked buffers
    # (static layer index) — strictly in-place friendly.
    self_k, self_v = cache.self_k, cache.self_v
    zero = jnp.int32(0)
    for li, lp in enumerate(p["layers"]):
        q, k_t, v_t = (_split_heads(y, nhead) for y in _fused_proj(
            [lp["self"]["q"], lp["self"]["k"], lp["self"]["v"]], x))
        self_k = jax.lax.dynamic_update_slice(
            self_k, k_t[None], (jnp.int32(li), zero, pos, zero, zero))
        self_v = jax.lax.dynamic_update_slice(
            self_v, v_t[None], (jnp.int32(li), zero, pos, zero, zero))
        a = attention_core(q, self_k[li], self_v[li], self_bias, ctx, dropout_p)
        b_, t_, h_, dh_ = a.shape
        a = nn.linear(lp["self"]["out"], a.reshape(b_, t_, h_ * dh_))
        x = nn.layernorm(lp["ln1"], x + nn.dropout(ctx, a, dropout_p))

        q = _split_heads(nn.linear(lp["cross"]["q"], x), nhead)
        a = attention_core(q, cache.cross_k[li], cache.cross_v[li],
                           mem_bias, ctx, dropout_p)
        a = nn.linear(lp["cross"]["out"], a.reshape(b_, t_, h_ * dh_))
        x = nn.layernorm(lp["ln2"], x + nn.dropout(ctx, a, dropout_p))

        f = _ffn(lp, ctx, x, dropout_p, moe_opts=moe_opts)
        x = nn.layernorm(lp["ln3"], x + nn.dropout(ctx, f, dropout_p))

    new_cache = DecodeCache(self_k, self_v, cache.cross_k, cache.cross_v)
    return x, new_cache
