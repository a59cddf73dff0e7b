"""Conformer speech encoder (Gulati et al., "Conformer: Convolution-
augmented Transformer for Speech Recognition", 2020).

Model-family ADDITION over the reference, which offers only a plain
transformer encoder (src/module.py:270-280) or an LSTM encoder
(src/module.py:297-336) on the speech side. Selected with
`--speech_encoder conformer`; it is a drop-in replacement for the
speech-side encoder stack in networks.speech_tr_encode — same
[B, T, D] -> [B, T, D] contract, so the shared-latent invariant
(SURVEY.md §2.2) and every downstream consumer (decoders, discriminator,
back-translation) are untouched.

Block structure (pre-LN, macaron):
    x += 1/2 FFN(LN(x))          (swish, dropout)
    x += MHSA(LN(x))             (reuses transformer.mha — fused QKV,
                                  optional Pallas flash path)
    x += Conv(LN(x))             (pointwise->GLU -> depthwise(k) -> BN ->
                                  swish -> pointwise, padded frames zeroed
                                  before the depthwise window)
    x += 1/2 FFN(LN(x))
    x  = LN(x)

Deliberate deviations from the paper, documented here:
  - absolute sinusoidal positions at the stack input (the surrounding
    model already applies modules.positional_encoding) instead of
    relative-position MHSA — keeps attention kernels shared with the
    transformer family;
  - BatchNorm statistics include zeroed pad frames, exactly like every
    other BN in this codebase (and like the reference's own prenet BNs,
    src/module.py:145-147, which normalize padded batches unmasked).

BatchNorm running stats thread through the same explicit-state path as
the postnet BNs: conformer state lives under speech_m state["encoder"].
"""

import jax
import jax.numpy as jnp

from .. import nn
from . import transformer as T


def _ffn_init(key, d: int, ffn_dim: int):
    k1, k2 = jax.random.split(key)
    return {"ln": nn.layernorm_init(d),
            "up": nn.linear_init(k1, d, ffn_dim, torch_default=True),
            "down": nn.linear_init(k2, ffn_dim, d, torch_default=True)}


def _half_ffn(p, ctx: nn.Ctx, x, dropout_p: float):
    h = nn.layernorm(p["ln"], x)
    h = nn.dropout(ctx, jax.nn.silu(nn.linear(p["up"], h)), dropout_p)
    return x + 0.5 * nn.dropout(ctx, nn.linear(p["down"], h), dropout_p)


def _depthwise_init(key, d: int, kernel: int):
    # torch Conv1d(groups=C) default init: fan_in = kernel * (C/groups) = k.
    kw, kb = jax.random.split(key)
    w = nn.torch_linear_uniform(kw, (kernel, 1, d), kernel)
    b = nn.torch_linear_uniform(kb, (d,), kernel)
    return {"w": w, "b": b}


def _depthwise_conv(p, x, kernel: int):
    """Per-channel ('same'-padded) conv over time. x: [B, T, C]."""
    pad = (kernel // 2, kernel - 1 - kernel // 2)
    y = jax.lax.conv_general_dilated(
        x, nn.weight(p, x.dtype), window_strides=(1,), padding=[pad],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])
    return y + p["b"].astype(x.dtype)


def conformer_layer_init(key, d: int, nhead: int, ffn_dim: int, kernel: int):
    ks = jax.random.split(key, 6)
    params = {
        "ff1": _ffn_init(ks[0], d, ffn_dim),
        "attn_ln": nn.layernorm_init(d),
        "attn": T.mha_init(ks[1], d, nhead),
        "conv_ln": nn.layernorm_init(d),
        "conv_pw1": nn.linear_init(ks[2], d, 2 * d, torch_default=True),
        "conv_dw": _depthwise_init(ks[3], d, kernel),
        "conv_bn": None,  # replaced below (init returns params+state)
        "conv_pw2": nn.linear_init(ks[4], d, d, torch_default=True),
        "ff2": _ffn_init(ks[5], d, ffn_dim),
        "out_ln": nn.layernorm_init(d),
    }
    bn_p, bn_s = nn.batchnorm_init(d)
    params["conv_bn"] = bn_p
    return params, {"bn": bn_s}


def conformer_layer(p, s, ctx: nn.Ctx, x, pad_mask, bias, nhead: int,
                    dropout_p: float, kernel: int, impl: str = "xla",
                    kv_lens=None):
    """x: [B, T, D], pad_mask: bool [B, T] True=PAD. Returns (y, new_state)."""
    x = _half_ffn(p["ff1"], ctx, x, dropout_p)

    h = nn.layernorm(p["attn_ln"], x)
    a = T.mha(p["attn"], ctx, h, h, bias, nhead, dropout_p,
              impl=impl, kv_lens=kv_lens)
    x = x + nn.dropout(ctx, a, dropout_p)

    h = nn.layernorm(p["conv_ln"], x)
    h = h * (~pad_mask)[..., None].astype(h.dtype)  # no pad leak into conv
    h = jax.nn.glu(nn.linear(p["conv_pw1"], h), axis=-1)
    h = _depthwise_conv(p["conv_dw"], h, kernel)
    h, bn_s = nn.batchnorm(p["conv_bn"], s["bn"], h, ctx.train)
    h = nn.linear(p["conv_pw2"], jax.nn.silu(h))
    x = x + nn.dropout(ctx, h, dropout_p)

    x = _half_ffn(p["ff2"], ctx, x, dropout_p)
    return nn.layernorm(p["out_ln"], x), {"bn": bn_s}


def conformer_encoder_init(key, d: int, nhead: int, ffn_dim: int,
                           nlayers: int, kernel: int):
    ks = jax.random.split(key, nlayers)
    inits = [conformer_layer_init(k, d, nhead, ffn_dim, kernel) for k in ks]
    return ({"layers": [p for p, _ in inits]},
            {"layers": [s for _, s in inits]})


def conformer_encoder(p, s, ctx: nn.Ctx, x, pad_mask, nhead: int,
                      dropout_p: float, kernel: int, impl: str = "xla",
                      scan_layers: bool = False, remat: bool = False,
                      remat_policy: str = ""):
    """x: [B, T, D] -> ([B, T, D], new_state). Same stacking options as
    transformer.encoder: scan_layers runs ONE compiled layer body via
    lax.scan over stacked (params, state); remat wraps each layer in
    jax.checkpoint (BN state is a body OUTPUT, so it is not recomputed
    incorrectly — jax.checkpoint only recomputes for the backward)."""
    bias = T.padding_bias(pad_mask)
    kv_lens = jnp.sum(~pad_mask, axis=1) if impl == "flash" else None

    if not scan_layers:
        rng_base = (ctx.next_rng()
                    if (remat and ctx.rng is not None) else None)

        def one(lp, ls, key, x):
            inner = (nn.Ctx(rng=key, train=ctx.train)
                     if remat else ctx)
            return conformer_layer(lp, ls, inner, x, pad_mask, bias,
                                   nhead, dropout_p, kernel, impl=impl,
                                   kv_lens=kv_lens)

        if remat:
            one = T._ckpt(one, remat_policy)
        new_states = []
        for li, (lp, ls) in enumerate(zip(p["layers"], s["layers"])):
            key = (jax.random.fold_in(rng_base, li)
                   if rng_base is not None else None)
            x, ns = one(lp, ls, key, x)
            new_states.append(ns)
        return x, {"layers": new_states}

    stacked_p = T._stack_layers(p["layers"])
    stacked_s = T._stack_layers(s["layers"])
    n = len(p["layers"])
    rng_base = ctx.next_rng() if ctx.rng is not None else None

    def body(x, xs):
        lp, ls, li = xs
        inner = T._layer_ctx(rng_base, ctx.train, li)
        y, ns = conformer_layer(lp, ls, inner, x, pad_mask, bias, nhead,
                                dropout_p, kernel, impl=impl,
                                kv_lens=kv_lens)
        return y, ns

    if remat:
        body = T._ckpt(body, remat_policy)
    x, new_s = jax.lax.scan(body, x, (stacked_p, stacked_s, jnp.arange(n)))
    # unbind the stacked per-layer states back to a list
    new_states = [jax.tree_util.tree_map(lambda a, i=i: a[i], new_s)
                  for i in range(n)]
    return x, {"layers": new_states}
