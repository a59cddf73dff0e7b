"""Shared NN modules: prenets, postnets, positional encoding, highway, CBHG.

Parity targets in the reference: SpeechPrenet (src/module.py:76-110),
SpeechPostnet (:113-171), TextPrenet (:174-230), TextPostnet (:233-246),
PositionalEncoding (:249-267), Highwaynet (:500-530), CBHG (:533-626).

Everything is [B, T, C] channels-last; causal convs use left padding instead
of the reference's pad-both-then-trim, which is numerically identical and
keeps shapes static for XLA.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from .config import ModelConfig, VOCAB_SIZE, PAD_IDX


# ---------------------------------------------------------------------------
# Masks
# ---------------------------------------------------------------------------


def lens_to_mask(lens, max_len: int):
    """[B] -> bool [B, max_len], True where t < len. TPU-native replacement
    for the reference's O(B*T) python loop (src/utils.py:77-83)."""
    pos = jnp.arange(max_len)[None, :]
    return pos < lens[:, None]


def noise_fn(ctx: nn.Ctx, x, mask_p: float = 0.3):
    """DAE input noising: Bernoulli time-step zero-masking
    (reference noise_fn, src/utils.py:40-49). x: [B, T, D] of any dtype."""
    if not ctx.train or mask_p == 0.0:
        return x
    keep = jax.random.bernoulli(ctx.next_rng(), 1.0 - mask_p, x.shape[:2])
    return x * keep[..., None].astype(x.dtype)


# ---------------------------------------------------------------------------
# Positional encoding (src/module.py:249-267): x*sqrt(d) + PE, dropout .1
# ---------------------------------------------------------------------------


def sinusoid_table(max_len: int, d_model: int) -> np.ndarray:
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def positional_encoding(ctx: nn.Ctx, x, dropout_p: float = 0.1, offset=0,
                        scale: bool = True):
    """x: [B, T, D]. `offset` supports incremental decode (position of x[0]).

    scale=True multiplies x by sqrt(D) before adding the table (reference
    parity, src/module.py:249-267) — correct when x is a LEARNABLE-scale
    embedding/prenet output that can shrink itself. scale=False adds the
    table to x unchanged — required when x is the output of a post-LN
    stack (per-dim RMS pinned ~1 by the final LayerNorm): scaling such an
    input by sqrt(D) saturates the next stack's attention logits and
    freezes learning (measured round 4: the NAR frame decoder attenuated
    input differences 25x and trained to the global-mean mel)."""
    d = x.shape[-1]
    pe = jnp.asarray(sinusoid_table(5000, d))
    t = x.shape[1]
    if isinstance(offset, int) and offset == 0:
        pos = pe[:t]
    else:
        pos = jax.lax.dynamic_slice_in_dim(pe, offset, t, axis=0)
    if scale:
        x = x * math.sqrt(d)
    x = x + pos[None, :, :].astype(x.dtype)
    return nn.dropout(ctx, x, dropout_p)


# ---------------------------------------------------------------------------
# SpeechPrenet: 2-layer MLP 80 -> 256 -> 256, ReLU + dropout(.5) each
# ---------------------------------------------------------------------------


def speech_prenet_init(key, cfg: ModelConfig):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": nn.linear_init(k1, cfg.num_mels, cfg.s_pre_hid),
        "fc2": nn.linear_init(k2, cfg.s_pre_hid, cfg.e_in),
    }


def speech_prenet(p, ctx: nn.Ctx, x, cfg: ModelConfig):
    """Reference quirk reproduced: SpeechPrenet's Sequential is built from an
    OrderedDict with a DUPLICATE 'dropout2' key (src/module.py:95-102), so the
    second Dropout replaces the first entry's value in place — the effective
    stack is fc1 -> relu -> dropout -> fc2 -> relu with NO trailing dropout."""
    x = x.astype(cfg.dtype)  # bf16 activation entry point for speech paths
    x = nn.dropout(ctx, jax.nn.relu(nn.linear(p["fc1"], x)), cfg.s_pre_drop)
    return jax.nn.relu(nn.linear(p["fc2"], x))


# ---------------------------------------------------------------------------
# SpeechPostnet: 5 causal convs k=5 (pad-left 4) with BN+tanh+dropout on the
# first four; plus the mel/stop projection heads (src/module.py:113-171)
# ---------------------------------------------------------------------------


def speech_postnet_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, 8)
    params = {
        "conv1": nn.conv1d_init(ks[0], cfg.num_mels, cfg.hidden, 5, w_init="tanh"),
        "convs": [nn.conv1d_init(ks[1 + i], cfg.hidden, cfg.hidden, 5, w_init="tanh")
                  for i in range(3)],
        "conv2": nn.conv1d_init(ks[4], cfg.hidden, cfg.num_mels, 5),
        # reduction_factor r (transformer decoder): the heads emit r
        # frames / r stop logits per decoder step; r=1 == reference shapes.
        "mel_proj": nn.linear_init(
            ks[5], cfg.hidden, cfg.reduction_factor * cfg.num_mels,
            torch_default=True),
        "stop_proj": nn.linear_init(ks[6], cfg.hidden, cfg.reduction_factor,
                                    torch_default=True),
    }
    bn_p, bn_s = {}, {}
    for i in range(4):
        bp, bs = nn.batchnorm_init(cfg.hidden)
        bn_p[f"bn{i}"], bn_s[f"bn{i}"] = bp, bs
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def speech_postnet(p, s, ctx: nn.Ctx, x, cfg: ModelConfig):
    """Residual mel refinement over the full sequence. Returns (y, new_state)."""
    new_bn = {}
    h = nn.conv1d(p["conv1"], x, padding=(4, 0))
    h, new_bn["bn0"] = nn.batchnorm(p["bn"]["bn0"], s["bn"]["bn0"], h, ctx.train)
    h = nn.dropout(ctx, jnp.tanh(h), cfg.s_post_drop)
    for i, cp in enumerate(p["convs"]):
        h2 = nn.conv1d(cp, h, padding=(4, 0))
        h2, new_bn[f"bn{i+1}"] = nn.batchnorm(
            p["bn"][f"bn{i+1}"], s["bn"][f"bn{i+1}"], h2, ctx.train)
        h = nn.dropout(ctx, jnp.tanh(h2), cfg.s_post_drop)
    h = nn.conv1d(p["conv2"], h, padding=(4, 0))
    return h, {"bn": new_bn}


def speech_mel_and_stop(p, dec_out):
    """Decoder hidden [B, Tg, H] -> (mel [B, Tg, r*num_mels], stop logits
    [B, Tg, r]); r = ModelConfig.reduction_factor (1 in the reference).
    Callers ungroup to per-frame shapes with reshape."""
    return nn.linear(p["mel_proj"], dec_out), nn.linear(p["stop_proj"], dec_out)


# ---------------------------------------------------------------------------
# TextPrenet: Embedding(46, emb, pad 0) + 3x conv k=5 same-pad BN+ReLU+drop
# (src/module.py:174-230). Split into embed / conv-stack halves so the DAE can
# noise embeddings before the convs (src/network.py:429-432).
# ---------------------------------------------------------------------------


def text_prenet_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, 4)
    params = {
        "embed": nn.embedding_init(ks[0], VOCAB_SIZE, cfg.t_emb_dim,
                                   padding_idx=PAD_IDX),
        "conv1": nn.conv1d_init(ks[1], cfg.t_emb_dim, cfg.e_in, 5, w_init="relu"),
        "conv2": nn.conv1d_init(ks[2], cfg.e_in, cfg.e_in, 5, w_init="relu"),
        "conv3": nn.conv1d_init(ks[3], cfg.e_in, cfg.e_in, 5, w_init="relu"),
    }
    bn_p, bn_s = {}, {}
    for i in (1, 2, 3):
        bp, bs = nn.batchnorm_init(cfg.e_in)
        bn_p[f"bn{i}"], bn_s[f"bn{i}"] = bp, bs
    params["bn"] = bn_p
    return params, {"bn": bn_s}


def text_embed(p, ctx: nn.Ctx, ids, cfg: ModelConfig):
    """ids -> dropped-out embeddings (the reference's emb_dropout half).
    Casts to cfg.dtype — the bf16 activation entry point for text paths.
    PAD positions are masked to zero, which both matches torch's
    padding_idx semantics (output zero) and keeps the PAD row's gradient
    zero so it never drifts from its zero init."""
    emb = nn.embedding(p["embed"], ids).astype(cfg.dtype)
    emb = emb * (ids != PAD_IDX)[..., None].astype(emb.dtype)
    return nn.dropout(ctx, emb, cfg.t_pre_drop)


def text_prenet_step_init(p, batch: int, cfg: ModelConfig, dtype):
    """Rolling per-layer activation buffers (last 5 positions each, zeros =
    the causal conv's left padding) for EXACT incremental evaluation of the
    causal conv stack."""
    return (jnp.zeros((batch, 5, cfg.t_emb_dim), dtype),
            jnp.zeros((batch, 5, cfg.e_in), dtype),
            jnp.zeros((batch, 5, cfg.e_in), dtype))


def text_prenet_step(p, s, ctx: nn.Ctx, emb_t, bufs, cfg: ModelConfig):
    """One position of the causal conv stack. emb_t: [B, emb]. Returns
    (y [B, e_in], new_bufs). Matches text_prenet_convs(causal=True) at every
    position exactly (BN uses running stats). Each conv is a single
    window-dot: y_i = sum_k w[k] . x[i-4+k]."""
    def push(buf, v):
        return jnp.concatenate([buf[:, 1:], v[:, None]], axis=1)

    def conv_pos(cp, buf):
        y = jnp.einsum("bkc,kcd->bd", buf, nn.weight(cp, buf.dtype))
        if "b" in cp:
            y = y + cp["b"].astype(buf.dtype)
        return y

    e_buf, c1_buf, c2_buf = bufs
    e_buf = push(e_buf, emb_t)
    h = conv_pos(p["conv1"], e_buf)
    h, _ = nn.batchnorm(p["bn"]["bn1"], s["bn"]["bn1"], h, train=False)
    h = nn.dropout(ctx, jax.nn.relu(h), cfg.t_pre_drop)
    c1_buf = push(c1_buf, h)
    h = conv_pos(p["conv2"], c1_buf)
    h, _ = nn.batchnorm(p["bn"]["bn2"], s["bn"]["bn2"], h, train=False)
    h = nn.dropout(ctx, jax.nn.relu(h), cfg.t_pre_drop)
    c2_buf = push(c2_buf, h)
    h = conv_pos(p["conv3"], c2_buf)
    h, _ = nn.batchnorm(p["bn"]["bn3"], s["bn"]["bn3"], h, train=False)
    h = nn.dropout(ctx, jax.nn.relu(h), cfg.t_pre_drop)
    return h, (e_buf, c1_buf, c2_buf)


def text_prenet_convs(p, s, ctx: nn.Ctx, x, cfg: ModelConfig, causal=False):
    """The conv half (forward_fcn). `causal=True` pads left-only — used on the
    RNN decoder input path instead of the reference's O(T^2) prefix re-run,
    which leaks up to 2 future tokens through same-padding
    (src/network.py:573-576); strictly-causal convs are the TPU-native fix."""
    pad = (4, 0) if causal else (2, 2)
    new_bn = {}
    for i in (1, 2, 3):
        x = nn.conv1d(p[f"conv{i}"], x, padding=pad)
        x, new_bn[f"bn{i}"] = nn.batchnorm(
            p["bn"][f"bn{i}"], s["bn"][f"bn{i}"], x, ctx.train)
        x = nn.dropout(ctx, jax.nn.relu(x), cfg.t_pre_drop)
    return x, {"bn": new_bn}


# ---------------------------------------------------------------------------
# TextPostnet: dropout + Linear hidden -> 46 (src/module.py:233-246)
# ---------------------------------------------------------------------------


def text_postnet_init(key, cfg: ModelConfig):
    return {"fc": nn.linear_init(key, cfg.hidden, VOCAB_SIZE, torch_default=True)}


def text_postnet(p, ctx: nn.Ctx, x, cfg: ModelConfig):
    return nn.linear(p["fc"], nn.dropout(ctx, x, cfg.t_post_drop))


# ---------------------------------------------------------------------------
# Highway network (src/module.py:500-530)
# ---------------------------------------------------------------------------


def highway_init(key, units: int, num_layers: int = 4):
    ks = jax.random.split(key, 2 * num_layers)
    return {
        "linears": [nn.linear_init(ks[2 * i], units, units) for i in range(num_layers)],
        "gates": [nn.linear_init(ks[2 * i + 1], units, units) for i in range(num_layers)],
    }


def highway(p, x):
    for fc, gate in zip(p["linears"], p["gates"]):
        h = jax.nn.relu(nn.linear(fc, x))
        t = jax.nn.sigmoid(nn.linear(gate, x))
        x = h * t + x * (1.0 - t)
    return x


# ---------------------------------------------------------------------------
# CBHG (src/module.py:533-626). Faithfully reproduces the reference's quirk
# of CHAINING the conv bank (conv_k consumes conv_{k-1}'s output, not the
# input — src/module.py:599-601).
# ---------------------------------------------------------------------------


def cbhg_init(key, hidden: int, K: int = 16, projection_size: int = 256,
              num_gru_layers: int = 2):
    ks = jax.random.split(key, K + 4 + 2 * num_gru_layers)
    params = {"bank": [], "bn_bank": []}
    state = {"bn_bank": []}
    c_in = projection_size
    for k in range(1, K + 1):
        params["bank"].append(
            nn.conv1d_init(ks[k - 1], c_in, hidden, k, torch_default=True))
        bp, bs = nn.batchnorm_init(hidden)
        params["bn_bank"].append(bp)
        state["bn_bank"].append(bs)
        c_in = hidden
    params["proj1"] = nn.conv1d_init(ks[K], hidden * K, hidden, 3,
                                     torch_default=True)
    params["proj2"] = nn.conv1d_init(ks[K + 1], hidden, projection_size, 3,
                                     torch_default=True)
    bp, bs = nn.batchnorm_init(hidden)
    params["bn_proj1"], state["bn_proj1"] = bp, bs
    bp, bs = nn.batchnorm_init(projection_size)
    params["bn_proj2"], state["bn_proj2"] = bp, bs
    params["highway"] = highway_init(ks[K + 2], projection_size)
    # Bidirectional GRU, hidden//2 per direction, num_gru_layers layers.
    gru = []
    d_in = projection_size
    for layer in range(num_gru_layers):
        kf, kb = ks[K + 3 + 2 * layer], ks[K + 4 + 2 * layer]
        gru.append({
            "fwd": nn.gru_cell_init(kf, d_in, hidden // 2),
            "bwd": nn.gru_cell_init(kb, d_in, hidden // 2),
        })
        d_in = hidden
    params["gru"] = gru
    return params, state


def _maxpool2_same(x):
    """torch MaxPool1d(k=2, stride=1, pad=1) then trim-last, on [B, T, C]:
    out[t] = max(x[t-1], x[t]) with -inf left pad."""
    shifted = jnp.pad(x, ((0, 0), (1, 0), (0, 0)),
                      constant_values=-jnp.inf)[:, :-1]
    return jnp.maximum(x, shifted)


def _gru_bidir(gru_params, x):
    """Stacked bidirectional GRU over [B, T, C] via lax.scan (time-major
    scan keeps the MXU busy with [B, C] matmuls per step)."""
    for layer_p in gru_params:
        xt = jnp.swapaxes(x, 0, 1)  # [T, B, C]
        B = x.shape[0]
        hdim = layer_p["fwd"]["wh"].shape[0]
        h0 = jnp.zeros((B, hdim), x.dtype)

        def step_f(h, xt_t):
            h = nn.gru_cell(layer_p["fwd"], xt_t, h)
            return h, h

        def step_b(h, xt_t):
            h = nn.gru_cell(layer_p["bwd"], xt_t, h)
            return h, h

        _, fwd = jax.lax.scan(step_f, h0, xt)
        _, bwd = jax.lax.scan(step_b, h0, xt, reverse=True)
        x = jnp.swapaxes(jnp.concatenate([fwd, bwd], axis=-1), 0, 1)
    return x


def cbhg(p, s, ctx: nn.Ctx, x, K: int = 16):
    """x: [B, T, projection_size] -> [B, T, hidden]. Returns (y, new_state)."""
    new_state = {"bn_bank": []}
    outs = []
    h = x
    for k in range(1, K + 1):
        pad = k // 2
        y = nn.conv1d(p["bank"][k - 1], h, padding=(pad, pad))
        if k % 2 == 0:
            y = y[:, :-1]  # even kernels over-produce one frame
        y, bs = nn.batchnorm(p["bn_bank"][k - 1], s["bn_bank"][k - 1], y, ctx.train)
        y = jax.nn.relu(y)
        new_state["bn_bank"].append(bs)
        outs.append(y)
        h = y
    cat = jnp.concatenate(outs, axis=-1)          # [B, T, hidden*K]
    cat = _maxpool2_same(cat)
    y = nn.conv1d(p["proj1"], cat, padding=(1, 1))
    y, new_state["bn_proj1"] = nn.batchnorm(p["bn_proj1"], s["bn_proj1"], y, ctx.train)
    y = jax.nn.relu(y)
    y = nn.conv1d(p["proj2"], y, padding=(1, 1))
    y, new_state["bn_proj2"] = nn.batchnorm(p["bn_proj2"], s["bn_proj2"], y, ctx.train)
    y = y + x
    y = highway(p["highway"], y)
    return _gru_bidir(p["gru"], y), new_state
