"""Recurrent backbone: masked-scan LSTM encoder, step decoder, and the two
attention mechanisms, all as pure functions with explicit state.

Parity targets: RNNEncoder (src/module.py:297-336, packed-sequence
semantics), RNNDecoder (:340-374), LocationSensitiveAttention (:377-463,
whose init_memory/clear_memory statefulness becomes an explicit LSAState
threaded through the scan carry), LuongGeneralAttention (:467-497 — despite
the name an additive/concat score).

TPU-native notes: time-major lax.scan over [T, B, C] slices keeps each step
a dense [B, C] x [C, 4H] MXU matmul; packed-sequence semantics are
reproduced with carry masking (the carry freezes once t >= length), which
both matches torch's pack_padded final-state behavior and compiles to static
shapes. The backward direction scans the padded sequence in reverse with the
same carry masking — the carry stays at h0 through trailing pads, so it
first updates at t = len-1, exactly like a packed reverse pass.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import nn
from .modules import lens_to_mask


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def rnn_encoder_init(key, d_in: int, hidden: int, num_layers: int,
                     bidirectional: bool):
    ks = jax.random.split(key, 2 * num_layers + 2)
    layers = []
    for li in range(num_layers):
        d = d_in if li == 0 else hidden * (2 if bidirectional else 1)
        layer = {"fwd": nn.lstm_cell_init(ks[2 * li], d, hidden)}
        if bidirectional:
            layer["bwd"] = nn.lstm_cell_init(ks[2 * li + 1], d, hidden)
        layers.append(layer)
    p = {"layers": layers}
    if bidirectional:
        p["reduce_h"] = nn.linear_init(ks[-2], hidden * 2, hidden,
                                       torch_default=True)
        p["reduce_c"] = nn.linear_init(ks[-1], hidden * 2, hidden,
                                       torch_default=True)
    return p


def _scan_dir(cell_p, x_tm, mask_tm, reverse: bool):
    """Masked LSTM scan. x_tm: [T, B, D], mask_tm: bool [T, B].
    Returns (outputs [T, B, H], (h_final, c_final))."""
    b = x_tm.shape[1]
    h0 = jnp.zeros((b, cell_p["wh"].shape[0]), x_tm.dtype)

    def step(carry, inp):
        h, c = carry
        x_t, m_t = inp
        h_new, c_new = nn.lstm_cell(cell_p, x_t, h, c)
        m = m_t[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), h

    (h, c), outs = jax.lax.scan(step, (h0, h0), (x_tm, mask_tm),
                                reverse=reverse)
    return outs, (h, c)


def rnn_encoder(p, ctx: nn.Ctx, x, lens, dropout_p: float):
    """x: [B, T, D], lens: [B]. Returns (outputs [B, T, H*dirs],
    (h [L, B, H*dirs_or_H_reduced...], c)) matching reference semantics:
    outputs zeroed at pads; bidirectional final states concat+linear-reduced
    to hidden (src/module.py:320-333)."""
    t = x.shape[1]
    mask = lens_to_mask(lens, t)                  # [B, T]
    mask_tm = jnp.swapaxes(mask, 0, 1)            # [T, B]
    h_list, c_list = [], []
    bidir = "bwd" in p["layers"][0]
    inp = jnp.swapaxes(x, 0, 1)                   # time-major
    for li, lp in enumerate(p["layers"]):
        fwd, (hf, cf) = _scan_dir(lp["fwd"], inp, mask_tm, reverse=False)
        if bidir:
            bwd, (hb, cb) = _scan_dir(lp["bwd"], inp, mask_tm, reverse=True)
            out = jnp.concatenate([fwd, bwd], axis=-1)
            h_list.append(jnp.concatenate([hf, hb], axis=-1))
            c_list.append(jnp.concatenate([cf, cb], axis=-1))
        else:
            out = fwd
            h_list.append(hf)
            c_list.append(cf)
        out = out * mask_tm[..., None].astype(out.dtype)
        inp = out
        if li + 1 < len(p["layers"]):
            inp = nn.dropout(ctx, inp, dropout_p)
    outputs = jnp.swapaxes(inp, 0, 1)             # [B, T, H*dirs]
    h = jnp.stack(h_list)                          # [L, B, H*dirs]
    c = jnp.stack(c_list)
    if bidir and "reduce_h" in p:
        h = nn.linear(p["reduce_h"], h)
        c = nn.linear(p["reduce_c"], c)
    return outputs, (h, c)


# ---------------------------------------------------------------------------
# Location-sensitive attention (Tacotron2-style)
# ---------------------------------------------------------------------------


class LSAState(NamedTuple):
    processed_memory: jnp.ndarray   # [B, S, A]
    attn_weights: jnp.ndarray       # [B, S]
    attn_cum: jnp.ndarray           # [B, S]


def lsa_init(key, hidden: int, enc_dim: int, attn_dim: int,
             n_filters: int = 32, kernel_size: int = 31):
    ks = jax.random.split(key, 5)
    return {
        "query": nn.linear_init(ks[0], hidden, attn_dim, bias=False, w_init="tanh"),
        "memory": nn.linear_init(ks[1], enc_dim, attn_dim, bias=False, w_init="tanh"),
        "v": nn.linear_init(ks[2], attn_dim, 1, bias=False),
        "loc_conv": nn.conv1d_init(ks[3], 2, n_filters, kernel_size, bias=False),
        "loc_dense": nn.linear_init(ks[4], n_filters, attn_dim, bias=False,
                                    w_init="tanh"),
    }


def lsa_init_state(p, memory) -> LSAState:
    """Per-sequence state (reference init_memory, src/module.py:409-415)."""
    b, s, _ = memory.shape
    return LSAState(
        processed_memory=nn.linear(p["memory"], memory),
        attn_weights=jnp.zeros((b, s), memory.dtype),
        attn_cum=jnp.zeros((b, s), memory.dtype),
    )


def lsa_attend(p, state: LSAState, query_h, memory, pad_mask):
    """query_h: [B, H] (top-layer decoder hidden), memory: [B, S, E],
    pad_mask: bool [B, S] True=PAD. Returns (ctxt [B, E], new_state)."""
    cat = jnp.stack([state.attn_weights, state.attn_cum], axis=-1)  # [B, S, 2]
    ks = p["loc_conv"]["w"].shape[0]
    loc = nn.conv1d(p["loc_conv"], cat, padding=((ks - 1) // 2, (ks - 1) // 2))
    loc = nn.linear(p["loc_dense"], loc)                             # [B, S, A]
    q = nn.linear(p["query"], query_h)[:, None, :]                   # [B, 1, A]
    energies = nn.linear(p["v"], jnp.tanh(q + loc + state.processed_memory))
    energies = jnp.squeeze(energies, -1)                             # [B, S]
    energies = jnp.where(pad_mask, -jnp.inf, energies)
    w = jax.nn.softmax(energies.astype(jnp.float32), axis=-1).astype(memory.dtype)
    ctxt = jnp.einsum("bs,bse->be", w, memory,
                      preferred_element_type=jnp.float32).astype(memory.dtype)
    return ctxt, LSAState(state.processed_memory, w, state.attn_cum + w)


# ---------------------------------------------------------------------------
# Additive ("Luong"-named in the reference) attention
# ---------------------------------------------------------------------------


def additive_attn_init(key, hidden: int, enc_dim: int, attn_dim: int):
    ks = jax.random.split(key, 3)
    return {
        "proj_hid": nn.linear_init(ks[0], hidden, attn_dim, bias=False,
                                   torch_default=True),
        "proj_eo": nn.linear_init(ks[1], enc_dim, attn_dim, bias=False,
                                  torch_default=True),
        "fc2": nn.linear_init(ks[2], attn_dim, 1, bias=False,
                              torch_default=True),
    }


def additive_attend(p, query_h, memory, pad_mask):
    """score = v . tanh(W_h h + W_e e) (src/module.py:467-497).
    query_h: [B, H] -> ctxt [B, E]."""
    q = nn.linear(p["proj_hid"], query_h)[:, None, :]
    e = nn.linear(p["proj_eo"], memory)
    scores = jnp.squeeze(nn.linear(p["fc2"], jnp.tanh(q + e)), -1)
    scores = jnp.where(pad_mask, -jnp.inf, scores)
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(memory.dtype)
    return jnp.einsum("bs,bse->be", w, memory,
                      preferred_element_type=jnp.float32).astype(memory.dtype)


# ---------------------------------------------------------------------------
# Decoder (single step; sequence loops live in networks.py as lax.scan)
# ---------------------------------------------------------------------------


def rnn_decoder_init(key, d_in: int, enc_out_size: int, hidden: int,
                     num_layers: int, attention: Optional[str], attn_dim: int):
    ks = jax.random.split(key, num_layers + 3)
    input_size = d_in + (enc_out_size if attention else 0)
    cells = []
    for li in range(num_layers):
        d = input_size if li == 0 else hidden
        cells.append(nn.lstm_cell_init(ks[li], d, hidden))
    p = {"cells": cells}
    if attention == "lsa":
        p["attn"] = lsa_init(ks[-3], hidden, enc_out_size, attn_dim)
    elif attention == "luong":
        p["attn"] = additive_attn_init(ks[-3], hidden, enc_out_size, attn_dim)
    if attention:
        p["proj"] = nn.linear_init(ks[-2], enc_out_size + hidden, hidden,
                                   w_init="tanh")
    return p


def rnn_decoder_step(p, ctx: nn.Ctx, x, hidden_state, memory, pad_mask,
                     attn_state: Optional[LSAState], dropout_p: float,
                     attention: Optional[str]):
    """One decode step. x: [B, D_in]; hidden_state: (h [L,B,H], c [L,B,H]).
    `attention` is the static mechanism name ('lsa'|'luong'|None) from config.
    Attention is computed from the PREVIOUS top-layer hidden (reference
    src/module.py:362-365). Returns (out [B, H], (h,c), new_attn_state)."""
    h, c = hidden_state
    new_attn_state = attn_state
    if attention == "lsa":
        ctxt, new_attn_state = lsa_attend(p["attn"], attn_state, h[-1],
                                          memory, pad_mask)
        x = jnp.concatenate([x, ctxt], axis=-1)
    elif attention == "luong":
        ctxt = additive_attend(p["attn"], h[-1], memory, pad_mask)
        x = jnp.concatenate([x, ctxt], axis=-1)
    new_h, new_c = [], []
    inp = x
    for li, cell in enumerate(p["cells"]):
        hi, ci = nn.lstm_cell(cell, inp, h[li], c[li])
        new_h.append(hi)
        new_c.append(ci)
        inp = hi
        if li + 1 < len(p["cells"]):
            inp = nn.dropout(ctx, inp, dropout_p)
    out = inp
    if attention:
        out = nn.dropout(
            ctx, jnp.tanh(nn.linear(p["proj"],
                                    jnp.concatenate([out, ctxt], axis=-1))),
            dropout_p)
    return out, (jnp.stack(new_h), jnp.stack(new_c)), new_attn_state
