"""Flash attention for TPU in Pallas: blocked online-softmax attention that
never materializes the [Tq, Tk] score matrix in HBM.

Used by the transformer encoder/decoder when ModelConfig.attn_impl='flash'
(attention-weight dropout is not applied on this path — a documented
deviation; residual/FFN dropout is unaffected). The jnp reference path
(models/transformer.py attention_core) remains the parity default.

Kernel design:
  - layout [B*H, T, D]: grid (BH, Tq_blocks); each program streams Tk in
    VMEM blocks, maintaining the (m, l, acc) online-softmax state in f32.
  - head_dim is zero-padded to a multiple of 128 so every matmul hits MXU
    tiles; the pad contributes nothing to scores or outputs.
  - masks: optional causal, plus per-key padding lengths (kv_lens). Both
    are applied as -1e9 additive biases inside the kernel.
  - backward: standard recompute-based flash VJP expressed in jnp (score
    matrices at these sizes, <=1k x 1k per head, fit comfortably; XLA fuses
    it well) wired through jax.custom_vjp; logsumexp is recomputed in the
    backward so the kernel emits only the attention output.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _attn_kernel(kv_len, q_ref, k_ref, v_ref, o_ref, *,
                 causal: bool, sm_scale: float, block_k: int, tk: int):
    """One (bh, q_block) program. q_ref: [1, Bq, D], k/v_ref: [1, Tk, D],
    o_ref: [1, Bq, D]. kv_len: scalar valid-key count."""
    q = q_ref[0].astype(jnp.float32) * sm_scale            # [Bq, D]
    bq = q.shape[0]
    q_start = pl.program_id(1) * bq

    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q_ref.shape[2]), jnp.float32)

    num_kb = tk // block_k

    def body(kb, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # [Bq, Bk]
        kpos = kb * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 1)
        mask = kpos < kv_len
        if causal:
            qpos = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 0)
            mask = jnp.logical_and(mask, kpos <= qpos)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk,
                                    preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_fwd(q, k, v, kv_lens, causal: bool, sm_scale: float,
               block_q: int, block_k: int, interpret: bool):
    """q: [BH, Tq, D], k/v: [BH, Tk, D], kv_lens: [BH] int32.
    Returns (o [BH, Tq, D], lse [BH, Tq])."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    dp = -(-d // 128) * 128
    q = _pad_to(q, 128, 2)
    k = _pad_to(k, 128, 2)
    v = _pad_to(v, 128, 2)
    tq_p = -(-tq // block_q) * block_q
    tk_p = -(-tk // block_k) * block_k
    q = _pad_to(q, block_q, 1)
    k = _pad_to(k, block_k, 1)
    v = _pad_to(v, block_k, 1)

    grid = (bh, tq_p // block_q)
    kernel = functools.partial(_attn_kernel, causal=causal,
                               sm_scale=sm_scale, block_k=block_k, tk=tk_p)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda b, i, kl: (b, i, 0)),
            pl.BlockSpec((1, tk_p, dp), lambda b, i, kl: (b, 0, 0)),
            pl.BlockSpec((1, tk_p, dp), lambda b, i, kl: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda b, i, kl: (b, i, 0)),
    )
    kernel2 = functools.partial(
        _kernel_with_prefetch, kernel=kernel)
    o = pl.pallas_call(
        kernel2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, tq_p, dp), q.dtype),
        interpret=interpret,
    )(kv_lens, q, k, v)
    return o[:, :tq, :d]


def _kernel_with_prefetch(kv_lens_ref, q_ref, k_ref, v_ref, o_ref, *, kernel):
    b = pl.program_id(0)
    kernel(kv_lens_ref[b], q_ref, k_ref, v_ref, o_ref)


# ---------------------------------------------------------------------------
# custom_vjp wrapper (public API works on [B, T, H, D] like attention_core)
# ---------------------------------------------------------------------------


def _ref_scores(q, k, kv_lens, causal, sm_scale):
    """[BH, Tq, Tk] masked scores in f32 (for the recompute backward)."""
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    tq, tk = s.shape[1], s.shape[2]
    mask = jnp.arange(tk)[None, None, :] < kv_lens[:, None, None]
    if causal:
        mask = jnp.logical_and(
            mask, jnp.arange(tk)[None, None, :] <=
            jnp.arange(tq)[None, :, None])
    return jnp.where(mask, s, NEG_INF)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash(q, k, v, kv_lens, causal, sm_scale, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, kv_lens, causal, sm_scale, block_q, block_k,
                      interpret)


def _flash_vjp_fwd(q, k, v, kv_lens, causal, sm_scale, block_q, block_k,
                   interpret):
    o = _flash_fwd(q, k, v, kv_lens, causal, sm_scale, block_q, block_k,
                   interpret)
    return o, (q, k, v, kv_lens, o)


def _flash_vjp_bwd(causal, sm_scale, block_q, block_k, interpret,
                   res, do):
    q, k, v, kv_lens, o = res
    s = _ref_scores(q, k, kv_lens, causal, sm_scale)
    lse = jax.scipy.special.logsumexp(s, axis=-1, keepdims=True)
    p = jnp.exp(s - lse)                                  # [BH, Tq, Tk]
    do_f = do.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqd->bkd", p, do_f)
    dp = jnp.einsum("bqd,bkd->bqk", do_f, v.astype(jnp.float32))
    delta = jnp.sum(do_f * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta) * sm_scale
    dq = jnp.einsum("bqk,bkd->bqd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bqk,bqd->bkd", ds, q.astype(jnp.float32))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q, k, v, kv_lens=None, causal: bool = False,
                    block_q: int = None, block_k: int = None,
                    interpret: bool = None):
    """Drop-in for attention_core's math (minus attention dropout).

    q: [B, Tq, H, D]; k, v: [B, Tk, H, D]; kv_lens: [B] valid key lengths
    (None = all valid). Returns [B, Tq, H, D].

    Default block sizes adapt to sequence length (measured on v5e: 512
    blocks halve long-context time vs 128 — fewer grid programs and
    k-loop iterations; at short T the difference is small)."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if block_k is None:
        block_k = 512 if tk >= 1024 else 256
    if block_q is None:
        block_q = 512 if tq >= 2048 else 256
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sm_scale = 1.0 / math.sqrt(d)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, tk, d)
    if kv_lens is None:
        lens = jnp.full((b,), tk, jnp.int32)
    else:
        lens = kv_lens.astype(jnp.int32)
    lens_bh = jnp.repeat(lens, h)
    block_q = min(block_q, -(-tq // 8) * 8)
    of = _flash(qf, kf, vf, lens_bh, causal, sm_scale, block_q, block_k,
                interpret)
    return of.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
