"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unast_tpu.ops import flash_attention
from unast_tpu.models.transformer import attention_core, padding_bias, causal_bias
from unast_tpu import nn


def _ref(q, k, v, kv_lens=None, causal=False):
    bias = None
    if kv_lens is not None:
        pad = jnp.arange(k.shape[1])[None, :] >= kv_lens[:, None]
        bias = padding_bias(pad)
    if causal:
        cb = causal_bias(q.shape[1])
        bias = cb if bias is None else bias + cb
    return attention_core(q, k, v, bias, nn.Ctx.eval(), 0.0)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_reference(causal):
    key = jax.random.PRNGKey(0)
    b, tq, tk, h, d = 2, 40, 56, 2, 64
    if causal:
        tk = tq
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, tq, h, d))
    k = jax.random.normal(ks[1], (b, tk, h, d))
    v = jax.random.normal(ks[2], (b, tk, h, d))
    kv_lens = jnp.array([tk, tk - 9])
    out = flash_attention(q, k, v, kv_lens, causal=causal)
    ref = _ref(q, k, v, kv_lens, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_grads_match_reference():
    key = jax.random.PRNGKey(1)
    b, t, h, d = 1, 24, 2, 32
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (b, t, h, d))
    k = jax.random.normal(ks[1], (b, t, h, d))
    v = jax.random.normal(ks[2], (b, t, h, d))
    kv_lens = jnp.array([t - 5])

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_lens, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, kv_lens, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_flash_jits():
    b, t, h, d = 2, 32, 2, 64
    q = jnp.ones((b, t, h, d))
    out = jax.jit(lambda q: flash_attention(q, q, q, causal=True))(q)
    assert out.shape == q.shape
    assert np.isfinite(np.asarray(out)).all()


def test_attn_impl_flash_config_path():
    """Transformer encode/decode under attn_impl='flash' matches the XLA
    path in eval mode (no dropout)."""
    from unast_tpu.models import TINY, networks as N, unast as U

    cfg_x = TINY
    cfg_f = TINY.replace(attn_impl="flash")
    params, state = U.unast_init(jax.random.PRNGKey(0), cfg_x)
    ids = jnp.ones((2, cfg_x.max_text_len), jnp.int32)
    ids = ids.at[:, :6].set(jnp.array([[5, 6, 7, 8, 9, 2]] * 2))
    lens = jnp.array([6, 6])
    ectx = nn.Ctx.eval()
    (mx, _), _ = N.text_encode(params["text_m"], state["text_m"], ectx,
                               cfg_x, ids, lens)
    (mf, _), _ = N.text_encode(params["text_m"], state["text_m"], ectx,
                               cfg_f, ids, lens)
    valid = np.asarray(mx)[:, :6]
    np.testing.assert_allclose(np.asarray(mf)[:, :6], valid, atol=2e-4,
                               rtol=2e-4)


# ---------------------------------------------------------------------------
# Pipeline-parallel encoder (parallel/pipeline.py)
# ---------------------------------------------------------------------------


def test_pipeline_encoder_matches_sequential():
    """GPipe-staged encoder == sequential encoder (eval mode), and its
    gradient w.r.t. the input matches too (the ppermute schedule is
    differentiable)."""
    from unast_tpu.models import transformer as T
    from unast_tpu.parallel.pipeline import (make_pp_mesh, pipeline_encoder,
                                             stack_for_pipeline)

    d, nhead, ffn, L, pp, n_micro = 32, 2, 64, 4, 4, 4
    b, t = 8, 12
    key = jax.random.PRNGKey(0)
    p = T.encoder_init(key, d, nhead, ffn, L)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d), jnp.float32)
    pad = jnp.arange(t)[None, :] >= jnp.array([t, t, 9, 7, t, 5, t, 11])[:, None]

    ref = T.encoder(p, nn.Ctx.eval(), x, pad, nhead, 0.0)
    mesh = make_pp_mesh(pp)
    sp = stack_for_pipeline(p, pp)
    got = pipeline_encoder(sp, nn.Ctx.eval(), x, pad, nhead, 0.0,
                           mesh, n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # reverse-mode through the schedule: d(sum(out))/dx
    def loss_ref(x):
        return jnp.sum(T.encoder(p, nn.Ctx.eval(), x, pad, nhead, 0.0))

    def loss_pp(x):
        return jnp.sum(pipeline_encoder(sp, nn.Ctx.eval(), x, pad, nhead,
                                        0.0, mesh, n_micro))

    g_ref = jax.grad(loss_ref)(x)
    g_pp = jax.grad(loss_pp)(x)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)


def test_pipeline_encoder_uneven_microbatches():
    """pp=2 stages, more micro-batches than stages (the bubble-amortizing
    regime), non-divisible mask lengths."""
    from unast_tpu.models import transformer as T
    from unast_tpu.parallel.pipeline import (make_pp_mesh, pipeline_encoder,
                                             stack_for_pipeline)

    d, nhead, ffn, L, pp, n_micro = 16, 2, 32, 2, 2, 4
    b, t = 8, 7
    p = T.encoder_init(jax.random.PRNGKey(2), d, nhead, ffn, L)
    x = jax.random.normal(jax.random.PRNGKey(3), (b, t, d), jnp.float32)
    pad = jnp.arange(t)[None, :] >= jnp.full((b, 1), 5)
    ref = T.encoder(p, nn.Ctx.eval(), x, pad, nhead, 0.0)
    got = pipeline_encoder(stack_for_pipeline(p, pp), nn.Ctx.eval(), x, pad,
                           nhead, 0.0, make_pp_mesh(pp), n_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
