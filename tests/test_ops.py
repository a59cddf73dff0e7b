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
