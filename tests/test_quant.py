"""Int8 weight-only quantization tests (nn/quant.py): rounding bounds,
transparent dequant through every apply fn, end-to-end forward fidelity,
and the Synthesizer serving integration."""

import numpy as np
import jax
import jax.numpy as jnp

from unast_tpu import nn
from unast_tpu.nn import quant
from unast_tpu.models import unast as U
from unast_tpu.models.config import TINY


def test_quantize_leaf_bounds_and_roundtrip():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 16)) * 3.0
    q, scale = quant.quantize_leaf(w)
    assert q.dtype == jnp.int8 and scale.shape == (16,)
    deq = q.astype(jnp.float32) * scale
    # symmetric round-to-nearest: |err| <= scale/2 per channel
    err = np.abs(np.asarray(w - deq))
    assert (err <= np.asarray(scale)[None, :] / 2 + 1e-7).all()
    # column-wise max maps to +-127 exactly
    assert np.abs(np.asarray(q)).max() == 127


def test_quantize_params_structure_and_dequant_inverse():
    p = {
        "lin": nn.linear_init(jax.random.PRNGKey(0), 8, 4),
        "emb": nn.embedding_init(jax.random.PRNGKey(1), 10, 8,
                                 padding_idx=0),
        "ln": nn.layernorm_init(8),
        "cell": nn.gru_cell_init(jax.random.PRNGKey(2), 8, 8),
        "layers": [nn.linear_init(jax.random.PRNGKey(3), 4, 4)],
    }
    qp = quant.quantize_params(p)
    assert "w_q" in qp["lin"] and "w" not in qp["lin"]
    assert qp["lin"]["b"].dtype == jnp.float32       # bias untouched
    assert "w_q" in qp["emb"]
    assert qp["ln"]["scale"].dtype == jnp.float32    # 1-D leaves untouched
    assert "wi_q" in qp["cell"] and "wh_q" in qp["cell"]
    assert "w_q" in qp["layers"][0]
    # dequant restores structure; values within rounding error
    dp = quant.dequantize_params(qp)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(dp),
                   key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.05, rtol=0.02)
    # parameter bytes: int8 weights cut the tree well below half
    assert quant.quantized_bytes(qp) < 0.6 * quant.quantized_bytes(p)


def test_quantized_apply_fns_close_to_dense():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 12, 16))
    lin = nn.linear_init(key, 16, 32)
    qlin = quant.quantize_params(lin)
    got, want = nn.linear(qlin, x), nn.linear(lin, x)
    assert np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1] > 0.999
    conv = nn.conv1d_init(key, 16, 32, 5)
    qconv = quant.quantize_params(conv)
    got, want = nn.conv1d(qconv, x, 2), nn.conv1d(conv, x, 2)
    assert np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(want).ravel())[0, 1] > 0.999


def test_quantized_embedding_pad_row_stays_zero():
    emb = nn.embedding_init(jax.random.PRNGKey(0), 12, 8, padding_idx=0)
    qemb = quant.quantize_params(emb)
    out = nn.embedding(qemb, jnp.array([0, 3]))
    assert np.abs(np.asarray(out[0])).max() == 0.0
    assert np.abs(np.asarray(out[1])).max() > 0.0


def test_quantized_tts_forward_close():
    """Teacher-forced TTS through the full quantized UNAST stack tracks the
    f32 forward closely (both eval mode)."""
    cfg = TINY
    params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params)
    text = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 3, 40)
    tl = jnp.full((2,), 8)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 12, cfg.num_mels))
    ml = jnp.full((2,), 12)
    (_, post, _, _), _ = U.tts(params, state, nn.Ctx.eval(), cfg,
                               text, tl, mel, ml)
    (_, qpost, _, _), _ = U.tts(qparams, state, nn.Ctx.eval(), cfg,
                                text, tl, mel, ml)
    ref = np.asarray(post, np.float32)
    got = np.asarray(qpost, np.float32)
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 0.05
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.99


def test_synthesizer_quantized_serving_runs():
    from unast_tpu.infer.serve import Synthesizer
    cfg = TINY.replace(max_mel_len=24, max_text_len=16)
    params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
    syn = Synthesizer(params, state, cfg, text_buckets=(16,),
                      mel_buckets=(24,), max_batch=2, quantize="int8")
    # quantized tree actually mounted
    assert "w_q" in syn.params["text_m"]["prenet"]["embed"]
    wavs = syn.tts(["hi there"])
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all()
    ids = syn.asr([np.random.randn(4096).astype(np.float32)])
    assert len(ids) == 1
