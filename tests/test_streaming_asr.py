"""Streaming CTC ASR (models/ctc.py chunk mask + stream step,
infer/streaming.py::StreamingCtcAsr) — serving addition over the
reference, whose only ASR decode consumes the complete utterance
(src/network.py:440-458). The load-bearing contract: per-chunk streaming
with cached K/V EXACTLY reproduces the one-shot chunk-masked forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unast_tpu import nn
from unast_tpu.models import ctc as C
from unast_tpu.models import transformer as T
from unast_tpu.models.config import TINY


def _chunked_cfg(chunk=4, left=2, **kw):
    return TINY.replace(ctc_chunk=chunk, ctc_left=left,
                        compute_dtype="float32", **kw)


def test_chunk_bias_matches_naive():
    t, c, left = 11, 4, 1
    bias = np.asarray(T.chunk_bias(t, c, left))[0, 0]
    for q in range(t):
        for k in range(t):
            ok = (k // c <= q // c) and (k // c >= q // c - left)
            assert (bias[q, k] == 0.0) == ok, (q, k)
    # left < 0: unlimited left context (pure chunk-causal)
    bias = np.asarray(T.chunk_bias(t, c, -1))[0, 0]
    for q in range(t):
        for k in range(t):
            assert (bias[q, k] == 0.0) == (k // c <= q // c), (q, k)


def test_chunk_mask_restricts_receptive_field():
    """A perturbation >= left+1 chunks in the past must not change the
    chunk-masked logits; one inside the window must."""
    cfg = _chunked_cfg(chunk=4, left=1)
    p, s = C.ctc_asr_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    mel = rng.randn(1, 16, cfg.num_mels).astype(np.float32)
    lens = jnp.array([16])
    base, _, _ = C.ctc_logits(p, s, nn.Ctx.eval(), cfg, jnp.asarray(mel),
                              lens)
    far = mel.copy()
    far[0, 0:4] += 1.0  # chunk 0: outside chunk 3's [2, 3] window
    far_l, _, _ = C.ctc_logits(p, s, nn.Ctx.eval(), cfg, jnp.asarray(far),
                               lens)
    np.testing.assert_allclose(np.asarray(far_l[0, 12:16]),
                               np.asarray(base[0, 12:16]), atol=1e-5)
    near = mel.copy()
    near[0, 8:12] += 1.0  # chunk 2: inside chunk 3's window
    near_l, _, _ = C.ctc_logits(p, s, nn.Ctx.eval(), cfg, jnp.asarray(near),
                                lens)
    assert np.abs(np.asarray(near_l[0, 12:16])
                  - np.asarray(base[0, 12:16])).max() > 1e-3


@pytest.mark.parametrize("left,pos", [(0, "abs"), (1, "abs"), (2, "abs"),
                                      (0, "rel"), (2, "rel")])
def test_stream_step_equals_full_forward(left, pos):
    cfg = _chunked_cfg(chunk=4, left=left, ctc_pos=pos)
    p, s = C.ctc_asr_init(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    t = 16
    mel = rng.randn(2, t, cfg.num_mels).astype(np.float32)
    lens = jnp.array([16, 11])  # row 1: pad inside the final chunks
    full, pad, _ = C.ctc_logits(p, s, nn.Ctx.eval(), cfg,
                                jnp.asarray(mel), lens)
    full = np.asarray(full)

    carry = C.ctc_stream_init(p, cfg, 2)
    ectx = nn.Ctx.eval()
    c = cfg.ctc_chunk
    got = []
    for t0 in range(0, t, c):
        n_valid = np.clip(np.asarray(lens) - t0, 0, c)
        valid = jnp.asarray(np.arange(c)[None] < n_valid[:, None])
        carry, logits, _ = C.ctc_stream_step(
            p, ectx, cfg, carry, jnp.asarray(mel[:, t0:t0 + c]), valid)
        got.append(np.asarray(logits))
    got = np.concatenate(got, axis=1)
    valid_full = ~np.asarray(pad)
    for i in range(2):
        nv = valid_full[i].sum()
        np.testing.assert_allclose(got[i, :nv], full[i, :nv],
                                   atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("pos", ["abs", "rel"])
def test_streaming_asr_class_matches_one_shot_decode(pos):
    cfg = _chunked_cfg(chunk=4, left=1, ctc_pos=pos)
    p, s = C.ctc_asr_init(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    t = 19  # final chunk is partial
    mel = rng.randn(2, 20, cfg.num_mels).astype(np.float32)
    lens = np.array([19, 13])
    (ids, out_lens), _ = C.ctc_asr_infer(
        p, s, nn.Ctx.eval(), cfg, jnp.asarray(mel[:, :20]),
        jnp.asarray(lens))
    ids, out_lens = np.asarray(ids), np.asarray(out_lens)

    from unast_tpu.infer.streaming import StreamingCtcAsr
    sa = StreamingCtcAsr(p, cfg).reset(batch_size=2)
    for t0 in range(0, t, cfg.ctc_chunk):
        tc = min(cfg.ctc_chunk, t - t0)
        n_valid = np.clip(lens - t0, 0, tc)
        sa.step(mel[:, t0:t0 + tc], n_valid=n_valid)
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(sa.emitted[i], np.int32), ids[i, :out_lens[i]])


def test_rel_pos_translation_invariance():
    """ctc_pos='rel': logits depend only on the bounded attention field's
    CONTENT, not the absolute stream position — prepending a chunk of
    frames shifts the outputs without changing them (the property that
    makes unbounded online streams exact). The EFFECTIVE left receptive
    field stacks with depth (layer 2 reads layer-1 outputs that saw one
    more chunk back), so the invariant region starts at Y-chunk
    num_layers*left. The absolute-PE path must NOT have this property
    (sanity that the test can fail)."""
    for pos, invariant in (("rel", True), ("abs", False)):
        cfg = _chunked_cfg(chunk=4, left=1, ctc_pos=pos)
        p, s = C.ctc_asr_init(jax.random.PRNGKey(3), cfg)
        rng = np.random.RandomState(3)
        y = rng.randn(1, 16, cfg.num_mels).astype(np.float32)
        x = rng.randn(1, 4, cfg.num_mels).astype(np.float32)
        base, _, _ = C.ctc_logits(p, s, nn.Ctx.eval(), cfg,
                                  jnp.asarray(y), jnp.array([16]))
        shift, _, _ = C.ctc_logits(p, s, nn.Ctx.eval(), cfg,
                                   jnp.asarray(np.concatenate([x, y], 1)),
                                   jnp.array([20]))
        # y-chunks >= num_layers*left = 2: stacked field fully within y
        a = np.asarray(base[0, 8:16])
        b = np.asarray(shift[0, 12:20])
        if invariant:
            np.testing.assert_allclose(b, a, atol=1e-5)
        else:
            assert np.abs(b - a).max() > 1e-3


def test_rel_pos_bias_trains():
    """The rel table is a live parameter: the CTC loss gradient through
    it is nonzero (it rides the training forward via ctc_logits)."""
    cfg = _chunked_cfg(chunk=4, left=1, ctc_pos="rel")
    p, s = C.ctc_asr_init(jax.random.PRNGKey(4), cfg)
    rng = np.random.RandomState(4)
    mel = jnp.asarray(rng.randn(2, 8, cfg.num_mels).astype(np.float32))
    labels = jnp.array([[3, 5, 0], [7, 0, 0]], jnp.int32)

    def loss(p):
        logits, pad, _ = C.ctc_logits(p, s, nn.Ctx.eval(), cfg, mel,
                                      jnp.array([8, 6]))
        return C.ctc_loss(logits, pad, labels, jnp.array([2, 1]))

    g = jax.grad(loss)(p)
    assert np.abs(np.asarray(g["rel_pos"])).max() > 0


def test_rel_pos_requires_bounded_field():
    with pytest.raises(AssertionError):
        C.ctc_asr_init(jax.random.PRNGKey(0),
                       _chunked_cfg(chunk=0, left=1, ctc_pos="rel"))
    with pytest.raises(AssertionError):
        C.ctc_asr_init(jax.random.PRNGKey(0),
                       _chunked_cfg(chunk=4, left=-1, ctc_pos="rel"))


def test_stream_init_rejects_unbounded_left():
    cfg = _chunked_cfg(chunk=4, left=-1)
    p, _ = C.ctc_asr_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(AssertionError):
        C.ctc_stream_init(p, cfg, 1)


def test_stream_step_rejects_train_ctx():
    cfg = _chunked_cfg(chunk=4, left=1)
    p, _ = C.ctc_asr_init(jax.random.PRNGKey(0), cfg)
    carry = C.ctc_stream_init(p, cfg, 1)
    with pytest.raises(ValueError):
        C.ctc_stream_step(p, nn.Ctx(rng=jax.random.PRNGKey(0), train=True),
                          cfg, carry, jnp.zeros((1, 4, cfg.num_mels)),
                          jnp.ones((1, 4), bool))
