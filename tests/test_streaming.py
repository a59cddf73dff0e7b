"""Streaming chunked vocoding (infer/streaming.py) — serving addition
over the reference (batch-only synthesis)."""

import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.infer.streaming import RECEPTIVE_FIELD, MelganStreamer
from unast_tpu.models import melgan as G

HOP = 275


def _gen(base=32):
    return G.melgan_init(jax.random.PRNGKey(0), base=base)


def _full_padded(p, mel, chunk):
    """The streaming contract's reference: forward over the mel zero-
    padded to a chunk multiple, truncated to T*hop samples."""
    t = mel.shape[0]
    t_pad = -(-t // chunk) * chunk
    padded = np.zeros((t_pad, mel.shape[1]), np.float32)
    padded[:t] = mel
    return np.asarray(G.melgan_forward(p, jnp.asarray(padded)[None])[0]
                      )[: t * HOP]


def test_chunked_equals_full():
    """Concatenated stream chunks == the padded full forward, exactly
    (window edges are true sequence slices; ctx >= receptive field)."""
    p = _gen()
    mel = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (77, 80)),
                     np.float32)
    full = _full_padded(p, mel, 32)
    s = MelganStreamer(p, HOP, chunk=32)
    got = np.concatenate(list(s.stream(mel)))
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, rtol=2e-5, atol=2e-5)


def test_receptive_field_bound_is_meaningful():
    """A context far below the receptive field must NOT reproduce the
    full output — i.e. the equality above is not vacuous."""
    p = _gen()
    mel = np.asarray(jax.random.uniform(jax.random.PRNGKey(2), (64, 80)),
                     np.float32)
    full = _full_padded(p, mel, 16)
    s = MelganStreamer(p, HOP, chunk=16, ctx=1)
    got = np.concatenate(list(s.stream(mel)))
    assert got.shape == full.shape
    assert not np.allclose(got, full, rtol=2e-5, atol=2e-5)
    assert RECEPTIVE_FIELD > 1


def test_short_utterance_and_remainder_chunks():
    p = _gen()
    for t in (5, 32, 33, 40):
        mel = np.asarray(jax.random.uniform(jax.random.PRNGKey(t), (t, 80)),
                         np.float32)
        full = _full_padded(p, mel, 32)
        s = MelganStreamer(p, HOP, chunk=32)
        got = np.concatenate(list(s.stream(mel)))
        np.testing.assert_allclose(got, full, rtol=2e-5, atol=2e-5,
                                   err_msg=f"T={t}")


def test_stream_tts_end_to_end():
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.infer.streaming import stream_tts
    from unast_tpu.models import fastspeech as F
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import TINY

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    n_params, n_state = F.fastspeech_init(jax.random.PRNGKey(1), cfg)
    n_params["dur"]["fc"]["b"] = n_params["dur"]["fc"]["b"] + 2.0
    mg = G.melgan_init(jax.random.PRNGKey(2), base=32)
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(cfg.max_mel_len,), max_batch=1,
                      nar_pv=(n_params, n_state), melgan_params=mg)
    chunks = list(stream_tts(syn, "hello world", chunk=8))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert total.ndim == 1 and np.isfinite(total).all()
