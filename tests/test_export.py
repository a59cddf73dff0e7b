"""AOT serving export (infer/export.py): StableHLO bundles round-trip and
reproduce the live functions exactly."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu import nn
from unast_tpu.infer.export import (export_bundle, export_synthesizer,
                                    load_bundle)
from unast_tpu.models import ctc as C
from unast_tpu.models import fastspeech as F
from unast_tpu.models import melgan as G
from unast_tpu.models import unast as U
from unast_tpu.models.config import TINY


def test_export_bundle_roundtrip(tmp_path):
    p = G.melgan_init(jax.random.PRNGKey(0), base=32)
    mel = jax.random.uniform(jax.random.PRNGKey(1), (2, 12, 80))
    path = os.path.join(tmp_path, "b.zip")
    export_bundle(path, {"voc": (lambda pp, m: G.generator_forward(pp, m),
                                 (p, mel))}, weights=p)
    b = load_bundle(path)
    assert b.names() == ["voc"]
    want = np.asarray(G.generator_forward(p, mel))
    got = np.asarray(b.call("voc", b.weights, mel))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # the weights file is swappable under the fixed program
    p2 = G.melgan_init(jax.random.PRNGKey(7), base=32)
    got2 = np.asarray(b.call("voc", p2, mel))
    want2 = np.asarray(G.generator_forward(p2, mel))
    np.testing.assert_allclose(got2, want2, rtol=1e-6, atol=1e-6)
    assert not np.allclose(got, got2)


def test_export_synthesizer_programs(tmp_path):
    from unast_tpu.infer.serve import Synthesizer

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    n_params, n_state = F.fastspeech_init(jax.random.PRNGKey(1), cfg)
    n_params["dur"]["fc"]["b"] = n_params["dur"]["fc"]["b"] + 2.0
    c_params, c_state = C.ctc_asr_init(jax.random.PRNGKey(2), cfg)
    mg = G.melgan_init(jax.random.PRNGKey(3), base=32)
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(24,), max_batch=2,
                      nar_pv=(n_params, n_state), melgan_params=mg,
                      ctc_pv=(c_params, c_state))
    path = os.path.join(tmp_path, "syn.zip")
    export_synthesizer(syn, path, batch=2)
    b = load_bundle(path)
    assert b.names() == ["ctc_asr", "nar_tts", "vocode"]

    ids = jnp.zeros((2, 16), jnp.int32).at[:, :3].set(
        jnp.array([[5, 6, 2], [7, 8, 2]]))
    lens = jnp.array([3, 3], jnp.int32)
    post, out_lens = b.call("nar_tts", b.weights["nar"], ids, lens)
    (_, want_post, want_lens, _), _ = F.fastspeech_forward(
        n_params, n_state, nn.Ctx.eval(), cfg, ids, lens,
        max_len=cfg.max_mel_len)
    np.testing.assert_allclose(np.asarray(post), np.asarray(want_post),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_lens),
                                  np.asarray(want_lens))

    mel = jax.random.uniform(jax.random.PRNGKey(4), (2, 24, cfg.num_mels))
    mlens = jnp.array([24, 12], jnp.int32)
    got_ids, got_l = b.call("ctc_asr", b.weights["ctc"], mel, mlens)
    (want_ids, want_l), _ = C.ctc_asr_infer(c_params, c_state,
                                            nn.Ctx.eval(), cfg, mel, mlens)
    np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(want_ids))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(want_l))

    wav = b.call("vocode", b.weights["melgan"], mel)
    np.testing.assert_allclose(np.asarray(wav),
                               np.asarray(G.generator_forward(mg, mel)),
                               rtol=1e-5, atol=1e-5)
