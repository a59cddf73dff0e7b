"""C++ native runtime parity tests vs the pure-numpy reference paths."""

import os
import wave

import numpy as np
import pytest

from unast_tpu import native
from unast_tpu.audio import ref_dsp
from unast_tpu.audio.params import DEFAULT
from unast_tpu.infer.metrics import edit_distance


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_levenshtein_batch_matches_python():
    rng = np.random.default_rng(0)
    B, T = 16, 40
    refs = rng.integers(3, 46, (B, T)).astype(np.int32)
    hyps = rng.integers(3, 46, (B, T)).astype(np.int32)
    ref_lens = rng.integers(1, T, B).astype(np.int32)
    hyp_lens = rng.integers(1, T, B).astype(np.int32)
    got = native.levenshtein_batch(refs, hyps, ref_lens, hyp_lens)
    want = [edit_distance(refs[i, :ref_lens[i]].tolist(),
                          hyps[i, :hyp_lens[i]].tolist()) for i in range(B)]
    np.testing.assert_array_equal(got, want)


def test_trim_matches_ref_dsp():
    rng = np.random.default_rng(1)
    y = np.zeros(44100, np.float32)
    y[11025:33075] = rng.standard_normal(22050).astype(np.float32) * 0.5
    got, (s1, e1) = native.trim_silence(y, DEFAULT.trim_frame_length,
                                        DEFAULT.trim_hop_length,
                                        DEFAULT.trim_top_db)
    want, (s2, e2) = ref_dsp.trim_silence(y, DEFAULT)
    assert (s1, e1) == (s2, e2)
    np.testing.assert_array_equal(got, want)


def test_preemphasis_matches_numpy():
    rng = np.random.default_rng(2)
    y = rng.standard_normal(5000).astype(np.float32)
    got = native.preemphasis(y, 0.97)
    want = ref_dsp.preemphasis(y, 0.97)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_read_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    y = (rng.standard_normal(22050) * 0.3).astype(np.float32)
    pcm = (np.clip(y, -1, 1) * 32767).astype(np.int16)
    path = str(tmp_path / "t.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(pcm.tobytes())
    got, sr = native.read_wav(path, expect_sr=22050)
    assert sr == 22050
    np.testing.assert_allclose(got, pcm / 32768.0, atol=1e-6)
