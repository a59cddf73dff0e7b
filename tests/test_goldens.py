"""Frozen regression goldens (VERDICT r2 #8, scripts/freeze_goldens.py):
change detectors for the numpy reference DSP and the from-scratch G2P.
Self-anchored on purpose — external numeric parity is covered by the
torch-oracle tests (tests/test_ref_parity.py); these catch SILENT drift
from refactors. If a failure here is a deliberate behavior change,
re-freeze with scripts/freeze_goldens.py and say so in the commit."""

import gzip
import json
import os

import numpy as np

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def test_dsp_matches_frozen_golden():
    from unast_tpu.audio import ref_dsp

    z = np.load(os.path.join(GOLDENS, "dsp_clips.npz"))
    for i in range(3):
        mel, mag = ref_dsp.wav_to_mel_mag(z[f"wav{i}"])
        np.testing.assert_allclose(mel, z[f"mel{i}"], rtol=1e-5, atol=1e-6,
                                   err_msg=f"mel clip {i}")
        np.testing.assert_allclose(mag[:, ::37], z[f"mag{i}_cols"],
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"mag clip {i}")


def test_jax_dsp_matches_frozen_golden_loosely():
    """The jitted device DSP tracks the same goldens within float32
    reassociation tolerance (the existing golden tests compare jax vs
    numpy per-run; this pins BOTH to a frozen artifact)."""
    from unast_tpu.audio import dsp

    z = np.load(os.path.join(GOLDENS, "dsp_clips.npz"))
    for i in range(3):
        mel, mag, n = dsp.wav_to_mel_mag(z[f"wav{i}"])
        want = z[f"mel{i}"]
        got = np.asarray(mel[:n], np.float32)
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4,
                                   err_msg=f"jax mel clip {i}")


def test_g2p_matches_frozen_snapshot():
    """Phonemization of 1,000 REAL LJSpeech transcripts is byte-stable."""
    from unast_tpu.text import raw_text_to_phoneme_ids
    from unast_tpu.data.dataset import load_manifest
    from unast_tpu.data.splits import REFERENCE_SPLITS_DIR

    with gzip.open(os.path.join(GOLDENS, "g2p_snapshot.json.gz"),
                   "rt") as f:
        snap = json.load(f)
    rows = load_manifest(os.path.join(REFERENCE_SPLITS_DIR,
                                      "full_train.csv"))[:1000]
    assert len(snap) == len(rows) == 1000
    mismatches = []
    for (fid, text), want in zip(rows, snap):
        assert fid == want["id"]
        got = raw_text_to_phoneme_ids(text)
        if got != want["ids"]:
            mismatches.append(fid)
    assert not mismatches, mismatches[:10]
