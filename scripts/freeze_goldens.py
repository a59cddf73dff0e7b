"""Freeze change-detector goldens (VERDICT r2 #8) into tests/goldens/:

  - dsp_clips.npz: mel/mag outputs of the numpy reference DSP
    (audio/ref_dsp.py, the in-repo reimplementation of the reference's
    librosa path, src/utils.py:235-278) on fixed seeded clips;
  - g2p_snapshot.json.gz: phoneme-id sequences for the first 1,000 REAL
    LJSpeech transcripts (in-package split CSVs).

Self-anchored by design: the point is catching silent refactor drift in
the DSP and the from-scratch G2P, not external parity (which the torch
oracle tests cover at the objective level). Re-run this script ONLY when
a behavior change is deliberate, and say so in the commit.
"""
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unast_tpu.audio import ref_dsp
from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.data.dataset import load_manifest, synth_audio
from unast_tpu.data.splits import REFERENCE_SPLITS_DIR
from unast_tpu.text import raw_text_to_phoneme_ids

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")


def main():
    os.makedirs(OUT, exist_ok=True)
    # --- DSP clips: 3 seeded synthetic clips of different lengths ---
    arrays = {}
    for i, (seed, n_ph) in enumerate(((0, 8), (1, 20), (2, 40))):
        rng = np.random.default_rng(seed)
        ids = rng.integers(4, 44, size=n_ph).astype(np.int32)
        wav = synth_audio(ids, P.sr, rng, phoneme_dur_s=0.06)
        mel, mag = ref_dsp.wav_to_mel_mag(wav)
        arrays[f"wav{i}"] = wav.astype(np.float32)
        arrays[f"mel{i}"] = mel.astype(np.float32)
        # mag is 13x the mel bytes; freeze a deterministic column subset
        arrays[f"mag{i}_cols"] = mag[:, ::37].astype(np.float32)
    np.savez_compressed(os.path.join(OUT, "dsp_clips.npz"), **arrays)
    print(f"dsp_clips.npz: {os.path.getsize(os.path.join(OUT, 'dsp_clips.npz'))} bytes")

    # --- G2P snapshot: first 1000 real transcripts ---
    rows = load_manifest(os.path.join(REFERENCE_SPLITS_DIR,
                                      "full_train.csv"))[:1000]
    snap = [{"id": fid, "ids": raw_text_to_phoneme_ids(text)}
            for fid, text in rows]
    path = os.path.join(OUT, "g2p_snapshot.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump(snap, f)
    print(f"g2p_snapshot.json.gz: {os.path.getsize(path)} bytes, "
          f"{len(snap)} transcripts")


if __name__ == "__main__":
    main()
