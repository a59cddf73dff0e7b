"""L1 audio DSP: STFT/mel/Griffin-Lim as jitted JAX (+ numpy golden path)."""

from .params import AudioParams, DEFAULT
from .filters import mel_filterbank, hann_window, hz_to_mel, mel_to_hz
from .dsp import (
    stft, istft, frame_signal, overlap_add, preemphasis, deemphasis,
    wav_to_mel_mag, griffin_lim, mag_to_wav, mel_to_mag_pseudo_inverse,
)
from . import ref_dsp

__all__ = [
    "AudioParams", "DEFAULT", "mel_filterbank", "hann_window", "hz_to_mel",
    "mel_to_hz", "stft", "istft", "frame_signal", "overlap_add",
    "preemphasis", "deemphasis", "wav_to_mel_mag", "griffin_lim",
    "mag_to_wav", "mel_to_mag_pseudo_inverse", "ref_dsp",
]
