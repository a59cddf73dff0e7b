"""Reference CPU DSP path in pure numpy.

Replicates the algorithm of the reference pipeline (`src/utils.py:235-328`,
which uses librosa — unavailable here) from the documented librosa semantics:
center-padded reflect STFT with a periodic Hann window padded to n_fft,
Slaney mel filterbank, dB conversion and clip-normalization, and Griffin-Lim
inversion. Serves two roles:

  1. golden values for numerical parity tests of the JAX/Pallas path;
  2. the measured CPU baseline in `bench.py` (the reference publishes no
     numbers, so BASELINE.md mandates measuring this path).
"""

import numpy as np

from .filters import mel_filterbank, hann_window
from .params import AudioParams, DEFAULT


def trim_silence(y: np.ndarray, p: AudioParams = DEFAULT):
    """librosa.effects.trim semantics: drop leading/trailing frames whose
    RMS power is more than top_db below the signal max. RMS frames are
    CENTERED (librosa.feature.rms center=True zero-pads frame//2 both
    sides), so frame t spans [t*hop - frame//2, t*hop + frame//2)."""
    frame, hop = p.trim_frame_length, p.trim_hop_length
    if len(y) == 0:
        return y, (0, 0)
    pad = frame // 2
    ypad = np.pad(y.astype(np.float64), pad)
    n_frames = 1 + (len(ypad) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    mse = np.mean(ypad[idx] ** 2, axis=1)
    db = 10.0 * np.log10(np.maximum(mse, 1e-10) / max(np.max(mse), 1e-10))
    non_silent = db > -p.trim_top_db
    if not non_silent.any():
        return y[:0], (0, 0)
    first = int(np.argmax(non_silent))
    last = int(len(non_silent) - np.argmax(non_silent[::-1]))
    start = first * hop
    end = min(len(y), last * hop)
    return y[start:end], (start, end)


def preemphasis(y: np.ndarray, coef: float) -> np.ndarray:
    return np.append(y[0], y[1:] - coef * y[:-1])


def deemphasis(y: np.ndarray, coef: float) -> np.ndarray:
    """IIR inverse of preemphasis: out[t] = y[t] + coef * out[t-1]."""
    out = np.empty_like(y)
    acc = 0.0
    for t in range(len(y)):
        acc = y[t] + coef * acc
        out[t] = acc
    return out


def stft(y: np.ndarray, p: AudioParams = DEFAULT) -> np.ndarray:
    """(n_freqs, T) complex STFT, center=True with reflect padding."""
    n_fft, hop = p.n_fft, p.hop_length
    window = hann_window(p.win_length, n_fft).astype(np.float64)
    y = np.pad(y.astype(np.float64), n_fft // 2, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    return np.fft.rfft(frames, n=n_fft, axis=1).T  # (n_freqs, T)


def istft(spec: np.ndarray, p: AudioParams = DEFAULT) -> np.ndarray:
    """Inverse STFT with window-sum-square normalization (librosa istft
    semantics, center=True)."""
    n_fft, hop = p.n_fft, p.hop_length
    window = hann_window(p.win_length, n_fft).astype(np.float64)
    frames = np.fft.irfft(spec.T, n=n_fft, axis=1)  # (T, n_fft)
    n_frames = frames.shape[0]
    out_len = n_fft + hop * (n_frames - 1)
    out = np.zeros(out_len)
    wss = np.zeros(out_len)
    w2 = window ** 2
    for t in range(n_frames):
        out[t * hop : t * hop + n_fft] += frames[t] * window
        wss[t * hop : t * hop + n_fft] += w2
    out = out / np.maximum(wss, 1e-10)
    return out[n_fft // 2 : out_len - n_fft // 2]


def wav_to_mel_mag(y: np.ndarray, p: AudioParams = DEFAULT, trim: bool = True):
    """wav -> (mel (T, n_mels), mag (T, n_freqs)) float32, normalized to
    [1e-8, 1] — parity with reference get_spectrograms (src/utils.py:235-278).
    """
    if trim:
        y, _ = trim_silence(y, p)
    y = preemphasis(y, p.preemphasis)
    linear = stft(y, p)
    mag = np.abs(linear)                               # (n_freqs, T)
    mel_basis = mel_filterbank(p.sr, p.n_fft, p.num_mels).astype(np.float64)
    mel = mel_basis @ mag                              # (n_mels, T)
    mel = 20.0 * np.log10(np.maximum(1e-5, mel))
    mag_db = 20.0 * np.log10(np.maximum(1e-5, mag))
    mel = np.clip((mel - p.ref_db + p.max_db) / p.max_db, 1e-8, 1.0)
    mag_db = np.clip((mag_db - p.ref_db + p.max_db) / p.max_db, 1e-8, 1.0)
    return mel.T.astype(np.float32), mag_db.T.astype(np.float32)


def griffin_lim(spectrogram: np.ndarray, p: AudioParams = DEFAULT) -> np.ndarray:
    """Phase reconstruction via n_iter rounds of ISTFT<->STFT
    (parity: src/utils.py:309-320). spectrogram: (n_freqs, T) magnitude."""
    x_best = spectrogram.astype(np.complex128)
    for _ in range(p.n_iter):
        x_t = istft(x_best, p)
        est = stft(x_t, p)
        # est may have a different frame count after istft->stft; crop/pad.
        t = min(est.shape[1], spectrogram.shape[1])
        phase = est[:, :t] / np.maximum(1e-8, np.abs(est[:, :t]))
        x_best = spectrogram[:, :t] * phase
    return np.real(istft(x_best, p))


def mag_to_wav(mag: np.ndarray, p: AudioParams = DEFAULT) -> np.ndarray:
    """Normalized magnitude (T, n_freqs) -> waveform; parity with reference
    spectrogram2wav (src/utils.py:281-306)."""
    mag = mag.T
    mag = (np.clip(mag, 0.0, 1.0) * p.max_db) - p.max_db + p.ref_db
    mag = np.power(10.0, mag * 0.05)
    wav = griffin_lim(mag ** p.power, p)
    wav = deemphasis(wav, p.preemphasis)
    wav, _ = trim_silence(wav.astype(np.float32), p)
    return wav.astype(np.float32)
