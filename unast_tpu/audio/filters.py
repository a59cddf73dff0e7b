"""Mel filterbank and window construction (host-side numpy constants).

Implements the Slaney-style mel filterbank with the same semantics as
`librosa.filters.mel(sr, n_fft, n_mels)` used by the reference at
`src/utils.py:263` (htk=False, norm='slaney', fmin=0, fmax=sr/2), written
from the published algorithm: mel scale linear below 1 kHz, logarithmic
above, triangular filters area-normalized by bandwidth.
"""

import numpy as np

_F_SP = 200.0 / 3.0            # linear region: mels per Hz below 1 kHz
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0  # log region step


def hz_to_mel(f):
    f = np.asanyarray(f, dtype=np.float64)
    mels = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mels = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, 1e-10) / _MIN_LOG_HZ) / _LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


def mel_filterbank(sr: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: float = None) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) Slaney-normalized triangular mel filterbank."""
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)  # (n_mels + 2,)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_freqs)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization: each filter integrates to ~2/bandwidth.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def hann_window(win_length: int, n_fft: int = None) -> np.ndarray:
    """Periodic Hann window, zero-padded centered to n_fft (librosa stft
    convention: scipy.signal.get_window('hann', win, fftbins=True) then
    util.pad_center to n_fft)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if n_fft is None or n_fft == win_length:
        return w.astype(np.float32)
    if n_fft < win_length:
        raise ValueError("n_fft must be >= win_length")
    pad = n_fft - win_length
    lpad = pad // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[lpad : lpad + win_length] = w
    return out.astype(np.float32)
