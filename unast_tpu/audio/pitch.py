"""Frame-level F0 (pitch) extraction — normalized-autocorrelation method.

Host-side numpy, used offline (dataset preparation for the FastSpeech
pitch adaptor, models/fastspeech.py) and for verification (the pitch-
control gate measures the F0 of synthesized audio,
scripts/pitch_control_check.py). The reference has no pitch modeling
anywhere (SURVEY §2); this supports a capability addition.

Method: for each analysis frame, the normalized autocorrelation
r(k) = sum(x_t x_{t+k}) / sqrt(sum x_t^2 * sum x_{t+k}^2) is evaluated
over lags for [fmin, fmax]; the peak lag gives F0, frames with peak
correlation below `voiced_threshold` (or too little energy) are unvoiced
(f0 = 0). Frame placement matches the DSP's mel frames (hop 275,
centered), so f0[t] aligns with mel[t].
"""

import numpy as np


def extract_f0(wav: np.ndarray, sr: int = 22050, hop: int = 275,
               win: int = 1102, fmin: float = 70.0, fmax: float = 400.0,
               voiced_threshold: float = 0.3) -> np.ndarray:
    """wav: float32 [n] -> f0 float32 [n_frames] (0 = unvoiced), with
    n_frames = 1 + n // hop (centered frames, matching the mel count)."""
    wav = np.asarray(wav, np.float32)
    n = len(wav)
    half = win // 2
    y = np.pad(wav, half, mode="reflect")
    n_frames = 1 + n // hop
    lag_min = max(1, int(sr / fmax))
    lag_max = min(win - 1, int(sr / fmin))
    f0 = np.zeros((n_frames,), np.float32)
    for t in range(n_frames):
        fr = y[t * hop:t * hop + win]
        fr = fr - fr.mean()
        e0 = float(fr @ fr)
        if e0 < 1e-8:
            continue
        # full autocorrelation via one FFT (O(win log win) per frame)
        nfft = 1
        while nfft < 2 * win:
            nfft <<= 1
        spec = np.fft.rfft(fr, nfft)
        ac = np.fft.irfft(spec * np.conj(spec), nfft)[:lag_max + 1]
        # normalize by the energy of the overlapping segments
        csum = np.cumsum(fr * fr)
        e_head = csum[win - 1 - np.arange(lag_min, lag_max + 1)]
        e_tail = csum[-1] - csum[np.arange(lag_min, lag_max + 1) - 1]
        denom = np.sqrt(np.maximum(e_head * e_tail, 1e-12))
        r = ac[lag_min:lag_max + 1] / denom
        peak = float(r.max())
        if peak >= voiced_threshold:
            # a periodic signal peaks at EVERY multiple of the period —
            # start at the SMALLEST lag within 5% of the best peak
            # (octave-error guard: plain argmax can land on 2x/3x the
            # period), climb to the local maximum, refine parabolically
            k = int(np.argmax(r >= 0.95 * peak))
            while k + 1 < len(r) and r[k + 1] > r[k]:
                k += 1
            lag = float(lag_min + k)
            if 0 < k < len(r) - 1:
                a, b, c = float(r[k - 1]), float(r[k]), float(r[k + 1])
                den = a - 2 * b + c
                if abs(den) > 1e-12:
                    lag += 0.5 * (a - c) / den
            f0[t] = sr / lag
    return f0


def token_log_f0(f0: np.ndarray, durations: np.ndarray) -> np.ndarray:
    """Token-level mean log-F0 over VOICED frames: f0 [T], durations
    [Tt] (summing to <= T) -> log-f0 [Tt] (0 where the whole span is
    unvoiced). numpy counterpart of the in-graph reduction in
    train/fastspeech.py (used by tests)."""
    out = np.zeros((len(durations),), np.float32)
    t = 0
    for i, d in enumerate(durations):
        span = f0[t:t + int(d)]
        v = span[span > 0]
        if len(v):
            out[i] = np.log(v).mean()
        t += int(d)
    return out
