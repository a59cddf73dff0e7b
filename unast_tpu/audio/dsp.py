"""TPU-native audio DSP: STFT / mel / Griffin-Lim as jit-compiled JAX.

Design notes (TPU-first, not a port):
  - Framing and overlap-add avoid gather/scatter entirely: with
    Q = ceil(n_fft / hop), a frame decomposes into Q hop-sized rows of the
    reshaped signal, so framing is Q shifted slices and overlap-add is Q
    shifted adds — pure, fusable XLA ops with static shapes.
  - rFFT uses XLA's native FFT on TPU.
  - The mel projection is a single MXU matmul.
  - De-preemphasis (a first-order IIR the reference runs with
    scipy.signal.lfilter, src/utils.py:301) runs as an O(log n)
    jax.lax.associative_scan on device.
  - Griffin-Lim (reference src/utils.py:309-320: 60 python-loop librosa
    round trips on CPU) is a lax.fori_loop of ISTFT<->STFT entirely on
    device with static [T, F] shapes.

Parity targets: get_spectrograms (src/utils.py:235-278), spectrogram2wav
(src/utils.py:281-306), griffin_lim (src/utils.py:309-328).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .filters import mel_filterbank, hann_window
from .params import AudioParams, DEFAULT
from . import ref_dsp


def _q_factor(n_fft: int, hop: int) -> int:
    return -(-n_fft // hop)  # ceil


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[n] (already center-padded) -> [T, n_fft] frames without gather.

    T = 1 + (n - n_fft) // hop.
    """
    n = y.shape[0]
    n_frames = 1 + (n - n_fft) // hop
    q = _q_factor(n_fft, hop)
    # Pad so every shifted slice of the [S, hop] view is in range.
    total = (n_frames + q) * hop
    y = jnp.pad(y, (0, max(0, total - n)))
    rows = y[: (n_frames + q) * hop].reshape(n_frames + q, hop)
    # frames[t] = concat(rows[t], rows[t+1], ..., rows[t+q-1])[:n_fft]
    parts = [rows[t0 : t0 + n_frames] for t0 in range(q)]
    frames = jnp.concatenate(parts, axis=1)  # [T, q*hop]
    return frames[:, :n_fft]


def overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """[T, n_fft] -> [out_len] overlap-add without scatter.

    Decomposes column index k = q*hop + r, so out[(t+q)*hop + r] += x[t, q, r]:
    Q shifted adds over the frame axis.
    """
    n_frames, n_fft = frames.shape
    q = _q_factor(n_fft, hop)
    frames = jnp.pad(frames, ((0, 0), (0, q * hop - n_fft)))
    blocks = frames.reshape(n_frames, q, hop)
    acc = jnp.zeros((n_frames + q, hop), dtype=frames.dtype)
    for qi in range(q):
        acc = acc.at[qi : qi + n_frames].add(blocks[:, qi, :])
    flat = acc.reshape(-1)[: n_fft + hop * (n_frames - 1)]
    return flat[:out_len] if out_len <= flat.shape[0] else jnp.pad(
        flat, (0, out_len - flat.shape[0])
    )


def preemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    return jnp.concatenate([y[:1], y[1:] - coef * y[:-1]])


def deemphasis(y: jnp.ndarray, coef: float) -> jnp.ndarray:
    """IIR out[t] = y[t] + coef*out[t-1] via associative scan (O(log n))."""
    a = jnp.full_like(y, coef)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, out = jax.lax.associative_scan(combine, (a, y))
    return out


def stft(y: jnp.ndarray, p: AudioParams = DEFAULT,
         window: jnp.ndarray = None) -> jnp.ndarray:
    """[n] -> [T, n_freqs] complex64; center=True, reflect padding."""
    if window is None:
        window = jnp.asarray(hann_window(p.win_length, p.n_fft))
    y = jnp.pad(y, p.n_fft // 2, mode="reflect")
    frames = frame_signal(y, p.n_fft, p.hop_length) * window[None, :]
    return jnp.fft.rfft(frames, n=p.n_fft, axis=1)


def istft(spec: jnp.ndarray, p: AudioParams = DEFAULT,
          window: jnp.ndarray = None) -> jnp.ndarray:
    """[T, n_freqs] complex -> [hop*(T-1)] real; window-sum-square normalized,
    center-cropped (librosa istft semantics)."""
    if window is None:
        window = jnp.asarray(hann_window(p.win_length, p.n_fft))
    n_fft, hop = p.n_fft, p.hop_length
    frames = jnp.fft.irfft(spec, n=n_fft, axis=1) * window[None, :]
    n_frames = frames.shape[0]
    full_len = n_fft + hop * (n_frames - 1)
    out = overlap_add(frames, hop, full_len)
    w2 = jnp.broadcast_to((window ** 2)[None, :], (n_frames, n_fft))
    wss = overlap_add(w2, hop, full_len)
    out = out / jnp.maximum(wss, 1e-10)
    return out[n_fft // 2 : full_len - n_fft // 2]


@functools.lru_cache(maxsize=4)
def _dft_matrices(p: AudioParams):
    """Windowed real-DFT as matmul operands, restricted to the hann
    window's nonzero support (win_length samples centered in n_fft):
    |STFT|[t, k] = sqrt((f_t @ C)[k]^2 + (f_t @ S)[k]^2) with the window
    folded into C/S. Built in f64, stored f32. Returns (lo, hi, C, S)."""
    window = np.asarray(hann_window(p.win_length, p.n_fft), np.float64)
    nz = np.nonzero(window)[0]
    lo, hi = int(nz[0]), int(nz[-1]) + 1
    k = np.arange(p.n_fft // 2 + 1)
    t = np.arange(lo, hi)
    ang = -2.0 * np.pi * np.outer(t, k) / p.n_fft
    c = (np.cos(ang) * window[lo:hi, None]).astype(np.float32)
    s = (np.sin(ang) * window[lo:hi, None]).astype(np.float32)
    return lo, hi, c, s


def _frame_magnitudes(y_padded: jnp.ndarray, p: AudioParams) -> jnp.ndarray:
    """[n] preemphasized+center-padded signal -> [T, n_freqs] |STFT|.

    p.stft_mode selects the engine (see AudioParams): the dft_* modes feed
    the MXU two [T, support] x [support, n_freqs] matmuls instead of an
    rfft — measured 2.1x (high) / 1.5x (highest) the fft path on v5e
    (scripts/dsp_probe.py), max |mel err| 1.2e-4 / 1.2e-6."""
    frames = frame_signal(y_padded, p.n_fft, p.hop_length)
    if p.stft_mode == "fft":
        window = jnp.asarray(hann_window(p.win_length, p.n_fft))
        return jnp.abs(jnp.fft.rfft(frames * window[None, :],
                                    n=p.n_fft, axis=1))
    prec = {"dft_high": jax.lax.Precision.HIGH,
            "dft_highest": jax.lax.Precision.HIGHEST}[p.stft_mode]
    lo, hi, c, s = _dft_matrices(p)
    fr = frames[:, lo:hi]
    re = jnp.dot(fr, jnp.asarray(c), precision=prec)
    im = jnp.dot(fr, jnp.asarray(s), precision=prec)
    return jnp.sqrt(re * re + im * im)


@functools.partial(jax.jit, static_argnames=("p",))
def _wav_to_mel_mag_core(y_padded: jnp.ndarray, p: AudioParams):
    """Jitted fixed-shape core on an already preemphasized + center-padded
    signal: framing -> windowed DFT/rFFT -> mel projection -> dB-normalize."""
    mag = _frame_magnitudes(y_padded, p)
    mel_w = jnp.asarray(mel_filterbank(p.sr, p.n_fft, p.num_mels).T)
    mel = jnp.dot(mag, mel_w, precision=jax.lax.Precision.HIGHEST)
    mel = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
    mag_db = 20.0 * jnp.log10(jnp.maximum(1e-5, mag))
    mel = jnp.clip((mel - p.ref_db + p.max_db) / p.max_db, 1e-8, 1.0)
    mag_db = jnp.clip((mag_db - p.ref_db + p.max_db) / p.max_db, 1e-8, 1.0)
    return mel, mag_db


# Bucketed input lengths (seconds) so XLA compiles a handful of programs.
_LENGTH_BUCKETS_S = (1, 2, 4, 6, 8, 11)


def wav_to_mel_mag(y: np.ndarray, p: AudioParams = DEFAULT, trim: bool = True):
    """wav -> (mel [T, n_mels], mag [T, n_freqs], n_frames).

    Host wrapper: variable-length trim runs on host (data-dependent length),
    the rest runs jitted on device with bucketed padding. Returns arrays
    padded to the bucket's frame count plus the valid frame count.
    Parity: reference get_spectrograms (src/utils.py:235-278).
    """
    # Host side: trim + O(n) preemphasis + reflect center padding on the
    # TRUE signal end (bucketing after reflect keeps the last valid
    # frames identical to the unbucketed result), then zero-pad to the
    # bucket.
    y_refl, n_frames_valid, n = _host_prep(np.asarray(y), p, trim)
    bucket = next(
        (int(b * p.sr) for b in _LENGTH_BUCKETS_S if n <= b * p.sr),
        ((n + p.sr - 1) // p.sr) * p.sr if n > 0 else p.sr,
    )
    half = p.n_fft // 2
    y_pad = np.zeros(bucket + 2 * half, dtype=np.float32)
    y_pad[: len(y_refl)] = y_refl
    mel, mag = _wav_to_mel_mag_core(jnp.asarray(y_pad), p)
    return mel, mag, n_frames_valid


@functools.partial(jax.jit, static_argnames=("p",))
def _wav_to_mel_mag_core_batch(y_padded: jnp.ndarray, p: AudioParams):
    """[B, n] batch of preemphasized + center-padded signals -> one
    vmapped framing->DFT->mel pass (the offline preprocessor's batched
    fast path — per-clip dispatch through the device tunnel costs more
    than the DSP itself; see data/prepare.py --batch)."""
    return jax.vmap(lambda y: _wav_to_mel_mag_core(y, p))(y_padded)


def _host_prep(y: np.ndarray, p: AudioParams, trim: bool):
    """Per-clip host side of wav_to_mel_mag (trim + preemphasis + reflect
    center pad), shared by the scalar and batched entry points. Returns
    (y_refl, n_frames_valid, n_samples)."""
    if trim:
        try:
            from .. import native
            y, _ = native.trim_silence(np.asarray(y, np.float32),
                                       p.trim_frame_length,
                                       p.trim_hop_length, p.trim_top_db)
        except Exception:
            y, _ = ref_dsp.trim_silence(np.asarray(y, dtype=np.float32), p)
    n = len(y)
    half = p.n_fft // 2
    if n > 0:
        y_pre = ref_dsp.preemphasis(y.astype(np.float32), p.preemphasis)
        y_refl = np.pad(y_pre, half, mode="reflect")
    else:
        y_refl = np.zeros(2 * half, dtype=np.float32)
    return y_refl, (1 + n // p.hop_length if n > 0 else 0), n


def wav_to_mel_mag_batch(wavs, p: AudioParams = DEFAULT, trim: bool = True,
                         bucket_s: float = 0.0):
    """Batched wav -> (mel [B, T, n_mels], mag [B, T, n_freqs], n_frames
    [B]) — one shared length bucket (max clip in the batch), one vmapped
    core dispatch. Each row equals wav_to_mel_mag on that clip over its
    valid frames (zero padding past the reflect pad is exact — same
    argument as the scalar bucketing; tested). mel/mag are returned as
    DEVICE arrays so callers that don't need mag never pay its
    device->host transfer.

    bucket_s > 0 pins ONE canonical bucket for every call (clips longer
    than it raise): each distinct (batch, bucket) shape is a fresh XLA
    program whose remote compile is minutes-cold on this setup — a
    corpus run should pay exactly one (then the persistent compile
    cache makes it free forever)."""
    half = p.n_fft // 2
    prepped = [_host_prep(np.asarray(y), p, trim) for y in wavs]
    n_max = max(pp[2] for pp in prepped)
    if bucket_s > 0:
        assert n_max <= bucket_s * p.sr, (n_max, bucket_s)
        bucket = int(bucket_s * p.sr)
    else:
        bucket = next(
            (int(b * p.sr) for b in _LENGTH_BUCKETS_S if n_max <= b * p.sr),
            ((n_max + p.sr - 1) // p.sr) * p.sr if n_max > 0 else p.sr,
        )
    y_pad = np.zeros((len(prepped), bucket + 2 * half), dtype=np.float32)
    for i, (y_refl, _, _) in enumerate(prepped):
        y_pad[i, : len(y_refl)] = y_refl
    mel, mag = _wav_to_mel_mag_core_batch(jnp.asarray(y_pad), p)
    return mel, mag, np.asarray([pp[1] for pp in prepped], np.int32)


@functools.partial(jax.jit, static_argnames=("p",))
def griffin_lim(spectrogram: jnp.ndarray, p: AudioParams = DEFAULT):
    """[T, n_freqs] magnitude -> [hop*(T-1)] waveform, n_iter ISTFT<->STFT
    rounds fully on device (parity: src/utils.py:309-320).

    p.gl_momentum > 0 enables fast Griffin-Lim (Perraudin et al. 2013):
    the phase estimate extrapolates along successive consistency
    projections (est - m/(1+m) * est_prev), converging in far fewer
    iterations. At momentum 0 the update reduces exactly to the
    reference's plain alternating projection."""
    window = jnp.asarray(hann_window(p.win_length, p.n_fft))
    n_frames = spectrogram.shape[0]
    m = p.gl_momentum / (1.0 + p.gl_momentum)
    spec_c = spectrogram.astype(jnp.complex64)

    def body(_, carry):
        x_best, est_prev = carry
        x_t = istft(x_best, p, window)
        est = stft(x_t, p, window)[:n_frames]
        est_m = est - m * est_prev
        phase = est_m / jnp.maximum(1e-8, jnp.abs(est_m))
        return spec_c * phase, est

    x_best, _ = jax.lax.fori_loop(0, p.n_iter, body,
                                  (spec_c, jnp.zeros_like(spec_c)))
    return istft(x_best, p, window)


@functools.partial(jax.jit, static_argnames=("p",))
def _mag_to_wav_core(mag: jnp.ndarray, p: AudioParams):
    mag = jnp.clip(mag, 0.0, 1.0) * p.max_db - p.max_db + p.ref_db
    mag = jnp.power(10.0, mag * 0.05)
    wav = griffin_lim(mag ** p.power, p)
    return deemphasis(wav, p.preemphasis)


def mag_to_wav(mag, p: AudioParams = DEFAULT, trim: bool = True) -> np.ndarray:
    """Normalized magnitude (T, n_freqs) -> waveform on device, host trim.
    Parity: reference spectrogram2wav (src/utils.py:281-306)."""
    wav = np.asarray(_mag_to_wav_core(jnp.asarray(mag), p), dtype=np.float32)
    if trim:
        wav, _ = ref_dsp.trim_silence(wav, p)
    return wav


def mel_to_mag_pseudo_inverse(p: AudioParams = DEFAULT) -> np.ndarray:
    """(n_mels, n_freqs) least-squares pseudo-inverse of the mel filterbank —
    a direct mel->linear lift for Griffin-Lim without a trained vocoder
    (capability add; the reference requires the CBHG vocoder or mag dumps)."""
    w = mel_filterbank(p.sr, p.n_fft, p.num_mels)
    return np.linalg.pinv(w).T.astype(np.float32)  # (n_mels, n_freqs)
