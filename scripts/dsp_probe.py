"""Stage breakdown + DFT-matmul experiment for the wav->mel headline path.

Times, on the real chip (one jitted program per variant, scalar-fetch
timing as in bench.py):
  1. full current pipeline (framing -> windowed rfft -> |.| -> mel matmul)
  2. framing only
  3. framing + rfft only
  4. DFT-as-matmul variant: mag^2 = (f@C)^2 + (f@S)^2 with the hann window
     folded into the DFT matrices and the frame sliced to the window's
     1102-sample support (the reference's win_length, padded into the
     2048-point FFT: src/utils.py:235-278 / audio/params.py) -> mel.
     Run at several matmul precisions, with max-abs-error vs the rfft
     path reported so a switch is accuracy-justified, not just fast.

Run: python scripts/dsp_probe.py [--n_clips 256]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.audio import dsp
from unast_tpu.audio.params import DEFAULT as P

N_CLIPS = 256
if "--n_clips" in sys.argv:
    N_CLIPS = int(sys.argv[sys.argv.index("--n_clips") + 1])

rng = np.random.default_rng(0)
n = int(10.0 * P.sr)
clips = rng.standard_normal((N_CLIPS, n)).astype(np.float32) * 0.1
half = P.n_fft // 2


def _time(fn, reps=5):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _prep(y):
    y = dsp.preemphasis(y, P.preemphasis)
    return jnp.pad(y, half, mode="reflect")


window = np.asarray(dsp.hann_window(P.win_length, P.n_fft), np.float64)
# window support: hann(win) centered-padded into n_fft
nz = np.nonzero(window)[0]
lo, hi = int(nz[0]), int(nz[-1]) + 1
print(f"window support [{lo}, {hi}) = {hi - lo} of {P.n_fft}")

mel_w = np.asarray(dsp.mel_filterbank(P.sr, P.n_fft, P.num_mels).T,
                   np.float32)

# DFT matrices over the window support only, window folded in (f64 build)
k = np.arange(P.n_fft // 2 + 1)
t = np.arange(lo, hi)
ang = -2.0 * np.pi * np.outer(t, k) / P.n_fft
C = (np.cos(ang) * window[lo:hi, None]).astype(np.float32)
S = (np.sin(ang) * window[lo:hi, None]).astype(np.float32)
Cj, Sj = jnp.asarray(C), jnp.asarray(S)
melj = jnp.asarray(mel_w)
xs = jnp.asarray(clips)


@jax.jit
def full_current(x):
    def one(y):
        mel, _ = dsp._wav_to_mel_mag_core(_prep(y), P)
        return mel
    return jax.vmap(one)(x)


@jax.jit
def framing_only(x):
    def one(y):
        return dsp.frame_signal(_prep(y), P.n_fft, P.hop_length)
    return jax.vmap(one)(x)


@jax.jit
def framing_fft(x):
    w = jnp.asarray(dsp.hann_window(P.win_length, P.n_fft))

    def one(y):
        frames = dsp.frame_signal(_prep(y), P.n_fft, P.hop_length) * w[None]
        return jnp.abs(jnp.fft.rfft(frames, n=P.n_fft, axis=1))
    return jax.vmap(one)(x)


def make_dft(precision):
    @jax.jit
    def f(x):
        def one(y):
            frames = dsp.frame_signal(_prep(y), P.n_fft, P.hop_length)
            fr = frames[:, lo:hi]
            re = jnp.dot(fr, Cj, precision=precision)
            im = jnp.dot(fr, Sj, precision=precision)
            mag = jnp.sqrt(re * re + im * im)
            mel = jnp.dot(mag, melj, precision=jax.lax.Precision.HIGHEST)
            mel = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
            return jnp.clip((mel - P.ref_db + P.max_db) / P.max_db,
                            1e-8, 1.0)
        return jax.vmap(one)(x)
    return f


print(f"n_clips={N_CLIPS}")
t_full = _time(lambda: float(full_current(xs)[0, 0, 0]))
print(f"full current pipeline: {t_full*1e3:.1f} ms  "
      f"({N_CLIPS/t_full:.0f} clips/s)")
t_frame = _time(lambda: float(framing_only(xs)[0, 0, 0]))
print(f"framing only:          {t_frame*1e3:.1f} ms")
t_fft = _time(lambda: float(framing_fft(xs)[0, 0, 0]))
print(f"framing + rfft:        {t_fft*1e3:.1f} ms")

ref = np.asarray(full_current(xs[:2]))
for name, prec in [("default", jax.lax.Precision.DEFAULT),
                   ("highest", jax.lax.Precision.HIGHEST)]:
    f = make_dft(prec)
    t = _time(lambda: float(f(xs)[0, 0, 0]))
    err = float(np.max(np.abs(np.asarray(f(xs[:2])) - ref)))
    print(f"DFT-matmul ({name:7s}): {t*1e3:.1f} ms  "
          f"({N_CLIPS/t:.0f} clips/s)  max|mel err| vs rfft = {err:.2e}")
