"""Frame-free STFT probe: kill the framing materialization in the
wav->mel headline path.

dsp_probe.py showed the DFT-matmul engine's cost is ~entirely the
framing stage (53.6 of 53.7 ms at 256x10s): frame_signal materializes a
[T, q*hop] concat whose 275-wide lane slices straddle TPU tile
boundaries. Both variants here never build frames:

  chunked: frames[:, qi*hop:(qi+1)*hop] == rows[qi:qi+T] for the
    hop-reshaped signal shifted to the window support, so
    |STFT| re/im = sum_qi rows[qi:qi+T] @ C[qi*hop:(qi+1)*hop] — q=5
    accumulated MXU matmuls over CONTIGUOUS [T, hop] slices (C/S padded
    with zero rows to q*hop; exact).
  conv: the same contraction as ONE lax.conv_general_dilated with
    window_strides=hop over the support-shifted signal (XLA:TPU lowers
    strided convs with implicit im2col).

Parity anchor: reference get_spectrograms (src/utils.py:235-278).
Run: python scripts/dsp_probe2.py [--n_clips 256]
"""
import dataclasses
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

HIGH = jax.lax.Precision.HIGH
rng = np.random.default_rng(0)
n = int(10.0 * P.sr)
clips = rng.standard_normal((N_CLIPS, n)).astype(np.float32) * 0.1
half = P.n_fft // 2
hop = P.hop_length
N = n + 2 * half                      # padded length fed to the core
T = 1 + (N - P.n_fft) // hop          # frames the current core emits


def _time(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _prep(y):
    y = dsp.preemphasis(y, P.preemphasis)
    return jnp.pad(y, half, mode="reflect")


lo, hi, C, S = dsp._dft_matrices(P)
support = hi - lo
q = -(-support // hop)                # ceil(1102/275) = 5
Cp = np.zeros((q * hop, C.shape[1]), np.float32)
Sp = np.zeros_like(Cp)
Cp[:support], Sp[:support] = C, S
Cj, Sj = jnp.asarray(Cp), jnp.asarray(Sp)
melj = jnp.asarray(dsp.mel_filterbank(P.sr, P.n_fft, P.num_mels).T)
R = T + q - 1                          # rows needed by the deepest shift
assert lo + R * hop <= N, (lo + R * hop, N)


def _postproc(re, im):
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, melj, precision=jax.lax.Precision.HIGHEST)
    mel = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
    return jnp.clip((mel - P.ref_db + P.max_db) / P.max_db, 1e-8, 1.0)


@jax.jit
def current(x):
    def one(y):
        mel, _ = dsp._wav_to_mel_mag_core(_prep(y), P)
        return mel
    return jax.vmap(one)(x)


@jax.jit
def chunked(x):
    yp = jax.vmap(_prep)(x)                       # [B, N]
    rows = yp[:, lo:lo + R * hop].reshape(x.shape[0], R, hop)
    re = jnp.zeros((x.shape[0], T, Cj.shape[1]), jnp.float32)
    im = jnp.zeros_like(re)
    for qi in range(q):
        blk = rows[:, qi:qi + T, :]
        re = re + jnp.einsum("bth,hk->btk", blk, Cj[qi * hop:(qi + 1) * hop],
                             precision=HIGH)
        im = im + jnp.einsum("bth,hk->btk", blk, Sj[qi * hop:(qi + 1) * hop],
                             precision=HIGH)
    return _postproc(re, im)


W = jnp.asarray(np.concatenate([C, S], axis=1)[:, None, :])  # [sup, 1, 2K]
K = C.shape[1]


@jax.jit
def conv(x):
    yp = jax.vmap(_prep)(x)[:, lo:, None]          # [B, N-lo, 1]
    out = jax.lax.conv_general_dilated(
        yp, W, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), precision=HIGH)
    return _postproc(out[:, :T, :K], out[:, :T, K:])


print(f"n_clips={N_CLIPS}  T={T}  support={support}  q={q}")
ref_small = np.asarray(current(jnp.asarray(clips[:2])))
xs = jnp.asarray(clips)
for name, fn in [("current dft_high", current), ("chunked", chunked),
                 ("conv", conv)]:
    try:
        err = float(np.max(np.abs(np.asarray(fn(jnp.asarray(clips[:2])))
                                  - ref_small)))
        t = _time(lambda: float(fn(xs)[0, 0, 0]))
        print(f"{name:18s}: {t*1e3:6.1f} ms  ({N_CLIPS/t:6.0f} clips/s)  "
              f"max|mel err| vs current = {err:.2e}")
    except Exception as e:  # noqa: BLE001 - probe keeps going
        print(f"{name:18s}: FAILED {type(e).__name__}: {e}")
