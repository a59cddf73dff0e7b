"""Neural-vocoder gate (real chip or CPU): train the MelGAN generator with
the multi-resolution STFT loss on the synthetic corpus, then compare its
full-utterance mel->wav spectral distance to gold against the serving
Griffin-Lim path (mel -> pseudo-inverse mag lift -> 60-iter GL -> wav) on
held-out items. Gate: the neural vocoder's spectral convergence must beat
the Griffin-Lim path's.

Run: python scripts/melgan_check.py [--vocoder_steps N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.audio import dsp
from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.models import melgan as G
from unast_tpu.train.melgan import (crop_batch, init_voc_state,
                                    make_vocoder_step, mr_stft_loss)

_argv = sys.argv[1:]


def _pop(name, default):
    if name in _argv:
        i = _argv.index(name)
        v = int(_argv[i + 1])
        del _argv[i:i + 2]
        return v
    return default


STEPS = _pop("--vocoder_steps", 1500)
TRAIN_N = _pop("--train_n", 8)


class A:
    lr = 5e-4
    melgan_base = 256


EVAL_N = 4
ds = SyntheticSpeechDataset(size=TRAIN_N + EVAL_N, seed=0)
train_ds = [ds[i] for i in range(TRAIN_N)]
eval_items = [ds[TRAIN_N + i] for i in range(EVAL_N)]

vs = init_voc_state(jax.random.PRNGKey(0), A())
print(f"generator params: {G.num_params(vs.params)}")
step = jax.jit(make_vocoder_step(A()), donate_argnums=(0,))
rng = np.random.default_rng(0)
for i in range(STEPS):
    mel, wav = crop_batch(train_ds, rng, 16, 40, P.hop_length)
    vs, m = step(vs, jnp.asarray(mel), jnp.asarray(wav))
    if (i + 1) % 100 == 0:
        print(f"step {i + 1}: " + " ".join(
            f"{k.split('/')[-1]} {float(v):.4f}"
            for k, v in sorted(m.items()) if k != "grad_norm"))

# ---- held-out full-utterance comparison ----
FR = 96  # fixed eval frame bucket (one compile each path)
voc = jax.jit(lambda p, m: G.melgan_forward(p, m))
lift = jnp.asarray(dsp.mel_to_mag_pseudo_inverse(P))
gl = jax.jit(lambda m: jax.vmap(
    lambda x: dsp._mag_to_wav_core(x, P))(jnp.clip(m @ lift, 1e-8, 1.0)))

nn_sc, gl_sc = [], []
for it in eval_items:
    t = min(FR, it["mel"].shape[0], len(it["wav"]) // P.hop_length)
    mel = np.zeros((1, FR, 80), np.float32)
    mel[0, :t] = it["mel"][:t]
    gold = np.zeros((1, FR * P.hop_length), np.float32)
    gold[0, :t * P.hop_length] = it["wav"][:t * P.hop_length]
    wav_nn = np.asarray(voc(vs.params, jnp.asarray(mel)))
    wav_gl = np.asarray(gl(jnp.asarray(mel)))[:, :FR * P.hop_length]
    if wav_gl.shape[1] < FR * P.hop_length:
        wav_gl = np.pad(wav_gl, ((0, 0),
                                 (0, FR * P.hop_length - wav_gl.shape[1])))
    _, sc1 = mr_stft_loss(jnp.asarray(wav_nn), jnp.asarray(gold))
    _, sc2 = mr_stft_loss(jnp.asarray(wav_gl), jnp.asarray(gold))
    nn_sc.append(float(sc1))
    gl_sc.append(float(sc2))

nn_m, gl_m = float(np.mean(nn_sc)), float(np.mean(gl_sc))
print(f"held-out spectral convergence to gold: neural {nn_m:.4f} "
      f"vs griffin-lim-path {gl_m:.4f}")
ok = nn_m < gl_m
print(f"GATE {'PASS' if ok else 'FAIL'} (neural beats GL path: {ok})")
sys.exit(0 if ok else 1)
