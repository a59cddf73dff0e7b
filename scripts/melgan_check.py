"""Neural-vocoder gate (real chip or CPU): train the MelGAN generator with
the multi-resolution STFT loss on the synthetic corpus, then compare its
full-utterance mel->wav quality to gold against the serving Griffin-Lim
path (mel -> pseudo-inverse mag lift -> 60-iter GL -> wav) on held-out
items, on TWO metrics: multi-res-STFT spectral convergence (envelope) and
mel-cepstral distortion (spectral shape, audio/metrics.py). Gate: the
neural vocoder beats the Griffin-Lim path on both.

--adv_steps N > 0 additionally runs the hinge-GAN + feature-matching
fine-tune (train/melgan.py adversarial phase) and reports a third row —
the measured A/B of what adversarial training buys at this corpus size.

Run: python scripts/melgan_check.py [--vocoder_steps N] [--train_n N]
     [--adv_steps N]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.audio import dsp
from unast_tpu.audio.metrics import mcd_wav
from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.models import melgan as G
from unast_tpu.train.melgan import (crop_batch, init_adv_state,
                                    init_voc_state, make_adversarial_step,
                                    make_vocoder_step, mr_stft_loss)

_argv = sys.argv[1:]


def _pop(name, default):
    if name in _argv:
        i = _argv.index(name)
        v = int(_argv[i + 1])
        del _argv[i:i + 2]
        return v
    return default


def _pop_str(name, default):
    if name in _argv:
        i = _argv.index(name)
        v = _argv[i + 1]
        del _argv[i:i + 2]
        return v
    return default


STEPS = _pop("--vocoder_steps", 1500)
TRAIN_N = _pop("--train_n", 8)
ADV_STEPS = _pop("--adv_steps", 0)
DISC = _pop_str("--disc", "msd")  # msd | mpd | msd+mpd (--adv_steps > 0)
GEN = _pop_str("--gen", "melgan")  # melgan | hifigan generator family


class A:
    # HiFi-GAN-paper-adjacent LR for the deeper MRF stacks; MelGAN keeps
    # the round-2 recipe (its recorded numbers stay reproducible)
    lr = 2e-4 if GEN == "hifigan" else 5e-4
    melgan_base = 256
    melgan_gen = GEN


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

# ---- optional adversarial fine-tune (kept as a separate param set so
# the A/B below scores both generators on the same held-out items) ----
adv_params = None
if ADV_STEPS > 0:

    class AV(A):
        lr = 1e-4  # fine-tune rate
        melgan_disc = DISC

    # hand init_adv_state a COPY of the STFT-only generator: it aliases
    # the params into ats.gen, and the donated a_step would delete the
    # buffers vs.params still points at (needed for the A/B below)
    vs_copy = vs._replace(
        params=jax.tree_util.tree_map(jnp.array, vs.params))
    ats = init_adv_state(jax.random.PRNGKey(1), vs_copy, AV())
    a_step = jax.jit(make_adversarial_step(AV()), donate_argnums=(0,))
    for i in range(ADV_STEPS):
        mel, wav = crop_batch(train_ds, rng, 16, 40, P.hop_length)
        ats, m = a_step(ats, jnp.asarray(mel), jnp.asarray(wav))
        if (i + 1) % 100 == 0:
            print(f"adv step {i + 1}: " + " ".join(
                f"{k.split('/')[-1]} {float(v):.4f}"
                for k, v in sorted(m.items()) if k != "grad_norm"))
    adv_params = ats.gen

# ---- held-out full-utterance comparison ----
FR = 96  # fixed eval frame bucket (one compile each path)
voc = jax.jit(lambda p, m: G.generator_forward(p, m))
lift = jnp.asarray(dsp.mel_to_mag_pseudo_inverse(P))
gl = jax.jit(lambda m: jax.vmap(
    lambda x: dsp._mag_to_wav_core(x, P))(jnp.clip(m @ lift, 1e-8, 1.0)))

NN = f"{GEN}-stft"
rows = {"griffin-lim": ([], []), NN: ([], [])}
if adv_params is not None:
    rows[f"{NN}+adv({DISC})"] = ([], [])
for it in eval_items:
    t = min(FR, it["mel"].shape[0], len(it["wav"]) // P.hop_length)
    mel = np.zeros((1, FR, 80), np.float32)
    mel[0, :t] = it["mel"][:t]
    gold = np.zeros((1, FR * P.hop_length), np.float32)
    gold[0, :t * P.hop_length] = it["wav"][:t * P.hop_length]
    wavs = {NN: np.asarray(voc(vs.params, jnp.asarray(mel)))}
    if adv_params is not None:
        wavs[f"{NN}+adv({DISC})"] = np.asarray(voc(adv_params,
                                                 jnp.asarray(mel)))
    wav_gl = np.asarray(gl(jnp.asarray(mel)))[:, :FR * P.hop_length]
    if wav_gl.shape[1] < FR * P.hop_length:
        wav_gl = np.pad(wav_gl, ((0, 0),
                                 (0, FR * P.hop_length - wav_gl.shape[1])))
    wavs["griffin-lim"] = wav_gl
    for name, w in wavs.items():
        _, sc = mr_stft_loss(jnp.asarray(w), jnp.asarray(gold))
        rows[name][0].append(float(sc))
        rows[name][1].append(mcd_wav(gold[0], w[0], P))

print("held-out quality vs gold (lower = better):")
means = {}
for name, (scs, mcds) in rows.items():
    means[name] = (float(np.mean(scs)), float(np.mean(mcds)))
    print(f"  {name:18s} SC {means[name][0]:7.4f}   MCD {means[name][1]:6.2f} dB")
nn_m, gl_m = means[NN][0], means["griffin-lim"][0]
nn_mcd, gl_mcd = means[NN][1], means["griffin-lim"][1]
ok = nn_m < gl_m and nn_mcd < gl_mcd
print(f"GATE {'PASS' if ok else 'FAIL'} "
      f"(neural beats GL path on SC: {nn_m < gl_m}, MCD: {nn_mcd < gl_mcd})")
sys.exit(0 if ok else 1)
