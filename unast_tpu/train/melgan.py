"""Neural-vocoder trainer: MelGAN generator + multi-resolution STFT loss.

Trains models/melgan.py to invert mel spectrograms to raw waveforms with
the Parallel-WaveGAN objective (Yamamoto et al. 2020): spectral-convergence
+ log-magnitude L1 at several STFT resolutions, plus a small time-domain
L1. No discriminator — the multi-res STFT loss alone trains a usable
vocoder and keeps the step a single fwd/bwd (an adversarial term can be
layered on with the package's existing discriminators later).

Replaces the reference's wav path (CBHG magnitudes + 60-iteration
Griffin-Lim, src/utils.py:61-103) with one conv forward pass.

Training samples are fixed-length (mel, wav) crops: mel frame t of the
reference DSP is centered at sample t*hop (center-padded analysis), so the
segment wav[t0*hop : (t0+F)*hop] pairs with mel[t0 : t0+F] — the standard
neural-vocoder crop alignment.

CLI: python -m unast_tpu.train.melgan [--vocoder_steps N] [--synthetic]
Gate: scripts/melgan_check.py (loss convergence + beats the Griffin-Lim
baseline's spectral distance to the gold wav).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio.dsp import frame_signal
from ..models import melgan as G

RESOLUTIONS = ((512, 128), (1024, 256), (2048, 512))


def stft_mag(y, n_fft: int, hop: int):
    """y: [B, n] -> magnitudes [B, T, n_fft//2+1] (hann, no padding)."""
    window = jnp.asarray(np.hanning(n_fft).astype(np.float32))

    def one(v):
        frames = frame_signal(v, n_fft, hop) * window[None, :]
        return jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=1))

    return jax.vmap(one)(y.astype(jnp.float32))


def mr_stft_loss(pred, gold):
    """Multi-resolution STFT loss: mean over RESOLUTIONS of
    spectral convergence + log-magnitude L1. Returns (loss, sc_mean)."""
    eps = 1e-7
    scs, mags = [], []
    for n_fft, hop in RESOLUTIONS:
        pm = stft_mag(pred, n_fft, hop)
        gm = stft_mag(gold, n_fft, hop)
        sc = (jnp.linalg.norm((gm - pm).reshape(gm.shape[0], -1), axis=1)
              / jnp.maximum(
                  jnp.linalg.norm(gm.reshape(gm.shape[0], -1), axis=1), eps))
        scs.append(jnp.mean(sc))
        mags.append(jnp.mean(jnp.abs(jnp.log(gm + eps) - jnp.log(pm + eps))))
    sc_mean = sum(scs) / len(scs)
    return sc_mean + sum(mags) / len(mags), sc_mean


class VocTrainState(NamedTuple):
    params: dict
    opt: object
    step: jnp.ndarray


def _voc_tx(args):
    """Vocoder optimizer: AdamW behind global-norm clipping. Clipping is
    load-bearing for the MRF (HiFi-GAN) generator: without it a single
    gradient spike saturates the output tanh (l1 pins at exactly 1.0,
    tanh grads die, training freezes — observed at step ~3000 of an
    otherwise-converging run); steady-state norms sit well under the
    default 5.0, so MelGAN results are unchanged."""
    clip = float(getattr(args, "vocoder_grad_clip", 5.0) or 0.0)
    tx = optax.adamw(float(getattr(args, "lr", 1e-4) or 1e-4))
    if clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


def init_voc_state(key, args, n_mels: int = 80) -> VocTrainState:
    params = G.generator_init(
        key, kind=str(getattr(args, "melgan_gen", "") or "melgan"),
        n_mels=n_mels, base=int(getattr(args, "melgan_base", 0) or 256))
    tx = _voc_tx(args)
    return VocTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def make_vocoder_step(args, wav_l1_weight: float = 1.0):
    tx = _voc_tx(args)

    def step(vs: VocTrainState, mel, wav):
        def loss_fn(params):
            pred = G.generator_forward(params, mel)
            stft, sc = mr_stft_loss(pred, wav)
            l1 = jnp.mean(jnp.abs(pred.astype(jnp.float32)
                                  - wav.astype(jnp.float32)))
            return stft + wav_l1_weight * l1, {"voc/stft": stft,
                                               "voc/sc": sc, "voc/l1": l1}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(vs.params)
        updates, opt = tx.update(grads, vs.opt, vs.params)
        params = optax.apply_updates(vs.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return VocTrainState(params, opt, vs.step + 1), metrics

    return step


class AdvTrainState(NamedTuple):
    gen: dict
    gen_opt: object
    disc: list
    disc_opt: object
    step: jnp.ndarray


def init_adv_state(key, vs: VocTrainState, args) -> AdvTrainState:
    """Continue from an STFT-pretrained generator (MelGAN recipe: the
    adversarial phase fine-tunes, it does not train from scratch here).
    `--melgan_disc` picks the discriminator family: 'msd' (MelGAN
    multi-scale, default), 'mpd' (HiFi-GAN multi-period), 'msd+mpd'."""
    disc = G.adv_disc_init(key, str(getattr(args, "melgan_disc", "")
                                    or "msd"))
    g_tx, d_tx = _voc_tx(args), _voc_tx(args)
    return AdvTrainState(vs.params, g_tx.init(vs.params), disc,
                         d_tx.init(disc), jnp.zeros((), jnp.int32))


def make_adversarial_step(args, fm_weight: float = 10.0,
                          stft_weight: float = 1.0):
    """Hinge-GAN fine-tune step (MelGAN objective + the multi-res STFT
    term kept as a stabilizer, Parallel-WaveGAN style): updates the
    discriminator on (real, stopgrad(fake)), then the generator against
    the updated discriminator — both inside ONE jitted call."""
    g_tx, d_tx = _voc_tx(args), _voc_tx(args)

    def step(ts: AdvTrainState, mel, wav):
        fake = G.generator_forward(ts.gen, mel)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(disc):
            loss = 0.0
            for (_, lr_), (_, lf) in zip(G.adv_disc_forward(disc, wav),
                                         G.adv_disc_forward(disc,
                                                            fake_sg)):
                loss += (jnp.mean(jax.nn.relu(1.0 - lr_))
                         + jnp.mean(jax.nn.relu(1.0 + lf)))
            return loss

        d_grads = jax.grad(d_loss_fn)(ts.disc)
        d_up, d_opt = d_tx.update(d_grads, ts.disc_opt, ts.disc)
        disc = optax.apply_updates(ts.disc, d_up)

        def g_loss_fn(gen):
            pred = G.generator_forward(gen, mel)
            stft, sc = mr_stft_loss(pred, wav)
            adv = 0.0
            fm = 0.0
            real_outs = G.adv_disc_forward(disc, wav)
            fake_outs = G.adv_disc_forward(disc, pred)
            for (fr, _), (ff, lf) in zip(real_outs, fake_outs):
                adv += -jnp.mean(lf)
                for a, b in zip(fr, ff):
                    fm += jnp.mean(jnp.abs(jax.lax.stop_gradient(a) - b))
            loss = stft_weight * stft + adv + fm_weight * fm
            return loss, {"adv/g": adv, "adv/fm": fm, "voc/stft": stft,
                          "voc/sc": sc}

        g_grads, metrics = jax.grad(g_loss_fn, has_aux=True)(ts.gen)
        g_up, g_opt = g_tx.update(g_grads, ts.gen_opt, ts.gen)
        gen = optax.apply_updates(ts.gen, g_up)
        metrics["adv/d"] = d_loss_fn(disc)
        return AdvTrainState(gen, g_opt, disc, d_opt, ts.step + 1), metrics

    return step


def crop_batch(ds, rng: np.random.Generator, batch: int, frames: int,
               hop: int):
    """Random aligned (mel [B, F, 80], wav [B, F*hop]) crops from dataset
    items carrying a 'wav' key. If `ds` exposes the window-read protocol
    (crop_lens/crop_pair — data/shard.py::MelWavCrops over packed mmap
    shards) only the crop window's bytes are touched per draw, instead of
    decoding whole files; the rng draw sequence is identical on both
    paths, so the same seed yields the same crops."""
    fast = hasattr(ds, "crop_pair")
    mels, wavs = [], []
    for _ in range(batch):
        i = int(rng.integers(len(ds)))
        if fast:
            mf, ns = ds.crop_lens(i)
            t_max = max(1, min(mf - frames, ns // hop - frames))
            t0 = int(rng.integers(t_max)) if t_max > 1 else 0
            m, w = ds.crop_pair(i, t0, frames, hop)
        else:
            it = ds[i]
            mel, wav = it["mel"], it["wav"]
            t_max = max(1, min(mel.shape[0] - frames,
                               len(wav) // hop - frames))
            t0 = int(rng.integers(t_max)) if t_max > 1 else 0
            m = mel[t0:t0 + frames]
            w = wav[t0 * hop:(t0 + frames) * hop]
            if m.shape[0] < frames:  # short utterance: zero-pad
                m = np.pad(m, ((0, frames - m.shape[0]), (0, 0)))
            if len(w) < frames * hop:
                w = np.pad(w, (0, frames * hop - len(w)))
        mels.append(m)
        wavs.append(w)
    return (np.stack(mels).astype(np.float32),
            np.stack(wavs).astype(np.float32))


def main(argv=None):
    import os

    from ..audio.params import DEFAULT as P
    from ..data.dataset import SyntheticSpeechDataset
    from .checkpoint import save_ckp
    from .config import parse_with_config

    args = parse_with_config(argv)
    n_steps = int(getattr(args, "vocoder_steps", 0) or 2000)
    frames = int(getattr(args, "vocoder_crop_frames", 0) or 40)
    bs = args.train_batch_size

    ds = SyntheticSpeechDataset(size=int(args.synthetic_size), seed=0)
    vs = init_voc_state(jax.random.PRNGKey(0), args)
    gen_kind = str(getattr(args, "melgan_gen", "") or "melgan")
    print(f"{gen_kind} generator: {G.num_params(vs.params)} params")
    step = jax.jit(make_vocoder_step(args), donate_argnums=(0,))
    rng = np.random.default_rng(args.seed)
    for i in range(n_steps):
        mel, wav = crop_batch(ds, rng, bs, frames, P.hop_length)
        vs, m = step(vs, jnp.asarray(mel), jnp.asarray(wav))
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: " + " ".join(
                f"{k} {float(v):.4f}" for k, v in sorted(m.items())))

    adv_steps = int(getattr(args, "melgan_adv_steps", 0) or 0)
    if adv_steps > 0:
        # MelGAN recipe: hinge-GAN + feature-matching fine-tune on top of
        # the STFT-pretrained generator.
        ats = init_adv_state(jax.random.PRNGKey(1), vs, args)
        a_step = jax.jit(make_adversarial_step(args), donate_argnums=(0,))
        for i in range(adv_steps):
            mel, wav = crop_batch(ds, rng, bs, frames, P.hop_length)
            ats, m = a_step(ats, jnp.asarray(mel), jnp.asarray(wav))
            if (i + 1) % 100 == 0:
                print(f"adv step {i + 1}: " + " ".join(
                    f"{k} {float(v):.4f}" for k, v in sorted(m.items())))
        # checkpoint the adversarial optimizer state with the fine-tuned
        # generator — pairing ats.gen with the stale pre-adversarial
        # vs.opt would resume with mismatched Adam moments
        vs = VocTrainState(ats.gen, ats.gen_opt, ats.step)

    if args.checkpoint_path:
        save_ckp(0, float(m["voc/sc"]), vs, True, args.checkpoint_path)
    return vs


if __name__ == "__main__":
    main()
