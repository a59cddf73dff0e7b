"""Corpus-scale vocoder quality (round 3): train the neural vocoder with
the multi-resolution STFT objective over the 12,500-clip rehearsal corpus
(scripts/corpus_rehearsal.py workdir: wavs/ + mel_cache/ over the REAL
LJSpeech transcripts, shape-matched synthetic audio), then score held-out
full-utterance mel->wav quality vs gold on the same two metrics as the
small-corpus gate (scripts/melgan_check.py): multi-res-STFT spectral
convergence (envelope) and MCD (spectral shape, audio/metrics.py), against
the Griffin-Lim serving path.

This is the data-scaling datapoint the round-2/3 ladder predicts:
8 utts -> SC 0.91, 32 utts -> 0.16 (MelGAN) / 0.077 (HiFi-GAN); here the
generator sees the full reference-scale corpus.

Run (chip): python scripts/corpus_vocoder.py [--steps 4000] [--gen hifigan]
  [--workdir /root/rehearsal] [--heldout 64] [--eval_n 16]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--workdir", default="/root/rehearsal")
ap.add_argument("--steps", type=int, default=4000)
ap.add_argument("--gen", default="hifigan", choices=["melgan", "hifigan"])
ap.add_argument("--bs", type=int, default=16)
ap.add_argument("--frames", type=int, default=40)
ap.add_argument("--no_shards", action="store_true",
                help="force the per-file load path (default: use/build "
                     "the packed mel+wav shards and window-read crops)")
ap.add_argument("--heldout", type=int, default=64)
ap.add_argument("--eval_n", type=int, default=16)
ap.add_argument("--log_every", type=int, default=500)
ap.add_argument("--save_path", default="",
                help="pickle the trained generator params — the "
                     "Synthesizer(melgan_params=...) serving artifact")
A = ap.parse_args()

from unast_tpu.audio import dsp
from unast_tpu.audio.metrics import mcd_wav
from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.data.prepare import read_wav
from unast_tpu.models import melgan as G
from unast_tpu.train.melgan import (crop_batch, init_voc_state,
                                    make_vocoder_step, mr_stft_loss)


class CorpusVocItems:
    """Lazy {'mel','wav'} items over a rehearsal workdir (mel_cache/*.mel.npy
    + wavs/*.wav), LRU-cached so the random-crop sampler doesn't re-hit
    disk for every draw of a hot item."""

    def __init__(self, workdir: str, names):
        self.workdir = workdir
        self.names = list(names)

    def __len__(self):
        return len(self.names)

    @functools.lru_cache(maxsize=3000)
    def _load(self, name):
        mel = np.load(os.path.join(self.workdir, "mel_cache",
                                   name + ".mel.npy")).astype(np.float32)
        wav = read_wav(os.path.join(self.workdir, "wavs", name + ".wav"))
        # The mel cache was analyzed over the silence-TRIMMED span
        # (dsp._host_prep) — trim the raw wav to the same span, else
        # every crop pair is misaligned on real speech with leading/
        # trailing silence (no-op on the synthetic rehearsal corpora).
        from unast_tpu.audio import ref_dsp
        wav, _ = ref_dsp.trim_silence(wav, P)
        return mel, wav

    def __getitem__(self, i):
        mel, wav = self._load(self.names[i])
        return {"mel": mel, "wav": wav}


mel_shard = os.path.join(A.workdir, "full_train.unsh")
wav_shard = os.path.join(A.workdir, "full_train.unwv")
if not A.no_shards and os.path.exists(mel_shard):
    # Packed-shard path: window reads off two mmaps (shard order ==
    # metadata order == the training scripts' split, so the held-out
    # tail here is the SAME tail the teacher/NAR never saw).
    from unast_tpu.data.prepare import write_wav_shard_from_dir
    from unast_tpu.data.dataset import load_manifest
    from unast_tpu.data.shard import (MelWavCrops, PackedShardDataset,
                                      WavShardDataset)
    if not os.path.exists(wav_shard):
        t0 = time.perf_counter()
        rows = load_manifest(os.path.join(A.workdir, "metadata.csv"))
        write_wav_shard_from_dir(rows, os.path.join(A.workdir, "wavs"),
                                 wav_shard)
        print(f"wav shard built in {time.perf_counter() - t0:.0f}s")
    mel_ds = PackedShardDataset(mel_shard)
    wav_ds = WavShardDataset(wav_shard)
    n = len(mel_ds)
    train_items = MelWavCrops(mel_ds, wav_ds, np.arange(0, n - A.heldout))
    eval_items = MelWavCrops(mel_ds, wav_ds, np.arange(n - A.heldout, n))
    n_clips = n
else:
    names = sorted(f[:-len(".mel.npy")]
                   for f in os.listdir(os.path.join(A.workdir, "mel_cache"))
                   if f.endswith(".mel.npy"))
    train_items = CorpusVocItems(A.workdir, names[:-A.heldout])
    eval_items = CorpusVocItems(A.workdir, names[-A.heldout:])
    n_clips = len(names)
print(f"corpus: {n_clips} clips -> train {len(train_items)}, "
      f"held-out {len(eval_items)} (scoring {A.eval_n}); gen={A.gen}")


class VA:
    lr = 2e-4 if A.gen == "hifigan" else 5e-4
    melgan_base = 256
    melgan_gen = A.gen


vs = init_voc_state(jax.random.PRNGKey(0), VA())
print(f"generator params: {G.num_params(vs.params)}")
step = jax.jit(make_vocoder_step(VA()), donate_argnums=(0,))
rng = np.random.default_rng(0)

t0 = time.perf_counter()
t_host = 0.0
for i in range(A.steps):
    th = time.perf_counter()
    mel, wav = crop_batch(train_items, rng, A.bs, A.frames, P.hop_length)
    t_host += time.perf_counter() - th
    vs, m = step(vs, jnp.asarray(mel), jnp.asarray(wav))
    if i == 0:
        float(m["voc/sc"])
        print(f"first step (incl. compile): {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
    if (i + 1) % A.log_every == 0:
        msg = " ".join(f"{k.split('/')[-1]} {float(v):.4f}"
                       for k, v in sorted(m.items()) if k != "grad_norm")
        print(f"step {i + 1}: {msg}  "
              f"({(i) / max(time.perf_counter() - t0, 1e-9):.1f} steps/s, "
              f"host-data {t_host / max(time.perf_counter() - t0, 1e-9) * 100:.0f}%)")
train_s = time.perf_counter() - t0

if A.save_path:
    import pickle
    with open(A.save_path, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, vs.params), f)
    print(f"saved vocoder params -> {A.save_path}")

# ---- held-out full-utterance scoring (protocol of melgan_check.py) ----
FR = 96  # fixed frame bucket: one compile per path
voc = jax.jit(lambda p, m: G.generator_forward(p, m))
lift = jnp.asarray(dsp.mel_to_mag_pseudo_inverse(P))
gl = jax.jit(lambda m: jax.vmap(
    lambda x: dsp._mag_to_wav_core(x, P))(jnp.clip(m @ lift, 1e-8, 1.0)))

NN = f"{A.gen}-stft"
rows = {"griffin-lim": ([], []), NN: ([], [])}
for j in range(min(A.eval_n, len(eval_items))):
    it = eval_items[j]
    t = min(FR, it["mel"].shape[0], len(it["wav"]) // P.hop_length)
    mel = np.zeros((1, FR, 80), np.float32)
    mel[0, :t] = it["mel"][:t]
    gold = np.zeros((1, FR * P.hop_length), np.float32)
    gold[0, :t * P.hop_length] = it["wav"][:t * P.hop_length]
    wavs = {NN: np.asarray(voc(vs.params, jnp.asarray(mel)))}
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
    means[name] = (round(float(np.mean(scs)), 4),
                   round(float(np.mean(mcds)), 2))
    print(f"  {name:16s} SC {means[name][0]:7.4f}   "
          f"MCD {means[name][1]:6.2f} dB")
result = {"steps": A.steps, "gen": A.gen, "train_clips": len(train_items),
          "train_s": round(train_s, 1), "heldout": means}
print("RESULT", json.dumps(result))
