"""GTA vocoder fine-tune: close the FULL audio loop (VERDICT r4 item 3).

The round-4 chain reads NAR mels at held-out PER 0.040 but the deployed
loop (NAR -> HiFi-GAN -> wav -> DSP -> ASR) at 0.137: the vocoder had
only ever seen gold mels, and regression-smoothed NAR synthesis is
out-of-domain for it. The standard fix (Tacotron-2 / FastSpeech
practice) is Ground-Truth-Aligned fine-tuning: run the NAR model with
TEACHER durations so its output mel aligns frame-for-frame with the gold
waveform, then fine-tune the vocoder on (GTA mel, gold wav) pairs. On
this corpus the teacher durations are the exact uniform grid the distill
itself trained on (`--dur_source uniform`, train/fastspeech.py:69-77),
so GTA alignment is exact.

Fine-tunes from the gold-trained generator (warm start) on a
--gta_mix/1-gta_mix mixture of GTA and gold crops (the mixture guards
the vocoded-GOLD quality against regression), multi-resolution STFT +
L1 objective (train/melgan.py — the same recipe that trained the warm
start). Reports held-out SC/MCD for gold-mel and GTA-mel inputs, before
and after. The loop-PER gate itself is scripts/ctc_nar_adapt.py
--vocoder <save_path> --loop_mels, run after this.

Run (chip): python scripts/gta_vocoder_finetune.py [--steps 2000]
"""
import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--shard", default="/root/rehearsal/full_train.unsh")
ap.add_argument("--wav_shard", default="/root/rehearsal/full_train.unwv")
ap.add_argument("--metadata", default="/root/rehearsal/metadata.csv")
ap.add_argument("--nar", default="/root/rehearsal/nar_pv.pkl")
ap.add_argument("--vocoder", default="/root/rehearsal/vocoder_hifigan.pkl",
                help="gold-trained generator pickle (warm start)")
ap.add_argument("--gen", default="hifigan", choices=["melgan", "hifigan"])
ap.add_argument("--heldout", type=int, default=512,
                help="held-out tail size (must match the training scripts)")
ap.add_argument("--train_n", type=int, default=2048,
                help="TRAIN clips rendered to GTA mels")
ap.add_argument("--steps", type=int, default=2000)
ap.add_argument("--bs", type=int, default=16)
ap.add_argument("--frames", type=int, default=40)
ap.add_argument("--lr", type=float, default=1e-4)
ap.add_argument("--gta_mix", type=float, default=0.5,
                help="fraction of each batch drawn from GTA crops")
ap.add_argument("--eval_n", type=int, default=16)
ap.add_argument("--log_every", type=int, default=400)
ap.add_argument("--save_path", default="/root/rehearsal/vocoder_gta.pkl")
ap.add_argument("--oracle_durs", default="",
                help="trim-offset-corrected oracle sidecar "
                     "(scripts/fix_noisy_oracle.py) — REQUIRED on "
                     "--realism corpora, where the uniform grid is no "
                     "longer the true alignment (the trim keeps a "
                     "~13-19-frame breath/lead prefix on token 0)")
A = ap.parse_args()

from unast_tpu.train.config import (apply_runtime_flags,
                                    model_config_from_args,
                                    parse_with_config)
from unast_tpu.audio import dsp
from unast_tpu.audio.metrics import mcd_wav
from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.data.shard import PackedShardDataset, WavShardDataset
from unast_tpu.models import fastspeech as F
from unast_tpu.models import melgan as G
from unast_tpu.models.fastspeech import load_nar_pickle
from unast_tpu.text import raw_text_to_phoneme_ids
from unast_tpu.train.melgan import (VocTrainState, _voc_tx, crop_batch,
                                    init_voc_state, make_vocoder_step,
                                    mr_stft_loss)
from unast_tpu import nn

args = parse_with_config([
    "--use_discriminator", "false",
    "--max_mel_len", "816", "--max_text_len", "304",
    "--data_mel_len", "816", "--data_text_len", "304",
    "--compute_dtype", "bfloat16", "--fast_prng", "true"])
apply_runtime_flags(args)
cfg = model_config_from_args(args)
TM, TT = cfg.max_mel_len, cfg.max_text_len

full = PackedShardDataset(A.shard)
wavs = WavShardDataset(A.wav_shard)
n_items = len(full)
assert len(wavs) == n_items, (len(wavs), n_items)
with open(A.metadata, encoding="utf-8") as f:
    meta_rows = [ln.rstrip("\n").split("|") for ln in f if ln.strip()]
assert len(meta_rows) == n_items

nar_params, nar_state = load_nar_pickle(A.nar)

rng = np.random.default_rng(0)
train_idx = rng.permutation(n_items - A.heldout)[:A.train_n]
eval_idx = list(range(n_items - A.heldout,
                      n_items - A.heldout + A.eval_n))


oracle_frames = None
if A.oracle_durs:
    _fids = [r[0] for r in meta_rows]
    _dz = np.load(A.oracle_durs)
    oracle_frames = []
    for fid in _fids:
        _d = _dz[fid].astype(np.int64)
        _fb = np.round(np.cumsum(_d) / float(P.hop_length)).astype(np.int32)
        oracle_frames.append(np.diff(np.concatenate([[0], _fb]))
                             .astype(np.int32))


@jax.jit
def gta_mels(params, state, text, tlen, durs):
    """NAR forward under teacher durations -> post mel aligned
    frame-for-frame with the gold mel/wav (GTA synthesis)."""
    (pre, post, out_lens, _), _ = F.fastspeech_forward(
        params, state, nn.Ctx.eval(), cfg, text, tlen,
        durations=durs, max_len=TM)
    return post.astype(jnp.float32), out_lens


def pack_texts(idx):
    """-> (text [B,TT], tlen, mlen, durs [B,TT] frames). Teacher
    durations: the corrected oracle sidecar when given (realism
    corpora), else the exact uniform grid (train/fastspeech.py:69-77)."""
    txt = np.zeros((len(idx), TT), np.int32)
    tlen = np.zeros((len(idx),), np.int32)
    mlen = np.zeros((len(idx),), np.int32)
    durs = np.zeros((len(idx), TT), np.int32)
    for j, i in enumerate(idx):
        ids = np.asarray(raw_text_to_phoneme_ids(meta_rows[i][1]), np.int32)
        L = min(TT, len(ids))
        txt[j, :L] = ids[:L]
        tlen[j] = L
        mlen[j] = min(TM, full[int(i)]["mel"].shape[0])
        if oracle_frames is not None:
            fr = oracle_frames[int(i)]
            Lf = min(L, len(fr))
            durs[j, :Lf] = fr[:Lf]
        else:
            bounds = np.round(np.arange(L + 1) * mlen[j]
                              / max(1, L)).astype(np.int64)
            durs[j, :L] = np.diff(bounds).astype(np.int32)
    return txt, tlen, mlen, durs


class GtaItems:
    """{'mel','wav'} items: GTA mel (fp16 in RAM) + gold wav (shard
    window reads), aligned on the shared frame grid."""

    def __init__(self, mels, wav_ds, idx):
        self.mels = mels          # list of fp16 [t, 80]
        self.wav_ds = wav_ds
        self.idx = list(idx)

    def __len__(self):
        return len(self.mels)

    def __getitem__(self, j):
        m = self.mels[j].astype(np.float32)
        w = self.wav_ds.crop(int(self.idx[j]), 0, m.shape[0] * P.hop_length)
        return {"mel": m, "wav": w}


class GoldCrops:
    """Gold (mel, wav) items over shard indices (per-item, small n)."""

    def __init__(self, mel_ds, wav_ds, idx):
        self.mel_ds, self.wav_ds, self.idx = mel_ds, wav_ds, list(idx)

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, j):
        i = int(self.idx[j])
        m = np.asarray(self.mel_ds[i]["mel"], np.float32)
        w = self.wav_ds.crop(i, 0, m.shape[0] * P.hop_length)
        return {"mel": m, "wav": w}


# ---- render GTA mels for the train subset ----
t0 = time.perf_counter()
gta_train = []
B = 32
for c0 in range(0, len(train_idx), B):
    chunk = train_idx[c0:c0 + B]
    txt, tlen, mlen, durs = pack_texts(chunk)
    post, _ = gta_mels(nar_params, nar_state, jnp.asarray(txt),
                       jnp.asarray(tlen), jnp.asarray(durs))
    post = np.asarray(post)
    for j, i in enumerate(chunk):
        t = min(mlen[j], int(durs[j].sum()))
        gta_train.append(post[j, :t].astype(np.float16))
print(f"rendered {len(gta_train)} GTA train mels in "
      f"{time.perf_counter() - t0:.0f}s", flush=True)

gta_items = GtaItems(gta_train, wavs, train_idx)
gold_items = GoldCrops(full, wavs, np.arange(0, n_items - A.heldout))


# ---- warm-start fine-tune ----
class VA:
    lr = A.lr
    melgan_base = 256
    melgan_gen = A.gen


with open(A.vocoder, "rb") as f:
    warm = pickle.load(f)
tx = _voc_tx(VA())
vs = VocTrainState(warm, tx.init(warm), jnp.zeros((), jnp.int32))
step = jax.jit(make_vocoder_step(VA()), donate_argnums=(0,))

n_gta = max(1, int(round(A.bs * A.gta_mix)))
t0 = time.perf_counter()
for i in range(A.steps):
    mg, wg = crop_batch(gta_items, rng, n_gta, A.frames, P.hop_length)
    md, wd = crop_batch(gold_items, rng, A.bs - n_gta, A.frames,
                        P.hop_length)
    mel = np.concatenate([mg, md])
    wav = np.concatenate([wg, wd])
    vs, m = step(vs, jnp.asarray(mel), jnp.asarray(wav))
    if i == 0:
        float(m["voc/sc"])
        print(f"first step (incl. compile): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
    if (i + 1) % A.log_every == 0:
        print(f"step {i + 1}: " + " ".join(
            f"{k.split('/')[-1]} {float(v):.4f}"
            for k, v in sorted(m.items()) if k != "grad_norm"), flush=True)
train_s = time.perf_counter() - t0

with open(A.save_path, "wb") as f:
    pickle.dump(jax.tree_util.tree_map(np.asarray, vs.params), f)
print(f"saved GTA-tuned vocoder -> {A.save_path}")

# ---- held-out scoring: gold-mel and GTA-mel inputs, warm vs tuned ----
FR = 96
voc = jax.jit(lambda p, m: G.generator_forward(p, m))
txt, tlen, mlen, durs_ev = pack_texts(eval_idx)
post, _ = gta_mels(nar_params, nar_state, jnp.asarray(txt),
                   jnp.asarray(tlen), jnp.asarray(durs_ev))
post = np.asarray(post)

scores = {}
for pname, pp in (("warm", warm), ("tuned", vs.params)):
    for mname in ("gold", "gta"):
        scs, mcds = [], []
        for j, i in enumerate(eval_idx):
            gold_mel = np.asarray(full[int(i)]["mel"], np.float32)
            m_in = gold_mel if mname == "gold" else post[j, :mlen[j]]
            t = min(FR, m_in.shape[0], gold_mel.shape[0])
            mel = np.zeros((1, FR, P.num_mels), np.float32)
            mel[0, :t] = m_in[:t]
            gold = np.zeros((1, FR * P.hop_length), np.float32)
            gw = wavs.crop(int(i), 0, t * P.hop_length)
            gold[0, :t * P.hop_length] = gw
            w = np.asarray(voc(pp, jnp.asarray(mel)))
            _, sc = mr_stft_loss(jnp.asarray(w), jnp.asarray(gold))
            scs.append(float(sc))
            mcds.append(mcd_wav(gold[0], w[0], P))
        scores[f"{pname}_{mname}"] = {
            "sc": round(float(np.mean(scs)), 4),
            "mcd": round(float(np.mean(mcds)), 2)}
        print(f"  {pname:5s} on {mname:4s} mels: SC "
              f"{scores[f'{pname}_{mname}']['sc']:7.4f}  MCD "
              f"{scores[f'{pname}_{mname}']['mcd']:6.2f} dB", flush=True)

result = {"steps": A.steps, "train_n": A.train_n, "gta_mix": A.gta_mix,
          "train_s": round(train_s, 1), "heldout": scores}
print("RESULT", json.dumps(result))
