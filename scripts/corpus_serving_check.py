"""Corpus-scale SERVING check (round 3): the production one-pass stack on
REAL held-out LJSpeech transcripts, built entirely from corpus-trained
artifacts (the round-3 evidence chain):

  --teacher  scripts/corpus_convergence.py --save_path   (AR + hybrid-CTC)
  --nar      scripts/corpus_nar_distill.py --save_path   (FastSpeech pv)
  --vocoder  scripts/corpus_vocoder.py --save_path       (neural generator)

Measures, at the serving-optimal configuration (NAR one-pass mels +
neural vocoder + device PCM16, Synthesizer of infer/serve.py):

  1. text->wav THROUGHPUT (utt/s, wall clock through the tunnel) at --bs,
     raw text in (G2P included) — the number a deployment sees;
  2. ROUND-TRIP intelligibility: synthesized wav -> package DSP -> one-pass
     CTC ASR (and CTC-drafted speculative AR decode) -> PER vs the input
     phonemization, with the same ASR on GOLD corpus mels as the ceiling;
  3. the spec-decode verify-round histogram at corpus scale.

Run (chip): python scripts/corpus_serving_check.py [--bs 64] [--n 64]
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
ap.add_argument("--metadata", default="/root/rehearsal/metadata.csv")
ap.add_argument("--teacher", default="/root/rehearsal/teacher_ckpt")
ap.add_argument("--nar", default="/root/rehearsal/nar_pv.pkl")
ap.add_argument("--vocoder", default="/root/rehearsal/vocoder_hifigan.pkl")
ap.add_argument("--heldout", type=int, default=512,
                help="held-out tail size (must match the training scripts)")
ap.add_argument("--n", type=int, default=64, help="held-out texts scored")
ap.add_argument("--bs", type=int, default=64)
ap.add_argument("--reps", type=int, default=3, help="timed tts() passes")
ap.add_argument("--ctc_weight", type=float, default=0.5)
ap.add_argument("--fast_prng", default="true")
A = ap.parse_args()

from unast_tpu.train.config import (apply_runtime_flags,
                                    model_config_from_args,
                                    parse_with_config)
from unast_tpu.train.checkpoint import load_ckp
from unast_tpu.train.steps import init_train_state
from unast_tpu.data.shard import PackedShardDataset
from unast_tpu.infer.metrics import compute_per
from unast_tpu.infer.serve import Synthesizer
from unast_tpu.audio import dsp
from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.text import raw_text_to_phoneme_ids

args = parse_with_config([
    "--use_discriminator", "false",
    "--max_mel_len", "816", "--max_text_len", "304",
    "--data_mel_len", "816", "--data_text_len", "304",
    "--compute_dtype", "bfloat16",
    "--ctc_weight", str(A.ctc_weight), "--fast_prng", A.fast_prng])
apply_runtime_flags(args)
cfg = model_config_from_args(args)

# ---- held-out texts (shard tail order == the training scripts' split) ----
full = PackedShardDataset(A.shard)
n_items = len(full)
tail_idx = range(n_items - A.heldout, n_items - A.heldout + A.n)
tail = [full[i] for i in tail_idx]
# shard row i was written from metadata.csv line i (prepare.main loads the
# manifest and _write_shard_from_cache iterates it in order); shard items
# carry synthetic SHARD-%06d fnames, so map back by POSITION, not name.
with open(A.metadata, encoding="utf-8") as f:
    meta_rows = [ln.rstrip("\n").split("|") for ln in f if ln.strip()]
assert len(meta_rows) == n_items, (len(meta_rows), n_items)
texts = [meta_rows[i][1] for i in tail_idx]
_chk = np.asarray(raw_text_to_phoneme_ids(texts[0]), np.int32)
assert np.array_equal(_chk, np.asarray(tail[0]["ids"])), \
    "metadata/shard order mismatch"
print(f"{len(texts)} held-out transcripts "
      f"(e.g. {texts[0][:60]!r}...)")

# ---- corpus-trained artifacts ----
template = init_train_state(jax.random.PRNGKey(0), cfg, args)
_, t_per, ts, _ = load_ckp(A.teacher, template)
from unast_tpu.models.fastspeech import load_nar_pickle
nar_pv = load_nar_pickle(A.nar)
with open(A.vocoder, "rb") as f:
    voc_params = pickle.load(f)
# the hybrid teacher's speech_m subtree IS the standalone CTC tree shape
# (networks.py:351 puts ctc_head inside speech_m; models/ctc.py reads the
# encoder tree + ctc_head) — serving reuses it with no re-training.
ctc_pv = (ts.params["speech_m"], ts.net_state["speech_m"])

syn = Synthesizer(ts.params, ts.net_state, cfg,
                  nar_pv=nar_pv, melgan_params=voc_params, ctc_pv=ctc_pv,
                  pcm16=True, max_batch=A.bs,
                  text_buckets=(cfg.max_text_len,),
                  mel_buckets=(cfg.max_mel_len,))

# ---- 1. throughput (serving-optimal one-pass path) ----
tput_texts = (texts * ((A.bs - 1) // len(texts) + 1))[:A.bs]
t0 = time.perf_counter()
wavs = syn.tts(tput_texts)
print(f"warm tts({A.bs}) incl. compile: {time.perf_counter() - t0:.1f}s")
times = []
for _ in range(A.reps):
    t0 = time.perf_counter()
    wavs = syn.tts(tput_texts)
    times.append(time.perf_counter() - t0)
sec = float(np.median(times))
audio_s = sum(len(w) for w in wavs) / P.sr
utt_s = A.bs / sec
print(f"one-pass tts batch {A.bs}: {sec:.3f} s median -> {utt_s:.1f} utt/s, "
      f"{audio_s:.0f} s audio/pass (RTF {sec / audio_s:.5f})")

# ---- 2. round-trip intelligibility ----
gold_ids = [np.asarray(raw_text_to_phoneme_ids(t), np.int32) for t in texts]
tl = max(len(g) for g in gold_ids)
gold_pad = np.zeros((len(texts), tl), np.int32)
gold_len = np.zeros((len(texts),), np.int32)
for i, g in enumerate(gold_ids):
    gold_pad[i, :len(g)] = g
    gold_len[i] = len(g)


def per_of(pred):
    pl = max(1, max(len(p) for p in pred))
    pp = np.zeros((len(pred), pl), np.int32)
    pn = np.zeros((len(pred),), np.int32)
    for i, p in enumerate(pred):
        pp[i, :len(p)] = p
        pn[i] = len(p)
    return float(compute_per(gold_pad, pp, gold_len, pn))


syn_wavs = syn.tts(texts)
mels = []
for w in syn_wavs:
    wf = np.asarray(w, np.float32) / 32768.0
    mel, _, nf = dsp.wav_to_mel_mag(wf, P)
    mels.append(np.asarray(mel[:nf], np.float32))
gold_mels = [np.asarray(it["mel"], np.float32) for it in tail]

per_ctc = per_of(syn.asr_ids(mels))
per_spec = per_of(syn.asr_ids(mels, spec=True))
rounds = list(syn.last_spec_rounds)
per_gold_ctc = per_of(syn.asr_ids(gold_mels))
per_gold_spec = per_of(syn.asr_ids(gold_mels, spec=True))

# stage isolation: (a) NAR mels straight into the ASR (no vocoder) and
# (b) gold mels through vocoder+DSP (no synthesis model) — localizes any
# round-trip gap to the synthesis front end vs the audio back end.
nar_direct = [np.asarray(m, np.float32) for m in syn.tts_mels(texts)]
per_nar_direct = per_of(syn.asr_ids(nar_direct))
from unast_tpu.models import melgan as G
_voc = jax.jit(lambda m: G.generator_forward(voc_params, m))
voc_gold = []
for m in gold_mels:
    t = min(cfg.max_mel_len, m.shape[0])
    buf = np.zeros((1, cfg.max_mel_len, P.num_mels), np.float32)
    buf[0, :t] = m[:t]
    w = np.asarray(_voc(jnp.asarray(buf)))[0, :t * P.hop_length]
    mel, _, nf = dsp.wav_to_mel_mag(w.astype(np.float32), P)
    voc_gold.append(np.asarray(mel[:nf], np.float32))
per_voc_gold = per_of(syn.asr_ids(voc_gold))

print(f"round-trip PER (synthesized audio): ctc {per_ctc:.3f}  "
      f"spec/AR {per_spec:.3f} (verify rounds {rounds})")
print(f"ceiling PER (gold mels):            ctc {per_gold_ctc:.3f}  "
      f"spec/AR {per_gold_spec:.3f}")
print(f"stage isolation: NAR mels direct {per_nar_direct:.3f}  "
      f"vocoded gold mels {per_voc_gold:.3f}")

result = {"bs": A.bs, "utt_per_s": round(utt_s, 1),
          "tts_s_median": round(sec, 3),
          "rtf": round(sec / audio_s, 6),
          "per_roundtrip_ctc": round(per_ctc, 4),
          "per_roundtrip_spec": round(per_spec, 4),
          "per_gold_ctc": round(per_gold_ctc, 4),
          "per_gold_spec": round(per_gold_spec, 4),
          "per_nar_direct": round(per_nar_direct, 4),
          "per_vocoded_gold": round(per_voc_gold, 4),
          "teacher_per_at_save": t_per}
print("RESULT", json.dumps(result))
