"""Streaming CTC ASR gate (real chip or CPU). Three claims, measured:

1. ACCURACY BUDGET — a chunk-masked CTC model (--ctc_chunk/--ctc_left,
   WeNet-style block attention) trained on the tiny synthetic corpus
   reaches greedy PER < 0.05, i.e. bounding the attention field for
   streaming does not break the one-pass recognizer that the
   full-context gate (scripts/ctc_check.py) certifies.
2. ONLINE EXACTNESS — feeding the SAME trained model per-chunk through
   infer/streaming.py::StreamingCtcAsr (K/V ring caches, positional
   offset) emits transcripts identical to the one-shot chunk-masked
   decode for every eval utterance.
3. LATENCY — per-chunk step wall time vs the chunk's audio duration
   (hop/sr seconds per frame): real-time factor and the share of the
   tunnel's ~27 ms dispatch floor.

Serving addition over the reference, whose only ASR decode consumes the
complete utterance (src/network.py:440-458).

Run: python scripts/streaming_asr_check.py [--ctc_steps N]
     [--ctc_chunk 8] [--ctc_left 2]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.data.batching import BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.infer.streaming import StreamingCtcAsr
from unast_tpu.train.config import model_config_from_args, parse_with_config
from unast_tpu.train.ctc import eval_per, init_ctc_state, make_ctc_step

args = parse_with_config([
    "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
    "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
    "--nhead", "2", "--use_discriminator", "false",
    "--max_mel_len", "112", "--max_text_len", "32",
    "--data_mel_len", "112", "--data_text_len", "32",
    "--train_batch_size", "4", "--sched_type", "multistep", "--lr", "1e-3",
    "--optim_type", "adamw", "--compute_dtype", "bfloat16",
    "--ctc_chunk", "8", "--ctc_left", "2",
    "--ctc_steps", "1200"] + sys.argv[1:])
cfg = model_config_from_args(args)
assert cfg.ctc_chunk > 0, "this gate trains a chunk-masked model"
ds = SyntheticSpeechDataset(size=4, seed=0, phoneme_dur_s=0.04)
it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len,
                   seed=args.seed + 1)
eval_it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len, seed=9)
eval_batch = eval_it.next_batch()

# --- 1. train the chunk-masked recognizer -------------------------------
ts = init_ctc_state(jax.random.PRNGKey(0), cfg, args)
print(f"chunk={cfg.ctc_chunk} left={cfg.ctc_left} "
      f"untrained PER: {eval_per(ts, cfg, eval_batch):.3f}")
step = jax.jit(make_ctc_step(cfg, args), donate_argnums=(0,))
rng = jax.random.PRNGKey(1)
keys = ("text", "text_len", "mel", "mel_len")
for i in range(args.ctc_steps):
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k]) for k in keys}
    ts, m = step(ts, jax.random.fold_in(rng, i), batch)
    if (i + 1) % 200 == 0:
        print(f"step {i + 1}: loss {float(m['ctc/loss']):.4f} "
              f"PER {eval_per(ts, cfg, eval_batch):.3f}")
per = eval_per(ts, cfg, eval_batch)
print(f"final chunk-masked greedy PER: {per:.4f}")
ok_per = per < 0.05

# --- 2. online decode == one-shot decode --------------------------------
from unast_tpu import nn
from unast_tpu.models import ctc as C

mel = jnp.asarray(eval_batch["mel"])
mel_len = np.asarray(eval_batch["mel_len"])
(ids, lens), _ = jax.jit(
    lambda p, s, m, ln: C.ctc_asr_infer(p, s, nn.Ctx.eval(), cfg, m, ln)
)(ts.params, ts.net_state, mel, jnp.asarray(mel_len))
ids, lens = np.asarray(ids), np.asarray(lens)

b = mel.shape[0]
sa = StreamingCtcAsr(ts.params, cfg).reset(batch_size=b).warm()
c = cfg.ctc_chunk
mel_np = np.asarray(mel, np.float32)
for t0 in range(0, mel_np.shape[1], c):
    n_valid = np.clip(mel_len - t0, 0, c)
    if (n_valid <= 0).all():
        break
    sa.step(mel_np[:, t0:t0 + c], n_valid=n_valid)
ok_exact = all(
    sa.emitted[i] == ids[i, :lens[i]].tolist() for i in range(b))
print(f"online == one-shot transcripts: {ok_exact} "
      f"(lens {[len(e) for e in sa.emitted]})")

# --- 3. per-chunk latency ----------------------------------------------
sa1 = StreamingCtcAsr(ts.params, cfg).reset(batch_size=1).warm()
chunk = mel_np[:1, :c]
n1 = np.array([c])
for _ in range(3):  # warm steps
    sa1.step(chunk, n_valid=n1)
n_timed = 50
t0 = time.perf_counter()
for _ in range(n_timed):
    sa1.step(chunk, n_valid=n1)
dt = (time.perf_counter() - t0) / n_timed
from unast_tpu.audio.params import DEFAULT as AP

audio_s = c * AP.hop_length / AP.sr
print(f"per-chunk step: {dt * 1e3:.1f} ms for {audio_s * 1e3:.1f} ms of "
      f"audio -> RTF {dt / audio_s:.3f} "
      f"(streamable: {dt < audio_s})")
ok_rt = dt < audio_s

print(f"GATE {'PASS' if (ok_per and ok_exact and ok_rt) else 'FAIL'} "
      f"(PER<0.05: {ok_per}, exact: {ok_exact}, real-time: {ok_rt})")
sys.exit(0 if (ok_per and ok_exact and ok_rt) else 1)
