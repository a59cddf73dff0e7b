"""FastSpeech NAR TTS end-to-end gate (real chip or CPU).

Phase 1 trains the AR transformer teacher supervised on the tiny synthetic
corpus (same recipe as asr_grounding_check.py — reaches TTS mel MSE < 0.01
by ~1200 steps). Phase 2 distills the FastSpeech student from the
teacher's cross-attention durations (train/fastspeech.py). Gate:

  - NAR free-running mel MSE vs gold < 0.02 (predicted durations), and
  - predicted total lengths within 20% of gold lengths.

Run: python scripts/nar_distill_check.py [--teacher_steps N] [--nar_steps M]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.data.batching import BatchGetter, BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.train.config import model_config_from_args, parse_with_config
from unast_tpu.train.fastspeech import (eval_nar_mse, init_fs_state,
                                        make_distill_step)
from unast_tpu.train.steps import init_train_state, make_train_step

_argv = sys.argv[1:]


def _pop_int(name, default):
    if name in _argv:
        i = _argv.index(name)
        v = int(_argv[i + 1])
        del _argv[i:i + 2]
        return v
    return default


TEACHER_STEPS = _pop_int("--teacher_steps", 1200)
NAR_STEPS = _pop_int("--nar_steps", 1500)
# --train_n > 0: train on the first train_n utterances of a larger
# corpus and evaluate on 4 HELD-OUT ones (generalization mode; default 0
# keeps the original 4-utt memorization gate).
TRAIN_N = _pop_int("--train_n", 0)

args = parse_with_config([
    "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
    "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
    "--nhead", "2", "--use_discriminator", "false",
    "--max_mel_len", "112", "--max_text_len", "32",
    "--data_mel_len", "112", "--data_text_len", "32",
    "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "2", "--d_steps", "0",
    "--train_batch_size", "4", "--sched_type", "multistep", "--lr", "1e-3",
    "--optim_type", "adamw", "--compute_dtype", "bfloat16"] + _argv)
cfg = model_config_from_args(args)
if TRAIN_N > 0:
    full = SyntheticSpeechDataset(size=TRAIN_N + 4, seed=0,
                                  phoneme_dur_s=0.04)
    ds = [full[i] for i in range(TRAIN_N)]
    eval_ds = [full[TRAIN_N + i] for i in range(4)]
else:
    ds = SyntheticSpeechDataset(size=4, seed=0, phoneme_dur_s=0.04)
    eval_ds = ds
bg = BatchGetter(args, ds, ds, ds)

# ---- Phase 1: AR teacher (supervised grounding recipe) ----
t_ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
t_step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))
rng = jax.random.PRNGKey(1)
for s in range(TEACHER_STEPS):
    batches = jax.tree_util.tree_map(jnp.asarray, bg.step_batches(args, False))
    t_ts, m = t_step(t_ts, jax.random.fold_in(rng, s), batches)
    if (s + 1) % 200 == 0:
        print(f"[teacher] step {s + 1}: tts {float(m['sp/tts']):.4f}")

# ---- Phase 2: NAR student distillation ----
fs = init_fs_state(jax.random.PRNGKey(2), cfg, args)
d_step = jax.jit(make_distill_step(cfg, cfg, args), donate_argnums=(0,))
it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len,
                   seed=args.seed + 1)
keys = ("text", "text_len", "mel", "mel_len")
rng = jax.random.PRNGKey(3)
for s in range(NAR_STEPS):
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k]) for k in keys}
    fs, m = d_step(fs, t_ts.params, t_ts.net_state,
                   jax.random.fold_in(rng, s), batch)
    if (s + 1) % 200 == 0:
        print(f"[student] step {s + 1}: " + " ".join(
            f"{k.split('/')[-1]} {float(v):.4f}" for k, v in sorted(m.items())
            if k != "grad_norm"))

# ---- Gate ----
eval_it = BatchIterator(eval_ds, 4, args.data_text_len, args.data_mel_len,
                        seed=9)
b = eval_it.next_batch()
mse, lens = eval_nar_mse(fs, cfg, b)
print(f"NAR free-running mel MSE: {mse:.4f}")
print(f"(pred_len, gold_len): {lens}")
len_ok = all(abs(p - g) <= 0.2 * g for p, g in lens)
ok = mse < 0.02 and len_ok
print(f"GATE {'PASS' if ok else 'FAIL'} (mse<0.02: {mse < 0.02}, "
      f"lens within 20%: {len_ok})")
sys.exit(0 if ok else 1)
