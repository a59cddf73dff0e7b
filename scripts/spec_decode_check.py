"""Speculative ASR decoding gate (real chip or CPU): train the supervised
AR model (asr_grounding_check recipe) AND a CTC head with the same cfg
dims on the same tiny corpus, then check that CTC-drafted speculative
decoding (networks.text_tr_spec_infer):
  1. returns EXACTLY the AR greedy transcript (bitwise id equality),
  2. verifies in a small number of parallel rounds (<= ROUNDS_MAX),
  3. is faster than the sequential KV-cached greedy loop at the gate's
     batch/length shape (timed like bench.py: the jitted fn returns a
     scalar that is fetched, so the tunnel's async dispatch can't lie).

Run: python scripts/spec_decode_check.py [--grounding_steps N]
     [--ctc_steps N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu import nn
from unast_tpu.data.batching import BatchGetter, BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.models import networks as N
from unast_tpu.train.config import model_config_from_args, parse_with_config
from unast_tpu.train.ctc import init_ctc_state, make_ctc_step
from unast_tpu.train.steps import init_train_state, make_train_step

_argv = sys.argv[1:]
N_STEPS = 1200


def _pop(name, default):
    if name in _argv:
        i = _argv.index(name)
        v = int(_argv[i + 1])
        del _argv[i:i + 2]
        return v
    return default


N_STEPS = _pop("--grounding_steps", 1200)
ROUNDS_MAX = _pop("--rounds_max", 6)

BASE = [
    "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
    "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
    "--nhead", "2", "--use_discriminator", "false",
    "--max_mel_len", "112", "--max_text_len", "32",
    "--data_mel_len", "112", "--data_text_len", "32",
    "--train_batch_size", "4", "--sched_type", "multistep", "--lr", "1e-3",
    "--optim_type", "adamw", "--compute_dtype", "bfloat16"]
args = parse_with_config(BASE + [
    "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "2", "--d_steps",
    "0", "--ctc_steps", "1200"] + _argv)
cfg = model_config_from_args(args)
ds = SyntheticSpeechDataset(size=4, seed=0, phoneme_dur_s=0.04)

# ---- 1. supervised AR grounding (asr_grounding_check.py recipe) ----
bg = BatchGetter(args, ds, ds, ds)
ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))
rng = jax.random.PRNGKey(1)
for s in range(N_STEPS):
    batches = jax.tree_util.tree_map(jnp.asarray, bg.step_batches(args, False))
    ts, m = step(ts, jax.random.fold_in(rng, s), batches)
print(f"AR trained ({N_STEPS} steps, sp/asr {float(m['sp/asr']):.3f})")

# ---- 2. CTC head (ctc_check.py recipe, same cfg dims) ----
cts = init_ctc_state(jax.random.PRNGKey(2), cfg, args)
c_step = jax.jit(make_ctc_step(cfg, args), donate_argnums=(0,))
it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len,
                   seed=args.seed + 1)
keys = ("text", "text_len", "mel", "mel_len")
for i in range(args.ctc_steps):
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k]) for k in keys}
    cts, cm = c_step(cts, jax.random.fold_in(rng, 10_000 + i), batch)
print(f"CTC trained ({args.ctc_steps} steps, loss {float(cm['ctc/loss']):.3f})")

# ---- 3. exactness + rounds + timing ----
eval_it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len, seed=9)
b = eval_it.next_batch()
mel = jnp.asarray(b["mel"])
mel_len = jnp.asarray(b["mel_len"])
ectx = nn.Ctx.eval()

from unast_tpu.models import ctc as CT


def greedy_fn(params, net_state, mel, mel_len):
    (enc, mask), _ = N.speech_encode(params["speech_m"],
                                     net_state["speech_m"], ectx, cfg,
                                     mel, mel_len)
    ids, lens = N.text_tr_infer(params["text_m"], ectx, cfg, enc, mask)
    return ids, lens


def spec_fn(params, net_state, c_params, c_state, mel, mel_len):
    (draft, _), _ = CT.ctc_asr_infer(c_params, c_state, ectx, cfg,
                                     mel, mel_len)
    (enc, mask), _ = N.speech_encode(params["speech_m"],
                                     net_state["speech_m"], ectx, cfg,
                                     mel, mel_len)
    return N.text_tr_spec_infer(params["text_m"], ectx, cfg, enc, mask,
                                draft)


g_jit = jax.jit(greedy_fn)
s_jit = jax.jit(spec_fn)
g_ids, g_lens = g_jit(ts.params, ts.net_state, mel, mel_len)
s_ids, s_lens, rounds = s_jit(ts.params, ts.net_state, cts.params,
                              cts.net_state, mel, mel_len)
g_ids, s_ids = np.asarray(g_ids), np.asarray(s_ids)
exact = (np.array_equal(g_ids, s_ids)
         and np.array_equal(np.asarray(g_lens), np.asarray(s_lens)))
rounds = int(rounds)
max_steps = int(np.asarray(g_lens).max())
print(f"exact match: {exact}   verify rounds: {rounds} "
      f"(AR loop ran {max_steps} sequential steps)")


def _time(fn, iters=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


t_ar = _time(lambda: int(np.asarray(
    g_jit(ts.params, ts.net_state, mel, mel_len)[1])[0]))
t_sp = _time(lambda: int(np.asarray(
    s_jit(ts.params, ts.net_state, cts.params, cts.net_state,
          mel, mel_len)[1])[0]))
print(f"AR greedy decode: {t_ar * 1e3:.1f} ms   speculative: "
      f"{t_sp * 1e3:.1f} ms   ({t_ar / t_sp:.2f}x)")

ok = exact and rounds <= ROUNDS_MAX
print(f"GATE {'PASS' if ok else 'FAIL'} (exact: {exact}, "
      f"rounds {rounds} <= {ROUNDS_MAX}: {rounds <= ROUNDS_MAX}, "
      f"speedup {t_ar / t_sp:.2f}x informational)")
sys.exit(0 if ok else 1)
