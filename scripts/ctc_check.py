"""CTC NAR ASR gate (real chip or CPU): supervised CTC training on the
tiny synthetic corpus must reach greedy PER < 0.05 — the one-pass decode
equivalent of the AR supervised grounding gate
(scripts/asr_grounding_check.py reaches PER 0.0 with the AR decoder).

Run: python scripts/ctc_check.py [--ctc_steps N] [--speech_encoder conformer]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from unast_tpu.data.batching import BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
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
    "--ctc_steps", "1200"] + sys.argv[1:])
cfg = model_config_from_args(args)
ds = SyntheticSpeechDataset(size=4, seed=0, phoneme_dur_s=0.04)
it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len,
                   seed=args.seed + 1)
eval_it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len, seed=9)
eval_batch = eval_it.next_batch()

ts = init_ctc_state(jax.random.PRNGKey(0), cfg, args)
print(f"untrained PER: {eval_per(ts, cfg, eval_batch):.3f}")
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
print(f"final greedy CTC PER: {per:.4f}")
ok = per < 0.05
print(f"GATE {'PASS' if ok else 'FAIL'} (PER < 0.05: {ok})")
sys.exit(0 if ok else 1)
