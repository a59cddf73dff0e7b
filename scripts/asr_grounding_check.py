"""Supervised grounding gate: train ONLY the paired objective on a tiny
synthetic set; greedy ASR must reach PER ~0 and greedy TTS must reconstruct
the gold mel (masked MSE ~ teacher-forced level). Validates the full
DSP -> encoder -> cross-attention -> KV-cached greedy decode path on real
hardware. Run: python scripts/asr_grounding_check.py"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from unast_tpu.train.config import parse_with_config, model_config_from_args
from unast_tpu.train.steps import init_train_state, make_train_step
from unast_tpu.data.batching import BatchGetter, BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.infer.metrics import compute_per
from unast_tpu.models import unast as U
from unast_tpu import nn

_argv = sys.argv[1:]
N_STEPS = 1200
if "--grounding_steps" in _argv:
    _i = _argv.index("--grounding_steps")
    N_STEPS = int(_argv[_i + 1])
    del _argv[_i:_i + 2]
args = parse_with_config([
    "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
    "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
    "--nhead", "2", "--use_discriminator", "false",
    "--max_mel_len", "112", "--max_text_len", "32",
    "--data_mel_len", "112", "--data_text_len", "32",
    "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "2", "--d_steps", "0",
    "--train_batch_size", "4", "--sched_type", "multistep", "--lr", "1e-3",
    "--optim_type", "adamw", "--compute_dtype", "bfloat16"] + _argv)
if args.fast_prng:
    jax.config.update("jax_default_prng_impl", "rbg")
cfg = model_config_from_args(args)
ds = SyntheticSpeechDataset(size=4, seed=0, phoneme_dur_s=0.04)
bg = BatchGetter(args, ds, ds, ds)
ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))

def per(ts):
    it = BatchIterator(ds, 4, 32, 112, seed=9)
    b = it.next_batch()
    (ids, lens), _ = U.asr(ts.params, ts.net_state, nn.Ctx.eval(), cfg,
                           None, None, jnp.asarray(b["mel"]),
                           jnp.asarray(b["mel_len"]), infer=True)
    return compute_per(b["text"], np.asarray(ids), b["text_len"],
                       np.asarray(lens))


def tts_infer_mse(ts):
    """Greedy TTS mel vs gold, masked to the overlap of stop_len/gold len."""
    it = BatchIterator(ds, 4, 32, 112, seed=9)
    b = it.next_batch()
    (pre, post, stops, stop_lens), _ = U.tts(
        ts.params, ts.net_state, nn.Ctx.eval(), cfg,
        jnp.asarray(b["text"]), jnp.asarray(b["text_len"]), None, None,
        infer=True)
    post = np.asarray(post, np.float32)
    gold = b["mel"]
    errs, lens = [], []
    for i in range(len(gold)):
        n = min(int(stop_lens[i]), int(b["mel_len"][i]))
        if n > 0:
            errs.append(np.mean((post[i, :n] - gold[i, :n]) ** 2))
            lens.append((int(stop_lens[i]), int(b["mel_len"][i])))
    return float(np.mean(errs)), lens

print("untrained PER:", round(per(ts), 3))
rng = jax.random.PRNGKey(1)
for s in range(N_STEPS):
    batches = jax.tree_util.tree_map(jnp.asarray, bg.step_batches(args, False))
    ts, m = step(ts, jax.random.fold_in(rng, s), batches)
    if (s + 1) % 100 == 0:
        print(f"step {s+1}: asr {float(m['sp/asr']):.3f} "
              f"PER {per(ts):.3f}")
print("final PER:", round(per(ts), 3))
mse, lens = tts_infer_mse(ts)
print(f"greedy TTS infer mel MSE: {mse:.4f}  (stop_len, gold_len) pairs: {lens}")
