"""Energy-control gate (real chip or CPU): train the AR teacher on a
gain-jittered corpus, distill a FastSpeech student with the energy
adaptor (--nar_energy), synthesize at energy_scale 1.0 vs 1.3, and
measure the mean mel level of the outputs. Gate: the measured level
difference must track the commanded scale (monotone, and the delta
within 40% of the expected shift), with the baseline near the gold mels'
mean level.

Run: python scripts/energy_control_check.py [--teacher_steps N]
     [--nar_steps M] [--scale R]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.data.batching import BatchGetter, BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.models import fastspeech as F
from unast_tpu import nn
from unast_tpu.train.config import model_config_from_args, parse_with_config
from unast_tpu.train.fastspeech import init_fs_state, make_distill_step
from unast_tpu.train.steps import init_train_state, make_train_step

_argv = sys.argv[1:]


def _pop(name, default, cast=int):
    if name in _argv:
        i = _argv.index(name)
        v = cast(_argv[i + 1])
        del _argv[i:i + 2]
        return v
    return default


TEACHER_STEPS = _pop("--teacher_steps", 1200)
NAR_STEPS = _pop("--nar_steps", 3000)
# 1.15 keeps the commanded conditioning inside the trained jitter range
# (gain_jitter 0.6 ~ +-0.05 mel units); larger scales extrapolate
SCALE = _pop("--scale", 1.15, float)

args = parse_with_config([
    "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
    "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
    "--nhead", "2", "--use_discriminator", "false",
    "--max_mel_len", "112", "--max_text_len", "32",
    "--data_mel_len", "112", "--data_text_len", "32",
    "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "2", "--d_steps", "0",
    "--train_batch_size", "4", "--sched_type", "multistep", "--lr", "1e-3",
    "--optim_type", "adamw", "--compute_dtype", "bfloat16",
    "--nar_energy", "true", "--nar_dur_weight", "2"] + _argv)
cfg = model_config_from_args(args)
assert cfg.nar_energy
# gain_jitter: per-utterance loudness variability; jitter_variants: each
# utterance cycles 4 differently-jittered renditions — with ONE fixed
# rendition the text identifies the gain and the decoder memorizes it
# instead of reading the conditioning (measured: response collapses to
# ~12% of commanded)
ds = SyntheticSpeechDataset(size=8, seed=0, phoneme_dur_s=0.04,
                            gain_jitter=0.6, jitter_variants=4)
bg = BatchGetter(args, ds, ds, ds)

t_ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
t_step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))
rng = jax.random.PRNGKey(1)
for s in range(TEACHER_STEPS):
    batches = jax.tree_util.tree_map(jnp.asarray, bg.step_batches(args, False))
    t_ts, m = t_step(t_ts, jax.random.fold_in(rng, s), batches)
    if (s + 1) % 400 == 0:
        print(f"[teacher] step {s + 1}: tts {float(m['sp/tts']):.4f}")

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
    if (s + 1) % 500 == 0:
        print(f"[student] step {s + 1}: " + " ".join(
            f"{k.split('/')[-1]} {float(v):.4f}" for k, v in sorted(m.items())
            if k != "grad_norm"))

eval_it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len, seed=9)
b = eval_it.next_batch()


@jax.jit
def synth(params, net_state, text, text_len, scale):
    (_, post, out_lens, _), _ = F.fastspeech_forward(
        params, net_state, nn.Ctx.eval(), cfg,
        text, text_len, max_len=112, energy_scale=scale)
    return post, out_lens


def mean_level(scale):
    post, out_lens = synth(fs.params, fs.net_state,
                           jnp.asarray(b["text"]),
                           jnp.asarray(b["text_len"]), scale)
    post = np.asarray(post, np.float32)
    levels = [float(np.mean(post[i, : max(int(out_lens[i]), 1)]))
              for i in range(len(post))]
    return float(np.mean(levels))


gold = float(np.mean([np.mean(b["mel"][i][: b["mel_len"][i]])
                      for i in range(4)]))
e_base = mean_level(1.0)
e_up = mean_level(SCALE)
# predicted token energies average ~e_base; scaling by R moves the
# conditioning by ~(R-1)*e_base in normalized-log units
expect_delta = (SCALE - 1.0) * e_base
delta = e_up - e_base
print(f"gold mean level {gold:.4f} | synth@1.0 {e_base:.4f} | "
      f"synth@{SCALE} {e_up:.4f} | delta {delta:.4f} "
      f"(expected ~{expect_delta:.4f})")
base_ok = abs(e_base - gold) < 0.1
delta_ok = 0.4 * expect_delta < delta < 1.6 * expect_delta
ok = base_ok and delta_ok
print(f"GATE {'PASS' if ok else 'FAIL'} (base near gold: {base_ok}; "
      f"delta tracks scale: {delta_ok})")
sys.exit(0 if ok else 1)
