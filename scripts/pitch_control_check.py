"""Pitch-control gate (real chip or CPU): train the AR teacher, distill a
FastSpeech student WITH the pitch adaptor (--nar_pitch), synthesize the
same texts at pitch_shift 1.0 and 1.33, and read the output F0 straight
off the synthesized MELS (audio/pitch.py::mel_f0_template; Griffin-Lim
over the serving mag lift destroys periodicity, so wav-domain
autocorrelation cannot verify this). Gate: the measured median F0 ratio
must land within 12% of the commanded shift (and shift=1.0 must stay
near the gold-mel readout).

Run: python scripts/pitch_control_check.py [--teacher_steps N]
     [--nar_steps M] [--shift R]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.audio.pitch import mel_f0_template
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
SHIFT = _pop("--shift", 1.33, float)

args = parse_with_config([
    "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
    "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
    "--nhead", "2", "--use_discriminator", "false",
    "--max_mel_len", "224", "--max_text_len", "32",
    "--data_mel_len", "224", "--data_text_len", "32",
    "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "2", "--d_steps", "0",
    "--train_batch_size", "4", "--sched_type", "multistep", "--lr", "1e-3",
    "--optim_type", "adamw", "--compute_dtype", "bfloat16",
    "--nar_pitch", "true", "--nar_dur_weight", "2"] + _argv)
cfg = model_config_from_args(args)
assert cfg.nar_pitch
# phoneme_dur_s 0.08: the 1102-sample analysis window then fits inside a
# phoneme, so mid-phoneme frames are single-tone and F0 is readable
# (at 0.04 every frame is a two-tone mixture — measured).
# pitch_jitter 0.25: per-utterance F0 variability — without it pitch is a
# function of phoneme identity and the decoder IGNORES the pitch
# conditioning (measured shift response exactly 1.000); with it the
# conditioning is the only way to resolve the mel ambiguity.
ds = SyntheticSpeechDataset(size=8, seed=0, phoneme_dur_s=0.08,
                            include_f0=True, pitch_jitter=0.25)
bg = BatchGetter(args, ds, ds, ds)

# ---- teacher ----
t_ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
t_step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))
rng = jax.random.PRNGKey(1)
for s in range(TEACHER_STEPS):
    batches = jax.tree_util.tree_map(jnp.asarray, bg.step_batches(args, False))
    t_ts, m = t_step(t_ts, jax.random.fold_in(rng, s), batches)
    if (s + 1) % 400 == 0:
        print(f"[teacher] step {s + 1}: tts {float(m['sp/tts']):.4f}")

# ---- student with pitch adaptor ----
fs = init_fs_state(jax.random.PRNGKey(2), cfg, args)
d_step = jax.jit(make_distill_step(cfg, cfg, args), donate_argnums=(0,))
it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len,
                   seed=args.seed + 1)
keys = ("text", "text_len", "mel", "mel_len", "f0")
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

# ---- synthesize at two pitch shifts, read F0 off the MELS ----
# (the serving mag lift + Griffin-Lim destroys periodicity — the
# template readout works on the mel directly, audio/pitch.py)
eval_it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len, seed=9)
b = eval_it.next_batch()


@jax.jit
def synth(params, net_state, text, text_len, shift):
    (_, post, out_lens, _), _ = F.fastspeech_forward(
        params, net_state, nn.Ctx.eval(), cfg,
        text, text_len, max_len=224, pitch_shift=shift)
    return post, out_lens


def median_f0(shift):
    post, out_lens = synth(fs.params, fs.net_state,
                           jnp.asarray(b["text"]),
                           jnp.asarray(b["text_len"]), shift)
    post = np.asarray(post, np.float32)
    meds = []
    for i in range(len(post)):
        f0 = mel_f0_template(post[i, : max(int(out_lens[i]), 1)])
        v = f0[f0 > 0]
        if len(v):
            meds.append(float(np.median(v)))
    return float(np.median(meds))


gold_meds = []
for i in range(4):
    f0 = mel_f0_template(b["mel"][i][: b["mel_len"][i]])
    v = f0[f0 > 0]
    gold_meds.append(float(np.median(v)))
gold = float(np.median(gold_meds))

f0_base = median_f0(1.0)
f0_up = median_f0(SHIFT)
ratio = f0_up / f0_base
print(f"gold median F0 {gold:.1f} Hz | synth@1.0 {f0_base:.1f} Hz | "
      f"synth@{SHIFT} {f0_up:.1f} Hz | measured ratio {ratio:.3f}")
base_ok = abs(f0_base - gold) / gold < 0.15
ratio_ok = abs(ratio - SHIFT) / SHIFT < 0.12
ok = base_ok and ratio_ok
print(f"GATE {'PASS' if ok else 'FAIL'} (base within 15% of gold: "
      f"{base_ok}; ratio within 12% of {SHIFT}: {ratio_ok})")
sys.exit(0 if ok else 1)
