"""FastSpeech NAR TTS trainer: duration distillation from an AR teacher.

Capability add over the reference (AR-only synthesis,
src/network.py:229-276). The student (models/fastspeech.py) learns

  - mel regression against the GOLD mels (pre + post masked MSE, the same
    losses the AR model trains with, train/losses.py::masked_mse), with
    the length regulator driven by TEACHER durations so frames align; and
  - log(1 + duration) regression against those teacher durations,

where durations come from the teacher's cross-attention argmax counts
(models/fastspeech.py::durations_from_attention), extracted IN-GRAPH from
a teacher-forced U.tts pass — one jitted step does teacher alignment +
student fwd/bwd, so distillation runs at train-step speed on the chip.

CLI (teacher checkpoint -> student checkpoint):
    python -m unast_tpu.train.fastspeech --load_path <ar_ckpt> \
        --checkpoint_path <out_dir> [--nar_steps N] [usual config flags]

End-to-end gate (trains the teacher first): scripts/nar_distill_check.py.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import nn
from ..models import fastspeech as F
from ..models import unast as U
from ..models.config import ModelConfig
from ..models.modules import lens_to_mask
from . import losses as L
from .optim import make_optimizer, make_schedule


class FSTrainState(NamedTuple):
    params: dict
    net_state: dict
    opt: object
    step: jnp.ndarray


def init_fs_state(key, cfg: ModelConfig, args) -> FSTrainState:
    params, net_state = F.fastspeech_init(key, cfg)
    tx = make_optimizer(args, make_schedule(args))
    return FSTrainState(params, net_state, tx.init(params),
                        jnp.zeros((), jnp.int32))


def make_distill_step(cfg: ModelConfig, teacher_cfg: ModelConfig, args):
    """Returns step(fs_state, teacher_params, teacher_state, rng, batch)
    -> (new_fs_state, metrics). batch: dict with text/text_len/mel/mel_len
    (the BatchIterator layout). jit with donate_argnums=(0,)."""
    tx = make_optimizer(args, make_schedule(args))
    dur_w = float(getattr(args, "nar_dur_weight", 1.0) or 1.0)
    source = getattr(args, "nar_dur_source", None) or (
        "soft" if getattr(args, "nar_soft_durations", False) else "argmax")

    def step(fs: FSTrainState, t_params, t_state, rng, batch):
        text = batch["text"]
        text_len = batch["text_len"]
        mel = batch["mel"]
        mel_len = batch["mel_len"]

        # Teacher alignment (no dropout, running BN stats, no grads).
        if "durs" in batch:
            # Precomputed per-token FRAME durations rode in with the
            # batch (e.g. the trim-offset-corrected oracle sidecar on a
            # --realism corpus, scripts/fix_noisy_oracle.py — the
            # uniform split is NOT exact there: the trim keeps a
            # ~13-19-frame breath/lead prefix that belongs to token 0).
            dur = batch["durs"].astype(jnp.int32)
        elif source == "uniform":
            # Even split of the gold frame count over the tokens:
            # dur_k = round((k+1)*M/N) - round(k*M/N). EXACT on the
            # uniform-duration synthetic corpora (round 4 measured the
            # ctc source's forced alignment time-warped there: a
            # full-attention CTC encoder transcribes perfectly with NO
            # frame-local alignment guarantee — mean |dur err| 9.0
            # frames vs the known grid, scripts/nar_blur_probe.py);
            # a defensible fallback prior on real speech.
            n_tok = text.shape[1]
            ratio = (mel_len.astype(jnp.float32)
                     / jnp.maximum(text_len, 1).astype(jnp.float32))
            k = jnp.arange(n_tok + 1, dtype=jnp.float32)[None, :]
            bounds = jnp.round(k * ratio[:, None])
            dur = (bounds[:, 1:] - bounds[:, :-1]).astype(jnp.int32)
            dur = dur * lens_to_mask(text_len, n_tok).astype(jnp.int32)
        elif source == "ctc":
            # CTC forced alignment off the teacher's hybrid CTC head
            # (requires a teacher trained with --ctc_weight > 0): frame
            # posteriors are grounded in the AUDIO->TEXT direction, so
            # the durations don't inherit the TTS cross-attention's
            # diffuseness (the measured held-out collapse of the
            # argmax/mas sources, BENCHMARKS.md generalization ladder).
            from ..models import ctc as CT
            from ..models import networks as N
            ectx = nn.Ctx.eval()
            (mem, pad), _ = N.speech_encode(
                t_params["speech_m"], t_state["speech_m"], ectx,
                teacher_cfg, mel, mel_len)
            logits = nn.linear(t_params["speech_m"]["ctc_head"],
                               mem).astype(jnp.float32)
            dur = CT.ctc_forced_align(
                jax.nn.log_softmax(logits, axis=-1), ~pad, text, text_len,
                blank_split=bool(
                    getattr(args, "nar_ctc_blank_split", 1)))
        else:
            ws = []
            U.tts(t_params, t_state, nn.Ctx.eval(), teacher_cfg, text,
                  text_len, mel, mel_len, cross_weights_out=ws)
            attn = jnp.stack(ws)
            if source == "mas":
                dur = F.mas_durations(attn, mel_len, text_len)
            else:
                dur = F.durations_from_attention(attn, mel_len, text_len,
                                                 soft=(source == "soft"))
        dur = jax.lax.stop_gradient(dur)

        tv = lens_to_mask(text_len, text.shape[1]).astype(jnp.float32)
        pitch_tgt = energy_tgt = None
        if cfg.nar_pitch:
            # token-level mean log-F0 over the teacher-aligned spans
            # (frame F0 from the dataset, audio/pitch.py)
            pitch_tgt = jax.lax.stop_gradient(
                F.token_log_f0_in_graph(batch["f0"], dur, tv))
        if cfg.nar_energy:
            # token-level mean mel energy straight from the gold mel
            energy_tgt = jax.lax.stop_gradient(
                F.token_energy_in_graph(mel, dur, tv))

        def loss_fn(params):
            ctx = nn.Ctx(rng=rng, train=True)
            (pre, post, _, _), ns = F.fastspeech_forward(
                params, fs.net_state, ctx, cfg, text, text_len,
                durations=dur, max_len=mel.shape[1],
                pitch_target=pitch_tgt, energy_target=energy_tgt)
            mask = lens_to_mask(mel_len, mel.shape[1])[..., None]
            l_pre = L.masked_mse(mel, pre, mask)
            l_post = L.masked_mse(mel, post, mask)
            # Variance losses on the EVAL-MODE branch — the path inference
            # actually runs (models/fastspeech.py::predict_variances
            # explains the train/eval bias this removes).
            logd, logf, ener = F.predict_variances(params, fs.net_state,
                                                   cfg, text, text_len)
            d_err = (logd - jnp.log1p(dur.astype(jnp.float32))) ** 2
            l_dur = jnp.sum(d_err * tv) / jnp.maximum(jnp.sum(tv), 1.0)
            loss = l_pre + l_post + dur_w * l_dur
            metrics = {"nar/pre": l_pre, "nar/post": l_post,
                       "nar/dur": l_dur}
            if cfg.nar_pitch:
                voiced = (pitch_tgt > 0).astype(jnp.float32) * tv
                p_err = (logf - pitch_tgt) ** 2
                l_pitch = (jnp.sum(p_err * voiced)
                           / jnp.maximum(jnp.sum(voiced), 1.0))
                loss = loss + dur_w * l_pitch
                metrics["nar/pitch"] = l_pitch
            if cfg.nar_energy:
                e_err = (ener - energy_tgt) ** 2
                l_en = jnp.sum(e_err * tv) / jnp.maximum(jnp.sum(tv), 1.0)
                loss = loss + dur_w * l_en
                metrics["nar/energy"] = l_en
            return loss, (ns, metrics)

        grads, (ns, metrics) = jax.grad(loss_fn, has_aux=True)(fs.params)
        updates, opt = tx.update(grads, fs.opt, fs.params)
        params = optax.apply_updates(fs.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return FSTrainState(params, ns, opt, fs.step + 1), metrics

    return step


def make_nar_infer(cfg: ModelConfig, max_len: int, speed: float = 1.0):
    """Jitted free-running NAR synthesis (PREDICTED durations):
    (params, net_state, text, text_len) -> (post_mel, out_lens)."""

    @jax.jit
    def infer(params, net_state, text, text_len):
        (_, post, out_lens, _), _ = F.fastspeech_forward(
            params, net_state, nn.Ctx.eval(), cfg, text, text_len,
            max_len=max_len, speed=speed)
        return post, out_lens

    return infer


def eval_nar_mse(fs: FSTrainState, cfg: ModelConfig, batch,
                 speed: float = 1.0):
    """Free-running NAR synthesis (PREDICTED durations) vs gold mel,
    scored over the overlap of predicted/gold lengths per utterance.
    Returns (mse, [(pred_len, gold_len), ...])."""
    infer = make_nar_infer(cfg, int(batch["mel"].shape[1]), speed)
    post, out_lens = infer(fs.params, fs.net_state,
                           jnp.asarray(batch["text"]),
                           jnp.asarray(batch["text_len"]))
    post = np.asarray(post, np.float32)
    out_lens = np.asarray(out_lens)
    gold, gold_len = batch["mel"], batch["mel_len"]
    errs, lens = [], []
    for i in range(len(gold)):
        n = min(int(out_lens[i]), int(gold_len[i]))
        if n > 0:
            errs.append(float(np.mean((post[i, :n] - gold[i, :n]) ** 2)))
        lens.append((int(out_lens[i]), int(gold_len[i])))
    return float(np.mean(errs)), lens


def main(argv=None):
    import os

    from ..data.batching import BatchIterator
    from ..data.dataset import LJSpeechDataset, SyntheticSpeechDataset
    from .checkpoint import load_ckp, save_ckp
    from .config import model_config_from_args, parse_with_config
    from .steps import init_train_state

    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    n_steps = int(getattr(args, "nar_steps", 0) or 2000)

    # Teacher: a trained AR checkpoint (params + BN state restored into a
    # freshly-initialized template).
    t_template = init_train_state(jax.random.PRNGKey(0), cfg, args)
    if args.load_path:
        _, _, t_ts, _ = load_ckp(args.load_path, t_template)
    else:
        print("WARNING: no --load_path; distilling from an UNTRAINED "
              "teacher (smoke-test mode)")
        t_ts = t_template

    if getattr(args, "synthetic", False) or not os.path.isdir(args.data_path):
        ds = SyntheticSpeechDataset(size=64, seed=0,
                                    include_f0=cfg.nar_pitch)
    else:
        # same split/cache layout as train/loop.py; --nar_pitch needs the
        # F0 cache from `python -m unast_tpu.data.prepare ... --f0`
        from ..data.splits import REFERENCE_SPLITS_DIR
        local = os.path.join(args.data_path, "splits")
        splits = (local if os.path.isdir(local) else REFERENCE_SPLITS_DIR)
        ds = LJSpeechDataset(
            os.path.join(splits, "labeled_train.csv"),
            os.path.join(args.data_path, "mel_cache"),
            include_f0=cfg.nar_pitch)
    it = BatchIterator(ds, args.train_batch_size, args.data_text_len,
                       args.data_mel_len, seed=args.seed + 1)

    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    step = jax.jit(make_distill_step(cfg, cfg, args), donate_argnums=(0,))
    rng = jax.random.PRNGKey(2)
    keys = ("text", "text_len", "mel", "mel_len") + (
        ("f0",) if cfg.nar_pitch else ())
    for i in range(n_steps):
        raw = it.next_batch()
        batch = {k: jnp.asarray(raw[k]) for k in keys}
        fs, m = step(fs, t_ts.params, t_ts.net_state,
                     jax.random.fold_in(rng, i), batch)
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: " + " ".join(
                f"{k} {float(v):.4f}" for k, v in sorted(m.items())))
    it = BatchIterator(ds, args.eval_batch_size, args.data_text_len,
                       args.data_mel_len, seed=9)
    mse, lens = eval_nar_mse(fs, cfg, it.next_batch())
    print(f"NAR free-running mel MSE {mse:.4f}; (pred, gold) lens: {lens}")
    if args.checkpoint_path:
        save_ckp(0, mse, fs, True, args.checkpoint_path)
    return fs, mse


if __name__ == "__main__":
    main()
