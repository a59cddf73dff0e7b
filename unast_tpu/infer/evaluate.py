"""Evaluation harness — parity with reference evaluate / evaluate_main
(src/train.py:474-565, 985-998): per batch, all objective losses in eval
mode, PER from greedy ASR, and in test mode the per-utterance dumps
(text_preds.json + predicted mels) and discriminator accuracy d_score.

The per-batch loss+infer computation is one jitted function; PER and file
dumps happen host-side."""

import functools
import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..models import unast as U
from ..models.config import ModelConfig
from ..train import losses as L
from ..train.augment import specaugment
from ..train.steps import disc_shuffle_batch
from .metrics import compute_per, compute_d_score


@functools.partial(jax.jit, static_argnames=("cfg", "s_eos_weight",
                                             "t_eos_weight"))
def eval_batch(params, net_state, rng, cfg: ModelConfig, text, mel,
               text_len, mel_len, s_eos_weight: float = 5.0,
               t_eos_weight: float = 1.0):
    """All objective losses (eval mode: no dropout, running BN stats) plus
    greedy ASR and TTS inference for one batch."""
    ctx = nn.Ctx(rng=rng, train=False)
    gold_stop = L.stop_label_from_lens(mel_len, mel.shape[1])
    out: Dict[str, jnp.ndarray] = {}

    # autoencoder losses
    logits, _ = U.text_ae(params, net_state, ctx, cfg, text, text_len)
    out["t_ae"] = L.text_loss(text, logits, t_eos_weight)
    (pre, post, stop), _ = U.speech_ae(params, net_state, ctx, cfg, mel, mel_len)
    out["s_ae"] = L.speech_loss(mel, gold_stop, pre, post, mel_len, stop,
                                s_eos_weight)

    # supervised losses
    mel_aug = specaugment(ctx.next_rng(), mel, mel_len,
                          cfg.spec_freq_mask, cfg.spec_time_mask)
    (pre, post, stop, _), _ = U.tts(params, net_state, ctx, cfg, text,
                                    text_len, mel, mel_len)
    out["tts"] = L.speech_loss(mel, gold_stop, pre, post, mel_len, stop,
                               s_eos_weight)
    logits, _ = U.asr(params, net_state, ctx, cfg, text, text_len,
                      mel_aug, mel_len)
    out["asr"] = L.text_loss(text, logits, t_eos_weight)

    # cross-modal losses
    (pre, post, stop), _ = U.cm_speech_in(params, net_state, ctx, cfg,
                                          mel, mel_len)
    out["s_cm"] = L.speech_loss(mel, gold_stop, pre, post, mel_len, stop,
                                s_eos_weight)
    logits, _ = U.cm_text_in(params, net_state, ctx, cfg, text, text_len)
    out["t_cm"] = L.text_loss(text, logits, t_eos_weight)

    # greedy inference
    (text_pred, text_pred_len), _ = U.asr(params, net_state, ctx, cfg,
                                          None, None, mel, mel_len, infer=True)
    (_, post_pred, _, stop_lens), _ = U.tts(params, net_state, ctx, cfg,
                                            text, text_len, None, None,
                                            infer=True)

    d_out = d_target = None
    if cfg.use_discriminator and "discriminator" in params:
        from ..models import networks as N
        (t_enc, _), _ = N.text_encode(params["text_m"], net_state["text_m"],
                                      ctx, cfg, text, text_len)
        (s_enc, _), _ = N.speech_encode(params["speech_m"],
                                        net_state["speech_m"], ctx, cfg,
                                        mel, mel_len)
        d_hid, d_len, d_target = disc_shuffle_batch(
            ctx.next_rng(), U._latent(t_enc, cfg), text_len,
            U._latent(s_enc, cfg), mel_len, train_discriminator=True)
        d_out = U.lstm_discriminator(params["discriminator"], ctx, d_hid, d_len)
        out["dis"] = L.discriminator_loss(d_out, d_target)

    return out, (text_pred, text_pred_len), (post_pred, stop_lens), (d_out, d_target)


def evaluate(params, net_state, cfg: ModelConfig, args, batches,
             is_test: bool = False, rng=None):
    """batches: iterable of collated dict batches (with 'fnames').
    Returns (per, losses_dict[, d_score]) matching the reference contract."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    losses: Dict[str, list] = {}
    per_sum, n_iters, d_score = 0.0, 0, 0.0
    text_pred_dict = {}
    if is_test:
        os.makedirs(os.path.join(args.out_test_dir, "mels"), exist_ok=True)

    for bi, batch in enumerate(batches):
        text, mel = batch["text"], batch["mel"]
        text_len, mel_len = batch["text_len"], batch["mel_len"]
        out, (text_pred, text_pred_len), (post_pred, stop_lens), d_pair = \
            eval_batch(params, net_state, jax.random.fold_in(rng, bi), cfg,
                       text, mel, text_len, mel_len,
                       args.s_eos_weight, args.t_eos_weight)
        for k, v in out.items():
            losses.setdefault(k, []).append(float(v))
        per_sum += compute_per(text, text_pred, text_len, text_pred_len)
        n_iters += 1
        if is_test:
            tp = np.asarray(text_pred)
            tpl = np.asarray(text_pred_len)
            for i, fname in enumerate(batch["fnames"]):
                text_pred_dict[fname] = {
                    "gt": text[i, :text_len[i]].tolist(),
                    "pred": tp[i, :tpl[i]].tolist(),
                }
            pp = np.asarray(post_pred)
            sl = np.asarray(stop_lens)
            for i, fname in enumerate(batch["fnames"]):
                np.save(os.path.join(args.out_test_dir, "mels",
                                     fname + ".pt"), pp[i, :sl[i]])
            if d_pair[0] is not None:
                d_score += (compute_d_score(d_pair[0], d_pair[1])
                            / len(batch["fnames"]) / 2)

    per = per_sum / max(1, n_iters)
    if is_test:
        with open(os.path.join(args.out_test_dir, "text_preds.json"), "w") as f:
            json.dump(text_pred_dict, f)
        return per, losses, d_score / max(1, n_iters)
    return per, losses
