"""The jit-compiled multi-objective train step.

Parity target: the reference's inner loop (src/train.py:597-638) — per outer
step, ae_steps AE batches + cm_steps back-translation batches + sp_steps
supervised batches accumulate gradients (each micro-loss scaled by
1/accum_steps, src/train.py:373,400,428) into ONE generator optimizer step,
followed by d_steps discriminator batches into one discriminator step.

TPU-native design: the whole thing is a single jitted function. Micro-batch
accumulation is a lax.scan over stacked [n, B, ...] batches (grads summed in
f32, BatchNorm state threaded through the carry); the reference's
freeze/unfreeze requires_grad dance (src/train.py:465-471) becomes two optax
chains over disjoint param partitions; torch.no_grad() becomes
stop_gradient (already inside the task fns). The adversarial '1 - target'
flip for generator phases (src/train.py:319-320) is a label tensor.
"""

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .. import nn
from ..models import unast as U
from ..models import networks as N
from ..models.config import ModelConfig
from . import losses as L
from .augment import specaugment
from .optim import (find_ema, make_optimizer, make_schedule, params_ema,
                    split_params)


class TrainState(NamedTuple):
    params: Any
    net_state: Any          # BatchNorm running stats
    gen_opt: Any
    disc_opt: Any           # () when no discriminator
    step: jnp.ndarray


def init_train_state(key, cfg: ModelConfig, args) -> TrainState:
    params, net_state = U.unast_init(key, cfg)
    gen_tx, disc_tx = make_optimizers(cfg, args)
    gen_params, disc_params = split_params(params)
    gen_opt = gen_tx.init(gen_params)
    disc_opt = disc_tx.init(disc_params) if disc_params is not None else ()
    return TrainState(params, net_state, gen_opt, disc_opt, jnp.int32(0))


def make_optimizers(cfg: ModelConfig, args):
    sched = make_schedule(args)
    gen_tx = make_optimizer(args, sched)
    ema = float(getattr(args, "ema_decay", 0.0) or 0.0)
    if ema > 0.0:
        # EMA of the generator params rides the chain state (optim.py);
        # eval/serving read it via ema_params(). Discriminator excluded —
        # the adversary should track the current generator.
        gen_tx = optax.chain(gen_tx, params_ema(ema))
    disc_tx = make_optimizer(args, sched)
    return gen_tx, disc_tx


def ema_params(ts: TrainState):
    """Full param tree with the generator partition replaced by its EMA
    (None if --ema_decay was off). Discriminator params pass through."""
    ema = find_ema(ts.gen_opt)
    if ema is None:
        return None
    out = dict(ema)
    if "discriminator" in ts.params:
        out["discriminator"] = ts.params["discriminator"]
    return out


# ---------------------------------------------------------------------------
# Discriminator batch assembly (src/train.py:296-335)
# ---------------------------------------------------------------------------


def disc_shuffle_batch(rng, t_lat, t_len, s_lat, s_len,
                       train_discriminator: bool):
    """Pad text/speech latents to a common length with zeros (PAD_IDX=0),
    concat, build smoothed targets (text .9 / speech .1; flipped for
    generator phases), and shuffle."""
    s_max = max(t_lat.shape[1], s_lat.shape[1])
    t_lat = jnp.pad(t_lat, ((0, 0), (0, s_max - t_lat.shape[1]), (0, 0)))
    s_lat = jnp.pad(s_lat, ((0, 0), (0, s_max - s_lat.shape[1]), (0, 0)))
    d_hid = jnp.concatenate([t_lat, s_lat], axis=0)
    d_len = jnp.concatenate([t_len, s_len], axis=0)
    d_target = jnp.concatenate([
        L.discriminator_target(t_lat.shape[0], "text"),
        L.discriminator_target(s_lat.shape[0], "speech")])
    if not train_discriminator:
        d_target = 1.0 - d_target
    perm = jax.random.permutation(rng, d_hid.shape[0])
    return d_hid[perm], d_len[perm], d_target[perm]


def _disc_adv_loss(params, ctx, rng, cfg, t_lat, t_len, s_lat, s_len):
    """Frozen-discriminator adversarial loss for generator phases. Gradients
    flow to the encoders through the latents; the discriminator partition's
    grads are simply never applied by the generator chain."""
    d_hid, d_len, d_target = disc_shuffle_batch(
        rng, t_lat, t_len, s_lat, s_len, train_discriminator=False)
    d_out = U.lstm_discriminator(params["discriminator"], ctx, d_hid, d_len)
    return L.discriminator_loss(d_out, d_target)


# ---------------------------------------------------------------------------
# Per-objective losses. Each returns (scalar_loss_scaled, (aux, new_state)).
# ---------------------------------------------------------------------------


def _gold(batch):
    text, mel, text_len, mel_len = batch
    gold_stop = L.stop_label_from_lens(mel_len, mel.shape[1])
    return text, mel, text_len, mel_len, gold_stop


def _obj_ctx(rng, args, cfg: ModelConfig = None) -> nn.Ctx:
    """Objective-forward context. Training uses train=True (dropout, DAE
    noise, SpecAugment, batch BN stats). tests/test_ref_parity.py sets
    args.objective_eval_mode=True to compare the exact objective composition
    against the reference implementation deterministically (both sides in
    eval mode with augmentation disabled).

    For MoE configs (cfg.moe_experts > 0) the ctx collects per-layer
    load-balance aux losses (models/moe.py); _moe_aux folds them into the
    objective."""
    collect = cfg is not None and cfg.moe_experts > 0
    return nn.Ctx(rng=rng,
                  train=not getattr(args, "objective_eval_mode", False),
                  aux_losses=[] if collect else None)


def _moe_aux(ctx: nn.Ctx, args, aux: dict):
    """Weighted sum of the MoE load-balance losses collected on `ctx`
    (Switch Transformer's alpha, default 0.01). Records the raw metric."""
    if not ctx.aux_losses:
        return 0.0
    raw = sum(ctx.aux_losses)
    aux["moe"] = raw
    return float(getattr(args, "moe_aux_weight", 0.01) or 0.0) * raw


def _ga_cfg(cfg: ModelConfig, args):
    """Guided-attention config: (enabled, weight, sigma). Capability add
    (off by default = exact reference objective): a diagonal prior on the
    teacher-forced decoder cross-attention that grounds the transformer's
    cross-modal alignment (VERDICT r1 #2). Transformer-only — the RNN/LSA
    backbone's location-sensitive attention already encodes the prior."""
    w = float(getattr(args, "ga_weight", 0.0) or 0.0)
    enabled = w > 0.0 and cfg.model_type == "transformer"
    return enabled, w, float(getattr(args, "ga_sigma", 0.2) or 0.2)


def _ga_loss(ws, q_len, k_len, sigma):
    return L.guided_attention_loss(jnp.stack(ws), q_len, k_len, sigma)


def ae_loss_fn(params, net_state, rng, batch, cfg: ModelConfig, args, scale):
    """Denoising AE objective (src/train.py:199-229)."""
    text, mel, text_len, mel_len, gold_stop = _gold(batch)
    ctx = _obj_ctx(rng, args, cfg)
    ga_on, ga_w, ga_sigma = _ga_cfg(cfg, args)
    t_ws = [] if ga_on else None
    s_ws = [] if ga_on else None
    aux = {}
    if cfg.use_discriminator:
        (logits, t_lat, t_l, _), st = U.text_ae(params, net_state, ctx, cfg,
                                                text, text_len, ret_enc_hid=True,
                                                cross_weights_out=t_ws)
        (pre, post, stop, s_lat, s_l, _), st = U.speech_ae(
            params, st, ctx, cfg, mel, mel_len, ret_enc_hid=True,
            cross_weights_out=s_ws)
        d_loss = _disc_adv_loss(params, ctx, ctx.next_rng(), cfg,
                                t_lat, t_l, s_lat, s_l)
        aux["d_ae"] = d_loss
    else:
        logits, st = U.text_ae(params, net_state, ctx, cfg, text, text_len,
                               cross_weights_out=t_ws)
        (pre, post, stop), st = U.speech_ae(params, st, ctx, cfg, mel, mel_len,
                                            cross_weights_out=s_ws)
        d_loss = 0.0
    t_ae = L.text_loss(text, logits, args.t_eos_weight)
    s_ae = L.speech_loss(mel, gold_stop, pre, post, mel_len, stop,
                         args.s_eos_weight)
    ga = 0.0
    if ga_on:
        # speech-decoder queries are frame GROUPS under reduction_factor
        s_q = -(-mel_len // cfg.reduction_factor)
        ga = ga_w * (_ga_loss(t_ws, text_len, text_len, ga_sigma)
                     + _ga_loss(s_ws, s_q, mel_len, ga_sigma))
        aux["ga_ae"] = ga
    moe = _moe_aux(ctx, args, aux)
    aux.update(t_ae=t_ae, s_ae=s_ae)
    return (t_ae + s_ae + d_loss + ga + moe) * scale, (aux, st)


def sp_loss_fn(params, net_state, rng, batch, cfg: ModelConfig, args, scale):
    """Supervised paired objective with SpecAugment on the ASR input only
    (src/train.py:231-259)."""
    text, mel, text_len, mel_len, gold_stop = _gold(batch)
    ctx = _obj_ctx(rng, args, cfg)
    ga_on, ga_w, ga_sigma = _ga_cfg(cfg, args)
    tts_ws = [] if ga_on else None
    asr_ws = [] if ga_on else None
    mel_aug = (mel if not ctx.train else
               specaugment(ctx.next_rng(), mel, mel_len,
                           cfg.spec_freq_mask, cfg.spec_time_mask))
    aux = {}
    if cfg.use_discriminator:
        (pre, post, stop, _, t_lat), st = U.tts(params, net_state, ctx, cfg,
                                                text, text_len, mel, mel_len,
                                                ret_enc_hid=True,
                                                cross_weights_out=tts_ws)
        (logits, s_lat), st = U.asr(params, st, ctx, cfg, text, text_len,
                                    mel_aug, mel_len, ret_enc_hid=True,
                                    cross_weights_out=asr_ws)
        d_loss = _disc_adv_loss(params, ctx, ctx.next_rng(), cfg,
                                t_lat, text_len, s_lat, mel_len)
        aux["d_sp"] = d_loss
    else:
        (pre, post, stop, _), st = U.tts(params, net_state, ctx, cfg,
                                         text, text_len, mel, mel_len,
                                         cross_weights_out=tts_ws)
        logits, st = U.asr(params, st, ctx, cfg, text, text_len,
                           mel_aug, mel_len, cross_weights_out=asr_ws)
        d_loss = 0.0
    tts_l = L.speech_loss(mel, gold_stop, pre, post, mel_len, stop,
                          args.s_eos_weight)
    asr_l = L.text_loss(text, logits, args.t_eos_weight)
    ga = 0.0
    if ga_on:
        # tts decode: queries=mel frames, keys=text memory; asr: the mirror
        s_q = -(-mel_len // cfg.reduction_factor)
        ga = ga_w * (_ga_loss(tts_ws, s_q, text_len, ga_sigma)
                     + _ga_loss(asr_ws, text_len, mel_len, ga_sigma))
        aux["ga_sp"] = ga
    ctc = 0.0
    if cfg.ctc_weight > 0:
        # hybrid CTC/attention (ESPnet-style): auxiliary CTC loss on the
        # speech-encoder output over the gold transcript. The re-encode's
        # BN-state update is DISCARDED (U.asr already threaded it once;
        # updating running stats twice per step would skew them).
        from ..models import ctc as CT
        (mem, pad), _ = N.speech_encode(
            params["speech_m"], st["speech_m"], ctx, cfg, mel_aug, mel_len)
        ctc_logits = nn.linear(params["speech_m"]["ctc_head"],
                               mem).astype(jnp.float32)
        ctc = cfg.ctc_weight * CT.ctc_loss(ctc_logits, pad, text, text_len)
        aux["ctc_sp"] = ctc
    moe = _moe_aux(ctx, args, aux)
    aux.update(tts=tts_l, asr=asr_l)
    return (tts_l + asr_l + d_loss + ga + moe + ctc) * scale, (aux, st)


def cm_loss_fn(params, net_state, rng, batch, cfg: ModelConfig, args, scale):
    """Back-translation objective (src/train.py:261-294). The greedy
    pseudo-pair inference runs inside the jitted step with stop_gradient."""
    text, mel, text_len, mel_len, gold_stop = _gold(batch)
    ctx = _obj_ctx(rng, args, cfg)
    infer_mel = getattr(args, "cm_infer_mel_len", None) or cfg.max_mel_len
    infer_text = getattr(args, "cm_infer_text_len", None) or cfg.max_text_len
    # decode lever for the in-graph pseudo-transcript (ar | spec | ctc);
    # the reference always pays the sequential AR loop here
    # (src/train.py:261-294 via src/network.py:463-481)
    td = getattr(args, "cm_text_decode", "ar") or "ar"
    aux = {}
    if cfg.use_discriminator:
        (pre, post, stop, t_lat, t_l, _), st = U.cm_speech_in(
            params, net_state, ctx, cfg, mel, mel_len, ret_enc_hid=True,
            infer_text_len=infer_text, text_decode=td)
        (logits, s_lat, s_l, _), st = U.cm_text_in(
            params, st, ctx, cfg, text, text_len, ret_enc_hid=True,
            infer_mel_len=infer_mel)
        d_loss = _disc_adv_loss(params, ctx, ctx.next_rng(), cfg,
                                t_lat, t_l, s_lat, s_l)
        aux["d_cm"] = d_loss
    else:
        (pre, post, stop), st = U.cm_speech_in(
            params, net_state, ctx, cfg, mel, mel_len,
            infer_text_len=infer_text, text_decode=td)
        logits, st = U.cm_text_in(params, st, ctx, cfg, text, text_len,
                                  infer_mel_len=infer_mel)
        d_loss = 0.0
    s_cm = L.speech_loss(mel, gold_stop, pre, post, mel_len, stop,
                         args.s_eos_weight)
    t_cm = L.text_loss(text, logits, args.t_eos_weight)
    moe = _moe_aux(ctx, args, aux)
    aux.update(s_cm=s_cm, t_cm=t_cm)
    return (s_cm + t_cm + d_loss + moe) * scale, (aux, st)


def disc_loss_fn(disc_params, gen_params, net_state, rng, batch,
                 cfg: ModelConfig, args, scale):
    """Discriminator training objective on detached encodings with TRUE
    labels (src/train.py:337-354)."""
    text, mel, text_len, mel_len, _ = _gold(batch)
    ctx = _obj_ctx(rng, args)
    params = dict(gen_params, discriminator=disc_params)
    (t_enc, _), _ = N.text_encode(params["text_m"], net_state["text_m"],
                                  ctx, cfg, text, text_len)
    (s_enc, _), _ = N.speech_encode(params["speech_m"], net_state["speech_m"],
                                    ctx, cfg, mel, mel_len)
    t_lat = jax.lax.stop_gradient(U._latent(t_enc, cfg))
    s_lat = jax.lax.stop_gradient(U._latent(s_enc, cfg))
    d_hid, d_len, d_target = disc_shuffle_batch(
        ctx.next_rng(), t_lat, text_len, s_lat, mel_len,
        train_discriminator=True)
    d_out = U.lstm_discriminator(params["discriminator"], ctx, d_hid, d_len)
    d_loss = L.discriminator_loss(d_out, d_target)
    return d_loss * scale, {"d": d_loss}


# ---------------------------------------------------------------------------
# Gradient accumulation over stacked micro-batches
# ---------------------------------------------------------------------------


def _accumulate(loss_fn, params, net_state, rng, stacked_batches):
    """lax.scan over the leading micro-batch axis, summing grads and
    threading BatchNorm state. Returns (grads, new_state, stacked_aux)."""
    zero_grads = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, jnp.float32), params)

    def body(carry, xs):
        acc, st = carry
        i, batch = xs
        (_, (aux, new_st)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, st, jax.random.fold_in(rng, i), batch)
        acc = jax.tree_util.tree_map(
            lambda a, b: a + b.astype(jnp.float32), acc, g)
        return (acc, new_st), aux

    n = jax.tree_util.tree_leaves(stacked_batches)[0].shape[0]
    idx = jnp.arange(n)
    (grads, new_state), aux = jax.lax.scan(
        body, (zero_grads, net_state), (idx, stacked_batches))
    return grads, new_state, aux


def make_train_step(cfg: ModelConfig, args):
    """Returns train_step(ts, rng, batches) -> (ts, metrics), jittable.

    `batches` is a dict with stacked micro-batch pytrees:
      'ae': [ae_steps, B, ...], 'cm': [cm_steps, ...], 'sp': [sp_steps, ...]
      and, when cfg.use_discriminator, 'd': [d_steps, ...].
    Each micro-batch is (text, mel, text_len, mel_len)."""
    gen_tx, disc_tx = make_optimizers(cfg, args)
    accum = args.ae_steps + args.cm_steps + args.sp_steps
    scale = 1.0 / accum

    def train_step(ts: TrainState, rng, batches):
        metrics = {}
        k_ae, k_cm, k_sp, k_d = jax.random.split(rng, 4)

        total = None
        net_state = ts.net_state
        for name, key, fn in (("ae", k_ae, ae_loss_fn),
                              ("cm", k_cm, cm_loss_fn),
                              ("sp", k_sp, sp_loss_fn)):
            if name not in batches:
                continue
            loss_fn = functools.partial(fn, cfg=cfg, args=args, scale=scale)
            g, net_state, aux = _accumulate(loss_fn, ts.params, net_state,
                                            key, batches[name])
            total = g if total is None else jax.tree_util.tree_map(
                jnp.add, total, g)
            metrics.update({f"{name}/{k}": jnp.mean(v) for k, v in aux.items()})

        gen_params, disc_params = split_params(ts.params)
        gen_opt = ts.gen_opt
        if total is not None:
            gen_grads = {k: v for k, v in total.items()
                         if k != "discriminator"}
            metrics["grad_norm"] = optax.global_norm(gen_grads)
            updates, gen_opt = gen_tx.update(gen_grads, gen_opt, gen_params)
            gen_params = optax.apply_updates(gen_params, updates)
        new_params = dict(gen_params)
        disc_opt = ts.disc_opt

        if cfg.use_discriminator and "d" in batches:
            d_fn = functools.partial(
                disc_loss_fn, gen_params=gen_params, net_state=net_state,
                cfg=cfg, args=args, scale=1.0 / args.d_steps)

            def d_loss(disc_p, st, key, batch):
                loss, aux = d_fn(disc_p, rng=key, batch=batch)
                return loss, (aux, st)

            d_grads, _, d_aux = _accumulate(d_loss, disc_params, net_state,
                                            k_d, batches["d"])
            d_updates, disc_opt = disc_tx.update(d_grads, disc_opt, disc_params)
            disc_params = optax.apply_updates(disc_params, d_updates)
            metrics.update({f"d/{k}": jnp.mean(v) for k, v in d_aux.items()})

        if disc_params is not None:
            new_params["discriminator"] = disc_params

        if getattr(args, "param_sum_metric", False):
            # reference logs sum|params| per step (src/train.py:646-651);
            # an O(params) reduction, so opt-in
            metrics["param_sum"] = sum(
                jnp.sum(jnp.abs(x))
                for x in jax.tree_util.tree_leaves(new_params))
        new_ts = TrainState(new_params, net_state, gen_opt, disc_opt,
                            ts.step + 1)
        return new_ts, metrics

    return train_step
