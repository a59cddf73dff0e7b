"""Optimizers and LR schedules via optax — parity with the reference's
Adam/AdamW + three schedules (src/train.py:858-956).

The reference uses ONE torch optimizer over all parameters and toggles
requires_grad to alternate generator/discriminator phases
(src/train.py:465-471). The functional equivalent is two optax chains over
disjoint param partitions, each stepped once per outer step — identical
effective updates (frozen torch params produce grad=None and are skipped)."""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# Schedules (multiplier applied to base lr, matching LambdaLR semantics)
# ---------------------------------------------------------------------------


def multistep_schedule(base_lr: float, milestones, gamma: float):
    """torch MultiStepLR: lr *= gamma at each milestone step."""
    ms = sorted(milestones)

    def fn(step):
        count = jnp.sum(jnp.asarray([step >= m for m in ms]).astype(jnp.int32)) \
            if ms else 0
        return base_lr * (gamma ** count)

    return fn


def linear_warmup_decay_schedule(base_lr: float, warmup_steps: int,
                                 total_steps: int):
    """Linear warmup to base_lr then linear decay to 0 (src/train.py:858-884)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return fn


def transformer_schedule(base_lr: float, warmup_steps: int):
    """"Attention is all you need" inverse-sqrt with warmup
    (src/train.py:887-907): step/warmup^1.5 during warmup, then 1/sqrt(step)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, float(warmup_steps) ** 1.5)
        decay = 1.0 / jnp.sqrt(jnp.maximum(1.0, step))
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return fn


def make_schedule(args) -> optax.Schedule:
    sched = getattr(args, "sched_type", "transformer")
    lr = args.lr
    if sched == "multistep":
        ms = [m * args.epoch_steps for m in args.lr_milestones]
        return multistep_schedule(lr, ms, args.lr_gamma)
    if sched == "linear":
        return linear_warmup_decay_schedule(
            lr, args.warmup_steps, args.epochs * args.epoch_steps)
    if sched == "transformer":
        return transformer_schedule(lr, args.warmup_steps)
    return lambda step: jnp.asarray(lr, jnp.float32)


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------


def make_optimizer(args, schedule: Optional[optax.Schedule] = None):
    """Build the optax chain for one param partition. grad_clip > 0 applies
    global-norm clipping before the step (src/train.py:358-363)."""
    schedule = schedule or make_schedule(args)
    optim_type = getattr(args, "optim_type", "adamw")
    wd = getattr(args, "weight_decay", 0.0)
    parts = []
    if getattr(args, "grad_clip", 0.0) and args.grad_clip > 0:
        parts.append(optax.clip_by_global_norm(args.grad_clip))
    if optim_type == "adam":
        # torch Adam L2: grad += wd * param BEFORE the moment update.
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    elif optim_type == "adamw":
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        if wd:
            parts.append(optax.add_decayed_weights(wd))
    elif optim_type == "adafactor":
        # Memory lever for the wide-model regime (ADDITION; the reference
        # is Adam-only, src/train.py:946-956): factored second moments
        # replace Adam's two full-tree f32 moments (~8 bytes/param ->
        # ~O(rows+cols)), e.g. ~3.1 GB saved at the d=1024/386M scale.
        # The external schedule drives the step size, so Adafactor's own
        # lr heuristics are disabled for parity with the other chains.
        parts.append(optax.scale_by_factored_rms())
        parts.append(optax.clip_by_block_rms(1.0))
        if wd:
            parts.append(optax.add_decayed_weights(wd))
    else:
        raise ValueError(f"unknown optim_type {optim_type}")
    parts.append(optax.scale_by_schedule(lambda s: -schedule(s)))
    return optax.chain(*parts)


class EmaState(NamedTuple):
    """Exponential moving average of the PARAMETERS, held inside the
    optimizer chain state (so it checkpoints/shards with the rest of the
    train state — the mesh path rule and ZeRO dp-sharding apply to it
    unchanged, because the tree mirrors the param tree)."""
    ema: Any


def params_ema(decay: float) -> optax.GradientTransformation:
    """Track an EMA of the post-update parameters. Appended LAST in the
    chain so `updates` are final; passes them through untouched. Capability
    add over the reference (no EMA there): decoupled weight averaging for
    eval/serving, a standard TTS quality lever."""

    def init(params):
        # Real copies: jnp.asarray would alias the param buffers, and the
        # donated train step then sees the same buffer twice (params +
        # chain state) — XLA rejects double donation.
        return EmaState(jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), params))

    def update(updates, state, params=None):
        assert params is not None, "params_ema needs params"
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_p)
        return updates, EmaState(ema)

    return optax.GradientTransformation(init, update)


def find_ema(opt_state):
    """Extract the EMA param tree from a chain state (None if no
    params_ema transform in the chain)."""
    for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, EmaState)):
        if isinstance(s, EmaState):
            return s.ema
    return None


def split_params(params):
    """(generator_params, discriminator_params_or_None)."""
    gen = {k: v for k, v in params.items() if k != "discriminator"}
    return gen, params.get("discriminator")


def global_norm(tree) -> jnp.ndarray:
    return optax.global_norm(tree)
