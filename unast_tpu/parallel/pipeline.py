"""Pipeline parallelism: GPipe-style staged transformer encoder.

The reference has no distributed machinery at all (single process, single
device — SURVEY.md §2.3/§5.8), so like the rest of `parallel/` this is a
pure TPU-native addition: the lever for models whose layer stack exceeds
one chip's HBM. Layers are split into `pp` contiguous stages, each stage
pinned to one mesh slice; micro-batches stream through the stages with
activations hopping stage→stage over ICI via `lax.ppermute` inside a
`shard_map` (the scaling-book pipeline recipe — hand-placed compute, XLA
compiles each stage's layers as one fused body).

Schedule: classic GPipe fill-and-drain. With M micro-batches and S stages
the loop runs M+S-1 ticks; each tick every stage runs its layers on its
in-flight micro-batch, then activations rotate one stage forward. Bubble
fraction = (S-1)/(M+S-1), so M >= ~4*S keeps utilization high. The whole
schedule is differentiable (ppermute transposes to the reverse rotation),
so the same function trains — autodiff yields the standard GPipe backward
drain for free.

UNAST's flagship stack (4 layers, d=256) fits one chip thousands of times
over, so this is validated for correctness on the virtual CPU mesh
(tests/test_ops.py) and exposed for scale rather than wired into the
parity configs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import nn
from ..models import transformer as T

# ---------------------------------------------------------------------------
# In-train-step pipelining (cfg.pp > 1): the transformer stacks call
# gpipe_stack (below) from models/transformer.py. The stage axis is a
# GSPMD-sharded leading dim; these helpers carry the active mesh so the
# sharding constraints can be placed without threading a Mesh through
# every model signature. shard_train_step sets it when the mesh has a
# 'pp' axis; None (the default) runs the same schedule unsharded (the
# single-host test substrate).
# ---------------------------------------------------------------------------

_PP_MESH = None


def set_pp_mesh(mesh):
    """Install (or clear, with None) the mesh used by in-step pipeline
    sharding constraints. Captured at trace time."""
    global _PP_MESH
    _PP_MESH = mesh if (mesh is not None and "pp" in mesh.shape) else None


def _pp_stage_constraint(tree):
    """Constrain the leading (stage) axis of every leaf over 'pp',
    leaving the other dims to GSPMD propagation (so tp/dp splits on the
    trailing dims survive)."""
    if _PP_MESH is None:
        return tree
    mesh = _PP_MESH
    U = P.UNCONSTRAINED

    def c(a):
        spec = P(*(("pp",) + (U,) * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(c, tree)


def gpipe_stack(stacked, n_layers: int, pp: int, ctx: nn.Ctx, x,
                micro_args, layer_fn, n_micro: int = 0):
    """Run a transformer layer stack as a GPipe pipeline inside a GSPMD
    program (the cfg.pp > 1 path of models/transformer.py::encoder /
    decoder).

    stacked: pytree with leading [L] layer axis (transformer._stack_layers
    output). x: [B, T, D]. micro_args: tuple of arrays with leading batch
    dim B that each layer needs alongside x (encoder: the padding bias;
    decoder: memory + self/cross biases) — micro-sliced in lockstep with x.
    layer_fn(lp, lctx, x_mb, *marg_mb) -> x_mb runs ONE layer.

    Formulation: vmap over a [S]-leading stage axis (sharded over 'pp'
    when a mesh is installed) computes all stages each tick; micro-batch
    k enters stage 0 at tick k and exits stage S-1 at tick k+S-1; the
    stage->stage activation hop is jnp.roll over the stage axis, which
    GSPMD lowers to a collective-permute over ICI. M+S-1 ticks total,
    bubble (S-1)/(M+S-1) — the classic fill-and-drain schedule, fully
    differentiable (roll transposes to the reverse rotation, giving the
    GPipe backward drain for free).

    Per-layer dropout keys fold (global_layer * M + micro) from one base
    key — micro-batches get independent masks (deviation from the
    sequential stack's one-mask-per-layer, same as the standalone
    pipeline_encoder; identical numerics at dropout 0 / eval).

    Returns [B, T, D]."""
    assert n_layers % pp == 0, f"{n_layers} layers over {pp} stages"
    per_stage = n_layers // pp
    b = x.shape[0]
    if n_micro <= 0:
        n_micro = next((m for m in (4 * pp, 2 * pp, pp) if b % m == 0), 1)
    assert b % n_micro == 0, f"batch {b} not divisible into {n_micro} micros"
    mb = b // n_micro

    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((pp, per_stage) + a.shape[1:]), stacked)
    staged = _pp_stage_constraint(staged)
    xs = x.reshape((n_micro, mb) + x.shape[1:])
    margs = tuple(a.reshape((n_micro, mb) + a.shape[1:]) for a in micro_args)
    rng_base = ctx.next_rng() if ctx.rng is not None else None

    def stage_fn(sp_tree, sidx, mbi, x_mb, marg_mb):
        def body(x_c, scan_in):
            lp, li = scan_in
            gli = sidx * per_stage + li
            lctx = T._layer_ctx(rng_base, ctx.train, gli * n_micro + mbi)
            return layer_fn(lp, lctx, x_c, *marg_mb), None

        x_mb, _ = jax.lax.scan(body, x_mb,
                               (sp_tree, jnp.arange(per_stage)))
        return x_mb

    v_stage = jax.vmap(stage_fn)
    sidx_arr = jnp.arange(pp)
    buf = jnp.zeros((pp, mb) + x.shape[1:], x.dtype)
    out = jnp.zeros_like(xs)

    def pick(a, idx):
        """a: [M, ...], idx: [S] -> [S, ...] (per-stage micro gather)."""
        return jax.vmap(
            lambda i: jax.lax.dynamic_index_in_dim(a, i, keepdims=False)
        )(idx)

    def tick(k, state):
        buf, out = state
        inj = jax.lax.dynamic_index_in_dim(
            xs, jnp.minimum(k, n_micro - 1), keepdims=False)
        sel = (sidx_arr == 0).reshape((-1,) + (1,) * (buf.ndim - 1))
        buf = jnp.where(sel, inj[None].astype(buf.dtype), buf)
        mbi = jnp.clip(k - sidx_arr, 0, n_micro - 1)  # [S]
        marg_mb = tuple(pick(a, mbi) for a in margs)
        y = v_stage(staged, sidx_arr, mbi, buf, marg_mb)
        done = jnp.clip(k - (pp - 1), 0, n_micro - 1)
        upd = jax.lax.dynamic_update_index_in_dim(
            out, y[-1].astype(out.dtype), done, axis=0)
        out = jnp.where(k >= pp - 1, upd, out)
        return jnp.roll(y, 1, axis=0), out

    _, out = jax.lax.fori_loop(0, n_micro + pp - 1, tick, (buf, out))
    return out.reshape(x.shape)


def _pvary(x):
    """Mark a shard_map-local array as varying over 'pp' (jax>=0.8 tracks
    varying-manual-axes; a zeros init is unvarying until cast)."""
    try:
        return jax.lax.pcast(x, ("pp",), to="varying")
    except (AttributeError, TypeError):
        try:
            return jax.lax.pvary(x, ("pp",))
        except AttributeError:  # older jax: no VMA tracking at all
            return x


def make_pp_mesh(pp: int, devices=None) -> Mesh:
    """1-D ('pp',) mesh of pipeline stages."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= pp, f"need {pp} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:pp]), ("pp",))


def stack_for_pipeline(p, pp: int):
    """Encoder params {'layers': [L dicts]} -> stacked [S, L/S, ...] pytree
    with the stage axis leading (shard axis 0 over 'pp')."""
    n = len(p["layers"])
    assert n % pp == 0, f"{n} layers do not divide into {pp} stages"
    stacked = T._stack_layers(p["layers"])  # [L, ...]
    return jax.tree_util.tree_map(
        lambda x: x.reshape((pp, n // pp) + x.shape[1:]), stacked)


def pipeline_encoder(stage_params, ctx: nn.Ctx, x, pad_mask, nhead: int,
                     dropout_p: float, mesh: Mesh, n_micro: int):
    """Transformer encoder (parity semantics of models/transformer.py::
    encoder) run as a `pp`-stage GPipe pipeline over `mesh`.

    stage_params: output of `stack_for_pipeline` ([S, L/S, ...] leaves).
    x: [B, T, D]; pad_mask: bool [B, T]; B must divide into n_micro
    micro-batches. Returns [B, T, D] identical (up to float assoc) to the
    sequential encoder."""
    pp = mesh.shape["pp"]
    b, t, d = x.shape
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro {n_micro}"
    mb = b // n_micro
    per_stage = jax.tree_util.tree_leaves(stage_params)[0].shape[1]
    bias = T.padding_bias(pad_mask)                    # [B, 1, 1, T]
    xs = x.reshape(n_micro, mb, t, d)
    biases = bias.reshape(n_micro, mb, 1, 1, t)
    rng_base = ctx.next_rng() if ctx.rng is not None else None

    def stage_fn(lp_stage, stage_idx, mb_idx, x_mb, bias_mb):
        """Run this stage's L/S layers sequentially on one micro-batch."""
        def body(x, li):
            lp = jax.tree_util.tree_map(lambda a: a[li], lp_stage)
            gli = stage_idx * per_stage + li   # global layer index
            # distinct dropout mask per (layer, micro-batch) — matches the
            # sequential encoder's one-independent-mask-per-row semantics
            lctx = T._layer_ctx(rng_base, ctx.train,
                                gli * n_micro + mb_idx)
            return T.encoder_layer(lp, lctx, x, bias_mb, nhead, dropout_p), None
        x_mb, _ = jax.lax.scan(body, x_mb, jnp.arange(per_stage))
        return x_mb

    def pipelined(lp_stage, xs, biases):
        # Inside shard_map: lp_stage [L/S, ...] (this stage's layers),
        # xs/biases replicated [M, mb, ...].
        lp_stage = jax.tree_util.tree_map(lambda a: a[0], lp_stage)
        sidx = jax.lax.axis_index("pp")
        carry = _pvary(jnp.zeros((mb, t, d), xs.dtype))
        out = _pvary(jnp.zeros_like(xs))

        def tick(k, state):
            carry, out = state
            # stage 0 injects micro-batch k (clamped; garbage ticks beyond
            # M-1 are never stored)
            inj = jax.lax.dynamic_index_in_dim(
                xs, jnp.minimum(k, n_micro - 1), keepdims=False)
            cur = jnp.where(sidx == 0, inj, carry)
            # every stage must see the bias of the micro-batch it holds:
            # stage s at tick k holds micro-batch k - s
            mbi = jnp.clip(k - sidx, 0, n_micro - 1)
            bias_mb = jax.lax.dynamic_index_in_dim(biases, mbi, keepdims=False)
            y = stage_fn(lp_stage, sidx, mbi, cur, bias_mb)
            # last stage finishes micro-batch k-(S-1) at tick k
            done = jnp.clip(k - (pp - 1), 0, n_micro - 1)
            store = (sidx == pp - 1) & (k >= pp - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                out, y.astype(out.dtype), done, axis=0)
            out = jnp.where(store, upd, out)
            carry = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return carry, out

        _, out = jax.lax.fori_loop(0, n_micro + pp - 1, tick, (carry, out))
        # result lives on the last stage; zeros elsewhere -> psum gathers it
        out = jnp.where(sidx == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pp")

    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map
    specs_p = jax.tree_util.tree_map(lambda _: P("pp"), stage_params)
    fn = shard_map(pipelined, mesh=mesh,
                   in_specs=(specs_p, P(), P()), out_specs=P())
    out = fn(jax.device_put(
        stage_params, jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P("pp")), stage_params)),
        xs, biases)
    return out.reshape(b, t, d)
