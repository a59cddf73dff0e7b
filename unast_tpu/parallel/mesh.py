"""Device mesh and sharding rules.

Design (scaling-book recipe): pick a mesh, annotate shardings on the jit
boundary, let XLA/GSPMD insert collectives over ICI.

  - dp axis: batch dimension of every micro-batch; gradients are reduced by
    XLA with a psum over 'dp' because the loss is a mean over the sharded
    batch axis.
  - tp axis: megatron-style split of each transformer layer — QKV and FFN
    up-projections column-split (output features / heads over 'tp'), output
    and FFN down-projections row-split (input features over 'tp') so each
    pair needs a single all-reduce per block. Small glue params (norms,
    embeddings, convs, biases of row-split layers) are replicated.
  - sp axis (optional): sequence parallelism — the time axis of every
    batch array (text ids [.., B, T], mels [.., B, T, D]) is sharded over
    'sp'. Elementwise/prenet/LN work then touches only T/sp frames per
    chip; GSPMD inserts the attention K/V all-gathers and conv halo
    exchanges itself. Params stay replicated over 'sp'. The reference has
    no long-context machinery at all (SURVEY §5.7) — this is the additive
    TPU-native lever for sequences past one chip's HBM.
  - ep axis (optional): expert parallelism — MoE expert-stacked FFN weights
    [E, ...] (models/moe.py) are sharded over 'ep' on the leading expert
    axis; the dispatch/combine einsums then induce the all-to-all-style
    collectives under GSPMD. Dense params are replicated over 'ep'.

  - ZeRO / FSDP (optional, `zero=`): state sharding over the EXISTING 'dp'
    axis — no extra mesh axis. zero=1 shards only the Adam moments (each
    dp rank owns a 1/dp slice; XLA lowers the optimizer update to
    reduce-scatter(grads) -> sharded update -> all-gather(updates), the
    ZeRO-1 communication pattern, cutting optimizer HBM by dp x). zero=3
    additionally shards the parameters themselves at rest (FSDP): one
    explicit gather back to the compute layout at step start (see
    shard_train_step — per-use gathers would re-gather every weight at
    every decode step inside the cm phase's while_loops), grads
    reduce-scattered at the gather's transpose, optimizer update on the
    dp-sharded state. Stage 2 has no separate meaning under XLA's
    dataflow: gradients are not persistent state, so there is nothing
    extra to shard between 1 and 3.

The same path-based rule shards the optimizer moments because optax's
ScaleByAdamState mirrors the param tree structure."""

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int, tp: int = 1, sp: int = 1, ep: int = 1,
              pp: int = 1, devices=None) -> Mesh:
    """(dp, tp[, ep][, sp][, pp]) mesh. The 'ep' (expert-parallel,
    models/moe.py), 'sp', and 'pp' (GPipe stages, parallel/pipeline.py)
    axes are only materialized when > 1 so existing two-axis meshes keep
    their exact shape."""
    devices = devices if devices is not None else jax.devices()
    n = dp * tp * ep * sp * pp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dims = [("dp", dp), ("tp", tp)]
    if ep > 1:
        dims.append(("ep", ep))
    if sp > 1:
        dims.append(("sp", sp))
    if pp > 1:
        dims.append(("pp", pp))
    arr = np.asarray(devices[:n]).reshape([d for _, d in dims])
    return Mesh(arr, tuple(name for name, _ in dims))


# Column-split (output dim over tp): attention q/k/v, FFN up-projections
# (dense lin1, conformer macaron 'up' halves, conformer conv pointwise-in).
_COL_W = re.compile(r"(^|/)(q|k|v|lin1|up|conv_pw1)/w$")
_COL_B = re.compile(r"(^|/)(q|k|v|lin1|up|conv_pw1)/b$")
# Row-split (input dim over tp): attention out-proj, FFN down-projections.
_ROW_W = re.compile(r"(^|/)(out|lin2|down|conv_pw2)/w$")
# Expert-stacked MoE FFN weights (models/moe.py): leading [E] axis over
# 'ep'; within each expert, the same megatron column/row split over 'tp'.
# The router stays replicated (tiny [D, E] matmul, every chip needs it).
_MOE = re.compile(r"(^|/)moe/(lin1|lin2)/(w|b)$")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
    return "/".join(parts)


def _spec_for(path, leaf, ep_axis: bool = False) -> P:
    if not hasattr(leaf, "ndim") or leaf.ndim < 1:
        return P()
    s = _path_str(path)
    m = _MOE.search(s)
    if m:
        ep = "ep" if ep_axis else None
        kind, wb = m.group(2), m.group(3)
        if wb == "w" and leaf.ndim == 3:   # [E, D, F] up / [E, F, D] down
            return P(ep, None, "tp") if kind == "lin1" else P(ep, "tp", None)
        if wb == "b" and leaf.ndim == 2:   # [E, F] up-bias / [E, D] down-bias
            return P(ep, "tp") if kind == "lin1" else P(ep, None)
        return P()
    if leaf.ndim == 2:
        if _COL_W.search(s):
            return P(None, "tp")
        if _ROW_W.search(s):
            return P("tp", None)
    if leaf.ndim == 1 and _COL_B.search(s):
        return P("tp")
    return P()


def _add_dp(spec: P, leaf, dp: int) -> P:
    """Additionally shard `leaf`'s largest still-unsharded, dp-divisible
    dim over 'dp' (ZeRO/FSDP state sharding). Leaves that cannot split
    evenly (tiny biases, scalars) stay as-is — replication is always
    correct, sharding is an optimization."""
    if not hasattr(leaf, "ndim") or leaf.ndim < 1:
        return spec
    dims = list(spec) + [None] * (leaf.ndim - len(spec))
    for i in sorted(range(leaf.ndim), key=lambda i: -leaf.shape[i]):
        if dims[i] is None and leaf.shape[i] >= dp and leaf.shape[i] % dp == 0:
            dims[i] = "dp"
            return P(*dims)
    return spec


def train_state_shardings(mesh: Mesh, ts, zero: int = 0) -> Any:
    """NamedSharding pytree for a TrainState (params, BN state, optimizer
    moments all via the same path rule; scalars replicated).

    zero=1: optimizer moments additionally sharded over 'dp' (ZeRO-1);
    zero=3: parameters too (FSDP). BN state stays replicated (tiny, and
    updated inside the forward)."""
    ep_axis = "ep" in mesh.shape and mesh.shape["ep"] > 1
    dp = dict(mesh.shape).get("dp", 1)

    def shard(tree, extra_dp: bool = False):
        extra_dp = extra_dp and dp > 1

        def rule(path, leaf):
            spec = _spec_for(path, leaf, ep_axis=ep_axis)
            if extra_dp:
                spec = _add_dp(spec, leaf, dp)
            return NamedSharding(mesh, spec)

        return jax.tree_util.tree_map_with_path(rule, tree)

    if not zero or dp <= 1 or not hasattr(ts, "_replace"):
        return shard(ts)
    return ts._replace(
        params=shard(ts.params, zero >= 3),
        net_state=shard(ts.net_state),
        gen_opt=shard(ts.gen_opt, True),
        disc_opt=shard(ts.disc_opt, True),
        step=shard(ts.step),
    )


def batch_shardings(mesh: Mesh, batches) -> Any:
    """Stacked micro-batches [n, B, ...]: shard B over 'dp'; when the mesh
    has an 'sp' axis, additionally shard the time axis (dim 2 of
    [n, B, T] text ids / [n, B, T, D] mels) over 'sp'."""
    seq_par = "sp" in mesh.shape and mesh.shape["sp"] > 1

    def spec(leaf):
        ndim = leaf.ndim if hasattr(leaf, "ndim") else 0
        if ndim >= 3 and seq_par:
            return NamedSharding(mesh, P(None, "dp", "sp"))
        if ndim >= 2:
            return NamedSharding(mesh, P(None, "dp"))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(spec, batches)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_train_step(train_step, mesh: Mesh, ts, example_batches,
                     zero: int = 0):
    """jit the train step with explicit in/out shardings over the mesh.
    Returns (sharded_step, placed_train_state). zero in {0, 1, 3} selects
    ZeRO-1 moment sharding / FSDP param sharding over the 'dp' axis.
    When the mesh carries a 'pp' axis it is installed as the pipeline
    mesh (pipeline.set_pp_mesh) so cfg.pp>1 stacks place their stage
    constraints — captured when jit traces the step."""
    from .pipeline import set_pp_mesh
    set_pp_mesh(mesh)
    ts_sh = train_state_shardings(mesh, ts, zero=zero)
    b_sh = batch_shardings(mesh, example_batches)
    ts_placed = jax.device_put(ts, ts_sh)
    if zero >= 3:
        # FSDP gather discipline: un-dp the params ONCE at step start
        # (back to their compute layout — tp/ep splits intact) instead of
        # letting GSPMD insert an all-gather at every use site. Per-use
        # gathers inside the cm phase's decode while_loops would re-gather
        # every weight at every decode step (ruinous on ICI, and the
        # per-iteration collectives deadlock XLA:CPU's rendezvous in the
        # 8-virtual-device test backend). The transpose of this constraint
        # is a reduce-scatter of the param grads, and the optimizer update
        # then runs on the dp-sharded state — the ZeRO compute pattern.
        # Moments stay dp-sharded throughout (out_shardings below).
        compute_sh = train_state_shardings(mesh, ts, zero=0).params
        inner_step = train_step

        def train_step(state, rng, batches):
            gathered = jax.lax.with_sharding_constraint(
                state.params, compute_sh)
            return inner_step(state._replace(params=gathered), rng, batches)

    step = jax.jit(
        train_step,
        in_shardings=(ts_sh, replicated(mesh), b_sh),
        out_shardings=(ts_sh, replicated(mesh)),
        donate_argnums=(0,),
    )
    return step, ts_placed
