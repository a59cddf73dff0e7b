"""Parallelism layer: device mesh + GSPMD sharding rules.

The reference has NO distributed machinery of any kind (single process,
single device — SURVEY.md §2.3/§5.8), so this layer is a pure TPU-native
addition: a (dp, tp[, sp]) jax.sharding.Mesh, named-sharding rules for
params / optimizer state / batches, and sharded jit wrappers. XLA inserts
the ICI collectives (grad psum over dp, activation all-gathers for tp,
attention K/V gathers + conv halo exchange for sp) — no hand-written
communication."""

from .mesh import (
    make_mesh,
    train_state_shardings,
    batch_shardings,
    replicated,
    shard_train_step,
)
from .pipeline import (gpipe_stack, make_pp_mesh, pipeline_encoder,
                       set_pp_mesh, stack_for_pipeline)

__all__ = ["make_mesh", "train_state_shardings", "batch_shardings",
           "replicated", "shard_train_step",
           "make_pp_mesh", "pipeline_encoder", "stack_for_pipeline",
           "gpipe_stack", "set_pp_mesh"]
