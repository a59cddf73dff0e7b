"""Multi-host (DCN) utilities — data sharding per process + distributed
initialization. Single-chip remains the parity configuration
(SURVEY.md §5.8); these helpers are the TPU-pod growth path.

Pattern: every host loads only its shard of each global batch
(host-local BatchIterator over a strided subset of the dataset), then
jax.make_array_from_process_local_data assembles the logically-global
sharded array; gradient reduction stays on ICI/DCN via the same psum XLA
already inserts for the 'dp' mesh axis."""

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """jax.distributed.initialize() when launched under a multi-process
    runtime (JAX_COORDINATOR_ADDRESS env); no-op single-process. MUST run
    before anything touches a JAX backend (jax.devices/process_count), so
    the env check comes first."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
    except RuntimeError as e:
        # already initialized by the launcher
        print(f"[multihost] distributed init skipped: {e}")


class HostShardedDataset:
    """View of a dataset restricted to this process's strided shard, so each
    host reads 1/num_processes of the corpus (the DataLoader-worker analogue
    scaled across hosts)."""

    def __init__(self, dataset, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.ds = dataset
        self.pi = jax.process_index() if process_index is None else process_index
        self.pc = jax.process_count() if process_count is None else process_count
        self.idx = list(range(self.pi, len(dataset), self.pc))

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        return self.ds[self.idx[i]]


def global_batch_from_local(mesh: Mesh, local_batch, batch_axis: str = "dp"):
    """Assemble logically-global device arrays from each host's local batch
    slice. local_batch leaves: [local_B, ...] numpy; returns jax.Arrays
    sharded over `batch_axis` with global_B = local_B * process_count."""
    def make(leaf):
        leaf = np.asarray(leaf)
        spec = P(batch_axis, *([None] * (leaf.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sharding, leaf)
    return jax.tree_util.tree_map(make, local_batch)
