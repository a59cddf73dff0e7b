"""Worker for the 2-process multihost test (test_pipeline.py::
test_multihost_two_process_train). Each process owns ONE virtual CPU
device; jax.distributed glues them into a 2-device global dp mesh — the
CPU stand-in for per-host TPU slices over DCN. Exercises exactly the
loop's pod path: distributed init, per-host strided dataset shards,
make_array_from_process_local_data batch assembly, one sharded train
step with finite metrics."""
import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{PORT}"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = str(PID)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from unast_tpu.parallel.multihost import (maybe_initialize_distributed,
                                          HostShardedDataset)

maybe_initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import math

import jax.numpy as jnp
import numpy as np
import __graft_entry__ as g
from unast_tpu.data.batching import BatchGetter
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.parallel import make_mesh, shard_train_step, batch_shardings
from unast_tpu.train.steps import init_train_state, make_train_step

args, cfg = g._tiny_cfg_args()
args.train_batch_size = 4  # global; 2 rows per host below
ds = HostShardedDataset(SyntheticSpeechDataset(size=8, seed=0))
assert len(ds) == 4  # strided half of the corpus per host
local_args, _ = g._tiny_cfg_args()
local_args.train_batch_size = args.train_batch_size // jax.process_count()
bg = BatchGetter(local_args, ds, ds, ds)
local = bg.step_batches(local_args, use_discriminator=True)

ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
mesh = make_mesh(dp=2)
step, ts = shard_train_step(make_train_step(cfg, args), mesh, ts, local)
batches = jax.tree_util.tree_map(
    lambda leaf, s: jax.make_array_from_process_local_data(
        s, np.asarray(leaf)), local, batch_shardings(mesh, local))
ts, metrics = step(ts, jax.random.PRNGKey(1), batches)
vals = {k: float(v) for k, v in metrics.items()}
assert all(math.isfinite(v) for v in vals.values()), vals
print(f"[p{PID}] DONE step={int(ts.step)}", flush=True)
