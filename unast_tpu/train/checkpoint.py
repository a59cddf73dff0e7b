"""Checkpoint / resume — parity with save_ckp/load_ckp
(src/utils.py:139-195): the same four file roles (model_temporary /
model_most_recent / model_best / model_<epoch>), state = (epoch+1, best
metric, model, optimizer).

Backend: Orbax StandardCheckpointer over the TrainState pytree (async-safe,
TPU-host friendly); epoch/best/rng ride a small JSON sidecar so restore
needs only an abstract template of the arrays."""

import json
import os
import shutil
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .steps import TrainState


def _roles(checkpoint_path: str, epoch: int, temporary: bool, epoch_save: bool):
    if temporary:
        return [os.path.join(checkpoint_path, "model_temporary.ckpt")]
    if epoch_save:
        return [os.path.join(checkpoint_path, f"model_{epoch}.ckpt")]
    return [os.path.join(checkpoint_path, "model_most_recent.ckpt")]


# Singleton async checkpointer: Orbax's StandardCheckpointer already
# splits save() into a blocking device->host snapshot plus a background
# disk write; reusing one instance across calls lets the write of epoch N
# overlap epoch N+1's training (only one save may be in flight at a time,
# so each call first drains the previous one).
_ASYNC_CKPTR = None


def _async_ckptr() -> ocp.StandardCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.StandardCheckpointer()
    return _ASYNC_CKPTR


def wait_for_saves():
    """Drain any in-flight async checkpoint write (call before exit and
    before restoring from a path that might still be being written)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_ckp(epoch: int, valid_metric: float, ts: TrainState, is_best: bool,
             checkpoint_path: str, temporary_save: bool = False,
             epoch_save: bool = False, rng=None, async_save: bool = False):
    """async_save=True returns as soon as the arrays are snapshotted to
    host; the disk write proceeds in the background (--async_ckpt). The
    device->host copy is synchronous either way, so donating `ts` to the
    next train step is safe."""
    os.makedirs(checkpoint_path, exist_ok=True)
    ckptr = _async_ckptr() if async_save else ocp.StandardCheckpointer()
    meta = {"epoch": epoch + 1, "valid_loss_min": float(valid_metric),
            "rng": np.asarray(rng).tolist() if rng is not None else None}
    paths = _roles(checkpoint_path, epoch, temporary_save, epoch_save)
    if is_best and not temporary_save and not epoch_save:
        paths.append(os.path.join(checkpoint_path, "model_best.ckpt"))
    for i, path in enumerate(paths):
        ckptr.wait_until_finished()  # drain any previous in-flight save
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(os.path.abspath(path), ts)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    if not async_save:
        ckptr.wait_until_finished()


def load_ckp(ckpt_fpath: str, template: TrainState
             ) -> Tuple[int, float, TrainState, Optional[np.ndarray]]:
    """Restore (epoch, best_metric, train_state, rng). `template` is a
    freshly-initialized TrainState supplying the pytree structure."""
    wait_for_saves()  # the path may still be mid-write by an async save
    if not os.path.exists(ckpt_fpath):
        raise FileNotFoundError(f"no checkpoint at {ckpt_fpath}")
    # convenience: a save DIRECTORY (save_ckp's target) resolves to its
    # best checkpoint (meta.json lives next to the inner .ckpt dirs)
    if (os.path.isdir(ckpt_fpath)
            and not os.path.exists(ckpt_fpath + ".meta.json")):
        inner = os.path.join(ckpt_fpath, "model_best.ckpt")
        if os.path.exists(inner + ".meta.json"):
            ckpt_fpath = inner
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    ts = ckptr.restore(os.path.abspath(ckpt_fpath), abstract)
    with open(ckpt_fpath + ".meta.json") as f:
        meta = json.load(f)
    rng = (np.asarray(meta["rng"], np.uint32)
           if meta.get("rng") is not None else None)
    return meta["epoch"], meta["valid_loss_min"], ts, rng
