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


def save_ckp(epoch: int, valid_metric: float, ts: TrainState, is_best: bool,
             checkpoint_path: str, temporary_save: bool = False,
             epoch_save: bool = False, rng=None):
    os.makedirs(checkpoint_path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    meta = {"epoch": epoch + 1, "valid_loss_min": float(valid_metric),
            "rng": np.asarray(rng).tolist() if rng is not None else None}
    paths = _roles(checkpoint_path, epoch, temporary_save, epoch_save)
    if is_best and not temporary_save and not epoch_save:
        paths.append(os.path.join(checkpoint_path, "model_best.ckpt"))
    for path in paths:
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(os.path.abspath(path), ts)
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    ckptr.wait_until_finished()


def load_ckp(ckpt_fpath: str, template: TrainState
             ) -> Tuple[int, float, TrainState, Optional[np.ndarray]]:
    """Restore (epoch, best_metric, train_state, rng). `template` is a
    freshly-initialized TrainState supplying the pytree structure."""
    if not os.path.exists(ckpt_fpath):
        raise FileNotFoundError(f"no checkpoint at {ckpt_fpath}")
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    ts = ckptr.restore(os.path.abspath(ckpt_fpath), abstract)
    with open(ckpt_fpath + ".meta.json") as f:
        meta = json.load(f)
    rng = (np.asarray(meta["rng"], np.uint32)
           if meta.get("rng") is not None else None)
    return meta["epoch"], meta["valid_loss_min"], ts, rng
