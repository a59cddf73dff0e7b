"""Observability: metrics logging (JSONL + optional TensorBoard via torch),
jax.profiler trace hooks, and the NaN sentinel.

Parity targets: the reference's TensorBoard scalars/examples
(src/train.py:641-764) and check_nan_loss dump-and-exit
(src/train.py:166-196). The reference has no profiler (SURVEY.md §5.1); the
jax.profiler hook is the TPU-native addition."""

import contextlib
import json
import os
import sys
import time
from typing import Dict, Optional

import numpy as np


class MetricsWriter:
    """Scalars to JSONL always; to TensorBoard when a log dir is given and
    torch's SummaryWriter is importable."""

    def __init__(self, jsonl_path: Optional[str] = None,
                 tb_log_path: Optional[str] = None):
        self._jsonl = None
        if jsonl_path:
            os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
            self._jsonl = open(jsonl_path, "a")
        self._tb = None
        if tb_log_path:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=tb_log_path, flush_secs=60)
            except Exception as e:  # pragma: no cover
                print(f"[observe] tensorboard unavailable: {e}", file=sys.stderr)

    def scalars(self, step: int, values: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in values.items():
            rec[prefix + k] = float(v)
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in values.items():
                self._tb.add_scalar(prefix + k, float(v), step)

    def text(self, step: int, tag: str, s: str):
        if self._tb:
            self._tb.add_text(tag, s, step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


def log_loss_metrics(losses: Dict[str, list], epoch: int, eval_: bool = False):
    """Console epoch summary (src/train.py:756-764)."""
    kind = "Eval_" if eval_ else "Train"
    parts = [f"{kind} epoch {epoch:-3d}"]
    for k in sorted(losses):
        parts.append(f"{k} loss = {np.mean(losses[k]):0.3f}")
    print(" \t".join(parts))


def check_nan(metrics: Dict[str, float], step: int, dump_dir: str = "."):
    """NaN sentinel (src/train.py:166-196): on any non-finite metric, dump
    the metric dict and exit."""
    bad = {k: v for k, v in metrics.items() if not np.isfinite(v)}
    if bad:
        path = os.path.join(dump_dir, f"nan_dump_step{step}.json")
        with open(path, "w") as f:
            json.dump({k: float(v) for k, v in metrics.items()}, f, indent=2)
        print(f"Discovered NaN loss at step {step}: {sorted(bad)} "
              f"(dump: {path})", file=sys.stderr)
        sys.exit(1)


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    """jax.profiler trace behind a config flag (SURVEY.md §5.1)."""
    if not profile_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class TeacherRatio:
    """Exponential teacher-forcing decay (src/utils.py:116-136). Dormant in
    the reference (teacher.step() commented out, every call passes ratio=1 —
    SURVEY.md #51) but kept for capability parity."""

    def __init__(self, args):
        self.iter = 0
        self.val = args.teacher_init_val
        self.gamma = args.teacher_gamma
        self.start_step = args.teacher_decay_start
        self.stop_step = args.teacher_decay_end

    def step(self):
        self.iter += 1

    def get_val(self) -> float:
        if self.start_step <= self.iter:
            power = min(self.iter, self.stop_step) - self.start_step
            return self.val * (self.gamma ** power)
        return self.val
