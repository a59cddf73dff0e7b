"""unast_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the UNAST reference (unsupervised adversarial speech<->text).

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

  unast_tpu.text      — L0 text frontend (symbols, cleaners, numbers, G2P)
  unast_tpu.audio     — L1 audio DSP (jitted STFT/mel, Griffin-Lim loop)
  unast_tpu.data      — L1 datasets, bucketed fixed-shape batching
  unast_tpu.nn        — functional NN core (init/apply pairs over pytrees)
  unast_tpu.models    — L2/L3 networks + UNAST facade with KV-cached decode
  unast_tpu.ops       — Pallas TPU kernels (flash attention)
  unast_tpu.train     — L4 losses, augmentation, jitted multi-objective step,
                        schedules, checkpointing, metrics, training loop
  unast_tpu.infer     — L4/L5 eval harness, vocoder, Griffin-Lim/synthesis CLI
  unast_tpu.parallel  — device mesh + GSPMD sharding (dp x tp) over ICI
  unast_tpu.native    — C++ runtime via ctypes (metrics, wav IO, collation)
"""

import os as _os

__version__ = "0.1.0"

PAD_IDX = 0
SOS_IDX = 1
EOS_IDX = 2


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the decode/train-step programs take
    minutes to compile (single-core host); caching makes repeated CLI/bench
    runs start hot. Disable with UNAST_NO_COMP_CACHE=1."""
    if _os.environ.get("UNAST_NO_COMP_CACHE"):
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/unast_tpu_xla"))
        if "cpu" in (_os.environ.get("JAX_PLATFORMS") or "").lower():
            # XLA:CPU persists AOT results (host machine code) under a
            # cache key that does NOT include the host's CPU features;
            # loading an executable compiled on a different machine (or
            # with different XLA tuning features) kills the process
            # (observed: "Target machine feature +prefer-no-gather is
            # not supported on the host machine" -> Fatal Python error:
            # Aborted, from a cache written by an earlier round's host).
            # Scope CPU-backend caches to a host fingerprint so reuse is
            # same-machine only; device-backend caches (device binaries,
            # host-independent) keep the shared directory.
            import hashlib as _hashlib
            import platform as _platform
            try:
                with open("/proc/cpuinfo") as _f:
                    _flags = next(
                        (l for l in _f if l.startswith("flags")), "")
            except OSError:
                _flags = _platform.processor()
            _fp = _hashlib.sha256(
                (_platform.machine() + _flags).encode()).hexdigest()[:12]
            cache_dir = _os.path.join(cache_dir, f"cpu-{_fp}")
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
