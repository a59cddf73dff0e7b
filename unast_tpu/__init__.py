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
    runs start hot. Disable with UNAST_NO_COMP_CACHE=1.

    CPU backend: the cache is DISABLED outright. XLA:CPU serializes AOT
    host machine code whose cache key does not fully capture host CPU
    features or XLA tuning flags; loading a foreign entry aborts the
    process ("Target machine feature +prefer-no-gather is not supported
    on the host machine" -> SIGILL/SIGABRT), and the serialize-on-write
    path itself has been observed to SIGSEGV mid-suite (round-3 judge
    run, jax compilation_cache.put_executable_and_time). A round-3
    host-fingerprint scoping of the cache dir did not stop either failure
    class. CPU is our correctness substrate (tests, dryrun_multichip),
    not the serving path, and its compiles are seconds-to-minutes — so
    no cache there; the axon/TPU backend, where cold compiles cost
    minutes and entries are host-independent device binaries, keeps it.
    """
    if _os.environ.get("UNAST_NO_COMP_CACHE"):
        return
    try:
        import jax
        plats = (_os.environ.get("JAX_PLATFORMS") or "").lower()
        try:
            plats = plats or (jax.config.jax_platforms or "").lower()
        except AttributeError:
            pass
        # Primary backend only: the image's sitecustomize sets
        # 'axon,cpu' (TPU preferred, cpu fallback) — that must keep the
        # cache; an explicit 'cpu'-first setting (tests, dryrun) must not.
        entries = [p.strip() for p in plats.split(",")]
        if entries[0] == "cpu":
            return
        if "cpu" in entries[1:]:
            # Ambiguous fallback list ('axon,cpu'): if the primary
            # backend fails to initialize, JAX silently falls back to
            # XLA:CPU — where the persistent cache must stay off (the
            # SIGILL/SIGSEGV class above). Resolve by initializing the
            # backend now; every consumer of this platform list uses the
            # device anyway, so the init is not wasted (ADVICE r4).
            try:
                if jax.default_backend() == "cpu":
                    return
            except Exception:
                return
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/unast_tpu_xla"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()
