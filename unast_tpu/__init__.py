"""unast_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the UNAST reference (unsupervised adversarial speech<->text).

Layer map (mirrors reference SURVEY.md §1, redesigned TPU-first):

  unast_tpu.text      — L0 text frontend (symbols, cleaners, numbers, G2P)
  unast_tpu.audio     — L1 audio DSP (STFT/mel as XLA+Pallas, Griffin-Lim scan)
  unast_tpu.data      — L1 datasets, bucketed fixed-shape batching
  unast_tpu.models    — L2/L3 flax modules + UNAST facade with KV-cached decode
  unast_tpu.train     — L4 losses, augmentation, jitted multi-objective steps,
                        schedules, checkpointing, metrics, training loop
  unast_tpu.infer     — L4/L5 eval harness, vocoder inference, Griffin-Lim CLI
  unast_tpu.parallel  — device mesh + sharding rules (dp x tp) over ICI
  unast_tpu.utils     — config system, misc
  unast_tpu.runtime   — native (C++) runtime helpers (edit distance, wav IO)
"""

__version__ = "0.1.0"

PAD_IDX = 0
SOS_IDX = 1
EOS_IDX = 2
