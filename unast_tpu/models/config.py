"""Model configuration — a frozen, hashable dataclass mirroring the knobs of
the reference config system (src/configs/*.json, parsed at src/utils.py:198-229
and consumed by initialize_model, src/train.py:910-931).

Being hashable, it can ride jit static_argnums so every forward compiles
against fixed shapes/hyperparameters.
"""

import dataclasses
import json
from typing import Optional

from ..text.symbols import symbols

VOCAB_SIZE = len(symbols)  # 46 (reference src/data/symbols.py:26)
PAD_IDX = 0
SOS_IDX = 1
EOS_IDX = 2


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # Backbone selection: 'transformer' | 'rnn' (src/train.py:915-920)
    model_type: str = "transformer"

    # Dimensions (src/configs/transformer_trans.json)
    num_mels: int = 80
    hidden: int = 256
    e_in: int = 256
    t_emb_dim: int = 256
    s_pre_hid: int = 256
    ffn_dim: int = 1024
    num_layers: int = 4
    nhead: int = 4

    # Dropouts
    s_pre_drop: float = 0.5
    s_post_drop: float = 0.1
    t_pre_drop: float = 0.5
    t_post_drop: float = 0.1
    e_drop: float = 0.1
    d_drop: float = 0.1

    # RNN-specific (src/configs/rnn_d_lsa.json)
    e_bi: bool = True
    d_attn: Optional[str] = "lsa"  # 'lsa' | 'luong' | None
    attn_dim: int = 128

    # Discriminator (src/train.py:922-924)
    use_discriminator: bool = False
    disc_hid: int = 64
    disc_bidirectional: bool = True
    disc_num_layers: int = 2

    # Inference caps (src/network.py:219,455). Static so decode loops compile
    # with fixed-size buffers; TPU-native replacement for the reference's
    # growing-tensor python loops.
    max_mel_len: int = 815
    max_text_len: int = 300

    # Noising / augmentation (src/utils.py:40-75)
    noise_mask_p: float = 0.3
    spec_freq_mask: int = 20
    spec_time_mask: int = 100

    # Greedy speech decode stops when sigmoid(stop) >= stop_threshold.
    # The reference hardcodes 0.5 (src/network.py:240); tunable for EOS
    # calibration (scripts/stop_calibration.py, BENCHMARKS.md).
    stop_threshold: float = 0.5

    # Compute dtype for activations ('bfloat16' on TPU, 'float32' for parity
    # tests). Params are always float32.
    compute_dtype: str = "float32"

    # Attention implementation for the transformer's parallel paths:
    # 'xla' (parity default, supports attention-weight dropout) or 'flash'
    # (Pallas blocked online-softmax kernel, ops/attention.py; no
    # attention-weight dropout). The KV-cached incremental decode always
    # uses the XLA path (single-query GEMV).
    attn_impl: str = "xla"

    # Run transformer layer stacks as lax.scan over stacked layer params:
    # ONE layer body in the compiled program instead of num_layers inlined
    # copies — a large XLA compile-time win for the full training graph
    # (identical math; per-layer dropout rng folded from the layer index).
    scan_layers: bool = False

    # Rematerialize transformer layers in the backward pass
    # (jax.checkpoint): ~1/3 extra FLOPs for O(num_layers) less activation
    # HBM — the lever that admits large-width training on one chip.
    remat: bool = False
    # jax.checkpoint policy for --remat: '' = nothing saveable (recompute
    # everything, min HBM); 'dots' = dots_with_no_batch_dims_saveable
    # (save matmul outputs — the standard TPU policy: skips recomputing
    # the MXU work, recomputes only the cheap bandwidth-bound ops);
    # 'dots_all' = dots_saveable.
    remat_policy: str = ""

    # Pipeline parallelism (GPipe schedule, parallel/pipeline.py): stage
    # the transformer encoder/decoder layer stacks over `pp` contiguous
    # stages inside the jitted train step. Micro-batches stream through
    # the stages (vmap-over-stages formulation: the stage axis is a
    # GSPMD-sharded leading dim, the stage->stage hop a jnp.roll that
    # lowers to a collective-permute over the mesh's 'pp' axis). Composes
    # with dp/tp; requires num_layers % pp == 0. The KV-cached greedy
    # decode loops (cm pseudo-pair generation, serving) run unstaged —
    # staging a [B, 1, D] decode step would serialize pp hops per frame
    # for no FLOP win. 1 = off (reference has no parallelism, SURVEY
    # §2.3). pp_micro: micro-batches per stack call (0 = auto: largest of
    # 4*pp / 2*pp / pp dividing the batch).
    pp: int = 1
    pp_micro: int = 0

    # Mixture-of-Experts FFN (models/moe.py). moe_experts > 0 replaces the
    # dense transformer FFN with a Switch/GShard-style sparse FFN of that
    # many experts; expert-stacked weights shard over the mesh's 'ep' axis
    # (parallel/mesh.py). 0 = dense (reference parity). Pure TPU-native
    # capability add — the reference has no MoE (SURVEY §2.3).
    # Decoder reduction factor (Tacotron-lineage): the speech transformer
    # decoder emits r mel frames per autoregressive step, cutting the
    # sequential decode length r-fold — the dominant cost of both serving
    # TTS and the in-graph back-translation decode (each while_loop step
    # is latency-bound on TPU, so fewer steps ~ r x faster). 1 = exact
    # reference behavior (one frame per step, src/network.py:229-276).
    # Transformer speech decoder only; requires data_mel_len % r == 0.
    reduction_factor: int = 1

    # Speech-encoder family: 'transformer' (reference parity,
    # src/module.py:270-280) or 'conformer' (models/conformer.py — a
    # model-family ADDITION; macaron FFN + MHSA + depthwise-conv blocks).
    # Transformer backbone only.
    speech_encoder: str = "transformer"
    conformer_kernel: int = 15  # depthwise conv window (odd)

    # FastSpeech-2-style variance adaptors (models/fastspeech.py):
    # token-level log-F0 / mel-energy predictors + conditioning of the
    # NAR TTS decoder; enable pitch/energy control at inference. NAR only.
    nar_pitch: bool = False
    nar_energy: bool = False

    # Hybrid CTC/attention supervised training (ESPnet-style): an
    # auxiliary CTC head on the speech encoder, weighted into the sp
    # objective. 0 = off (reference parity). Transformer/conformer only.
    ctc_weight: float = 0.0

    # Streaming CTC ASR (WeNet-style chunk-causal attention): the CTC
    # model's speech encoder attends within blocks of ctc_chunk frames
    # plus ctc_left previous chunks (transformer.py::chunk_bias).
    # Training and one-shot inference apply the mask in ctc_logits;
    # infer/streaming.py::StreamingCtcAsr then reproduces the full
    # forward EXACTLY from per-chunk slices with ctc_left cached chunks
    # of K/V per layer — online ASR with bounded latency and state.
    # 0 = off (full-context CTC). ctc_left < 0 = unlimited left context
    # (chunk-causal only; streaming state then grows with the utterance,
    # so StreamingCtcAsr requires ctc_left >= 0). Transformer speech
    # encoder + attn_impl 'xla' only.
    ctc_chunk: int = 0
    ctc_left: int = 1
    # Position representation for the (chunk-masked) CTC speech encoder:
    # 'abs' = the reference's absolute sinusoid PE (src/module.py:249-267)
    #   — streaming is capped at the 5000-entry table (~62 s at hop 275)
    #   and extrapolates beyond trained positions;
    # 'rel' = learned per-head RELATIVE position bias over the bounded
    #   chunk attention field (T5-style, shared across layers; no
    #   absolute PE added). Translation-invariant, so online streams of
    #   ANY length are exact and match the training distribution.
    #   Requires ctc_chunk > 0 and ctc_left >= 0 (a bounded field is what
    #   makes the relative-distance table finite).
    ctc_pos: str = "abs"

    moe_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    # 'dispatch': GShard grouped one-hot dispatch/combine einsums —
    #   capacity drops, composes with the 'ep' mesh axis under GSPMD.
    # 'ragged': dropless sort + lax.ragged_dot grouped matmul — exact
    #   (no drops), fastest on a single chip / pure-dp meshes.
    moe_impl: str = "dispatch"
    # Routing group size for 'dispatch' (tokens routed and capacity-capped
    # per group, GShard-style, bounding the [G,S,E,C] one-hot tensors).
    # 0 = auto: largest divisor of the token count <= 4096.
    moe_group_size: int = 0

    @property
    def moe_opts(self):
        """MoeOpts bundle threaded to transformer FFNs (jit-static)."""
        from . import moe as MoE
        return MoE.MoeOpts(self.moe_top_k, self.moe_capacity_factor,
                           self.moe_impl, self.moe_group_size)

    @property
    def dtype(self):
        """Activation dtype. Params stay float32; nn.* apply fns cast
        weights to the activation dtype, and losses/softmax/norms accumulate
        in float32 regardless."""
        import jax.numpy as jnp
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def enc_out_dim(self) -> int:
        """Latent dim seen by decoders/discriminator: 2*hidden for the
        bidirectional RNN encoder, hidden otherwise (src/train.py:922-924)."""
        if self.model_type == "rnn" and self.e_bi:
            return 2 * self.hidden
        return self.hidden

    @property
    def head_dim(self) -> int:
        return self.e_in // self.nhead

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)

    @classmethod
    def from_args(cls, args) -> "ModelConfig":
        """Build from a flat config namespace/dict (reference-style JSON)."""
        d = vars(args) if not isinstance(args, dict) else dict(args)
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))


# Small configs for tests / smoke runs.
TINY = ModelConfig(
    hidden=32, e_in=32, t_emb_dim=32, s_pre_hid=32, ffn_dim=64,
    num_layers=2, nhead=2, attn_dim=16, disc_hid=16,
    max_mel_len=24, max_text_len=16,
)
