"""FastSpeech-style non-autoregressive TTS (Ren et al., "FastSpeech: Fast,
Robust and Controllable Text to Speech", 2019).

Model-family ADDITION over the reference, which synthesizes speech only
autoregressively (one mel frame per decoder step with no KV cache,
src/network.py:229-276). Here the whole mel is produced in ONE forward
pass: text encoder -> per-token duration predictor -> length regulator
(token-to-frame expansion) -> frame-level self-attention decoder -> mel
head + convolutional postnet. No stop token — the output length is the sum
of the predicted durations.

This is the TPU-native serving shape: a single static-shape program of
large batched matmuls on the MXU instead of max_mel_len sequential
dispatches; decode latency drops from O(T) round trips to one.

Training distills durations from a trained autoregressive UNAST teacher:
per text token, the number of mel frames whose (layer/head-averaged)
cross-attention argmax lands on that token (`durations_from_attention`,
consuming the same cross_weights_out plumbing the guided-attention loss
uses). Mel targets are the gold mels; the duration predictor regresses
log(1 + d). See train/fastspeech.py for the trainer and
scripts/nar_distill_check.py for the end-to-end gate.

Reuses the package's building blocks: text prenet (embed + conv stack,
modules.text_prenet_init), transformer encoder stacks (transformer.encoder
— scan_layers / remat / flash attention all apply), speech postnet convs,
and ModelConfig dimensions. The param tree embeds cleanly under the same
mesh rules (q/k/v/lin1/lin2 regexes in parallel/mesh.py), so dp/tp
sharding works unchanged.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from . import modules as M
from . import transformer as T
from .config import ModelConfig

# pitch-conditioning normalization (see fastspeech_forward): log(245 Hz)
# center, ~0.5 log-units spread covers 90-580 Hz
_LOG_F0_CENTER = 5.5
_LOG_F0_SCALE = 0.5
# energy conditioning center (mean of [0,1]-normalized log-mel frames)
_ENERGY_CENTER = 0.3


# ---------------------------------------------------------------------------
# Duration predictor: 2x (conv1d k3 -> ReLU -> LayerNorm -> dropout) -> linear
# (FastSpeech §3.3). Predicts log(1 + duration) per token.
# ---------------------------------------------------------------------------


def duration_predictor_init(key, d: int):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": nn.conv1d_init(k1, d, d, 3, w_init="relu"),
        "ln1": nn.layernorm_init(d),
        "conv2": nn.conv1d_init(k2, d, d, 3, w_init="relu"),
        "ln2": nn.layernorm_init(d),
        "fc": nn.linear_init(k3, d, 1, torch_default=True),
    }


def duration_predictor(p, ctx: nn.Ctx, x, pad_mask, dropout_p: float = 0.1):
    """x: [B, Tt, D] -> log-duration predictions [B, Tt] (f32), zeroed on
    PAD tokens. Padded positions are zeroed before each conv so its k=3
    window never reads garbage."""
    keep = (~pad_mask)[..., None].astype(x.dtype)
    h = nn.conv1d(p["conv1"], x * keep, padding=(1, 1))
    h = nn.dropout(ctx, nn.layernorm(p["ln1"], jax.nn.relu(h)), dropout_p)
    h = nn.conv1d(p["conv2"], h * keep, padding=(1, 1))
    h = nn.dropout(ctx, nn.layernorm(p["ln2"], jax.nn.relu(h)), dropout_p)
    logd = nn.linear(p["fc"], h)[..., 0].astype(jnp.float32)
    return logd * (~pad_mask)


# ---------------------------------------------------------------------------
# Length regulator: expand token embeddings to frames by duration.
# ---------------------------------------------------------------------------


def length_regulate(x, durations, max_len: int):
    """x: [B, Tt, D], durations: int32 [B, Tt] (0 on PAD) -> (frames
    [B, max_len, D], out_lens [B]).

    Static-shape expansion: frame j belongs to the token whose cumulative-
    duration interval contains j, resolved with a comparison against the
    cumsum and applied as a one-hot matmul (MXU work, no gather/scatter;
    gathers lower poorly on TPU). Frames beyond sum(durations) are zero."""
    b, tt, _ = x.shape
    ends = jnp.cumsum(durations.astype(jnp.int32), axis=1)  # [B, Tt]
    out_lens = jnp.minimum(ends[:, -1], max_len)
    pos = jnp.arange(max_len, dtype=jnp.int32)
    # idx[b, j] = number of tokens fully emitted by frame j = owning token.
    idx = jnp.sum(pos[None, :, None] >= ends[:, None, :], axis=-1)  # [B, Tm]
    onehot = jax.nn.one_hot(idx, tt, dtype=x.dtype)  # [B, Tm, Tt]
    frames = jnp.einsum("bmt,btd->bmd", onehot, x)
    valid = (pos[None, :] < out_lens[:, None])[..., None].astype(x.dtype)
    return frames * valid, out_lens


def durations_from_attention(attn, mel_len, text_len, soft: bool = False):
    """Teacher-alignment duration extraction (FastSpeech §3.4).

    attn: [L, B, H, Tm, Tt] cross-attention probs from a teacher-forced
    autoregressive TTS decode (networks.speech_tr_decode_sequence's
    cross_weights_out). Averages layers/heads and masks PAD text columns.

    soft=False (FastSpeech 1): per-frame argmax counts. soft=True:
    EXPECTED attention mass per token (renormalized over valid tokens,
    summed over valid frames, largest-remainder rounding so rows still
    sum to mel_len) — strictly positive for attended tokens and much
    smoother, which generalizes better when the teacher's attention is
    noisy (the held-out probe in BENCHMARKS.md: argmax durations
    memorize utterance-specific noise).
    Returns int32 [B, Tt] durations summing to mel_len per row."""
    a = jnp.mean(attn.astype(jnp.float32), axis=(0, 2))  # [B, Tm, Tt]
    tm, tt = a.shape[1], a.shape[2]
    text_valid = M.lens_to_mask(text_len, tt)  # [B, Tt]
    frame_valid = M.lens_to_mask(mel_len, tm)
    if not soft:
        am = jnp.where(text_valid[:, None, :], a, -jnp.inf)
        tok = jnp.argmax(am, axis=-1)  # [B, Tm]
        onehot = jax.nn.one_hot(tok, tt, dtype=jnp.int32)
        return jnp.sum(onehot * frame_valid.astype(jnp.int32)[..., None],
                       axis=1)
    mass = a * text_valid[:, None, :]
    mass = mass / jnp.maximum(jnp.sum(mass, axis=-1, keepdims=True), 1e-6)
    soft_d = jnp.sum(mass * frame_valid.astype(jnp.float32)[..., None],
                     axis=1)  # [B, Tt], sums to mel_len
    # largest-remainder rounding: floor, then hand the leftover frames to
    # the largest fractional parts so the row total stays exactly mel_len
    base = jnp.floor(soft_d)
    frac = soft_d - base
    short = (mel_len.astype(jnp.int32)
             - jnp.sum(base, axis=1).astype(jnp.int32))  # [B]
    order = jnp.argsort(-frac, axis=1)
    rank = jnp.argsort(order, axis=1)  # rank of each token by frac
    bump = (rank < short[:, None]).astype(jnp.int32)
    return base.astype(jnp.int32) + bump


def mas_durations(attn, mel_len, text_len):
    """Monotonic alignment search (Glow-TTS-style Viterbi) over teacher
    cross-attention posteriors — the forced-alignment duration source.

    attn: [L, B, H, Tm, Tt] cross-attention probs (same input as
    durations_from_attention). Finds, per utterance, the best MONOTONIC
    SURJECTIVE frame->token path: every frame t maps to a token j(t) with
    j(0)=0, j(t) - j(t-1) in {0, 1}, and j(mel_len-1) = text_len-1 —
    maximizing sum_t log a[t, j(t)]. Unlike per-frame argmax (which can
    skip or revisit tokens and memorizes attention noise — the measured
    held-out collapse in BENCHMARKS.md) the path is guaranteed to visit
    every token at least once with a globally-optimal assignment, so every
    duration is >= 1 and rows sum exactly to mel_len.

    Pure lax.scan dynamic program (one forward pass storing the
    stay/advance decisions, one backward pass recovering the path and
    counting frames per token) — static shapes, runs in-graph inside the
    jitted distillation step. Returns int32 [B, Tt] durations.

    Measured caveat (BENCHMARKS.md forced-alignment ladder): when the
    teacher's attention is diffuse, the best monotonic path through it
    is still degenerate — on the held-out gate MAS did not fix the
    argmax collapse. The generalization-safe source is CTC forced
    alignment (models/ctc.py::ctc_forced_align, --nar_dur_source ctc),
    whose posteriors are audio->text grounded; MAS remains useful when
    the teacher has GA-sharpened or naturally monotonic attention."""
    a = jnp.mean(attn.astype(jnp.float32), axis=(0, 2))  # [B, Tm, Tt]
    b, tm, tt = a.shape
    neg = jnp.float32(-1e9)
    text_valid = M.lens_to_mask(text_len, tt)  # [B, Tt]
    frame_valid = M.lens_to_mask(mel_len, tm)  # [B, Tm]
    log_a = jnp.log(jnp.clip(a, 1e-9, 1.0))
    log_a = jnp.where(text_valid[:, None, :], log_a, neg)
    # PAD frames carry the path position unchanged (score 0, stay-only):
    # the path position at frame Tm-1 then equals the position at the
    # last VALID frame, so backtracking can start from a static index.
    log_a = jnp.where(frame_valid[:, :, None], log_a, 0.0)

    j_idx = jnp.arange(tt)
    q0 = jnp.where(j_idx == 0, log_a[:, 0, :], neg)  # path starts at token 0

    def fwd(q, inputs):
        la_t, valid_t = inputs  # [B, Tt], [B]
        stay = q
        advance = jnp.concatenate(
            [jnp.full((b, 1), neg), q[:, :-1]], axis=1)
        # PAD frames: force stay (advance forbidden) so position holds.
        advance = jnp.where(valid_t[:, None], advance, neg)
        from_prev = advance > stay  # [B, Tt] True = diagonal move
        return jnp.maximum(stay, advance) + la_t, from_prev

    _, from_prev = jax.lax.scan(
        fwd, q0,
        (jnp.swapaxes(log_a, 0, 1)[1:], jnp.swapaxes(frame_valid, 0, 1)[1:]))
    # from_prev: [Tm-1, B, Tt] decisions for frames 1..Tm-1

    end_j = jnp.maximum(text_len.astype(jnp.int32) - 1, 0)  # [B]

    def bwd(j, inputs):
        fp_t, valid_t = inputs  # [B, Tt], [B]
        took_diag = jnp.take_along_axis(fp_t, j[:, None], axis=1)[:, 0]
        j_prev = j - took_diag.astype(jnp.int32)
        # counted token for THIS frame is j (only if the frame is valid)
        count_row = jax.nn.one_hot(j, tt, dtype=jnp.int32) * \
            valid_t[:, None].astype(jnp.int32)
        return j_prev, count_row

    j_last, counts = jax.lax.scan(
        bwd, end_j,
        (from_prev[::-1], jnp.swapaxes(frame_valid, 0, 1)[1:][::-1]))
    dur = jnp.sum(counts, axis=0)  # frames 1..Tm-1
    # frame 0 always belongs to token 0 (and j_last == 0 by construction)
    dur = dur + jax.nn.one_hot(jnp.zeros((b,), jnp.int32), tt,
                               dtype=jnp.int32) * \
        frame_valid[:, 0][:, None].astype(jnp.int32)
    return dur * text_valid.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


def _span_onehot(durations, tm: int):
    """Frame->token assignment for duration spans: [B, Tm, Tt] one-hot
    (the same cumsum rule as length_regulate; shared by the variance-
    target reductions below)."""
    ends = jnp.cumsum(durations.astype(jnp.int32), axis=1)
    pos = jnp.arange(tm, dtype=jnp.int32)
    idx = jnp.sum(pos[None, :, None] >= ends[:, None, :], axis=-1)
    return jax.nn.one_hot(idx, durations.shape[1], dtype=jnp.float32)


def token_energy_in_graph(mel, durations, text_valid):
    """Token-level mean frame energy (mean of the normalized-log mel over
    bins) over the duration-aligned spans: mel [B, Tm, M], durations
    int32 [B, Tt] -> [B, Tt] f32. Targets for the energy adaptor — no
    external extractor needed, the gold mel IS the energy source."""
    onehot = _span_onehot(durations, mel.shape[1])
    e_frame = jnp.mean(mel.astype(jnp.float32), axis=-1)  # [B, Tm]
    num = jnp.einsum("bmt,bm->bt", onehot, e_frame)
    den = jnp.sum(onehot, axis=1)
    return (num / jnp.maximum(den, 1.0)) * text_valid


def token_log_f0_in_graph(f0, durations, text_valid):
    """Token-level mean log-F0 over VOICED frames, in-graph (the numpy
    counterpart is audio/pitch.py::token_log_f0). f0: [B, Tm] (0 =
    unvoiced), durations: int32 [B, Tt] -> [B, Tt] f32 (0 where the whole
    span is unvoiced or the token is PAD)."""
    onehot = _span_onehot(durations, f0.shape[1])
    voiced = (f0 > 0).astype(jnp.float32)
    logf = jnp.log(jnp.maximum(f0, 1e-3)) * voiced
    num = jnp.einsum("bmt,bm->bt", onehot, logf)
    den = jnp.einsum("bmt,bm->bt", onehot, voiced)
    return (num / jnp.maximum(den, 1.0)) * text_valid


def fastspeech_init(key, cfg: ModelConfig):
    """Returns (params, state). state carries the text-prenet and postnet
    BatchNorm running stats (same explicit-state discipline as networks)."""
    ks = jax.random.split(key, 5)
    prenet_p, prenet_s = M.text_prenet_init(ks[0], cfg)
    postnet_p, postnet_s = M.speech_postnet_init(ks[1], cfg)
    # The AR heads' stop_proj has no meaning without a stop token, and
    # mel_proj must emit exactly num_mels per frame (reduction grouping is
    # an AR-decode concept): replace both with a single frame-level head.
    del postnet_p["stop_proj"]
    postnet_p["mel_proj"] = nn.linear_init(
        jax.random.split(ks[1])[1], cfg.e_in, cfg.num_mels,
        torch_default=True)
    params = {
        "prenet": prenet_p,
        "encoder": T.encoder_init(ks[2], cfg.e_in, cfg.nhead, cfg.ffn_dim,
                                  cfg.num_layers),
        "dur": duration_predictor_init(ks[3], cfg.e_in),
        "decoder": T.encoder_init(ks[4], cfg.e_in, cfg.nhead, cfg.ffn_dim,
                                  cfg.num_layers),
        "postnet": postnet_p,
    }
    if cfg.nar_pitch:
        # FastSpeech-2-style pitch adaptor: a second variance predictor
        # (same conv arch) + a linear conditioning of the token states on
        # (token-level) log-F0; 0 = unvoiced carries the voicing signal.
        kp1, kp2 = jax.random.split(jax.random.fold_in(key, 7))
        params["pitch"] = duration_predictor_init(kp1, cfg.e_in)
        params["pitch_proj"] = nn.linear_init(kp2, 1, cfg.e_in,
                                              torch_default=True)
    if cfg.nar_energy:
        # energy adaptor: token-level mean normalized-log-mel energy
        # (targets come straight from the gold mel — no extractor)
        ke1, ke2 = jax.random.split(jax.random.fold_in(key, 8))
        params["energy"] = duration_predictor_init(ke1, cfg.e_in)
        params["energy_proj"] = nn.linear_init(ke2, 1, cfg.e_in,
                                               torch_default=True)
    return params, {"prenet": prenet_s, "postnet": postnet_s}


def _encode(p, s, ctx: nn.Ctx, cfg: ModelConfig, text, pad_mask):
    """Shared text-side encode: embed -> conv prenet -> positions ->
    transformer stack. Returns (h [B, Tt, D], new_prenet_state)."""
    x = M.text_embed(p["prenet"], ctx, text, cfg)
    x, prenet_s = M.text_prenet_convs(p["prenet"], s["prenet"], ctx, x, cfg)
    x = M.positional_encoding(ctx, x)
    h = T.encoder(p["encoder"], ctx, x, pad_mask, cfg.nhead, cfg.e_drop,
                  impl=cfg.attn_impl, scan_layers=cfg.scan_layers,
                  remat=cfg.remat)
    return h, prenet_s


def predict_variances(p, s, cfg: ModelConfig, text, text_lens):
    """EVAL-MODE variance predictions (no dropout, running BN stats) —
    exactly the branch inference uses. The distillation losses regress
    THIS output (train/fastspeech.py): regressing a train-mode branch
    leaves a systematic eval-time bias (~+10-20% length error measured on
    the gate — 0.5 prenet dropout + batch-stat BN shift the heads' input
    distribution between modes). Returns (log_dur [B, Tt],
    log_f0 [B, Tt] or None when cfg.nar_pitch is off, energy [B, Tt] or
    None when cfg.nar_energy is off)."""
    pad_mask = ~M.lens_to_mask(text_lens, text.shape[1])
    ctx = nn.Ctx.eval()
    h, _ = _encode(p, s, ctx, cfg, text, pad_mask)
    log_dur = duration_predictor(p["dur"], ctx, h, pad_mask, cfg.d_drop)
    log_f0 = (duration_predictor(p["pitch"], ctx, h, pad_mask, cfg.d_drop)
              if cfg.nar_pitch else None)
    energy = (duration_predictor(p["energy"], ctx, h, pad_mask, cfg.d_drop)
              if cfg.nar_energy else None)
    return log_dur, log_f0, energy


def predict_log_durations(p, s, cfg: ModelConfig, text, text_lens):
    return predict_variances(p, s, cfg, text, text_lens)[0]


def fastspeech_forward(p, s, ctx: nn.Ctx, cfg: ModelConfig, text, text_lens,
                       durations=None, max_len: Optional[int] = None,
                       speed: float = 1.0, pitch_target=None,
                       pitch_shift: float = 1.0, energy_target=None,
                       energy_scale: float = 1.0):
    """text: [B, Tt] int32 -> ((pre, post [B, max_len, num_mels], out_lens,
    log_dur_pred [B, Tt]), new_state).

    durations: int32 [B, Tt] teacher durations (training — the regulator
    uses them so mel targets align frame-for-frame). None = inference: the
    regulator uses round(expm1(log_dur_pred) / speed) (speed > 1 talks
    faster, the FastSpeech control knob).

    cfg.nar_pitch: token states are additionally conditioned on token
    log-F0 — `pitch_target` [B, Tt] during training, the eval-mode pitch
    predictor at inference with `pitch_shift` scaling the F0 (log-domain
    shift on voiced tokens; the pitch-control knob,
    scripts/pitch_control_check.py)."""
    tt = text.shape[1]
    max_len = int(max_len or cfg.max_mel_len)
    pad_mask = ~M.lens_to_mask(text_lens, tt)

    h, prenet_s = _encode(p, s, ctx, cfg, text, pad_mask)
    # all variance predictors read the RAW (pre-conditioning) encoder
    # output — the same input predict_variances regresses their training
    # targets on; reading h after the pitch embedding is added would be a
    # train/inference input mismatch when pitch+energy are both enabled
    h_raw = h

    log_dur = duration_predictor(p["dur"], ctx, h_raw, pad_mask, cfg.d_drop)
    if durations is None:
        durations = jnp.round(jnp.expm1(log_dur) / speed).astype(jnp.int32)
        durations = jnp.maximum(durations, 0) * (~pad_mask)

    if cfg.nar_pitch:
        if pitch_target is None:
            pf = duration_predictor(p["pitch"], ctx, h_raw, pad_mask,
                                    cfg.d_drop)
            pf = jnp.where(pf > 0, pf + jnp.log(pitch_shift), pf)
        else:
            pf = pitch_target.astype(jnp.float32)
        # normalize the conditioning scalar (FastSpeech 2 recipe): raw
        # log-F0 (~5-6) through a fan-in-1 linear is a huge near-constant
        # input — the trained response collapses to insensitivity
        # (measured pitch_shift response 1.01 unnormalized); centered and
        # scaled, a 1.33 shift is a 0.57-unit feature delta. 0 keeps
        # meaning "unvoiced".
        pf = jnp.where(pf > 0, (pf - _LOG_F0_CENTER) / _LOG_F0_SCALE, 0.0)
        emb = nn.linear(p["pitch_proj"], pf[..., None]).astype(h.dtype)
        h = h + emb * (~pad_mask)[..., None].astype(h.dtype)

    if cfg.nar_energy:
        if energy_target is None:
            ef = duration_predictor(p["energy"], ctx, h_raw, pad_mask,
                                    cfg.d_drop) * energy_scale
        else:
            ef = energy_target.astype(jnp.float32)
        # energies are means of the [0,1]-normalized log mel (~0.2-0.5):
        # already unit-scale, center only
        ef = jnp.where(ef != 0, ef - _ENERGY_CENTER, 0.0)
        emb = nn.linear(p["energy_proj"], ef[..., None]).astype(h.dtype)
        h = h + emb * (~pad_mask)[..., None].astype(h.dtype)

    frames, out_lens = length_regulate(h, durations, max_len)
    # scale=False: `frames` are regulated post-LN encoder states (per-dim
    # RMS pinned ~1) — the reference-parity sqrt(d) input scaling
    # saturates the frame decoder's attention and freezes training (the
    # round-4 global-mean-mel collapse; see positional_encoding).
    frames = M.positional_encoding(ctx, frames, scale=False)
    frame_pad = ~M.lens_to_mask(out_lens, max_len)
    d = T.encoder(p["decoder"], ctx, frames, frame_pad, cfg.nhead,
                  cfg.d_drop, impl=cfg.attn_impl,
                  scan_layers=cfg.scan_layers, remat=cfg.remat)

    pre = nn.linear(p["postnet"]["mel_proj"], d)
    resid, postnet_s = M.speech_postnet(p["postnet"], s["postnet"], ctx,
                                        pre, cfg)
    keep = (~frame_pad)[..., None].astype(pre.dtype)
    return ((pre * keep, (pre + resid) * keep, out_lens, log_dur),
            {"prenet": prenet_s, "postnet": postnet_s})


# ---------------------------------------------------------------------------
# Serialized-artifact versioning (ADVICE r4)
# ---------------------------------------------------------------------------

NAR_PICKLE_FORMAT = 2
"""Format 2: the frame-decoder input uses positional_encoding(scale=False)
(the round-4 saturation fix in fastspeech_forward above). Format-1
(round-3) pickles were trained under sqrt(d) input scaling — loading one
into this network silently produces wrong mels, so load_nar_pickle
refuses a mismatched stamp; unversioned bare (params, net_state) tuples
cannot prove their vintage and load with a warning."""


def save_nar_pickle(path, params, net_state):
    """Pickle (params, net_state) with the current format stamp."""
    import pickle

    import numpy as np
    with open(path, "wb") as f:
        pickle.dump({"nar_format": NAR_PICKLE_FORMAT,
                     "pv": jax.tree_util.tree_map(np.asarray,
                                                  (params, net_state))}, f)


def load_nar_pickle(path):
    """-> (params, net_state). Hard-errors on a stale format stamp; warns
    on unversioned pre-stamp tuples (vintage unverifiable)."""
    import pickle
    import warnings
    with open(path, "rb") as f:
        obj = pickle.load(f)
    if isinstance(obj, dict) and "nar_format" in obj:
        if obj["nar_format"] != NAR_PICKLE_FORMAT:
            raise ValueError(
                f"{path}: NAR pickle format {obj['nar_format']} != "
                f"{NAR_PICKLE_FORMAT} — re-distill (format 2 changed the "
                f"frame-decoder PE scaling; old weights are incompatible)")
        return tuple(obj["pv"])
    warnings.warn(f"{path}: unversioned NAR pickle (pre-format-stamp); "
                  f"cannot verify frame-decoder PE vintage", stacklevel=2)
    return tuple(obj)
