"""The four backbone networks — TextTransformer, SpeechTransformer, TextRNN,
SpeechRNN — as pure init/encode/decode_sequence/infer_sequence functions.

Parity targets: src/network.py:188-276 (SpeechTransformer), :279-402
(SpeechRNN), :417-500 (TextTransformer), :503-624 (TextRNN). The shared
contract (AutoEncoderNet, src/network.py:13-85): encode returns a latent
memory either decoder can attend to (§2.2 of SURVEY.md).

TPU-native decode design (replaces the reference's python loops over growing
tensors):
  - fixed [B, max_len(+1), ...] buffers + per-sequence stop bookkeeping,
    wrapped in lax.while_loop so compilation sees static shapes and the loop
    exits as soon as every sequence has stopped;
  - transformer inference uses the KV cache from transformer.py (the
    reference re-runs the full decoder stack over the whole prefix each
    step, src/network.py:229-243,463-474);
  - RNN inference threads (h, c) + attention state through the loop carry
    (the reference's stateful LSA init_memory/clear_memory,
    src/module.py:409-419);
  - stop semantics match the reference exactly: a sequence's stop_len is
    set the first step its stop condition fires (sigmoid(stop) >= .5 for
    speech, EOS for text), outputs beyond stop_len are masked to zero
    (src/network.py:236-252,469-481).

Documented deviation: the reference TextRNN decoder re-embeds the whole
prefix through SAME-padded convs every step (src/network.py:573-576), an
O(T^2) scheme that leaks up to two future tokens per conv layer at interior
positions; we use strictly-causal convs applied once over the sequence
(O(T)), and inside the inference loop BatchNorm always uses running stats.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from .config import ModelConfig, PAD_IDX, SOS_IDX, EOS_IDX
from . import modules as M
from . import transformer as T
from . import rnn as R


def _loop_base(ctx: nn.Ctx):
    """A loop-distinct base key: ctx.next_rng() advances the parent counter,
    so two loops in the same forward pass never share a fold domain."""
    return ctx.next_rng() if ctx.rng is not None else None


def _fold_ctx(base, train: bool, i) -> nn.Ctx:
    """Fresh per-iteration rng inside decode loops (the loop body is traced
    once, so Ctx's op counter alone would repeat masks across steps)."""
    if base is None:
        return nn.Ctx(rng=None, train=train)
    return nn.Ctx(rng=jax.random.fold_in(base, i), train=train)


# ===========================================================================
# TextTransformer (src/network.py:417-500)
# ===========================================================================


def text_transformer_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, 4)
    prenet_p, prenet_s = M.text_prenet_init(ks[0], cfg)
    params = {
        "prenet": prenet_p,
        "encoder": T.encoder_init(ks[1], cfg.e_in, cfg.nhead, cfg.ffn_dim,
                                  cfg.num_layers, moe=cfg.moe_experts),
        "decoder": T.decoder_init(ks[2], cfg.e_in, cfg.nhead, cfg.ffn_dim,
                                  cfg.num_layers, moe=cfg.moe_experts),
        "postnet": M.text_postnet_init(ks[3], cfg),
    }
    return params, {"prenet": prenet_s}


def text_tr_encode(p, s, ctx, cfg: ModelConfig, ids, lens, noise_in=False):
    """ids: [B, T] int32. Returns ((memory [B,T,D], pad_mask), new_state)."""
    pad_mask = ~M.lens_to_mask(lens, ids.shape[1])
    x = M.text_embed(p["prenet"], ctx, ids, cfg)
    if noise_in:
        x = M.noise_fn(ctx, x, cfg.noise_mask_p)
    x, prenet_s = M.text_prenet_convs(p["prenet"], s["prenet"], ctx, x, cfg)
    x = M.positional_encoding(ctx, x)
    memory = T.encoder(p["encoder"], ctx, x, pad_mask, cfg.nhead,
                       cfg.e_drop, impl=cfg.attn_impl,
                       scan_layers=cfg.scan_layers, remat=cfg.remat,
                       moe_opts=cfg.moe_opts, pp=cfg.pp,
                       pp_micro=cfg.pp_micro,
                       remat_policy=cfg.remat_policy)
    return (memory, pad_mask), {"prenet": prenet_s}


def text_tr_decode_sequence(p, ctx, cfg: ModelConfig, tgt, tgt_lens,
                            memory, mem_pad_mask, cross_weights_out=None):
    """Teacher-forced parallel decode -> logits [B, T, V]. The text decoder
    input path embeds WITHOUT the conv stack (reference preprocess_decode,
    src/network.py:435-438), so no BN state is touched."""
    sos = jnp.full((tgt.shape[0], 1), SOS_IDX, tgt.dtype)
    tgt_in = jnp.concatenate([sos, tgt[:, :-1]], axis=1)
    tgt_pad_mask = ~M.lens_to_mask(tgt_lens, tgt.shape[1])
    x = M.text_embed(p["prenet"], ctx, tgt_in, cfg)
    x = M.positional_encoding(ctx, x)
    h = T.decoder(p["decoder"], ctx, x, memory, tgt_pad_mask, mem_pad_mask,
                  cfg.nhead, cfg.d_drop, impl=cfg.attn_impl,
                  scan_layers=cfg.scan_layers, remat=cfg.remat,
                  cross_weights_out=cross_weights_out,
                  moe_opts=cfg.moe_opts, pp=cfg.pp,
                  pp_micro=cfg.pp_micro,
                  remat_policy=cfg.remat_policy)
    return M.text_postnet(p["postnet"], ctx, h, cfg)


def text_tr_infer(p, ctx, cfg: ModelConfig, memory, mem_pad_mask,
                  max_len: Optional[int] = None, temperature: float = 0.0):
    """KV-cached decode: greedy (temperature=0, reference parity) or
    temperature sampling. Returns (ids [B, max_len] masked past stop,
    stop_lens [B])."""
    max_len = max_len or cfg.max_text_len
    b = memory.shape[0]
    cache = T.init_cache(p["decoder"], memory, max_len, cfg.nhead)
    mem_bias = T.padding_bias(mem_pad_mask)
    tokens = jnp.full((b, max_len + 1), PAD_IDX, jnp.int32).at[:, 0].set(SOS_IDX)
    stop_lens = jnp.full((b,), max_len, jnp.int32)
    rng_base = _loop_base(ctx)
    if temperature > 0 and rng_base is None:
        raise ValueError("temperature sampling needs a Ctx with an rng key")
    sample_base = (jax.random.fold_in(rng_base, 0x5a3f)
                   if rng_base is not None else None)

    def cond(c):
        i, _, _, stop_lens = c
        return jnp.logical_and(i < max_len, jnp.any(stop_lens == max_len))

    def body(c):
        i, tokens, cache, stop_lens = c
        ctx_i = _fold_ctx(rng_base, ctx.train, i)
        cur = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
        x = M.text_embed(p["prenet"], ctx_i, cur, cfg)
        x = M.positional_encoding(ctx_i, x, offset=i)
        h, cache = T.decoder_step(p["decoder"], ctx_i, x, i, cache, mem_bias,
                                  cfg.nhead, cfg.d_drop,
                                  scan_layers=cfg.scan_layers,
                                  moe_opts=cfg.moe_opts)
        logits = M.text_postnet(p["postnet"], ctx_i, h, cfg)
        if temperature > 0:
            choice = jax.random.categorical(
                jax.random.fold_in(sample_base, i),
                logits[:, -1].astype(jnp.float32) / temperature,
                axis=-1).astype(jnp.int32)
        else:
            choice = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, choice[:, None], i + 1, axis=1)
        newly = jnp.logical_and(choice == EOS_IDX, stop_lens == max_len)
        stop_lens = jnp.where(newly, i + 1, stop_lens)
        return (i + 1, tokens, cache, stop_lens)

    _, tokens, _, stop_lens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, cache, stop_lens))
    res = tokens[:, 1:]
    res = res * M.lens_to_mask(stop_lens, max_len).astype(res.dtype)
    return res, stop_lens


def text_tr_spec_infer(p, ctx, cfg: ModelConfig, memory, mem_pad_mask,
                       draft, max_len: Optional[int] = None):
    """Speculative greedy decoding (TPU-native ADDITION; the reference is
    strictly sequential, src/network.py:463-481): verify a DRAFT token
    sequence — e.g. the CTC head's one-pass greedy output (models/ctc.py)
    — against the AR decoder's own greedy choices using the PARALLEL
    teacher-forced forward (text_tr_decode_sequence), which is one big
    MXU-friendly pass instead of max_len latency-bound cached steps.

    Each round scores candidate = accepted-prefix + draft-suffix in one
    forward, accepts the longest prefix where the decoder's greedy choice
    equals the candidate, plus ONE corrected token at the first mismatch
    (whose context is by then fully accepted, so its argmax is the true
    greedy continuation). Guaranteed >= 1 token of progress per round;
    when the draft is good the whole utterance verifies in a couple of
    rounds. Output is exactly greedy decoding under the parallel scorer
    (ctx must be eval-mode for determinism).

    draft: [B, >=max_len] int32 ids (PAD-padded). Returns (ids [B,
    max_len] masked past stop, stop_lens [B], n_rounds)."""
    if ctx.train:
        raise ValueError("speculative decode requires an eval-mode Ctx "
                         "(dropout would break verify determinism)")
    max_len = max_len or cfg.max_text_len
    b = memory.shape[0]
    draft = draft[:, :max_len].astype(jnp.int32)
    if draft.shape[1] < max_len:
        draft = jnp.pad(draft, ((0, 0), (0, max_len - draft.shape[1])),
                        constant_values=PAD_IDX)
    pos = jnp.arange(max_len)
    lens_full = jnp.full((b,), max_len, jnp.int32)

    def cond(c):
        n, _, stop_lens, _ = c
        live = jnp.logical_and(stop_lens == max_len, n < max_len)
        return jnp.any(live)

    def body(c):
        n, tokens, stop_lens, r = c
        cand = jnp.where(pos[None] < n[:, None], tokens, draft)
        logits = text_tr_decode_sequence(p, ctx, cfg, cand, lens_full,
                                         memory, mem_pad_mask)
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        ok = (g == cand)
        # longest all-ok prefix, then one corrected token at the mismatch
        n_match = jnp.sum(jnp.cumsum(~ok, axis=1) == 0, axis=1)
        n_new = jnp.minimum(n_match + 1, max_len).astype(jnp.int32)
        accepted = jnp.where(pos[None] < n_new[:, None], g, PAD_IDX)
        # EOS inside the newly accepted region ends the row (reference
        # stop semantics: stop_len = index of EOS + 1)
        is_eos = jnp.logical_and(accepted == EOS_IDX, pos[None] < n_new[:, None])
        first_eos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
        has_eos = jnp.any(is_eos, axis=1)
        live = jnp.logical_and(stop_lens == max_len, n < max_len)
        stop_lens = jnp.where(jnp.logical_and(live, has_eos),
                              first_eos + 1, stop_lens)
        tokens = jnp.where(live[:, None], accepted, tokens)
        n = jnp.where(live, n_new, n)
        return (n, tokens, stop_lens, r + 1)

    n0 = jnp.zeros((b,), jnp.int32)
    tokens0 = jnp.full((b, max_len), PAD_IDX, jnp.int32)
    stops0 = jnp.full((b,), max_len, jnp.int32)
    _, tokens, stop_lens, rounds = jax.lax.while_loop(
        cond, body, (n0, tokens0, stops0, jnp.int32(0)))
    res = tokens * M.lens_to_mask(stop_lens, max_len).astype(tokens.dtype)
    return res, stop_lens, rounds


def text_tr_beam_search(p, ctx, cfg: ModelConfig, memory, mem_pad_mask,
                        beam: int = 4, max_len: Optional[int] = None,
                        length_penalty: float = 0.6):
    """KV-cached beam search over the text decoder (capability add beyond
    the reference's greedy-only decode). Returns (ids [B, max_len],
    stop_lens [B]) for the best finished beam per batch element.

    Fixed shapes throughout: beams ride a flattened [B*K] batch axis; the
    per-step beam reorder is a gather over that axis of the KV cache.
    Finished beams are frozen (forced to re-emit EOS with zero added score).
    Scores use GNMT length normalization ((5+len)/6)^length_penalty."""
    max_len = max_len or cfg.max_text_len
    b, ts_, d = memory.shape
    k = beam
    mem_k = jnp.repeat(memory, k, axis=0)               # [B*K, Ts, D]
    pad_k = jnp.repeat(mem_pad_mask, k, axis=0)
    cache = T.init_cache(p["decoder"], mem_k, max_len, cfg.nhead)
    mem_bias = T.padding_bias(pad_k)
    tokens = jnp.full((b * k, max_len + 1), PAD_IDX, jnp.int32)
    tokens = tokens.at[:, 0].set(SOS_IDX)
    # beam 0 starts live, others at -inf so the first expansion seeds
    # distinct continuations.
    scores = jnp.tile(jnp.array([0.0] + [-1e9] * (k - 1), jnp.float32), (b,))
    finished = jnp.zeros((b * k,), bool)
    fin_lens = jnp.full((b * k,), max_len, jnp.int32)
    rng_base = _loop_base(ctx)

    def cond(c):
        i, _, _, _, finished, _ = c
        return jnp.logical_and(i < max_len, ~jnp.all(finished))

    def body(c):
        i, tokens, cache, scores, finished, fin_lens = c
        ctx_i = _fold_ctx(rng_base, ctx.train, i)
        cur = jax.lax.dynamic_slice_in_dim(tokens, i, 1, axis=1)
        x = M.text_embed(p["prenet"], ctx_i, cur, cfg)
        x = M.positional_encoding(ctx_i, x, offset=i)
        h, cache = T.decoder_step(p["decoder"], ctx_i, x, i, cache, mem_bias,
                                  cfg.nhead, cfg.d_drop,
                                  scan_layers=cfg.scan_layers,
                                  moe_opts=cfg.moe_opts)
        logits = M.text_postnet(p["postnet"], ctx_i, h, cfg)[:, -1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # frozen beams: only EOS continuation, no score change
        v = logp.shape[-1]
        frozen = jnp.full((v,), -1e9).at[EOS_IDX].set(0.0)
        logp = jnp.where(finished[:, None], frozen[None, :], logp)
        cand = scores[:, None] + logp                    # [B*K, V]
        cand = cand.reshape(b, k * v)
        top_scores, top_idx = jax.lax.top_k(cand, k)     # [B, K]
        src_beam = top_idx // v                          # [B, K] in 0..K-1
        tok = (top_idx % v).astype(jnp.int32)
        flat_src = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)
        # reorder beam-wise; cross K/V are identical across beams of one
        # batch element (memory was repeated), so only self caches move
        tokens = tokens[flat_src]
        cache = T.DecodeCache(
            jnp.take(cache.self_k, flat_src, axis=1),
            jnp.take(cache.self_v, flat_src, axis=1),
            cache.cross_k, cache.cross_v)
        finished = finished[flat_src]
        fin_lens = fin_lens[flat_src]
        scores = top_scores.reshape(-1)
        tok = tok.reshape(-1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, tok[:, None], i + 1, axis=1)
        newly = jnp.logical_and(tok == EOS_IDX, ~finished)
        fin_lens = jnp.where(newly, i + 1, fin_lens)
        finished = jnp.logical_or(finished, tok == EOS_IDX)
        return (i + 1, tokens, cache, scores, finished, fin_lens)

    _, tokens, _, scores, finished, fin_lens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, cache, scores, finished, fin_lens))

    # pick best beam per batch element under GNMT length normalization
    lp = ((5.0 + fin_lens.astype(jnp.float32)) / 6.0) ** length_penalty
    norm = (scores / lp).reshape(b, k)
    best = jnp.argmax(norm, axis=-1)                     # [B]
    flat_best = jnp.arange(b) * k + best
    res = tokens[flat_best][:, 1:]
    stop_lens = fin_lens[flat_best]
    res = res * M.lens_to_mask(stop_lens, max_len).astype(res.dtype)
    return res, stop_lens


# ===========================================================================
# SpeechTransformer (src/network.py:188-276)
# ===========================================================================


def speech_transformer_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, 4)
    postnet_p, postnet_s = M.speech_postnet_init(ks[3], cfg)
    state = {"postnet": postnet_s}
    if cfg.speech_encoder == "conformer":
        # Model-family addition (models/conformer.py): conv-augmented
        # encoder blocks on the speech side; BN state threads explicitly.
        from . import conformer as C
        enc_p, enc_s = C.conformer_encoder_init(
            ks[1], cfg.e_in, cfg.nhead, cfg.ffn_dim, cfg.num_layers,
            cfg.conformer_kernel)
        state["encoder"] = enc_s
    else:
        enc_p = T.encoder_init(ks[1], cfg.e_in, cfg.nhead, cfg.ffn_dim,
                               cfg.num_layers, moe=cfg.moe_experts)
    params = {
        "prenet": M.speech_prenet_init(ks[0], cfg),
        "encoder": enc_p,
        "decoder": T.decoder_init(ks[2], cfg.e_in, cfg.nhead, cfg.ffn_dim,
                                  cfg.num_layers, moe=cfg.moe_experts),
        "postnet": postnet_p,
    }
    if cfg.ctc_weight > 0:
        # hybrid CTC/attention (train/steps.py sp objective): per-frame
        # head over 46 symbols + 1 blank on the encoder output
        from .config import VOCAB_SIZE
        params["ctc_head"] = nn.linear_init(
            jax.random.fold_in(key, 9), cfg.e_in, VOCAB_SIZE + 1,
            torch_default=True)
    return params, state


def speech_tr_encode(p, s, ctx, cfg: ModelConfig, mel, lens, noise_in=False,
                     extra_bias=None, add_pe=True):
    """add_pe=False skips the absolute sinusoid PE — used by the
    relative-position CTC encoder (models/ctc.py, cfg.ctc_pos='rel'),
    whose position information rides `extra_bias` instead."""
    pad_mask = ~M.lens_to_mask(lens, mel.shape[1])
    x = M.noise_fn(ctx, mel, cfg.noise_mask_p) if noise_in else mel
    x = M.speech_prenet(p["prenet"], ctx, x, cfg)
    if add_pe:
        x = M.positional_encoding(ctx, x)
    if cfg.speech_encoder == "conformer":
        assert extra_bias is None, (
            "chunk-masked (streaming) encoding requires the transformer "
            "speech encoder — the conformer's depthwise conv is non-causal")
        from . import conformer as C
        memory, enc_s = C.conformer_encoder(
            p["encoder"], s["encoder"], ctx, x, pad_mask, cfg.nhead,
            cfg.e_drop, cfg.conformer_kernel, impl=cfg.attn_impl,
            scan_layers=cfg.scan_layers, remat=cfg.remat,
            remat_policy=cfg.remat_policy)
        return (memory, pad_mask), dict(s, encoder=enc_s)
    memory = T.encoder(p["encoder"], ctx, x, pad_mask, cfg.nhead,
                       cfg.e_drop, impl=cfg.attn_impl,
                       scan_layers=cfg.scan_layers, remat=cfg.remat,
                       moe_opts=cfg.moe_opts, pp=cfg.pp,
                       pp_micro=cfg.pp_micro,
                       remat_policy=cfg.remat_policy,
                       extra_bias=extra_bias)
    return (memory, pad_mask), s


def speech_tr_decode_sequence(p, s, ctx, cfg: ModelConfig, tgt, tgt_lens,
                              memory, mem_pad_mask, cross_weights_out=None):
    """Teacher-forced decode with zero-frame "go" shift (src/network.py:261).
    Returns ((pre [B,T,80], post, stop [B,T], tgt_lens), new_state).

    reduction_factor r > 1 (Tacotron-lineage; transformer-only): the
    decoder runs over T/r frame GROUPS — step g's input is the LAST frame
    of group g-1 (go-frame for g=0), the heads emit r frames + r stop
    logits per group, ungrouped back to per-frame [B, T, ...] so losses
    and the postnet are r-agnostic. r=1 reduces to the reference exactly
    (the slice tgt[:, r-1 : T-1 : r] is tgt[:, :-1])."""
    b, t = tgt.shape[:2]
    r = cfg.reduction_factor
    assert t % r == 0, f"mel length {t} not divisible by reduction {r}"
    go = jnp.zeros((b, 1, cfg.num_mels), tgt.dtype)
    tgt_in = jnp.concatenate([go, tgt[:, r - 1:t - 1:r]], axis=1)
    group_lens = -(-tgt_lens // r) if r > 1 else tgt_lens
    tgt_pad_mask = ~M.lens_to_mask(group_lens, t // r)
    x = M.speech_prenet(p["prenet"], ctx, tgt_in, cfg)
    x = M.positional_encoding(ctx, x)
    h = T.decoder(p["decoder"], ctx, x, memory, tgt_pad_mask, mem_pad_mask,
                  cfg.nhead, cfg.d_drop, impl=cfg.attn_impl,
                  scan_layers=cfg.scan_layers, remat=cfg.remat,
                  cross_weights_out=cross_weights_out,
                  moe_opts=cfg.moe_opts, pp=cfg.pp,
                  pp_micro=cfg.pp_micro,
                  remat_policy=cfg.remat_policy)
    pre, stop = M.speech_mel_and_stop(p["postnet"], h)
    pre = pre.reshape(b, t, cfg.num_mels)
    resid, postnet_s = M.speech_postnet(p["postnet"], s["postnet"], ctx, pre, cfg)
    return (pre, pre + resid, stop.reshape(b, t), tgt_lens), dict(s, postnet=postnet_s)


def speech_tr_infer(p, s, ctx, cfg: ModelConfig, memory, mem_pad_mask,
                    max_len: Optional[int] = None):
    """KV-cached greedy decode; stop when sigmoid(stop) >= .5 per sequence.
    Returns ((pre, post, stops, stop_lens), new_state). The postnet residual
    runs once over the full buffer INCLUDING the leading zero go-frame, then
    the first frame is dropped (src/network.py:246-252)."""
    max_len = max_len or cfg.max_mel_len
    b = memory.shape[0]
    r = cfg.reduction_factor
    n_groups = -(-max_len // r)           # decode runs ceil(max_len/r) steps
    cap = n_groups * r                    # frame capacity (>= max_len)
    cache = T.init_cache(p["decoder"], memory, n_groups, cfg.nhead)
    mem_bias = T.padding_bias(mem_pad_mask)
    frames = jnp.zeros((b, cap + 1, cfg.num_mels), memory.dtype)
    stops = jnp.zeros((b, cap), memory.dtype)
    stop_lens = jnp.full((b,), cap, jnp.int32)
    rng_base = _loop_base(ctx)

    def cond(c):
        g, _, _, _, stop_lens = c
        return jnp.logical_and(g < n_groups, jnp.any(stop_lens == cap))

    def body(c):
        g, frames, stops, cache, stop_lens = c
        ctx_i = _fold_ctx(rng_base, ctx.train, g)
        # input: last frame of the previous group (go-frame for g=0)
        cur = jax.lax.dynamic_slice_in_dim(frames, g * r, 1, axis=1)
        x = M.speech_prenet(p["prenet"], ctx_i, cur, cfg)
        x = M.positional_encoding(ctx_i, x, offset=g)
        h, cache = T.decoder_step(p["decoder"], ctx_i, x, g, cache, mem_bias,
                                  cfg.nhead, cfg.d_drop,
                                  scan_layers=cfg.scan_layers,
                                  moe_opts=cfg.moe_opts)
        mel_t, stop_t = M.speech_mel_and_stop(p["postnet"], h)
        frames = jax.lax.dynamic_update_slice_in_dim(
            frames, mel_t.reshape(b, r, cfg.num_mels), g * r + 1, axis=1)
        stops = jax.lax.dynamic_update_slice_in_dim(
            stops, stop_t.reshape(b, r), g * r, axis=1)
        fired = jax.nn.sigmoid(stop_t[:, 0]) >= cfg.stop_threshold  # [B, r]
        any_fired = jnp.any(fired, axis=-1)
        first = jnp.argmax(fired, axis=-1)            # first stop in group
        newly = jnp.logical_and(any_fired, stop_lens == cap)
        stop_lens = jnp.where(newly, g * r + first + 1, stop_lens)
        return (g + 1, frames, stops, cache, stop_lens)

    _, frames, stops, _, stop_lens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), frames, stops, cache, stop_lens))

    stop_lens = jnp.minimum(stop_lens, max_len)
    mask = M.lens_to_mask(stop_lens, max_len).astype(frames.dtype)
    resid, postnet_s = M.speech_postnet(p["postnet"], s["postnet"], ctx,
                                        frames, cfg)
    pre = frames[:, 1:max_len + 1] * mask[..., None]
    post = (frames + resid)[:, 1:max_len + 1] * mask[..., None]
    stops = stops[:, :max_len] * mask
    return (pre, post, stops, stop_lens), dict(s, postnet=postnet_s)


# ===========================================================================
# TextRNN (src/network.py:503-624)
# ===========================================================================


def text_rnn_init(key, cfg: ModelConfig):
    ks = jax.random.split(key, 4)
    prenet_p, prenet_s = M.text_prenet_init(ks[0], cfg)
    params = {
        "prenet": prenet_p,
        "encoder": R.rnn_encoder_init(ks[1], cfg.e_in, cfg.hidden,
                                      cfg.num_layers, cfg.e_bi),
        "decoder": R.rnn_decoder_init(ks[2], cfg.e_in, cfg.enc_out_dim,
                                      cfg.hidden, cfg.num_layers,
                                      cfg.d_attn, cfg.attn_dim),
        "postnet": M.text_postnet_init(ks[3], cfg),
    }
    return params, {"prenet": prenet_s}


def text_rnn_encode(p, s, ctx, cfg: ModelConfig, ids, lens, noise_in=False):
    """Returns (((h, c), enc_out [B,T,enc_dim]), pad_mask), new_state."""
    pad_mask = ~M.lens_to_mask(lens, ids.shape[1])
    x = M.text_embed(p["prenet"], ctx, ids, cfg)
    if noise_in:
        x = M.noise_fn(ctx, x, cfg.noise_mask_p)
    x, prenet_s = M.text_prenet_convs(p["prenet"], s["prenet"], ctx, x, cfg)
    enc_out, hc = R.rnn_encoder(p["encoder"], ctx, x, lens, cfg.e_drop)
    return ((hc, enc_out), pad_mask), {"prenet": prenet_s}


def _init_attn_state(p, cfg: ModelConfig, enc_out):
    if cfg.d_attn == "lsa":
        return R.lsa_init_state(p["decoder"]["attn"], enc_out)
    # A dummy-but-typed state keeps the scan carry structure uniform.
    b, s_, _ = enc_out.shape
    z = jnp.zeros((b, s_), enc_out.dtype)
    return R.LSAState(jnp.zeros((b, s_, 1), enc_out.dtype), z, z)


def text_rnn_decode_sequence(p, s, ctx, cfg: ModelConfig, tgt, tgt_lens,
                             enc_outputs, enc_pad_mask):
    """Teacher-forced decode -> (logits [B,T,V], new_state). Gold inputs are
    embedded once through CAUSAL prenet convs (see module docstring) and the
    LSTM+attention scans over time."""
    hc, enc_out = enc_outputs
    b, t = tgt.shape
    sos = jnp.full((b, 1), SOS_IDX, tgt.dtype)
    tgt_in = jnp.concatenate([sos, tgt[:, :-1]], axis=1)
    x = M.text_embed(p["prenet"], ctx, tgt_in, cfg)
    x, prenet_s = M.text_prenet_convs(p["prenet"], s["prenet"], ctx, x, cfg,
                                      causal=True)
    attn0 = _init_attn_state(p, cfg, enc_out)
    rng_base = _loop_base(ctx)

    def step(carry, inp):
        i, hc, attn = carry
        out, hc, attn = R.rnn_decoder_step(
            p["decoder"], _fold_ctx(rng_base, ctx.train, i), inp, hc,
            enc_out, enc_pad_mask, attn, cfg.d_drop, cfg.d_attn)
        return (i + 1, hc, attn), out

    _, outs = jax.lax.scan(step, (jnp.int32(0), hc, attn0),
                           jnp.swapaxes(x, 0, 1))
    h_seq = jnp.swapaxes(outs, 0, 1)  # [B, T, H]
    logits = M.text_postnet(p["postnet"], ctx, h_seq, cfg)
    return logits, {"prenet": prenet_s}


def text_rnn_infer(p, s, ctx, cfg: ModelConfig, enc_outputs, enc_pad_mask,
                   max_len: Optional[int] = None):
    """Greedy decode. The causal conv prenet is evaluated EXACTLY
    incrementally via per-layer rolling activation buffers
    (modules.text_prenet_step): each step costs one window-dot per conv
    instead of the reference's O(prefix) re-embed, and matches the
    teacher-forced training path position-for-position. BatchNorm uses
    running statistics inside the loop."""
    max_len = max_len or cfg.max_text_len
    hc, enc_out = enc_outputs
    b = enc_out.shape[0]

    tokens = jnp.full((b, max_len), PAD_IDX, jnp.int32)
    stop_lens = jnp.full((b,), max_len, jnp.int32)
    bufs = M.text_prenet_step_init(p["prenet"], b, cfg, enc_out.dtype)
    sos_emb = M.text_embed(p["prenet"], ctx, jnp.full((b,), SOS_IDX), cfg)
    attn0 = _init_attn_state(p, cfg, enc_out)
    rng_base = _loop_base(ctx)

    def cond(c):
        i, _, _, _, _, _, stop_lens = c
        return jnp.logical_and(i < max_len, jnp.any(stop_lens == max_len))

    def body(c):
        i, tokens, cur_emb, bufs, hc, attn, stop_lens = c
        ctx_i = _fold_ctx(rng_base, ctx.train, i)
        x_t, bufs = M.text_prenet_step(p["prenet"], s["prenet"], ctx_i,
                                       cur_emb, bufs, cfg)
        out, hc, attn = R.rnn_decoder_step(
            p["decoder"], ctx_i, x_t, hc, enc_out, enc_pad_mask,
            attn, cfg.d_drop, cfg.d_attn)
        logits = M.text_postnet(p["postnet"], ctx_i, out, cfg)
        choice = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, choice[:, None], i, axis=1)
        newly = jnp.logical_and(choice == EOS_IDX, stop_lens == max_len)
        stop_lens = jnp.where(newly, i + 1, stop_lens)
        cur_emb = M.text_embed(p["prenet"], ctx_i, choice, cfg)
        return (i + 1, tokens, cur_emb, bufs, hc, attn, stop_lens)

    _, tokens, _, _, _, _, stop_lens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, sos_emb, bufs, hc, attn0,
                     stop_lens))
    tokens = tokens * M.lens_to_mask(stop_lens, max_len).astype(tokens.dtype)
    return tokens, stop_lens


# ===========================================================================
# SpeechRNN (src/network.py:279-402)
# ===========================================================================


def speech_rnn_init(key, cfg: ModelConfig):
    assert cfg.reduction_factor == 1, (
        "reduction_factor > 1 is implemented for the transformer speech "
        "decoder only (the RNN/LSA scan consumes one frame per step)")
    ks = jax.random.split(key, 4)
    postnet_p, postnet_s = M.speech_postnet_init(ks[3], cfg)
    params = {
        "prenet": M.speech_prenet_init(ks[0], cfg),
        "encoder": R.rnn_encoder_init(ks[1], cfg.e_in, cfg.hidden,
                                      cfg.num_layers, cfg.e_bi),
        "decoder": R.rnn_decoder_init(ks[2], cfg.e_in, cfg.enc_out_dim,
                                      cfg.hidden, cfg.num_layers,
                                      cfg.d_attn, cfg.attn_dim),
        "postnet": postnet_p,
    }
    return params, {"postnet": postnet_s}


def speech_rnn_encode(p, s, ctx, cfg: ModelConfig, mel, lens, noise_in=False):
    pad_mask = ~M.lens_to_mask(lens, mel.shape[1])
    x = M.noise_fn(ctx, mel, cfg.noise_mask_p) if noise_in else mel
    x = M.speech_prenet(p["prenet"], ctx, x, cfg)
    enc_out, hc = R.rnn_encoder(p["encoder"], ctx, x, lens, cfg.e_drop)
    return ((hc, enc_out), pad_mask), s


def speech_rnn_decode_sequence(p, s, ctx, cfg: ModelConfig, tgt, tgt_lens,
                               enc_outputs, enc_pad_mask):
    """Teacher-forced scan. Postnet residual is computed over the buffer
    including the leading zero frame then shifted off (src/network.py:377)."""
    hc, enc_out = enc_outputs
    b, t = tgt.shape[0], tgt.shape[1]
    go = jnp.zeros((b, 1, cfg.num_mels), tgt.dtype)
    tgt_in = jnp.concatenate([go, tgt[:, :-1]], axis=1)
    attn0 = _init_attn_state(p, cfg, enc_out)
    rng_base = _loop_base(ctx)

    def step(carry, frame):
        i, hc, attn = carry
        ctx_i = _fold_ctx(rng_base, ctx.train, i)
        x = M.speech_prenet(p["prenet"], ctx_i, frame[:, None, :], cfg)[:, 0]
        out, hc, attn = R.rnn_decoder_step(
            p["decoder"], ctx_i, x, hc, enc_out, enc_pad_mask,
            attn, cfg.d_drop, cfg.d_attn)
        return (i + 1, hc, attn), out

    _, outs = jax.lax.scan(step, (jnp.int32(0), hc, attn0),
                           jnp.swapaxes(tgt_in, 0, 1))
    h_seq = jnp.swapaxes(outs, 0, 1)
    pre, stop = M.speech_mel_and_stop(p["postnet"], h_seq)
    buf = jnp.concatenate([jnp.zeros_like(pre[:, :1]), pre], axis=1)
    resid, postnet_s = M.speech_postnet(p["postnet"], s["postnet"], ctx, buf, cfg)
    post = (buf + resid)[:, 1:]
    return (pre, post, jnp.squeeze(stop, -1), tgt_lens), dict(s, postnet=postnet_s)


def speech_rnn_infer(p, s, ctx, cfg: ModelConfig, enc_outputs, enc_pad_mask,
                     max_len: Optional[int] = None):
    max_len = max_len or cfg.max_mel_len
    hc, enc_out = enc_outputs
    b = enc_out.shape[0]
    frames = jnp.zeros((b, max_len + 1, cfg.num_mels), enc_out.dtype)
    stops = jnp.zeros((b, max_len), enc_out.dtype)
    stop_lens = jnp.full((b,), max_len, jnp.int32)
    attn0 = _init_attn_state(p, cfg, enc_out)
    rng_base = _loop_base(ctx)

    def cond(c):
        i, _, _, _, _, stop_lens = c
        return jnp.logical_and(i < max_len, jnp.any(stop_lens == max_len))

    def body(c):
        i, frames, stops, hc, attn, stop_lens = c
        ctx_i = _fold_ctx(rng_base, ctx.train, i)
        cur = jax.lax.dynamic_slice_in_dim(frames, i, 1, axis=1)
        x = M.speech_prenet(p["prenet"], ctx_i, cur, cfg)[:, 0]
        out, hc, attn = R.rnn_decoder_step(
            p["decoder"], ctx_i, x, hc, enc_out, enc_pad_mask,
            attn, cfg.d_drop, cfg.d_attn)
        mel_t, stop_t = M.speech_mel_and_stop(p["postnet"], out[:, None, :])
        frames = jax.lax.dynamic_update_slice_in_dim(frames, mel_t, i + 1, axis=1)
        stops = jax.lax.dynamic_update_slice_in_dim(
            stops, stop_t[:, :, 0], i, axis=1)
        fired = jax.nn.sigmoid(stop_t[:, 0, 0]) >= cfg.stop_threshold
        newly = jnp.logical_and(fired, stop_lens == max_len)
        stop_lens = jnp.where(newly, i + 1, stop_lens)
        return (i + 1, frames, stops, hc, attn, stop_lens)

    _, frames, stops, _, _, stop_lens = jax.lax.while_loop(
        cond, body, (jnp.int32(0), frames, stops, hc, attn0, stop_lens))

    mask = M.lens_to_mask(stop_lens, max_len).astype(frames.dtype)
    resid, postnet_s = M.speech_postnet(p["postnet"], s["postnet"], ctx,
                                        frames, cfg)
    pre = frames[:, 1:] * mask[..., None]
    post = (frames + resid)[:, 1:] * mask[..., None]
    stops = stops * mask
    return (pre, post, stops, stop_lens), dict(s, postnet=postnet_s)


# ===========================================================================
# Dispatch helpers (model_type-agnostic API used by the UNAST facade)
# ===========================================================================


def text_init(key, cfg: ModelConfig):
    return (text_transformer_init if cfg.model_type == "transformer"
            else text_rnn_init)(key, cfg)


def speech_init(key, cfg: ModelConfig):
    return (speech_transformer_init if cfg.model_type == "transformer"
            else speech_rnn_init)(key, cfg)


def text_encode(p, s, ctx, cfg, ids, lens, noise_in=False):
    fn = text_tr_encode if cfg.model_type == "transformer" else text_rnn_encode
    return fn(p, s, ctx, cfg, ids, lens, noise_in)


def speech_encode(p, s, ctx, cfg, mel, lens, noise_in=False):
    fn = (speech_tr_encode if cfg.model_type == "transformer"
          else speech_rnn_encode)
    return fn(p, s, ctx, cfg, mel, lens, noise_in)


def text_decode_sequence(p, s, ctx, cfg, tgt, tgt_lens, memory, mem_mask,
                         cross_weights_out=None):
    if cfg.model_type == "transformer":
        return text_tr_decode_sequence(
            p, ctx, cfg, tgt, tgt_lens, memory, mem_mask,
            cross_weights_out=cross_weights_out), s
    return text_rnn_decode_sequence(p, s, ctx, cfg, tgt, tgt_lens,
                                    memory, mem_mask)


def speech_decode_sequence(p, s, ctx, cfg, tgt, tgt_lens, memory, mem_mask,
                           cross_weights_out=None):
    if cfg.model_type == "transformer":
        return speech_tr_decode_sequence(
            p, s, ctx, cfg, tgt, tgt_lens, memory, mem_mask,
            cross_weights_out=cross_weights_out)
    return speech_rnn_decode_sequence(p, s, ctx, cfg, tgt, tgt_lens,
                                      memory, mem_mask)


def text_infer(p, s, ctx, cfg, memory, mem_mask, max_len=None):
    if cfg.model_type == "transformer":
        return text_tr_infer(p, ctx, cfg, memory, mem_mask, max_len), s
    return text_rnn_infer(p, s, ctx, cfg, memory, mem_mask, max_len), s


def speech_infer(p, s, ctx, cfg, memory, mem_mask, max_len=None):
    fn = speech_tr_infer if cfg.model_type == "transformer" else speech_rnn_infer
    return fn(p, s, ctx, cfg, memory, mem_mask, max_len)
