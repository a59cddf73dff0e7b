"""CTC non-autoregressive ASR: mel -> token posteriors in ONE forward pass
(Graves et al., "Connectionist Temporal Classification", 2006).

Model-family ADDITION over the reference, whose only ASR decode is the
autoregressive text decoder run one token per step with no KV cache
(src/network.py:440-458). Here the speech encoder (the same
prenet + transformer/conformer stack as the AR model — cfg.speech_encoder
applies) feeds a per-frame linear head over the 46 symbols + 1 blank;
greedy CTC decode (argmax -> collapse repeats -> drop blanks) is a few
vector ops on the same device pass. No sequential loop anywhere: the
TPU-native serving shape for ASR, mirroring models/fastspeech.py for TTS.

Training: optax.ctc_loss on gold transcripts (train/ctc.py). The blank id
is VOCAB_SIZE (=46), outside the symbol table, so emitted ids need no
remapping.
"""

import jax
import jax.numpy as jnp

from .. import nn
from . import modules as M
from . import networks as N
from .config import VOCAB_SIZE, ModelConfig

BLANK_ID = VOCAB_SIZE  # 46 — one past the symbol table


def ctc_asr_init(key, cfg: ModelConfig):
    """Returns (params, state): the speech-side encoder tree (prenet +
    encoder, exactly networks.speech_transformer_init's encoder half, so
    cfg.speech_encoder='conformer' works unchanged) plus the CTC head.

    cfg.ctc_pos='rel' adds a learned per-head RELATIVE position bias
    table over the bounded chunk attention field (T5-style, shared
    across layers) and drops the absolute sinusoid PE — see rel_bias."""
    k_enc, k_head, k_rel = jax.random.split(key, 3)
    enc_p, enc_s = N.speech_transformer_init(k_enc, cfg)
    del enc_p["decoder"], enc_p["postnet"]
    state = {k: v for k, v in enc_s.items() if k != "postnet"}
    enc_p["ctc_head"] = nn.linear_init(k_head, cfg.e_in, VOCAB_SIZE + 1,
                                       torch_default=True)
    if cfg.ctc_pos == "rel":
        assert cfg.ctc_chunk > 0 and cfg.ctc_left >= 0, (
            "ctc_pos='rel' needs a bounded chunk attention field "
            "(ctc_chunk > 0, ctc_left >= 0) — that is what makes the "
            "relative-distance table finite")
        enc_p["rel_pos"] = 0.02 * jax.random.normal(
            k_rel, (cfg.nhead, rel_table_size(cfg)), jnp.float32)
    return enc_p, state


# ---------------------------------------------------------------------------
# Relative position bias (cfg.ctc_pos='rel')
# ---------------------------------------------------------------------------
#
# The reference's speech encoder (and the 'abs' default here) adds the
# 5000-entry absolute sinusoid PE (src/module.py:249-267), which caps a
# stream at ~62 s (hop 275) and extrapolates beyond trained positions.
# With the chunk mask, a query at frame q only ever sees keys at
# distances d = q - k in [-(chunk-1), (left+1)*chunk - 1] — a FINITE set
# — so a learned per-head bias table over those distances (T5-style,
# Raffel et al. 2020, shared across layers) carries all the position
# information the bounded field can use. It is translation-invariant:
# online streams of ANY length are exact and match the training
# distribution, with no table cap and no extrapolation regime.


def rel_table_size(cfg: ModelConfig) -> int:
    """Distances within the chunk field: -(chunk-1) .. (left+1)*chunk-1."""
    return (cfg.ctc_left + 2) * cfg.ctc_chunk - 1


def rel_bias(table, q_pos, k_pos, cfg: ModelConfig):
    """table [H, S] -> additive bias [1, H, Tq, Tk] with
    bias[0, h, i, j] = table[h, (q_pos[i] - k_pos[j]) + (chunk-1)].
    Out-of-field distances are clamped — those pairs are NEG_INF-masked
    by the chunk mask (one-shot) or the validity mask (streaming), so
    the clamped value never reaches a softmax."""
    d = q_pos[:, None] - k_pos[None, :] + (cfg.ctc_chunk - 1)
    d = jnp.clip(d, 0, table.shape[1] - 1)
    return table[:, d][None].astype(jnp.float32)


def ctc_logits(p, s, ctx: nn.Ctx, cfg: ModelConfig, mel, mel_len):
    """mel [B, T, n_mels] -> (logits f32 [B, T, V+1], frame_pad_mask
    [B, T] True=PAD, new_state).

    cfg.ctc_chunk > 0 applies the chunk-causal attention mask
    (transformer.py::chunk_bias) so the SAME weights serve both this
    one-shot path and infer/streaming.py's online path exactly.
    cfg.ctc_pos='rel' rides the relative bias on the same extra_bias
    slot and skips the absolute PE (see rel_bias)."""
    extra = None
    t = mel.shape[1]
    if cfg.ctc_chunk > 0:
        from . import transformer as T
        extra = T.chunk_bias(t, cfg.ctc_chunk, cfg.ctc_left)
    if cfg.ctc_pos == "rel":
        pos = jnp.arange(t)
        extra = extra + rel_bias(p["rel_pos"], pos, pos, cfg)
    (memory, pad_mask), new_s = N.speech_tr_encode(
        p, s, ctx, cfg, mel, mel_len, extra_bias=extra,
        add_pe=cfg.ctc_pos != "rel")
    logits = nn.linear(p["ctc_head"], memory).astype(jnp.float32)
    return logits, pad_mask, new_s


def ctc_greedy_decode(logits, pad_mask, max_text_len: int):
    """Greedy CTC: per-frame argmax -> collapse repeats -> drop blanks.
    Static shapes: returns (ids [B, max_text_len] int32, lens [B]).
    Tokens beyond max_text_len are dropped (caps match the AR decoder's
    fixed decode buffers)."""
    b, t = logits.shape[:2]
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32), tok[:, :-1]],
                           axis=1)
    keep = (tok != BLANK_ID) & (tok != prev) & ~pad_mask
    # compact kept tokens to the left with a dump slot at max_text_len
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    dst = jnp.where(keep & (pos < max_text_len), pos, max_text_len)
    out = jnp.zeros((b, max_text_len + 1), jnp.int32)
    out = out.at[jnp.arange(b)[:, None], dst].set(tok, mode="drop")
    lens = jnp.minimum(jnp.sum(keep, axis=1), max_text_len)
    return out[:, :max_text_len], lens


def ctc_asr_infer(p, s, ctx: nn.Ctx, cfg: ModelConfig, mel, mel_len):
    """One-pass greedy ASR. Returns ((ids, lens), new_state)."""
    logits, pad_mask, new_s = ctc_logits(p, s, ctx, cfg, mel, mel_len)
    ids, lens = ctc_greedy_decode(logits, pad_mask, cfg.max_text_len)
    return (ids, lens), new_s


# ---------------------------------------------------------------------------
# Streaming (online) inference over a chunk-masked model
# ---------------------------------------------------------------------------


def ctc_stream_init(p, cfg: ModelConfig, batch_size: int):
    """Carry for ctc_stream_step: per-layer K/V ring caches of the last
    cfg.ctc_left chunks, their validity mask, and the absolute frame
    position (for the positional-encoding offset). Requires a model built
    with cfg.ctc_chunk > 0 and ctc_left >= 0 (a negative ctc_left means
    unlimited left context, whose state grows without bound — use the
    one-shot ctc_asr_infer for that)."""
    assert cfg.ctc_chunk > 0, "streaming needs a chunk-masked model"
    assert cfg.ctc_left >= 0, "streaming needs bounded left context"
    m = cfg.ctc_left * cfg.ctc_chunk
    nlayers = len(p["encoder"]["layers"])
    z = jnp.zeros((batch_size, m, cfg.nhead, cfg.e_in // cfg.nhead),
                  cfg.dtype)
    return {"k": [z] * nlayers, "v": [z] * nlayers,
            "valid": jnp.zeros((batch_size, m), bool),
            "pos": jnp.zeros((), jnp.int32)}


def ctc_stream_step(p, ctx: nn.Ctx, cfg: ModelConfig, carry, mel_chunk,
                    frame_valid):
    """One online encoder step over mel_chunk [B, ctc_chunk, n_mels].

    Reproduces ctc_logits EXACTLY (chunk-masked full forward) from
    per-chunk slices: layer l's cached K/V for past chunks were computed
    when those chunks streamed, under the same bounded attention field
    the chunk mask gives the full forward, so the block-banded attention
    factorizes chunk-by-chunk (tested: tests/test_streaming_asr.py).

    frame_valid: bool [B, ctc_chunk], False for pad frames (only the
    final partial chunk should contain any). Returns (new_carry,
    logits f32 [B, ctc_chunk, V+1], tok [B, ctc_chunk] int32 per-frame
    argmax — the greedy-CTC emission stream)."""
    from . import transformer as T

    if ctx.train:
        raise ValueError("streaming inference requires an eval-mode Ctx")
    c = cfg.ctc_chunk
    m = carry["valid"].shape[1]
    b = mel_chunk.shape[0]
    x = M.speech_prenet(p["prenet"], ctx, mel_chunk, cfg)
    if cfg.ctc_pos != "rel":
        x = M.positional_encoding(ctx, x, offset=carry["pos"])
    key_valid = jnp.concatenate([carry["valid"], frame_valid], axis=1)
    bias = jnp.where(key_valid, 0.0,
                     T.NEG_INF)[:, None, None, :].astype(jnp.float32)
    if cfg.ctc_pos == "rel":
        # cache slot j holds the key m-j frames before the chunk start;
        # query i sits at in-window position m+i — distances m+i-j match
        # the one-shot rel_bias exactly, independent of stream position
        bias = bias + rel_bias(p["rel_pos"], m + jnp.arange(c),
                               jnp.arange(m + c), cfg)
    new_k, new_v = [], []
    for li, lp in enumerate(p["encoder"]["layers"]):
        attn = lp["attn"]
        q, k, v = T._fused_proj([attn["q"], attn["k"], attn["v"]], x)
        q, k, v = (T._split_heads(t, cfg.nhead) for t in (q, k, v))
        k_full = jnp.concatenate([carry["k"][li], k], axis=1)
        v_full = jnp.concatenate([carry["v"][li], v], axis=1)
        o = T.attention_core(q, k_full, v_full, bias, ctx, cfg.e_drop)
        a = nn.linear(attn["out"], o.reshape(b, c, -1))
        x = nn.layernorm(lp["ln1"], x + a)
        f = T._ffn(lp, ctx, x, cfg.e_drop)
        x = nn.layernorm(lp["ln2"], x + f)
        new_k.append(k_full[:, k_full.shape[1] - m:])
        new_v.append(v_full[:, v_full.shape[1] - m:])
    logits = nn.linear(p["ctc_head"], x).astype(jnp.float32)
    new_carry = {"k": new_k, "v": new_v,
                 "valid": key_valid[:, key_valid.shape[1] - m:],
                 "pos": carry["pos"] + c}
    return new_carry, logits, jnp.argmax(logits, axis=-1).astype(jnp.int32)


def ctc_prefix_beam_search(log_probs: "np.ndarray", n_frames: int,
                           beam: int = 8, max_text_len: int = 300):
    """Prefix beam search over a CTC lattice (Hannun et al. 2014) —
    host-side numpy over one utterance's log-posteriors [T, V+1].

    Unlike greedy argmax-collapse, probability mass is merged across the
    MANY alignments of each prefix (blank/non-blank bookkeeping), which
    recovers tokens whose per-frame argmax never wins. Serving entry:
    Synthesizer.asr_ids(..., ctc_beam=K). Returns a python list of ids."""
    import numpy as np

    lp = np.asarray(log_probs, np.float64)[:n_frames]
    NEG = -1e30

    def logsumexp2(a, b):
        m = max(a, b)
        if m <= NEG:
            return NEG
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    # beams: prefix tuple -> (log p ending in blank, log p ending in tok)
    beams = {(): (0.0, NEG)}
    for t in range(lp.shape[0]):
        frame = lp[t]
        top = np.argsort(frame)[::-1][: max(beam, 8)]  # prune the vocab
        nxt = {}

        def acc(prefix, pb, pnb):
            b0, nb0 = nxt.get(prefix, (NEG, NEG))
            nxt[prefix] = (logsumexp2(b0, pb), logsumexp2(nb0, pnb))

        for prefix, (pb, pnb) in beams.items():
            p_tot = logsumexp2(pb, pnb)
            for k in top:
                pk = float(frame[k])
                if k == BLANK_ID:
                    acc(prefix, p_tot + pk, NEG)
                elif prefix and k == prefix[-1]:
                    # repeat: extends ONLY the blank-ending mass; the
                    # non-blank mass collapses into the same prefix
                    acc(prefix, NEG, pnb + pk)
                    if len(prefix) < max_text_len:
                        acc(prefix + (int(k),), NEG, pb + pk)
                else:
                    if len(prefix) < max_text_len:
                        acc(prefix + (int(k),), NEG, p_tot + pk)
        beams = dict(sorted(nxt.items(),
                            key=lambda kv: -logsumexp2(*kv[1]))[:beam])
    best = max(beams.items(), key=lambda kv: logsumexp2(*kv[1]))[0]
    return list(best)


def ctc_forced_align(log_probs, frame_valid, labels, label_lens,
                     blank_split: bool = False):
    """Viterbi forced alignment over the standard CTC graph (the
    MFA-style duration source for the FastSpeech NAR family — VERDICT r2
    #1; models/fastspeech.py consumes the result via `durations=`).

    log_probs: [B, T, V+1] log-softmax frame posteriors (blank=BLANK_ID);
    frame_valid: bool [B, T]; labels: [B, U] gold ids (0=PAD);
    label_lens: [B]. Finds the best alignment constrained to emit EXACTLY
    the label sequence (expanded states blank,l1,blank,...,lU,blank with
    the standard stay/advance/skip transitions) and counts frames per
    token — blank-run frames are attributed to the PRECEDING token
    (leading blanks to token 0), so rows sum exactly to the frame count.
    `blank_split=True` instead splits each INTERIOR blank run half/half
    between the tokens it separates (leading/trailing runs keep their
    only neighbor) — measured against the synthetic corpus's oracle
    phoneme grid this halves the boundary error the all-to-preceding
    rule leaves (CTC emits label spikes; the blanks around a boundary
    carry both neighbors' frames). Static-shape lax.scan DP (one forward
    pass storing transition choices, one backward pass recovering the
    path), runs in-graph inside the jitted distillation step. Returns
    int32 [B, U]."""
    b, t, _ = log_probs.shape
    u = labels.shape[1]
    s_dim = 2 * u + 1
    neg = jnp.float32(-1e9)
    s_idx = jnp.arange(s_dim)
    is_lab = (s_idx % 2) == 1
    # token a state's frames count toward: label state 2k+1 -> token k;
    # blank state 2k -> preceding token k-1 (clipped to 0 for the lead-in)
    tok_of_state = jnp.clip((s_idx - 1) // 2, 0, u - 1)
    lab_ids = jnp.where(is_lab[None, :],
                        labels[:, jnp.clip(s_idx // 2, 0, u - 1)],
                        BLANK_ID)  # [B, S]
    s_valid = s_idx[None, :] < (2 * label_lens[:, None] + 1)
    # skip (s-2 -> s) is legal only into a label state whose label differs
    # from the label two states back (CTC's repeated-label rule)
    prev2_lab = jnp.concatenate(
        [jnp.full((b, 2), -1, lab_ids.dtype), lab_ids[:, :-2]], axis=1)
    skip_ok = is_lab[None, :] & (s_idx >= 2)[None, :] & \
        (lab_ids != prev2_lab)

    emit = jnp.take_along_axis(
        log_probs.astype(jnp.float32),
        jnp.broadcast_to(lab_ids[:, None, :], (b, t, s_dim)),
        axis=2)  # [B, T, S]

    q0 = jnp.where((s_idx[None, :] <= 1) & s_valid, emit[:, 0], neg)

    def fwd(q, inputs):
        e_t, valid_t = inputs  # [B, S], [B]
        prev1 = jnp.concatenate(
            [jnp.full((b, 1), neg), q[:, :-1]], axis=1)
        prev2 = jnp.concatenate(
            [jnp.full((b, 2), neg), q[:, :-2]], axis=1)
        prev2 = jnp.where(skip_ok, prev2, neg)
        best = jnp.maximum(q, jnp.maximum(prev1, prev2))
        delta = jnp.where(prev2 >= best, 2,
                          jnp.where(prev1 >= best, 1, 0)).astype(jnp.int8)
        q_new = jnp.where(s_valid, best + e_t, neg)
        # PAD frames carry the lattice unchanged (stay-only, score 0) so
        # the path position at frame T-1 equals the last valid frame's
        q_next = jnp.where(valid_t[:, None], q_new, q)
        delta = jnp.where(valid_t[:, None], delta, jnp.int8(0))
        return q_next, delta

    q_fin, deltas = jax.lax.scan(
        fwd, q0, (jnp.swapaxes(emit, 0, 1)[1:],
                  jnp.swapaxes(frame_valid, 0, 1)[1:]))
    # end in the last blank (2*U_b) or last label (2*U_b - 1), whichever
    # scored higher
    e_blank = jnp.clip(2 * label_lens, 0, s_dim - 1)
    e_label = jnp.clip(2 * label_lens - 1, 0, s_dim - 1)
    qb = jnp.take_along_axis(q_fin, e_blank[:, None], axis=1)[:, 0]
    ql = jnp.take_along_axis(q_fin, e_label[:, None], axis=1)[:, 0]
    j0 = jnp.where(qb >= ql, e_blank, e_label).astype(jnp.int32)

    def bwd(j, inputs):
        d_t, _valid_t = inputs  # [B, S], [B]
        step = jnp.take_along_axis(d_t, j[:, None], axis=1)[:, 0]
        return j - step.astype(jnp.int32), j

    j_first, js = jax.lax.scan(
        bwd, j0, (deltas[::-1],
                  jnp.swapaxes(frame_valid, 0, 1)[1:][::-1]))
    # per-frame Viterbi state [B, T] (frame 0 = lead blank or first label)
    states = jnp.concatenate(
        [j_first[:, None], jnp.swapaxes(js[::-1], 0, 1)], axis=1)
    prec = tok_of_state[states]          # preceding token (blank 2k -> k-1)
    if blank_split:
        isb = (states % 2) == 0
        fol = jnp.clip(states // 2, 0, u - 1)  # following token (2k -> k)
        fidx = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
        lab_here = (~isb) & frame_valid
        # nearest label frame at/before f (running max) and at/after f
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(lab_here, fidx, -1), axis=1) + 1
        nxt = jax.lax.associative_scan(
            jnp.minimum, jnp.where(lab_here, fidx, t), axis=1, reverse=True)
        # interior run: a label exists on both sides within valid frames
        interior = (nxt < t) & (run_start > 0)
        second = (fidx - run_start) * 2 >= (nxt - run_start)
        tok = jnp.where(isb & interior & second, fol, prec)
    else:
        tok = prec
    dur = jnp.sum(
        jax.nn.one_hot(tok, u, dtype=jnp.int32)
        * frame_valid[:, :, None].astype(jnp.int32), axis=1)
    return dur * M.lens_to_mask(label_lens, u).astype(jnp.int32)


def ctc_loss(logits, frame_pad_mask, labels, label_lens):
    """Mean per-sequence CTC loss. labels: [B, N] gold ids (0=PAD)."""
    label_pad = (~M.lens_to_mask(label_lens, labels.shape[1])
                 ).astype(jnp.float32)
    import optax
    per_seq = optax.ctc_loss(logits, frame_pad_mask.astype(jnp.float32),
                             labels, label_pad, blank_id=BLANK_ID)
    return jnp.mean(per_seq)
