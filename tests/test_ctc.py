"""CTC non-autoregressive ASR (models/ctc.py, train/ctc.py) — model-family
addition over the reference (AR-only ASR decode, src/network.py:440-458)."""

import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu import nn
from unast_tpu.models import ctc as C
from unast_tpu.models.config import TINY, VOCAB_SIZE


def test_greedy_decode_collapses_and_drops_blanks():
    # frames: a a blank a b b blank blank -> "a a b" (repeat across blank
    # is kept, adjacent repeats collapse)
    b_id = C.BLANK_ID
    seq = [5, 5, b_id, 5, 7, 7, b_id, b_id]
    logits = np.full((1, len(seq), VOCAB_SIZE + 1), -10.0, np.float32)
    for t, k in enumerate(seq):
        logits[0, t, k] = 10.0
    pad = np.zeros((1, len(seq)), bool)
    ids, lens = C.ctc_greedy_decode(jnp.asarray(logits), jnp.asarray(pad),
                                    max_text_len=6)
    assert int(lens[0]) == 3
    np.testing.assert_array_equal(np.asarray(ids[0, :3]), [5, 5, 7])
    assert np.all(np.asarray(ids[0, 3:]) == 0)


def test_greedy_decode_respects_pad_and_cap():
    b_id = C.BLANK_ID
    seq = [5, 6, 7, 8, 9]
    logits = np.full((1, 5, VOCAB_SIZE + 1), -10.0, np.float32)
    for t, k in enumerate(seq):
        logits[0, t, k] = 10.0
    pad = np.array([[False, False, False, True, True]])  # frames 3,4 PAD
    ids, lens = C.ctc_greedy_decode(jnp.asarray(logits), jnp.asarray(pad),
                                    max_text_len=2)
    assert int(lens[0]) == 2  # 3 kept tokens clipped to the cap
    np.testing.assert_array_equal(np.asarray(ids[0]), [5, 6])
    assert b_id == VOCAB_SIZE


def test_forward_shapes_both_encoders():
    for enc in ("transformer", "conformer"):
        cfg = TINY.replace(speech_encoder=enc, conformer_kernel=7)
        p, s = C.ctc_asr_init(jax.random.PRNGKey(0), cfg)
        assert "decoder" not in p and "postnet" not in p
        mel = jnp.zeros((2, 12, cfg.num_mels))
        lens = jnp.array([12, 7])
        (ids, out_lens), _ = C.ctc_asr_infer(p, s, nn.Ctx.eval(), cfg,
                                             mel, lens)
        assert ids.shape == (2, cfg.max_text_len)
        assert np.all(np.asarray(out_lens) <= cfg.max_text_len)


def test_ctc_loss_decreases_and_grounds():
    """~80 CPU steps on 2 fixed synthetic utterances: loss drops and
    greedy PER improves from the untrained value."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.ctc import eval_per, init_ctc_state, make_ctc_step

    args, cfg = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 2e-3
    ds = SyntheticSpeechDataset(size=2, seed=0)
    it = BatchIterator(ds, 2, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len")}
    ts = init_ctc_state(jax.random.PRNGKey(0), cfg, args)
    per0 = eval_per(ts, cfg, raw)
    step = jax.jit(make_ctc_step(cfg, args), donate_argnums=(0,))
    first = last = None
    for i in range(80):
        ts, m = step(ts, jax.random.PRNGKey(10 + i), batch)
        v = float(m["ctc/loss"])
        assert np.isfinite(v), m
        if first is None:
            first = v
        last = v
    assert last < 0.5 * first, (first, last)
    per1 = eval_per(ts, cfg, raw)
    assert per1 < per0, (per0, per1)


def test_synthesizer_ctc_asr_path():
    """Synthesizer(ctc_pv=...) serves one-pass CTC ASR."""
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import unast as U

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    c_params, c_state = C.ctc_asr_init(jax.random.PRNGKey(1), cfg)
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(24,), max_batch=2,
                      ctc_pv=(c_params, c_state))
    mels = [np.random.default_rng(0).random((20, cfg.num_mels),
                                            ).astype(np.float32),
            np.random.default_rng(1).random((12, cfg.num_mels),
                                            ).astype(np.float32)]
    outs = syn.asr_ids(mels)
    assert len(outs) == 2
    for ids in outs:
        assert ids.ndim == 1 and len(ids) <= cfg.max_text_len
        assert np.all(ids < C.BLANK_ID)  # blanks never emitted
    # it must actually be the CTC decode, not a silent AR fallback: match
    # a direct ctc_asr_infer call at the same padded bucket shape exactly
    bucket = 24
    for i, m in enumerate(mels):
        mel_b = np.zeros((1, bucket, cfg.num_mels), np.float32)
        mel_b[0, :len(m)] = m
        (want_ids, want_lens), _ = C.ctc_asr_infer(
            c_params, c_state, nn.Ctx.eval(), cfg,
            jnp.asarray(mel_b), jnp.asarray([len(m)], jnp.int32))
        want = np.asarray(want_ids[0, : int(want_lens[0])])
        np.testing.assert_array_equal(outs[i], want)


def test_hybrid_ctc_attention_sp_objective():
    """--ctc_weight: the ctc_head exists, the supervised step carries a
    finite ctc_sp metric, and ~40 steps drop it substantially."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.config import model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step

    args, _ = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 2e-3
    args.ctc_weight = 0.5
    args.ae_steps, args.cm_steps, args.sp_steps, args.d_steps = 0, 0, 1, 0
    args.use_discriminator = False
    args.train_batch_size = 2
    cfg = model_config_from_args(args)
    assert cfg.ctc_weight == 0.5
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    assert "ctc_head" in ts.params["speech_m"]
    ds = SyntheticSpeechDataset(size=2, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=False))
    step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))
    first = last = None
    for i in range(40):
        ts, m = step(ts, jax.random.PRNGKey(1 + i), batches)
        v = float(m["sp/ctc_sp"])
        assert np.isfinite(v), m
        if first is None:
            first = v
        last = v
    assert last < 0.6 * first, (first, last)


def test_prefix_beam_matches_greedy_on_peaked_logits():
    """With near-one-hot posteriors, prefix beam == greedy collapse."""
    b_id = C.BLANK_ID
    seq = [5, 5, b_id, 7, 7, b_id, 9]
    logits = np.full((len(seq), VOCAB_SIZE + 1), -15.0, np.float32)
    for t, k in enumerate(seq):
        logits[t, k] = 8.0
    lp = logits - np.log(np.sum(np.exp(logits), -1, keepdims=True))
    got = C.ctc_prefix_beam_search(lp, len(seq), beam=4, max_text_len=8)
    assert got == [5, 7, 9]


def test_prefix_beam_merges_alignment_mass():
    """A case where greedy is wrong but the summed alignment mass picks
    the right prefix: every frame slightly prefers blank, but the token's
    total mass across frames dominates."""
    b_id = C.BLANK_ID
    T = 4
    lp = np.full((T, VOCAB_SIZE + 1), -20.0, np.float64)
    # per frame: P(blank)=0.4, P(tok 5)=0.35, P(tok 7)=0.25
    for t in range(T):
        lp[t, b_id] = np.log(0.40)
        lp[t, 5] = np.log(0.35)
        lp[t, 7] = np.log(0.25)
    # greedy: argmax is blank every frame -> empty hyp
    greedy_ids, greedy_lens = C.ctc_greedy_decode(
        jnp.asarray(lp[None], jnp.float32),
        jnp.zeros((1, T), bool), max_text_len=4)
    assert int(greedy_lens[0]) == 0
    # prefix beam: P(empty) = 0.4^4 = 0.0256 < P("5") summed over all
    # alignments with >=1 frame of token 5 and no 7
    got = C.ctc_prefix_beam_search(lp, T, beam=8, max_text_len=4)
    assert got == [5], got


def test_synthesizer_ctc_beam_path():
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import unast as U

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    c_params, c_state = C.ctc_asr_init(jax.random.PRNGKey(1), cfg)
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(24,), max_batch=2,
                      ctc_pv=(c_params, c_state))
    mels = [np.random.default_rng(0).random((20, cfg.num_mels)
                                            ).astype(np.float32)]
    outs = syn.asr_ids(mels, ctc_beam=4)
    assert len(outs) == 1 and outs[0].ndim == 1
    assert np.all(outs[0] < C.BLANK_ID)


def _fa_oracle(lp, labels, t_len):
    """Brute-force CTC Viterbi forced alignment for one utterance."""
    u = len(labels)
    s_dim = 2 * u + 1
    lab = [C.BLANK_ID if s % 2 == 0 else labels[s // 2]
           for s in range(s_dim)]
    neg = -1e18
    q = np.full((t_len, s_dim), neg)
    back = np.zeros((t_len, s_dim), np.int64)
    q[0, 0] = lp[0, lab[0]]
    if s_dim > 1:
        q[0, 1] = lp[0, lab[1]]
    for t in range(1, t_len):
        for s in range(s_dim):
            cands = [(q[t - 1, s], 0)]
            if s >= 1:
                cands.append((q[t - 1, s - 1], 1))
            if s >= 2 and s % 2 == 1 and lab[s] != lab[s - 2]:
                cands.append((q[t - 1, s - 2], 2))
            best, d = max(cands, key=lambda c: c[0])
            q[t, s], back[t, s] = best + lp[t, lab[s]], d
    s = 2 * u if q[t_len - 1, 2 * u] >= q[t_len - 1, 2 * u - 1] \
        else 2 * u - 1
    dur = np.zeros(u, np.int64)
    for t in range(t_len - 1, 0, -1):
        dur[min(max((s - 1) // 2, 0), u - 1)] += 1
        s -= back[t, s]
    dur[0] += 1  # frame 0 (state 0 or 1 -> token 0)
    return dur


def test_ctc_forced_align_matches_bruteforce():
    """ctc_forced_align equals a per-utterance numpy Viterbi oracle on
    random posteriors across ragged frame/label lengths."""
    rng = np.random.default_rng(3)
    b, t, u = 3, 14, 4
    logits = rng.standard_normal((b, t, VOCAB_SIZE + 1)).astype(np.float32)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = np.array([[5, 6, 5, 7], [8, 8, 9, 0], [4, 0, 0, 0]], np.int32)
    label_lens = np.array([4, 3, 1])
    mel_lens = np.array([14, 10, 6])
    fv = np.arange(t)[None, :] < mel_lens[:, None]
    got = np.asarray(C.ctc_forced_align(lp, jnp.asarray(fv),
                                        jnp.asarray(labels),
                                        jnp.asarray(label_lens)))
    lp_np = np.asarray(lp, np.float64)
    for i in range(b):
        want = _fa_oracle(lp_np[i], list(labels[i][:label_lens[i]]),
                          int(mel_lens[i]))
        np.testing.assert_array_equal(got[i, :label_lens[i]], want,
                                      err_msg=f"row {i}")
        assert got[i].sum() == mel_lens[i]
        assert np.all(got[i, label_lens[i]:] == 0)


def test_ctc_forced_align_clean_segments():
    """On sharply-peaked posteriors matching a known segmentation, the
    alignment recovers the true spans (blanks fold into the previous
    token)."""
    spans = {5: 4, 7: 3, 9: 5}
    seq = [5] * 4 + [C.BLANK_ID] * 2 + [7] * 3 + [9] * 5
    t = len(seq)
    logits = np.full((1, t, VOCAB_SIZE + 1), -15.0, np.float32)
    for i, k in enumerate(seq):
        logits[0, i, k] = 15.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = jnp.asarray([[5, 7, 9]], jnp.int32)
    dur = np.asarray(C.ctc_forced_align(
        lp, jnp.ones((1, t), bool), labels, jnp.asarray([3])))[0]
    np.testing.assert_array_equal(dur, [6, 3, 5])  # blanks -> token 0
    assert dur.sum() == t


def test_ctc_forced_align_blank_split():
    """blank_split=True divides interior blank runs between the tokens
    they separate; leading/trailing runs keep their single neighbor, and
    rows still sum to the frame count."""
    B = C.BLANK_ID
    # lead 2 blanks | 5 x3 | 4 blanks | 7 x2 | 1 blank | 9 x3 | trail 2
    seq = ([B] * 2 + [5] * 3 + [B] * 4 + [7] * 2 + [B] * 1 + [9] * 3
           + [B] * 2)
    t = len(seq)
    logits = np.full((1, t, VOCAB_SIZE + 1), -15.0, np.float32)
    for i, k in enumerate(seq):
        logits[0, i, k] = 15.0
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = jnp.asarray([[5, 7, 9]], jnp.int32)
    lens = jnp.asarray([3])
    fv = jnp.ones((1, t), bool)
    base = np.asarray(C.ctc_forced_align(lp, fv, labels, lens))[0]
    # all-to-preceding: lead+run1 -> 5, run2 + trail -> their predecessors
    np.testing.assert_array_equal(base, [2 + 3 + 4, 2 + 1, 3 + 2])
    split = np.asarray(C.ctc_forced_align(lp, fv, labels, lens,
                                          blank_split=True))[0]
    # interior 4-run splits 2/2; single interior blank stays w/ preceding;
    # leading -> first token, trailing -> last token
    np.testing.assert_array_equal(split, [2 + 3 + 2, 2 + 2 + 1, 3 + 2])
    assert split.sum() == t
    # ragged tail: pad frames must not leak into the last token
    fv2 = jnp.asarray(np.arange(t)[None, :] < (t - 2))
    split2 = np.asarray(C.ctc_forced_align(lp, fv2, labels, lens,
                                           blank_split=True))[0]
    assert split2.sum() == t - 2


def test_synthesizer_spec_asr_matches_ar_greedy():
    """asr_ids(spec=True) = the AR model's greedy transcript, reached by
    CTC-drafted speculative verification — must equal the pure-AR path's
    output exactly (and expose the verify-round count)."""
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import unast as U

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    c_params, c_state = C.ctc_asr_init(jax.random.PRNGKey(1), cfg)
    mels = [np.random.default_rng(0).random((20, cfg.num_mels),
                                            ).astype(np.float32),
            np.random.default_rng(1).random((12, cfg.num_mels),
                                            ).astype(np.float32)]
    # pure AR greedy (no ctc_pv -> _asr_fn is the AR decoder)
    syn_ar = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                         mel_buckets=(24,), max_batch=2)
    want = syn_ar.asr_ids(mels)
    # speculative: same AR transcript via CTC draft + parallel verify
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(24,), max_batch=2,
                      ctc_pv=(c_params, c_state))
    got = syn.asr_ids(mels, spec=True)
    assert len(got) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert len(syn.last_spec_rounds) == 1
    assert 1 <= syn.last_spec_rounds[0] <= cfg.max_text_len
    # spec requires a CTC draft model
    import pytest
    with pytest.raises(ValueError):
        syn_ar.asr_ids(mels, spec=True)
