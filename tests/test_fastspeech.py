"""FastSpeech NAR TTS (models/fastspeech.py, train/fastspeech.py) — a
model-family addition over the reference (AR-only synthesis,
src/network.py:229-276)."""

import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu import nn
from unast_tpu.models import fastspeech as F
from unast_tpu.models.config import TINY


def test_length_regulate_hand_example():
    x = jnp.arange(1, 4, dtype=jnp.float32)[None, :, None]  # tokens 1,2,3
    dur = jnp.array([[2, 0, 3]], jnp.int32)
    frames, out_lens = F.length_regulate(
        jnp.broadcast_to(x, (1, 3, 1)), dur, max_len=8)
    assert int(out_lens[0]) == 5
    np.testing.assert_array_equal(
        np.asarray(frames[0, :, 0]), [1, 1, 3, 3, 3, 0, 0, 0])


def test_length_regulate_clips_to_max_len():
    x = jnp.ones((1, 2, 4), jnp.float32)
    dur = jnp.array([[5, 5]], jnp.int32)
    frames, out_lens = F.length_regulate(x, dur, max_len=6)
    assert int(out_lens[0]) == 6
    assert np.isfinite(np.asarray(frames)).all()


def test_durations_from_attention_counts_argmax_frames():
    # 1 layer, 1 head, 6 mel frames, 3 text tokens; frames 0-1 attend
    # token 0, frames 2-4 token 1, frame 5 token 2 — but mel_len=5 and
    # text_len=2, so token 2's column is masked and the last frame ignored.
    b, tm, tt = 1, 6, 3
    a = np.zeros((1, b, 1, tm, tt), np.float32)
    for m, t in enumerate([0, 0, 1, 1, 1, 2]):
        a[0, 0, 0, m, t] = 1.0
    dur = F.durations_from_attention(
        jnp.asarray(a), jnp.array([5]), jnp.array([2]))
    np.testing.assert_array_equal(np.asarray(dur[0]), [2, 3, 0])
    assert int(jnp.sum(dur[0])) == 5  # sums to mel_len


def test_forward_shapes_and_teacher_duration_alignment():
    cfg = TINY
    p, s = F.fastspeech_init(jax.random.PRNGKey(0), cfg)
    b, tt, tm = 2, 6, 24
    text = jnp.array([[5, 6, 7, 8, 0, 0], [5, 9, 10, 0, 0, 0]], jnp.int32)
    text_len = jnp.array([4, 3])
    dur = jnp.array([[3, 5, 6, 6, 0, 0], [8, 8, 8, 0, 0, 0]], jnp.int32)
    (pre, post, out_lens, logd), s2 = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, durations=dur,
        max_len=tm)
    assert pre.shape == (b, tm, cfg.num_mels)
    assert post.shape == (b, tm, cfg.num_mels)
    assert logd.shape == (b, tt)
    np.testing.assert_array_equal(np.asarray(out_lens), [20, 24])
    # frames beyond out_lens are exactly zero
    assert np.all(np.asarray(post[0, 20:]) == 0.0)
    assert np.isfinite(np.asarray(post)).all()
    # PAD-token log-durations are exactly zero
    assert np.all(np.asarray(logd[1, 3:]) == 0.0)


def test_infer_uses_predicted_durations_and_is_deterministic():
    cfg = TINY
    p, s = F.fastspeech_init(jax.random.PRNGKey(0), cfg)
    text = jnp.array([[5, 6, 7, 0]], jnp.int32)
    text_len = jnp.array([3])
    (_, post1, lens1, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, max_len=16)
    (_, post2, lens2, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, max_len=16)
    np.testing.assert_array_equal(np.asarray(post1), np.asarray(post2))
    np.testing.assert_array_equal(np.asarray(lens1), np.asarray(lens2))


def test_distill_step_trains():
    """One jitted distillation step against an (untrained) AR teacher:
    finite losses, params move, BN state threads."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step
    from unast_tpu.train.steps import init_train_state

    args, cfg = g._tiny_cfg_args()
    # the reference's transformer schedule has lr(0)=0 (warmup quirk) —
    # use the flat multistep schedule so step 1 actually moves params
    args.sched_type, args.lr = "multistep", 1e-3
    teacher = init_train_state(jax.random.PRNGKey(0), cfg, args)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    ds = SyntheticSpeechDataset(size=4, seed=0)
    it = BatchIterator(ds, 2, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len")}
    step = jax.jit(make_distill_step(cfg, cfg, args))
    fs2, m = step(fs, teacher.params, teacher.net_state,
                  jax.random.PRNGKey(2), batch)
    assert all(np.isfinite(float(v)) for v in m.values()), m
    w0 = np.asarray(jax.tree_util.tree_leaves(fs.params)[0])
    w1 = np.asarray(jax.tree_util.tree_leaves(fs2.params)[0])
    assert not np.allclose(w0, w1)
    # a second step from the new state also runs (donation-safe shapes)
    fs3, m2 = step(fs2, teacher.params, teacher.net_state,
                   jax.random.PRNGKey(3), batch)
    assert all(np.isfinite(float(v)) for v in m2.values()), m2


def test_distill_learns_on_tiny_corpus():
    """~60 CPU distillation steps on 2 fixed utterances: every loss term
    must drop substantially (the in-graph teacher-alignment -> regulator
    -> decoder pipeline is trainable end-to-end)."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step
    from unast_tpu.train.steps import init_train_state

    args, cfg = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 2e-3
    teacher = init_train_state(jax.random.PRNGKey(0), cfg, args)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    ds = SyntheticSpeechDataset(size=2, seed=0)
    it = BatchIterator(ds, 2, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len")}
    step = jax.jit(make_distill_step(cfg, cfg, args), donate_argnums=(0,))
    first = last = None
    for i in range(60):
        fs, m = step(fs, teacher.params, teacher.net_state,
                     jax.random.PRNGKey(10 + i), batch)
        vals = {k: float(v) for k, v in m.items()}
        if first is None:
            first = vals
        last = vals
    for k in ("nar/pre", "nar/post"):
        assert last[k] < 0.7 * first[k], (k, first[k], last[k])
    # duration regression converges more slowly against a spiky untrained-
    # teacher target — require steady progress here; the full convergence
    # gate is scripts/nar_distill_check.py (trained teacher, real chip)
    assert last["nar/dur"] < 0.9 * first["nar/dur"], (first, last)


def test_synthesizer_nar_path():
    """Synthesizer(nar_pv=...) serves one-pass NAR TTS mels."""
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import unast as U

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    n_params, n_state = F.fastspeech_init(jax.random.PRNGKey(1), cfg)
    # push durations up so the untrained student emits some frames
    n_params["dur"]["fc"]["b"] = n_params["dur"]["fc"]["b"] + 2.0
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(cfg.max_mel_len,), max_batch=2,
                      nar_pv=(n_params, n_state))
    mels = syn.tts_mels(["hello", "cat"])
    assert len(mels) == 2
    for m in mels:
        assert m.ndim == 2 and m.shape[1] == cfg.num_mels
        assert m.shape[0] >= 1
        assert np.isfinite(m).all()


def test_speed_control_scales_durations():
    """speed > 1 shortens the regulated output proportionally."""
    cfg = TINY
    p, s = F.fastspeech_init(jax.random.PRNGKey(0), cfg)
    p["dur"]["fc"]["b"] = p["dur"]["fc"]["b"] + 2.0  # ~6 frames/token
    text = jnp.array([[5, 6, 7, 8]], jnp.int32)
    text_len = jnp.array([4])
    (_, _, lens1, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, max_len=64)
    (_, _, lens2, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, max_len=64, speed=2.0)
    n1, n2 = int(lens1[0]), int(lens2[0])
    assert n1 > 0 and 0 < n2 < n1
    assert abs(n2 - n1 / 2) <= 4  # per-token rounding slack


def test_token_log_f0_in_graph_matches_numpy():
    from unast_tpu.audio.pitch import token_log_f0
    f0 = np.array([[220., 220., 0., 110., 110., 0., 0., 330.]], np.float32)
    dur = np.array([[2, 3, 3]], np.int32)
    tv = np.ones((1, 3), np.float32)
    got = np.asarray(F.token_log_f0_in_graph(
        jnp.asarray(f0), jnp.asarray(dur), jnp.asarray(tv)))[0]
    want = token_log_f0(f0[0], dur[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pitch_adaptor_forward_and_shift():
    """nar_pitch: params exist, forward runs, and pitch_target
    conditioning actually changes the output mels."""
    cfg = TINY.replace(nar_pitch=True)
    p, s = F.fastspeech_init(jax.random.PRNGKey(0), cfg)
    assert "pitch" in p and "pitch_proj" in p
    text = jnp.array([[5, 6, 7, 0]], jnp.int32)
    text_len = jnp.array([3])
    dur = jnp.array([[4, 4, 4, 0]], jnp.int32)
    t1 = jnp.log(220.0) * jnp.ones((1, 4)) * (jnp.arange(4) < 3)
    t2 = jnp.log(330.0) * jnp.ones((1, 4)) * (jnp.arange(4) < 3)
    (_, post1, _, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, durations=dur,
        max_len=16, pitch_target=t1)
    (_, post2, _, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, durations=dur,
        max_len=16, pitch_target=t2)
    assert not np.allclose(np.asarray(post1), np.asarray(post2))
    # free-running with a shift also runs (predicted pitch path)
    (_, post3, _, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, max_len=16,
        pitch_shift=1.5)
    assert np.isfinite(np.asarray(post3)).all()


def test_distill_step_with_pitch_trains():
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step
    from unast_tpu.train.steps import init_train_state
    from unast_tpu.train.config import model_config_from_args

    args, _ = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 2e-3
    args.nar_pitch = True
    cfg = model_config_from_args(args)
    assert cfg.nar_pitch
    teacher = init_train_state(jax.random.PRNGKey(0), cfg, args)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    ds = SyntheticSpeechDataset(size=2, seed=0, include_f0=True)
    it = BatchIterator(ds, 2, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    assert "f0" in raw
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len", "f0")}
    step = jax.jit(make_distill_step(cfg, cfg, args), donate_argnums=(0,))
    first = last = None
    for i in range(40):
        fs, m = step(fs, teacher.params, teacher.net_state,
                     jax.random.PRNGKey(10 + i), batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        if first is None:
            first = vals
        last = vals
    assert "nar/pitch" in last
    assert last["nar/pitch"] < 0.9 * first["nar/pitch"], (first, last)


def test_mel_f0_template_reads_gold_pitch():
    """The mel-domain template F0 readout agrees with the wav-domain
    autocorrelation on gold data (median relative error < 10%)."""
    from unast_tpu.audio.pitch import mel_f0_template
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    ds = SyntheticSpeechDataset(size=2, seed=0, include_f0=True)
    for i in range(2):
        it = ds[i]
        got = mel_f0_template(it["mel"])
        ref = it["f0"][: len(got)]
        both = (ref > 0) & (got > 0)
        assert both.sum() > 10
        err = np.abs(got[both] - ref[both]) / ref[both]
        assert np.median(err) < 0.10, float(np.median(err))


def test_energy_adaptor_forward_and_training():
    """nar_energy: targets from the gold mel, conditioning changes the
    output, and one distill step trains with a finite energy loss."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.config import model_config_from_args
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step
    from unast_tpu.train.steps import init_train_state

    cfg = TINY.replace(nar_energy=True)
    p, s = F.fastspeech_init(jax.random.PRNGKey(0), cfg)
    assert "energy" in p and "energy_proj" in p
    text = jnp.array([[5, 6, 7, 0]], jnp.int32)
    text_len = jnp.array([3])
    dur = jnp.array([[4, 4, 4, 0]], jnp.int32)
    e1 = 0.2 * jnp.ones((1, 4)) * (jnp.arange(4) < 3)
    e2 = 0.5 * jnp.ones((1, 4)) * (jnp.arange(4) < 3)
    (_, o1, _, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, durations=dur,
        max_len=16, energy_target=e1)
    (_, o2, _, _), _ = F.fastspeech_forward(
        p, s, nn.Ctx.eval(), cfg, text, text_len, durations=dur,
        max_len=16, energy_target=e2)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))

    # in-graph targets match a hand reduction
    mel = jnp.asarray(np.random.default_rng(0).random((1, 12, cfg.num_mels),
                                                      ).astype(np.float32))
    tgt = np.asarray(F.token_energy_in_graph(
        mel, jnp.array([[5, 7, 0, 0]]), jnp.asarray([[1., 1., 0., 0.]])))
    want0 = float(np.mean(np.asarray(mel)[0, :5]))
    want1 = float(np.mean(np.asarray(mel)[0, 5:12]))
    np.testing.assert_allclose(tgt[0, :2], [want0, want1], rtol=1e-5)

    args, _ = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 1e-3
    args.nar_energy = True
    cfg2 = model_config_from_args(args)
    teacher = init_train_state(jax.random.PRNGKey(0), cfg2, args)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg2, args)
    ds = SyntheticSpeechDataset(size=2, seed=0, gain_jitter=0.5)
    it = BatchIterator(ds, 2, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len")}
    step = jax.jit(make_distill_step(cfg2, cfg2, args))
    fs2, m = step(fs, teacher.params, teacher.net_state,
                  jax.random.PRNGKey(2), batch)
    assert "nar/energy" in m
    assert all(np.isfinite(float(v)) for v in m.values()), m


def test_pitch_and_energy_adaptors_compose():
    """Both variance adaptors on together: params present, one distill
    step runs with both losses finite."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.config import model_config_from_args
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step
    from unast_tpu.train.steps import init_train_state

    args, _ = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 1e-3
    args.nar_pitch = True
    args.nar_energy = True
    cfg = model_config_from_args(args)
    teacher = init_train_state(jax.random.PRNGKey(0), cfg, args)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    for k in ("pitch", "pitch_proj", "energy", "energy_proj"):
        assert k in fs.params, k
    ds = SyntheticSpeechDataset(size=2, seed=0, include_f0=True,
                                pitch_jitter=0.2, gain_jitter=0.3,
                                jitter_variants=2)
    it = BatchIterator(ds, 2, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len", "f0")}
    step = jax.jit(make_distill_step(cfg, cfg, args))
    fs2, m = step(fs, teacher.params, teacher.net_state,
                  jax.random.PRNGKey(2), batch)
    assert "nar/pitch" in m and "nar/energy" in m
    assert all(np.isfinite(float(v)) for v in m.values()), m


def test_soft_durations_sum_and_positivity():
    """soft=True durations sum exactly to mel_len per row and spread mass
    over attended tokens (no argmax zero-collapse)."""
    b, tm, tt = 2, 10, 4
    rng = np.random.default_rng(0)
    a = rng.random((1, b, 1, tm, tt)).astype(np.float32)
    mel_len = jnp.array([10, 7])
    text_len = jnp.array([4, 3])
    hard = F.durations_from_attention(jnp.asarray(a), mel_len, text_len)
    soft = F.durations_from_attention(jnp.asarray(a), mel_len, text_len,
                                      soft=True)
    np.testing.assert_array_equal(np.asarray(jnp.sum(hard, 1)), [10, 7])
    np.testing.assert_array_equal(np.asarray(jnp.sum(soft, 1)), [10, 7])
    # near-uniform random attention: soft spreads over ALL valid tokens
    assert np.all(np.asarray(soft)[0, :4] > 0)
    assert np.all(np.asarray(soft)[1, :3] > 0)
    assert np.all(np.asarray(soft)[1, 3:] == 0)  # PAD token gets none


def _mas_oracle(a, mel_len, text_len):
    """Brute-force Viterbi oracle for one utterance: a [Tm, Tt] probs."""
    la = np.log(np.clip(a, 1e-9, 1.0))
    neg = -1e9
    q = np.full((mel_len, text_len), neg)
    back = np.zeros((mel_len, text_len), np.int64)
    q[0, 0] = la[0, 0]
    for t in range(1, mel_len):
        for j in range(text_len):
            stay = q[t - 1, j]
            adv = q[t - 1, j - 1] if j > 0 else neg
            if adv > stay:
                q[t, j], back[t, j] = adv + la[t, j], 1
            else:
                q[t, j], back[t, j] = stay + la[t, j], 0
    dur = np.zeros(a.shape[1], np.int64)
    j = text_len - 1
    for t in range(mel_len - 1, 0, -1):
        dur[j] += 1
        j -= back[t, j]
    assert j == 0
    dur[0] += 1
    return dur, q[mel_len - 1, text_len - 1]


def test_mas_durations_match_bruteforce_viterbi():
    """mas_durations equals a per-utterance numpy Viterbi oracle on random
    attention, across ragged mel/text lengths."""
    b, tm, tt = 3, 12, 5
    rng = np.random.default_rng(7)
    a = rng.random((2, b, 2, tm, tt)).astype(np.float32)
    a /= a.sum(-1, keepdims=True)
    mel_len = np.array([12, 9, 5])
    text_len = np.array([5, 3, 2])
    got = np.asarray(F.mas_durations(jnp.asarray(a), jnp.asarray(mel_len),
                                     jnp.asarray(text_len)))
    mean_a = a.astype(np.float64).mean(axis=(0, 2))
    for i in range(b):
        want, _ = _mas_oracle(mean_a[i], int(mel_len[i]), int(text_len[i]))
        np.testing.assert_array_equal(got[i], want, err_msg=f"row {i}")


def test_mas_durations_every_token_covered():
    """The forced-alignment property the argmax source lacks: every valid
    token gets >= 1 frame and rows sum exactly to mel_len — even on
    adversarially token-skipping attention."""
    b, tm, tt = 1, 8, 4
    a = np.zeros((1, b, 1, tm, tt), np.float32)
    a[..., 0] = 1.0  # every frame argmaxes token 0: argmax would emit [8,0,0,0]
    mel_len, text_len = jnp.array([8]), jnp.array([4])
    dur = np.asarray(F.mas_durations(jnp.asarray(a), mel_len, text_len))[0]
    assert dur.sum() == 8
    assert np.all(dur[:4] >= 1), dur
    hard = np.asarray(F.durations_from_attention(
        jnp.asarray(a), mel_len, text_len))[0]
    assert hard[0] == 8 and np.all(hard[1:] == 0)  # the failure MAS fixes


def test_mas_durations_clean_diagonal_recovered():
    """On clean monotonic attention MAS reproduces the true durations."""
    spans = [3, 2, 4, 1]
    tm, tt = sum(spans), 4
    a = np.zeros((1, 1, 1, tm, tt), np.float32)
    t0 = 0
    for j, d in enumerate(spans):
        a[0, 0, 0, t0:t0 + d, j] = 1.0
        t0 += d
    dur = np.asarray(F.mas_durations(
        jnp.asarray(a), jnp.array([tm]), jnp.array([tt])))[0]
    np.testing.assert_array_equal(dur, spans)


def test_distill_step_mas_source_trains():
    """make_distill_step with --nar_dur_source mas runs jitted and the
    duration targets it regresses cover every token."""
    import __graft_entry__ as g
    from unast_tpu.models import unast as U
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step

    args, cfg = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 1e-3
    args.nar_dur_source = "mas"
    t_params, t_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    step = jax.jit(make_distill_step(cfg, cfg, args), donate_argnums=(0,))
    b, tt, tm = 2, 8, 24
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(5, 40, (b, tt)), jnp.int32),
        "text_len": jnp.array([8, 6]),
        "mel": jnp.asarray(rng.random((b, tm, cfg.num_mels)), jnp.float32),
        "mel_len": jnp.array([24, 17]),
    }
    last = None
    for i in range(3):
        fs, m = step(fs, t_params, t_state, jax.random.PRNGKey(i), batch)
        assert np.isfinite(float(m["nar/pre"])), m
        last = float(m["nar/dur"])
    assert np.isfinite(last)


def test_distill_step_ctc_source_trains():
    """make_distill_step with --nar_dur_source ctc (teacher equipped with
    the hybrid CTC head) runs jitted for both blank-split settings; the
    forced-alignment durations it regresses sum to mel_len per row."""
    import dataclasses
    import __graft_entry__ as g
    from unast_tpu.models import unast as U
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step

    args, cfg = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 1e-3
    args.nar_dur_source = "ctc"
    cfg = dataclasses.replace(cfg, ctc_weight=0.5)
    t_params, t_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    b, tt, tm = 2, 8, 24
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(5, 40, (b, tt)), jnp.int32),
        "text_len": jnp.array([8, 6]),
        "mel": jnp.asarray(rng.random((b, tm, cfg.num_mels)), jnp.float32),
        "mel_len": jnp.array([24, 17]),
    }
    for blank_split in (1, 0):
        args.nar_ctc_blank_split = blank_split
        fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
        step = jax.jit(make_distill_step(cfg, cfg, args),
                       donate_argnums=(0,))
        for i in range(2):
            fs, m = step(fs, t_params, t_state, jax.random.PRNGKey(i),
                         batch)
            assert np.isfinite(float(m["nar/pre"])), m
            assert np.isfinite(float(m["nar/dur"])), m


def test_nar_pickle_format_stamp(tmp_path):
    """ADVICE r4: NAR serving pickles carry a format stamp — stale
    formats (pre round-4 PE-scaling fix) fail loudly, unversioned tuples
    load with a warning, current-format round-trips exactly."""
    import pickle
    import warnings

    import pytest

    from unast_tpu.models.fastspeech import (NAR_PICKLE_FORMAT,
                                             load_nar_pickle,
                                             save_nar_pickle)
    p = {"w": np.arange(4, dtype=np.float32)}
    s = {"bn": np.zeros(2, np.float32)}
    f = str(tmp_path / "nar.pkl")
    save_nar_pickle(f, p, s)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # current format: NO warning
        lp, ls = load_nar_pickle(f)
    np.testing.assert_array_equal(lp["w"], p["w"])
    np.testing.assert_array_equal(ls["bn"], s["bn"])

    with open(f, "wb") as fh:
        pickle.dump({"nar_format": NAR_PICKLE_FORMAT - 1, "pv": (p, s)}, fh)
    with pytest.raises(ValueError, match="format"):
        load_nar_pickle(f)

    with open(f, "wb") as fh:
        pickle.dump((p, s), fh)
    with pytest.warns(UserWarning, match="unversioned"):
        lp, ls = load_nar_pickle(f)
    np.testing.assert_array_equal(lp["w"], p["w"])


def test_distill_step_with_batch_durations():
    """Precomputed frame durations riding in with the batch ('durs' key —
    the trim-offset-corrected oracle sidecar path on --realism corpora,
    scripts/fix_noisy_oracle.py) are used verbatim: step runs, losses
    finite, and the duration-predictor target follows the provided durs
    (different durs -> different nar/dur loss)."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step
    from unast_tpu.train.steps import init_train_state

    args, cfg = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 1e-3
    teacher = init_train_state(jax.random.PRNGKey(0), cfg, args)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    ds = SyntheticSpeechDataset(size=4, seed=0)
    it = BatchIterator(ds, 2, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    base = {k: jnp.asarray(raw[k])
            for k in ("text", "text_len", "mel", "mel_len")}

    def uniform_durs(shift0):
        tl = np.asarray(raw["text_len"])
        ml = np.asarray(raw["mel_len"])
        tt = raw["text"].shape[1]
        durs = np.zeros((len(tl), tt), np.int32)
        for i in range(len(tl)):
            bounds = np.round(np.arange(tt + 1) * ml[i]
                              / max(1, tl[i])).astype(np.int64)
            d = np.diff(bounds).astype(np.int32)
            d[tl[i]:] = 0
            d[0] += shift0  # emulate a kept-prefix offset
            if tl[i] > 1:
                d[1] = max(0, d[1] - shift0)
            durs[i] = d
        return durs

    step = jax.jit(make_distill_step(cfg, cfg, args))
    m_by_shift = []
    for shift in (0, 3):
        batch = dict(base, durs=jnp.asarray(uniform_durs(shift)))
        fs2, m = step(fs, teacher.params, teacher.net_state,
                      jax.random.PRNGKey(2), batch)
        assert all(np.isfinite(float(v)) for v in m.values()), m
        m_by_shift.append(float(m["nar/dur"]))
    assert m_by_shift[0] != m_by_shift[1], m_by_shift
