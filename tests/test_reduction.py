"""Decoder reduction-factor tests (ModelConfig.reduction_factor — the
speech transformer decoder emits r frames per autoregressive step;
Tacotron-lineage speed lever, r=1 = exact reference semantics which the
torch-parity goldens in test_models.py pin)."""

import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unast_tpu import nn
from unast_tpu.models import networks as N
from unast_tpu.models import unast as U
from unast_tpu.models.config import TINY


def _model(r, seed=0):
    cfg = TINY.replace(reduction_factor=r)
    p, s = N.speech_transformer_init(jax.random.PRNGKey(seed), cfg)
    return cfg, p, s


def _memory(cfg, b=2, ts=6, seed=1):
    memory = jax.random.normal(jax.random.PRNGKey(seed), (b, ts, cfg.e_in))
    return memory, jnp.zeros((b, ts), bool)


def test_reduction_head_shapes():
    cfg, p, _ = _model(3)
    assert p["postnet"]["mel_proj"]["w"].shape == (cfg.hidden,
                                                   3 * cfg.num_mels)
    assert p["postnet"]["stop_proj"]["w"].shape == (cfg.hidden, 3)


@pytest.mark.parametrize("r", [2, 4])
def test_reduction_decode_sequence_shapes_and_causality(r):
    """Outputs stay per-frame [B, T, ...]; perturbing gold frame j must not
    change PRE-net mel outputs of groups <= j//r (frame j only feeds the
    decoder when it is the last frame of its group, as input to group
    j//r + 1)."""
    cfg, p, s = _model(r)
    b, t = 2, 4 * r
    memory, mem_pad = _memory(cfg, b)
    tgt = jax.random.normal(jax.random.PRNGKey(2), (b, t, cfg.num_mels))
    lens = jnp.full((b,), t)

    (pre, post, stop, _), _ = N.speech_tr_decode_sequence(
        p, s, nn.Ctx.eval(), cfg, tgt, lens, memory, mem_pad)
    assert pre.shape == (b, t, cfg.num_mels)
    assert post.shape == (b, t, cfg.num_mels)
    assert stop.shape == (b, t)

    j = 2 * r - 1          # last frame of group 1 -> feeds groups >= 2
    bumped = tgt.at[:, j].add(10.0)
    (pre2, _, _, _), _ = N.speech_tr_decode_sequence(
        p, s, nn.Ctx.eval(), cfg, bumped, lens, memory, mem_pad)
    unaffected = (j // r + 1) * r
    np.testing.assert_allclose(np.asarray(pre[:, :unaffected]),
                               np.asarray(pre2[:, :unaffected]),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(pre[:, unaffected:]
                             - pre2[:, unaffected:])).max() > 1e-4


@pytest.mark.parametrize("r,max_len", [(2, 12), (2, 7), (4, 10)])
def test_reduction_infer_shapes_and_stop(r, max_len):
    """KV-cached greedy decode at r > 1: per-frame output shapes, stop
    length bookkeeping at FRAME granularity (a stop in mid-group cuts the
    length inside the group), non-divisible max_len handled by ceil."""
    cfg, p, s = _model(r)
    memory, mem_pad = _memory(cfg)

    # stop never fires -> full length
    p_never = jax.tree_util.tree_map(lambda x: x, p)
    p_never["postnet"]["stop_proj"] = {
        "w": p["postnet"]["stop_proj"]["w"],
        "b": p["postnet"]["stop_proj"]["b"] - 100.0}
    (pre, post, stops, stop_lens), _ = N.speech_tr_infer(
        p_never, s, nn.Ctx.eval(), cfg, memory, mem_pad, max_len=max_len)
    assert pre.shape == (2, max_len, cfg.num_mels)
    assert post.shape == (2, max_len, cfg.num_mels)
    assert stops.shape == (2, max_len)
    assert np.asarray(stop_lens).tolist() == [max_len, max_len]

    # stop fires on every frame -> length 1 (first frame of first group)
    p_always = jax.tree_util.tree_map(lambda x: x, p)
    p_always["postnet"]["stop_proj"] = {
        "w": p["postnet"]["stop_proj"]["w"],
        "b": p["postnet"]["stop_proj"]["b"] + 100.0}
    (_, _, _, stop_lens), _ = N.speech_tr_infer(
        p_always, s, nn.Ctx.eval(), cfg, memory, mem_pad, max_len=max_len)
    assert np.asarray(stop_lens).tolist() == [1, 1]


def test_reduction_infer_mid_group_stop():
    """Only the SECOND stop logit of each group fires -> stop_len = 2."""
    r = 3
    cfg, p, s = _model(r)
    memory, mem_pad = _memory(cfg)
    sp = {"w": jnp.zeros_like(p["postnet"]["stop_proj"]["w"]),
          "b": jnp.array([-100.0, 100.0, -100.0])}
    p2 = jax.tree_util.tree_map(lambda x: x, p)
    p2["postnet"]["stop_proj"] = sp
    (_, _, _, stop_lens), _ = N.speech_tr_infer(
        p2, s, nn.Ctx.eval(), cfg, memory, mem_pad, max_len=9)
    assert np.asarray(stop_lens).tolist() == [2, 2]


def test_reduction_full_train_step_runs():
    """All four objectives (incl. the in-graph back-translation decode)
    compile and produce finite metrics at r=2."""
    from unast_tpu.train.steps import init_train_state, make_train_step
    cfg = TINY.replace(reduction_factor=2)
    args = types.SimpleNamespace(
        ae_steps=1, cm_steps=1, sp_steps=1, d_steps=1,
        t_eos_weight=1.0, s_eos_weight=1.0, lr=1e-3,
        sched_type="constant", warmup_steps=0, optim_type="adam",
        weight_decay=0.0, grad_clip=0.0, ga_weight=0.3, ga_sigma=0.2,
        cm_infer_mel_len=8, cm_infer_text_len=6)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    b, tt, tm = 2, 12, 16
    text = jax.random.randint(jax.random.PRNGKey(1), (b, tt), 3, 40)
    mel = jax.random.normal(jax.random.PRNGKey(2), (b, tm, cfg.num_mels))
    tl = jnp.full((b,), tt)
    ml = jnp.full((b,), tm)
    one = (text[None], mel[None], tl[None], ml[None])
    batches = {"ae": one, "cm": one, "sp": one, "d": one}
    step = jax.jit(make_train_step(cfg, args))
    ts2, metrics = step(ts, jax.random.PRNGKey(3), batches)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_reduction_rnn_guard():
    with pytest.raises(AssertionError):
        N.speech_rnn_init(jax.random.PRNGKey(0),
                          TINY.replace(model_type="rnn", reduction_factor=2))


def test_reduction_synthesizer_serves():
    from unast_tpu.infer.serve import Synthesizer
    cfg = TINY.replace(max_mel_len=24, max_text_len=16, reduction_factor=2)
    params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
    syn = Synthesizer(params, state, cfg, text_buckets=(16,),
                      mel_buckets=(24,), max_batch=2)
    wavs = syn.tts(["hello world"])
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all()
