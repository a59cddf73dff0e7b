"""Training-layer tests: loss parity vs torch, augmentation invariants, the
jitted 4-objective train step, PER metric parity, and data plumbing."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from unast_tpu.models.config import ModelConfig, TINY
from unast_tpu.train import losses as L
from unast_tpu.train.augment import specaugment
from unast_tpu.train.steps import init_train_state, make_train_step
from unast_tpu.train.config import parse_with_config, model_config_from_args
from unast_tpu.infer.metrics import compute_per, edit_distance
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.data.batching import BatchGetter, BatchIterator


# ---------------------------------------------------------------------------
# Loss parity vs torch
# ---------------------------------------------------------------------------


def test_text_loss_matches_torch():
    torch.manual_seed(0)
    B, T, V = 3, 7, 46
    logits = torch.randn(B, T, V)
    gold = torch.randint(0, V, (B, T))
    gold[:, -2:] = 0  # PAD
    gold[0, 3] = 2    # EOS
    w = torch.ones(V)
    w[2] = 5.0
    ref = F.cross_entropy(logits.permute(0, 2, 1), gold, weight=w,
                          ignore_index=0)
    got = L.text_loss(jnp.asarray(gold.numpy()), jnp.asarray(logits.numpy()),
                      eos_weight=5.0)
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)


def test_stop_bce_matches_torch():
    torch.manual_seed(1)
    B, T = 4, 9
    logits = torch.randn(B, T)
    lens = torch.tensor([9, 5, 7, 3])
    label = F.one_hot(lens - 1, T).float()
    pw = torch.where(label.eq(1), torch.tensor(5.0), torch.ones(1))
    ref = F.binary_cross_entropy_with_logits(logits, label, pos_weight=pw)
    got = L.bce_with_logits(jnp.asarray(logits.numpy()),
                            jnp.asarray(label.numpy()),
                            pos_weight=jnp.where(
                                jnp.asarray(label.numpy()) == 1, 5.0, 1.0))
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)


def test_masked_mse_matches_torch():
    torch.manual_seed(2)
    B, T, M = 2, 6, 4
    gold = torch.randn(B, T, M)
    pred = torch.randn(B, T, M)
    lens = torch.tensor([6, 3])
    mask = (torch.arange(T)[None, :] < lens[:, None]).unsqueeze(-1).repeat(1, 1, M)
    diff2 = (gold.flatten() - pred.flatten()) ** 2 * mask.flatten()
    ref = diff2.sum() / mask.sum()
    from unast_tpu.models.modules import lens_to_mask
    got = L.masked_mse(jnp.asarray(gold.numpy()), jnp.asarray(pred.numpy()),
                       lens_to_mask(jnp.array([6, 3]), T)[..., None])
    np.testing.assert_allclose(float(got), ref.item(), rtol=1e-5)


def test_discriminator_target():
    t = L.discriminator_target(4, "text")
    s = L.discriminator_target(4, "speech")
    assert np.allclose(t, 0.9) and np.allclose(s, 0.1)


# ---------------------------------------------------------------------------
# Augmentation
# ---------------------------------------------------------------------------


def test_specaugment_masks_with_mean():
    rng = jax.random.PRNGKey(0)
    mel = jnp.ones((2, 50, 8)) * jnp.arange(1, 3)[:, None, None]
    mel_len = jnp.array([50, 30])
    out = specaugment(rng, mel, mel_len, freq_mask=10, time_mask=20)
    assert out.shape == mel.shape
    # masked positions hold the per-utterance mean; everything is finite
    assert np.isfinite(np.asarray(out)).all()
    changed = np.any(np.asarray(out) != np.asarray(mel), axis=(1, 2))
    means = np.asarray(jnp.mean(mel, axis=(1, 2)))
    for b in range(2):
        diff = np.asarray(out[b]) != np.asarray(mel[b])
        if diff.any():
            assert np.allclose(np.asarray(out[b])[diff], means[b])


# ---------------------------------------------------------------------------
# PER metric (jiwer-equivalent)
# ---------------------------------------------------------------------------


def test_edit_distance():
    assert edit_distance([1, 2, 3], [1, 2, 3]) == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance([], [1, 2]) == 2
    assert edit_distance([1, 2, 3, 4], [4, 3, 2, 1]) == 4
    assert edit_distance([1, 2, 3], [2, 3]) == 1


def test_compute_per():
    gt = np.array([[5, 6, 7, 0], [8, 9, 0, 0]])
    hyp = np.array([[5, 6, 7, 0], [8, 4, 0, 0]])
    per = compute_per(gt, hyp, np.array([3, 2]), np.array([3, 2]))
    assert per == pytest.approx(1 / 5)


# ---------------------------------------------------------------------------
# Data plumbing
# ---------------------------------------------------------------------------


class Args:
    seed = 0
    train_batch_size = 2
    data_text_len = 24
    data_mel_len = 32
    ae_steps = 2
    cm_steps = 1
    sp_steps = 1
    d_steps = 1


def test_synthetic_dataset_and_batching():
    ds = SyntheticSpeechDataset(size=8, seed=0)
    item = ds[0]
    assert item["ids"].dtype == np.int32 and item["ids"][-1] == 2  # EOS
    assert item["mel"].shape[1] == 80
    bg = BatchGetter(Args(), ds, ds, ds)
    batches = bg.step_batches(Args(), use_discriminator=True)
    assert batches["ae"][0].shape == (2, 2, 24)       # [n, B, Tt]
    assert batches["ae"][1].shape == (2, 2, 32, 80)   # [n, B, Tm, M]
    assert batches["d"][0].shape == (1, 2, 24)
    # lengths clamped to fixed shapes
    assert (batches["ae"][2] <= 24).all() and (batches["ae"][3] <= 32).all()


# ---------------------------------------------------------------------------
# Train step end-to-end (tiny, with discriminator)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("model_type", ["transformer", "rnn"])
def test_train_step_runs_and_updates(model_type):
    # multistep schedule: constant lr from step 0 (the reference's
    # 'transformer' schedule gives lr=0 on the very first step).
    argv = ["--config", "configs/transformer_test.json",
            "--model_type", model_type, "--sched_type", "multistep",
            "--lr", "0.001"]
    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    assert cfg.use_discriminator

    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=8, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = bg.step_batches(args, use_discriminator=True)
    batches = jax.tree_util.tree_map(jnp.asarray, batches)

    step = jax.jit(make_train_step(cfg, args))
    p0 = jax.tree_util.tree_leaves(ts.params)[0]
    ts2, metrics = step(ts, jax.random.PRNGKey(1), batches)
    assert int(ts2.step) == 1
    for k in ("ae/t_ae", "ae/s_ae", "cm/t_cm", "cm/s_cm", "sp/tts", "sp/asr",
              "ae/d_ae", "d/d", "grad_norm"):
        assert k in metrics, f"missing metric {k}"
        assert np.isfinite(float(metrics[k])), f"non-finite {k}"
    # params actually moved
    p1 = jax.tree_util.tree_leaves(ts2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # BN state updated
    s0 = jax.tree_util.tree_leaves(ts.net_state)
    s1 = jax.tree_util.tree_leaves(ts2.net_state)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(s0, s1))


def test_bucketed_batching():
    ds = SyntheticSpeechDataset(size=8, seed=0)
    it = BatchIterator(ds, batch_size=2, text_len=304, mel_len=816, seed=0,
                       text_buckets=[16, 32, 64, 304],
                       mel_buckets=[64, 128, 816])
    b = it.next_batch()
    assert b["text"].shape[1] in (16, 32, 64, 304)
    assert b["mel"].shape[1] in (64, 128, 816)
    assert (b["text_len"] <= b["text"].shape[1]).all()
    # stacked micro-batches share one (max) bucket
    s = it.next_stacked(3)
    assert s[0].shape[0] == 3 and s[1].shape[0] == 3
    assert s[0].shape[2] in (16, 32, 64, 304)


def test_ae_grads_bf16():
    """value_and_grad through the bf16 activation path (convs, BN, attention)
    produces finite f32 grads."""
    argv = ["--config", "configs/transformer_test.json",
            "--sched_type", "multistep", "--compute_dtype", "bfloat16"]
    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    assert cfg.dtype == jnp.bfloat16
    from unast_tpu.models import unast as U
    from unast_tpu.train.steps import ae_loss_fn
    params, net_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    ds = SyntheticSpeechDataset(size=4, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batch = jax.tree_util.tree_map(
        jnp.asarray, tuple(np.asarray(x[0]) for x in
                           bg.step_batches(args, False)["ae"]))

    def loss(p):
        l, _ = ae_loss_fn(p, net_state, jax.random.PRNGKey(1), batch,
                          cfg, args, 1.0)
        return l

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_schedules_match_torch_lambdalr():
    """The three LR schedules reproduce the reference lr_lambda curves
    (src/train.py:858-907 + MultiStepLR)."""
    import torch
    from unast_tpu.train.optim import (multistep_schedule,
                                       linear_warmup_decay_schedule,
                                       transformer_schedule)

    lr = 0.0625
    # transformer (inverse-sqrt with warmup^1.5 scaling)
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    lam = lambda step: (step / max(1.0, 2000.0 ** 1.5) if step < 2000
                        else 1.0 / max(1.0, float(step) ** 0.5))
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lam)
    mine = transformer_schedule(lr, 2000)
    for step in (0, 1, 100, 1999, 2000, 5000, 100000):
        sched.last_epoch = step - 1
        sched.step()
        np.testing.assert_allclose(float(mine(step)),
                                   opt.param_groups[0]["lr"], rtol=1e-6)

    # linear warmup->decay
    mine = linear_warmup_decay_schedule(lr, 100, 1000)
    assert float(mine(0)) == 0.0
    np.testing.assert_allclose(float(mine(50)), lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(mine(100)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(mine(550)), lr * 0.5, rtol=1e-6)
    assert float(mine(1000)) == 0.0

    # multistep
    mine = multistep_schedule(lr, [100, 200], 0.1)
    np.testing.assert_allclose(float(mine(0)), lr)
    np.testing.assert_allclose(float(mine(150)), lr * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(mine(250)), lr * 0.01, rtol=1e-6)


# ---------------------------------------------------------------------------
# Guided attention (capability add, VERDICT r1 #2)
# ---------------------------------------------------------------------------


def test_guided_attention_loss_prefers_diagonal():
    B, H, Tq, Tk = 2, 2, 8, 12
    q_len = jnp.array([8, 6])
    k_len = jnp.array([12, 9])
    # diagonal attention: q attends k = round(q * Kl / Ql)
    diag = np.zeros((B, H, Tq, Tk), np.float32)
    anti = np.zeros((B, H, Tq, Tk), np.float32)
    for b, (ql, kl) in enumerate([(8, 12), (6, 9)]):
        for q in range(ql):
            diag[b, :, q, int(q * kl / ql)] = 1.0
            anti[b, :, q, kl - 1 - int(q * kl / ql)] = 1.0
    l_diag = float(L.guided_attention_loss(jnp.asarray(diag), q_len, k_len))
    l_anti = float(L.guided_attention_loss(jnp.asarray(anti), q_len, k_len))
    assert l_diag < 0.02
    assert l_anti > 10 * max(l_diag, 1e-6)
    # stacked layer axis broadcasts
    stacked = jnp.stack([jnp.asarray(diag)] * 3)
    l_stacked = float(L.guided_attention_loss(stacked, q_len, k_len))
    np.testing.assert_allclose(l_stacked, l_diag, rtol=1e-6)


def test_train_step_with_guided_attention():
    """ga_weight>0 runs the full jitted step, reports a finite ga metric,
    and leaves the parity objective intact when 0."""
    argv = ["--config", "configs/transformer_test.json",
            "--ga_weight", "0.5", "--synthetic"]
    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=8, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(jnp.asarray, bg.step_batches(args, True))
    step = jax.jit(make_train_step(cfg, args))
    ts2, m = step(ts, jax.random.PRNGKey(1), batches)
    assert np.isfinite(float(m["sp/ga_sp"])) and float(m["sp/ga_sp"]) > 0
    assert np.isfinite(float(m["ae/ga_ae"]))
    assert np.isfinite(float(m["grad_norm"]))


def test_remat_step_matches_scan_layers():
    """--remat (jax.checkpoint around each transformer layer) must be a pure
    memory/compute trade: losses AND grad_norm equal the scan_layers step
    exactly — both derive per-layer dropout keys by folding the layer index
    from one base key (the unrolled no-remat path uses the sequential
    counter stream instead, a documented deviation shared with
    scan_layers)."""
    base = ["--train_batch_size", "2", "--data_mel_len", "16",
            "--data_text_len", "8", "--max_mel_len", "16",
            "--max_text_len", "8", "--ae_steps", "0", "--cm_steps", "0",
            "--sp_steps", "1", "--d_steps", "0",
            "--use_discriminator", "false", "--hidden", "16", "--e_in", "16",
            "--t_emb_dim", "16", "--s_pre_hid", "16", "--ffn_dim", "32",
            "--num_layers", "2", "--nhead", "2",
            "--compute_dtype", "float32"]
    res = {}
    for name, extra in (("remat", ["--remat", "true"]),
                        ("scan", ["--scan_layers", "true"])):
        args = parse_with_config(base + extra)
        cfg = model_config_from_args(args)
        ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
        ds = SyntheticSpeechDataset(size=4, seed=0)
        bg = BatchGetter(args, ds, ds, ds)
        batches = {"sp": jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(args, False))["sp"]}
        step = jax.jit(make_train_step(cfg, args))
        _, m = step(ts, jax.random.PRNGKey(1), batches)
        res[name] = {k: float(v) for k, v in m.items()}
    for k, v in res["remat"].items():
        np.testing.assert_allclose(v, res["scan"][k], rtol=1e-5, err_msg=k)


def test_adafactor_trains_and_state_is_factored():
    """--optim_type adafactor: the supervised step runs, the loss drops
    over ~30 steps, and the optimizer state carries NO full-tree Adam
    moments (second moments are factored row/col vectors — the memory
    point of the option)."""
    argv = ["--config", "configs/transformer_test.json",
            "--sched_type", "multistep", "--lr", "0.003",
            "--optim_type", "adafactor", "--use_discriminator", "false",
            "--ae_steps", "0", "--cm_steps", "0", "--sp_steps", "1",
            "--d_steps", "0"]
    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)

    def nbytes(tree):
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(tree)
                   if hasattr(x, "size"))

    # memory claim at a width where factoring engages (optax factors
    # dims >= 128): same config at d=256 vs its AdamW state
    wide = parse_with_config(argv + ["--hidden", "256", "--e_in", "256",
                                     "--t_emb_dim", "256", "--s_pre_hid",
                                     "256", "--ffn_dim", "256"])
    wcfg = model_config_from_args(wide)
    ts_f = init_train_state(jax.random.PRNGKey(0), wcfg, wide)
    wide_adam = parse_with_config(argv[:7] + ["adamw"] + argv[8:] + [
        "--hidden", "256", "--e_in", "256", "--t_emb_dim", "256",
        "--s_pre_hid", "256", "--ffn_dim", "256"])
    ts_a = init_train_state(jax.random.PRNGKey(0),
                            model_config_from_args(wide_adam), wide_adam)
    f_bytes = nbytes(ts_f.gen_opt) + nbytes(ts_f.disc_opt)
    a_bytes = nbytes(ts_a.gen_opt) + nbytes(ts_a.disc_opt)
    assert f_bytes < 0.6 * a_bytes, (f_bytes, a_bytes)

    ds = SyntheticSpeechDataset(size=4, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=False))
    step = jax.jit(make_train_step(cfg, args))
    first = last = None
    for i in range(30):
        ts, m = step(ts, jax.random.PRNGKey(1 + i), batches)
        v = float(m["sp/asr"])
        assert np.isfinite(v)
        if first is None:
            first = v
        last = v
    assert last < first, (first, last)


@pytest.mark.parametrize("td", ["ctc", "spec"])
def test_cm_text_decode_levers(td):
    """--cm_text_decode {ctc,spec}: the back-translation pseudo-text from
    the jointly-trained CTC head (one-pass draft / drafted speculative
    decode) — the step must run, produce finite metrics, and update
    params (VERDICT r3 item 5 decode lever)."""
    argv = ["--config", "configs/transformer_test.json",
            "--sched_type", "multistep", "--lr", "0.001",
            "--ctc_weight", "0.5", "--cm_text_decode", td]
    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=8, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=True))
    step = jax.jit(make_train_step(cfg, args))
    p0 = jax.tree_util.tree_leaves(ts.params)[0]
    ts2, metrics = step(ts, jax.random.PRNGKey(1), batches)
    for k in ("cm/t_cm", "cm/s_cm", "grad_norm"):
        assert np.isfinite(float(metrics[k])), (td, k)
    assert not np.allclose(np.asarray(p0),
                           np.asarray(jax.tree_util.tree_leaves(ts2.params)[0]))


def test_cm_spec_decode_equals_eval_greedy():
    """'spec' inside cm must reproduce the eval-mode AR greedy transcript
    exactly (the documented deviation is eval-Ctx determinism, not a
    different decode)."""
    from unast_tpu.models import ctc as CT
    from unast_tpu.models import networks as N
    from unast_tpu.models import unast as U
    from unast_tpu import nn

    argv = ["--config", "configs/transformer_test.json",
            "--ctc_weight", "0.5"]
    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    params, state = U.unast_init(jax.random.PRNGKey(3), cfg)
    ds = SyntheticSpeechDataset(size=4, seed=0)
    from unast_tpu.data.batching import BatchIterator
    b = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len,
                      seed=5).next_batch()
    mel = jnp.asarray(b["mel"])
    mel_len = jnp.asarray(b["mel_len"])
    ectx = nn.Ctx.eval()
    (s_enc, s_mask), _ = N.speech_encode(
        params["speech_m"], state["speech_m"], ectx, cfg, mel, mel_len)
    (ar_ids, ar_lens), _ = N.text_infer(
        params["text_m"], state["text_m"], ectx, cfg, s_enc, s_mask)
    logits = nn.linear(params["speech_m"]["ctc_head"],
                       s_enc).astype(jnp.float32)
    draft, _ = CT.ctc_greedy_decode(logits, s_mask, cfg.max_text_len)
    sp_ids, sp_lens, _ = N.text_tr_spec_infer(
        params["text_m"], ectx, cfg, s_enc, s_mask, draft)
    np.testing.assert_array_equal(np.asarray(ar_ids), np.asarray(sp_ids))
    np.testing.assert_array_equal(np.asarray(ar_lens), np.asarray(sp_lens))
