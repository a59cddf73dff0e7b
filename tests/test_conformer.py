"""Conformer speech-encoder family (models/conformer.py) — a model-family
addition over the reference (transformer/RNN only, src/module.py:270-336).
"""

import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu import nn
from unast_tpu.models import conformer as C
from unast_tpu.models import modules as M
from unast_tpu.models.config import TINY

CONF = TINY.replace(speech_encoder="conformer", conformer_kernel=7)
D, H, FFN, L, K = 32, 2, 64, 2, 7


def _enc(key=0):
    return C.conformer_encoder_init(jax.random.PRNGKey(key), D, H, FFN, L, K)


def _x(b=3, t=12, key=1):
    return jax.random.normal(jax.random.PRNGKey(key), (b, t, D), jnp.float32)


def test_forward_shape_and_determinism():
    p, s = _enc()
    x = _x()
    pad = ~M.lens_to_mask(jnp.array([12, 7, 3]), 12)
    y1, s1 = C.conformer_encoder(p, s, nn.Ctx.eval(), x, pad, H, 0.1, K)
    y2, _ = C.conformer_encoder(p, s, nn.Ctx.eval(), x, pad, H, 0.1, K)
    assert y1.shape == x.shape
    assert np.isfinite(np.asarray(y1)).all()
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # eval mode: BN running stats unchanged
    for a, b in zip(jax.tree_util.tree_leaves(s),
                    jax.tree_util.tree_leaves(s1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pad_invariance_eval():
    """Garbage in the padded tail must not change valid-position outputs
    (attention bias + pre-conv masking + per-position norms in eval)."""
    p, s = _enc()
    lens = jnp.array([8, 5, 12])
    pad = ~M.lens_to_mask(lens, 12)
    x = _x()
    x_dirty = x + 100.0 * pad[..., None].astype(x.dtype)
    y1, _ = C.conformer_encoder(p, s, nn.Ctx.eval(), x, pad, H, 0.1, K)
    y2, _ = C.conformer_encoder(p, s, nn.Ctx.eval(), x_dirty, pad, H, 0.1, K)
    valid = np.asarray(~pad)[..., None]
    np.testing.assert_allclose(np.asarray(y1) * valid, np.asarray(y2) * valid,
                               rtol=1e-5, atol=1e-5)


def test_scan_layers_matches_unrolled():
    p, s = _enc()
    x = _x()
    pad = ~M.lens_to_mask(jnp.array([12, 9, 4]), 12)
    y_un, s_un = C.conformer_encoder(p, s, nn.Ctx.eval(), x, pad, H, 0.1, K,
                                     scan_layers=False)
    y_sc, s_sc = C.conformer_encoder(p, s, nn.Ctx.eval(), x, pad, H, 0.1, K,
                                     scan_layers=True)
    np.testing.assert_allclose(np.asarray(y_un), np.asarray(y_sc),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_un),
                    jax.tree_util.tree_leaves(s_sc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_remat_matches_plain_loss_and_grad():
    p, s = _enc()
    x = _x()
    pad = ~M.lens_to_mask(jnp.array([12, 9, 4]), 12)

    def loss(p, remat):
        y, _ = C.conformer_encoder(p, s, nn.Ctx.eval(), x, pad, H, 0.1, K,
                                   remat=remat)
        return jnp.sum(y ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(p)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(p)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_unast_tts_asr_forward_with_conformer():
    """Full UNAST task methods run with the conformer speech encoder:
    the shared-latent contract (SURVEY §2.2) is encoder-family agnostic."""
    from unast_tpu.models import unast as U

    params, state = U.unast_init(jax.random.PRNGKey(0), CONF)
    assert "encoder" in state["speech_m"], "conformer BN state missing"
    b, tt, tm = 2, 8, 16
    text = jnp.ones((b, tt), jnp.int32)
    text_len = jnp.array([tt, tt // 2])
    mel = jnp.zeros((b, tm, CONF.num_mels), jnp.float32)
    mel_len = jnp.array([tm, tm // 2])
    ctx = nn.Ctx.eval()
    (pre, post, stop, _), st = U.tts(params, state, ctx, CONF,
                                     text, text_len, mel, mel_len)
    assert post.shape == (b, tm, CONF.num_mels)
    logits, st = U.asr(params, st, ctx, CONF, text, text_len, mel, mel_len)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(post)).all()


def test_conformer_train_step():
    """One jitted supervised train step: BN state threads through the
    grad-accumulation scan and updates."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.config import model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step

    args, _ = g._tiny_cfg_args()
    args.speech_encoder = "conformer"
    args.conformer_kernel = 7
    args.ae_steps, args.cm_steps, args.sp_steps, args.d_steps = 0, 0, 1, 0
    args.use_discriminator = False
    args.train_batch_size = 2
    cfg = model_config_from_args(args)
    assert cfg.speech_encoder == "conformer"
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=4, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=False))
    step = jax.jit(make_train_step(cfg, args))
    ts2, metrics = step(ts, jax.random.PRNGKey(1), batches)
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    # BN running stats moved (train-mode batch statistics were used)
    m0 = ts.net_state["speech_m"]["encoder"]["layers"][0]["bn"]["mean"]
    m1 = ts2.net_state["speech_m"]["encoder"]["layers"][0]["bn"]["mean"]
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_conformer_tp_sharded_step():
    """The extended mesh rule (conv_pw1/conv_pw2 column/row splits) admits
    a tp-sharded conformer train step with finite metrics and the pointwise
    conv weights actually split over 'tp'."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.parallel import batch_shardings, make_mesh, shard_train_step
    from unast_tpu.train.config import model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step

    args, _ = g._tiny_cfg_args()
    args.speech_encoder = "conformer"
    args.conformer_kernel = 7
    args.ae_steps, args.cm_steps, args.sp_steps, args.d_steps = 0, 0, 1, 0
    args.use_discriminator = False
    args.train_batch_size = 4
    cfg = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=4, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=False))
    mesh = make_mesh(2, 2)  # dp2 x tp2
    step, ts_sh = shard_train_step(make_train_step(cfg, args), mesh, ts,
                                   batches)
    pw1 = ts_sh.params["speech_m"]["encoder"]["layers"][0]["conv_pw1"]["w"]
    assert "tp" in tuple(pw1.sharding.spec), pw1.sharding
    b_sh = jax.device_put(batches, batch_shardings(mesh, batches))
    _, metrics = step(ts_sh, jax.random.PRNGKey(1), b_sh)
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
