"""Sharded coverage for the added model families (VERDICT r2 #6): the
FastSpeech distillation step, the MelGAN vocoder step, and the CTC train
step under dp/tp GSPMD meshes on the 8-virtual-device CPU backend must
produce the SAME metrics as their unsharded runs — sharding is a layout
choice, not a semantic one (same trace, same rng streams; GSPMD only
partitions the compiled ops)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from unast_tpu.parallel import make_mesh, train_state_shardings


def _flat_batch_shardings(mesh, batch):
    """Flat batches (dict of [B, ...] leaves): shard dim 0 over 'dp'."""
    def spec(leaf):
        if getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, P("dp"))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(spec, batch)


def _assert_metrics_equal(got, want):
    for k, v in want.items():
        np.testing.assert_allclose(float(got[k]), float(v), rtol=2e-4,
                                   atol=2e-4, err_msg=k)


def _fs_setup():
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.models import unast as U
    from unast_tpu.train.fastspeech import init_fs_state, make_distill_step

    args, cfg = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 1e-3
    t_params, t_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    fs = init_fs_state(jax.random.PRNGKey(1), cfg, args)
    ds = SyntheticSpeechDataset(size=4, seed=0)
    it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len")}
    return make_distill_step(cfg, cfg, args), fs, t_params, t_state, batch


def test_fastspeech_distill_step_sharded_dp_tp():
    step_fn, fs, t_params, t_state, batch = _fs_setup()
    rng = jax.random.PRNGKey(2)
    _, ref_m = jax.jit(step_fn)(fs, t_params, t_state, rng, batch)
    ref = {k: float(v) for k, v in ref_m.items()}

    mesh = make_mesh(2, 2)
    fs_sh = train_state_shardings(mesh, fs)
    tp_sh = train_state_shardings(mesh, t_params)
    tst_sh = train_state_shardings(mesh, t_state)
    b_sh = _flat_batch_shardings(mesh, batch)
    repl = NamedSharding(mesh, P())
    step = jax.jit(step_fn,
                   in_shardings=(fs_sh, tp_sh, tst_sh, repl, b_sh),
                   out_shardings=(fs_sh, repl))
    fs_p = jax.device_put(fs, fs_sh)
    _, got_m = step(fs_p, jax.device_put(t_params, tp_sh),
                    jax.device_put(t_state, tst_sh), rng,
                    jax.device_put(batch, b_sh))
    # the param tree embeds under the megatron rules: at least one leaf
    # actually tp-sharded (the docstring's claim, proven)
    q = fs_p.params["encoder"]["layers"][0]["attn"]["q"]["w"]
    assert any(ax == "tp" for ax in q.sharding.spec if ax is not None)
    _assert_metrics_equal(got_m, ref)


def test_melgan_vocoder_step_sharded_dp():
    from unast_tpu.train.melgan import init_voc_state, make_vocoder_step

    class A:
        lr = 5e-4
        melgan_base = 64

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.random((4, 16, 80)), jnp.float32)
    wav = jnp.asarray(rng.standard_normal((4, 16 * 275)) * 0.1, jnp.float32)
    vs = init_voc_state(jax.random.PRNGKey(0), A())
    step_fn = make_vocoder_step(A())
    _, ref_m = jax.jit(step_fn)(vs, mel, wav)
    ref = {k: float(v) for k, v in ref_m.items()}

    mesh = make_mesh(4, 1)
    vs_sh = train_state_shardings(mesh, vs)
    b_sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    step = jax.jit(step_fn, in_shardings=(vs_sh, b_sh, b_sh),
                   out_shardings=(vs_sh, repl))
    _, got_m = step(jax.device_put(vs, vs_sh), jax.device_put(mel, b_sh),
                    jax.device_put(wav, b_sh))
    _assert_metrics_equal(got_m, ref)


def test_ctc_train_step_sharded_dp_tp():
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.ctc import init_ctc_state, make_ctc_step

    args, cfg = g._tiny_cfg_args()
    args.sched_type, args.lr = "multistep", 1e-3
    ds = SyntheticSpeechDataset(size=4, seed=0)
    it = BatchIterator(ds, 4, args.data_text_len, args.data_mel_len, seed=3)
    raw = it.next_batch()
    batch = {k: jnp.asarray(raw[k])
             for k in ("text", "text_len", "mel", "mel_len")}
    ts = init_ctc_state(jax.random.PRNGKey(0), cfg, args)
    step_fn = make_ctc_step(cfg, args)
    rng = jax.random.PRNGKey(5)
    _, ref_m = jax.jit(step_fn)(ts, rng, batch)
    ref = {k: float(v) for k, v in ref_m.items()}

    mesh = make_mesh(2, 2)
    ts_sh = train_state_shardings(mesh, ts)
    b_sh = _flat_batch_shardings(mesh, batch)
    repl = NamedSharding(mesh, P())
    step = jax.jit(step_fn, in_shardings=(ts_sh, repl, b_sh),
                   out_shardings=(ts_sh, repl))
    _, got_m = step(jax.device_put(ts, ts_sh), rng,
                    jax.device_put(batch, b_sh))
    _assert_metrics_equal(got_m, ref)
