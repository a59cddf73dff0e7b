"""ZeRO-1 / FSDP state sharding (parallel/mesh.py, zero=).

Sharding the optimizer moments (zero=1) or moments+params (zero=3) over
the 'dp' axis is a GSPMD layout choice — the train step's numerics must be
IDENTICAL to the fully-replicated step, and the targeted leaves must
actually come back dp-sharded (that's the HBM saving being claimed).

The reference is single-device (SURVEY.md §2.3); this is an additive
TPU-native scaling lever.
"""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from unast_tpu.data.batching import BatchGetter
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.parallel import (batch_shardings, make_mesh,
                                shard_train_step)
from unast_tpu.parallel.mesh import train_state_shardings
from unast_tpu.train.steps import init_train_state, make_train_step


def _setup():
    args, cfg = g._tiny_cfg_args()
    args.train_batch_size = 8
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=8, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=True))
    return args, cfg, ts, batches


def _spec_of(sharding):
    return tuple(sharding.spec)


def test_zero_shardings_target_the_right_leaves():
    """zero=1 dp-shards moments but NOT params; zero=3 shards both; BN
    state and step scalar stay replicated in every mode."""
    args, cfg, ts, _ = _setup()
    mesh = make_mesh(8)

    def flat(tree):
        return jax.tree_util.tree_leaves(tree)

    for zero in (1, 3):
        sh = train_state_shardings(mesh, ts, zero=zero)
        # Adam moments: every >=2-D dp-divisible leaf sharded over 'dp'
        # (1-D column biases are already fully tp-sharded — no free dim).
        mom = [s for s, l in zip(flat(sh.gen_opt), flat(ts.gen_opt))
               if hasattr(l, "ndim") and l.ndim >= 2
               and any(d % 8 == 0 and d >= 8 for d in l.shape)]
        assert mom, "no moment leaves found"
        assert all(any("dp" in (ax if isinstance(ax, tuple) else (ax,))
                       for ax in _spec_of(s) if ax is not None)
                   for s in mom), f"zero={zero}: moments not dp-sharded"
        # Params: sharded only at zero=3.
        p_w = sh.params["text_m"]["prenet"]["embed"]["w"]
        has_dp = any(ax == "dp" for ax in _spec_of(p_w) if ax is not None)
        assert has_dp == (zero == 3), (zero, _spec_of(p_w))
        # Step scalar + BN state replicated.
        assert _spec_of(sh.step) == ()
        for s in flat(sh.net_state):
            assert all(ax is None for ax in _spec_of(s))


def test_zero3_step_matches_replicated():
    """One full 4-objective + discriminator train step under FSDP
    (zero=3, dp=8) produces the same metrics and parameters as the
    unsharded single-device step."""
    args, cfg, ts, batches = _setup()
    step_fn = make_train_step(cfg, args)

    ref_ts, ref_m = jax.jit(step_fn)(ts, jax.random.PRNGKey(1), batches)
    ref = {k: float(v) for k, v in ref_m.items()}

    mesh = make_mesh(8)
    for zero in (1, 3):
        # fresh state per donating call: shard_train_step's device_put may
        # alias host buffers, and the donated step then deletes them
        ts_i = init_train_state(jax.random.PRNGKey(0), cfg, args)
        z_step, ts_sh = shard_train_step(step_fn, mesh, ts_i, batches,
                                         zero=zero)
        b_sh = jax.device_put(batches, batch_shardings(mesh, batches))
        z_ts, z_m = z_step(ts_sh, jax.random.PRNGKey(1), b_sh)
        for k, v in ref.items():
            np.testing.assert_allclose(float(z_m[k]), v, rtol=2e-4,
                                       atol=2e-4, err_msg=f"zero={zero}:{k}")
        w_ref = np.asarray(
            ref_ts.params["speech_m"]["postnet"]["mel_proj"]["w"])
        w_z = np.asarray(z_ts.params["speech_m"]["postnet"]["mel_proj"]["w"])
        np.testing.assert_allclose(w_z, w_ref, rtol=2e-5, atol=2e-5)


def test_zero_sharded_state_checkpoints(tmp_path):
    """save_ckp/load_ckp round-trips a dp-sharded (zero=3) TrainState:
    preemption-safe FSDP training needs sharded-array checkpointing."""
    import shutil

    from unast_tpu.train.checkpoint import load_ckp, save_ckp

    args, cfg, ts, batches = _setup()
    mesh = make_mesh(8)
    step_fn = make_train_step(cfg, args)
    z_step, ts_sh = shard_train_step(step_fn, mesh, ts, batches, zero=3)
    b_sh = jax.device_put(batches, batch_shardings(mesh, batches))
    z_ts, _ = z_step(ts_sh, jax.random.PRNGKey(1), b_sh)

    path = str(tmp_path / "zckpt")
    shutil.rmtree(path, ignore_errors=True)
    save_ckp(0, 1.0, z_ts, False, path)

    template = init_train_state(jax.random.PRNGKey(0), cfg, args)
    _, _, restored, _ = load_ckp(path + "/model_most_recent.ckpt", template)
    for a, b in zip(jax.tree_util.tree_leaves(z_ts.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(z_ts.gen_opt),
                    jax.tree_util.tree_leaves(restored.gen_opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
