"""Mixture-of-Experts FFN tests (models/moe.py) — routing math, capacity
semantics, aux-loss values, path equivalences, and the expert-parallel ('ep')
sharded train step. Pure TPU-native capability add; the reference is dense
(SURVEY.md §2.3), so there is no torch golden — invariants are proven
against the dense FFN and against closed-form aux values instead."""

import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unast_tpu import nn
from unast_tpu.models import moe as MoE
from unast_tpu.models import transformer as T
from unast_tpu.models.config import TINY
from unast_tpu.train.steps import init_train_state, make_train_step, \
    ae_loss_fn


def _eval_ctx():
    return nn.Ctx(rng=None, train=False)


def _args(**kw):
    base = dict(ae_steps=1, cm_steps=0, sp_steps=0, d_steps=1,
                t_eos_weight=1.0, s_eos_weight=1.0, lr=1e-3,
                sched_type="constant", warmup_steps=0, optim_type="adam",
                weight_decay=0.0, grad_clip=0.0, moe_aux_weight=0.01)
    base.update(kw)
    return types.SimpleNamespace(**base)


def _batch(B=2, Tt=12, Tm=16, M=80, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    text = jax.random.randint(k1, (B, Tt), 3, 40)
    mel = jax.random.normal(k2, (B, Tm, M))
    tl = jnp.full((B,), Tt).at[1].set(Tt - 3)
    ml = jnp.full((B,), Tm).at[1].set(Tm - 5)
    return (text, mel, tl, ml)


# ---------------------------------------------------------------------------
# Unit: routing / dispatch math
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("impl", ["dispatch", "ragged"])
def test_moe_single_expert_matches_dense_ffn(impl):
    """E=1: softmax over one expert is 1.0, capacity >= N keeps every
    token, so the MoE layer must equal the dense FFN with expert-0
    weights exactly."""
    d, f = 8, 16
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, d))
    got = MoE.moe_ffn(p, _eval_ctx(), x, None, 0.0, MoE.MoeOpts(1, 2.0, impl))
    lin1 = {"w": p["lin1"]["w"][0], "b": p["lin1"]["b"][0]}
    lin2 = {"w": p["lin2"]["w"][0], "b": p["lin2"]["b"][0]}
    want = nn.linear(lin2, jax.nn.relu(nn.linear(lin1, x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("impl", ["dispatch", "ragged"])
def test_moe_dispatch_matches_dense_combine(top_k, impl):
    """With ample capacity the sparse dispatch path must agree with the
    exact dense-combine path (used for T==1 incremental decode) token by
    token — proving decode == train-layer semantics."""
    d, f, e = 8, 16, 4
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, d))
    got = MoE.moe_ffn(p, _eval_ctx(), x, None, 0.0,
                      MoE.MoeOpts(top_k, float(e), impl))  # ample cap: no drops
    per_tok = MoE._moe_dense(p, _eval_ctx(), x.reshape(-1, 1, d), 0.0, top_k)
    want = per_tok.reshape(x.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_moe_capacity_overflow_falls_through_to_zero():
    """Zero router weights tie every token's probs; argmax sends them all
    to expert 0, so only `capacity` tokens fit — the rest must output
    exactly zero (residual pass-through in the transformer layer)."""
    d, f, e = 8, 16, 4
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
    n = 8
    x = jax.random.normal(jax.random.PRNGKey(1), (1, n, d))
    out = MoE.moe_ffn(p, _eval_ctx(), x, None, 0.0,
                      MoE.MoeOpts(1, 1.0))  # cap = ceil(8/4) = 2
    nonzero = np.asarray(jnp.any(jnp.abs(out[0]) > 0, axis=-1))
    assert nonzero.sum() == 2, nonzero
    # the first two tokens in flat order hold the capacity slots
    assert nonzero[:2].all()


@pytest.mark.parametrize("impl", ["dispatch", "ragged"])
def test_moe_pad_tokens_get_no_capacity_and_zero_output(impl):
    d, f, e = 8, 16, 2
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, d))
    pad = jnp.array([[False, False, True, True],
                     [False, True, True, True]])
    out = MoE.moe_ffn(p, _eval_ctx(), x, pad, 0.0, MoE.MoeOpts(1, float(e), impl))
    assert np.asarray(jnp.abs(out[pad]).max()) == 0.0
    assert np.asarray(jnp.abs(out[~pad]).max()) > 0.0


def test_moe_grouped_dispatch_matches_single_group():
    """Routing in G groups of S with per-group capacity C = ceil(S*cf/E)
    must equal the single-group result when capacity is ample (no drops):
    grouping only changes WHERE the capacity is accounted, not the math."""
    d, f, e = 8, 16, 4
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 6, d))  # N = 24
    want = MoE.moe_ffn(p, _eval_ctx(), x, None, 0.0,
                       MoE.MoeOpts(2, float(e), "dispatch", 0))   # S = 24
    got = MoE.moe_ffn(p, _eval_ctx(), x, None, 0.0,
                      MoE.MoeOpts(2, float(e), "dispatch", 6))    # G = 4
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_moe_grouped_capacity_is_per_group():
    """Zero router weights send every token to expert 0. With group_size 4
    and cf 1.0, capacity = ceil(4/4) = 1 PER GROUP, so exactly one token
    per group survives — the first in each group."""
    d, f, e = 8, 16, 4
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, d))
    out = MoE.moe_ffn(p, _eval_ctx(), x, None, 0.0,
                      MoE.MoeOpts(1, 1.0, "dispatch", 4))
    nonzero = np.asarray(jnp.any(jnp.abs(out[0]) > 0, axis=-1))
    assert nonzero.tolist() == [True, False, False, False,
                                True, False, False, False]


def test_moe_ragged_is_dropless():
    """The ragged (sort + lax.ragged_dot) path must process EVERY valid
    token even when the dispatch path's capacity would drop most of them
    (collapsed router, cf 1.0)."""
    d, f, e = 8, 16, 4
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    p["router"]["w"] = jnp.zeros_like(p["router"]["w"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, d))
    out = MoE.moe_ffn(p, _eval_ctx(), x, None, 0.0,
                      MoE.MoeOpts(1, 1.0, "ragged"))
    nonzero = np.asarray(jnp.any(jnp.abs(out[0]) > 0, axis=-1))
    assert nonzero.all()
    # and token-exact vs the dense-combine oracle
    want = MoE._moe_dense(p, _eval_ctx(), x.reshape(-1, 1, d), 0.0, 1)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(want.reshape(x.shape)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_ragged_grads_finite_with_pads(top_k):
    """Regression: PAD assignments must stay inside a real ragged_dot
    group (gate 0) — rows past sum(group_sizes) are undefined, and
    undefined * 0 poisons the backward pass with NaNs."""
    d, f, e = 8, 16, 4
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, d))
    pad = jnp.arange(6)[None, :] >= jnp.array([[6], [2]])

    def loss(p, x):
        y = MoE.moe_ffn(p, _eval_ctx(), x, pad, 0.0,
                        MoE.MoeOpts(top_k, 1.25, "ragged"))
        return jnp.sum(y ** 2)

    gp, gx = jax.grad(loss, argnums=(0, 1))(p, x)
    for leaf in jax.tree_util.tree_leaves((gp, gx)):
        assert np.isfinite(np.asarray(leaf)).all()


def test_moe_ragged_train_step_gradients():
    """The ragged path must be differentiable end-to-end (ragged_dot VJP):
    one jitted train step updates expert AND router weights, metrics
    finite."""
    cfg = TINY.replace(moe_experts=2, moe_top_k=2, moe_impl="ragged")
    args = _args()
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    w0 = ts.params["text_m"]["encoder"]["layers"][0]["moe"]
    t, m, tl, ml = _batch()
    batches = {"ae": (t[None], m[None], tl[None], ml[None])}
    step = jax.jit(make_train_step(cfg, args))
    ts2, metrics = step(ts, jax.random.PRNGKey(1), batches)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    w1 = ts2.params["text_m"]["encoder"]["layers"][0]["moe"]
    assert float(jnp.abs(w1["lin1"]["w"] - w0["lin1"]["w"]).max()) > 0.0
    assert float(jnp.abs(w1["router"]["w"] - w0["router"]["w"]).max()) > 0.0


def test_moe_aux_loss_balanced_vs_collapsed():
    """Switch aux = E * sum_e f_e * P_e: 1.0 when assignments and probs are
    uniform, E when the router collapses onto one expert."""
    d, f, e = 4, 8, 4
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    n = 16
    x = jax.random.normal(jax.random.PRNGKey(1), (1, n, d))

    # Collapse: huge bias toward expert 0 via the input direction.
    p["router"]["w"] = jnp.zeros((d, e)).at[:, 0].set(100.0)
    ctx = nn.Ctx(rng=None, train=False, aux_losses=[])
    MoE.moe_ffn(p, ctx, jnp.abs(x), None, 0.0, MoE.MoeOpts(1, 4.0))
    assert abs(float(ctx.aux_losses[0]) - e) < 1e-3

    # Balanced: rotate tokens through experts with a one-hot pattern.
    xb = jnp.eye(e).astype(jnp.float32)  # token i activates expert i
    xb = jnp.tile(xb, (n // e, 1))[None] * 100.0
    p["router"]["w"] = jnp.eye(d, e)
    ctx = nn.Ctx(rng=None, train=False, aux_losses=[])
    MoE.moe_ffn(p, ctx, xb, None, 0.0, MoE.MoeOpts(1, 4.0))
    assert abs(float(ctx.aux_losses[0]) - 1.0) < 1e-2


def test_moe_no_aux_collection_by_default():
    d, f, e = 4, 8, 2
    p = MoE.moe_init(jax.random.PRNGKey(0), d, f, e)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, d))
    ctx = _eval_ctx()
    MoE.moe_ffn(p, ctx, x, None, 0.0)
    assert ctx.aux_losses is None


# ---------------------------------------------------------------------------
# Transformer integration: layer-stack paths agree
# ---------------------------------------------------------------------------


def test_moe_encoder_paths_agree_and_collect_aux():
    """Unrolled / scan_layers / remat encoder stacks must produce the same
    activations AND the same collected aux loss in eval mode (no dropout)."""
    cfg = TINY.replace(moe_experts=4, moe_top_k=2)
    d, nh = cfg.e_in, cfg.nhead
    p = T.encoder_init(jax.random.PRNGKey(0), d, nh, cfg.ffn_dim,
                       cfg.num_layers, moe=cfg.moe_experts)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, d))
    pad = jnp.arange(10)[None, :] >= jnp.array([[10], [7]])

    outs, auxs = [], []
    for scan, remat in ((False, False), (True, False), (False, True),
                        (True, True)):
        ctx = nn.Ctx(rng=None, train=False, aux_losses=[])
        y = T.encoder(p, ctx, x, pad, nh, 0.0, scan_layers=scan,
                      remat=remat, moe_opts=cfg.moe_opts)
        outs.append(np.asarray(y))
        auxs.append(float(sum(ctx.aux_losses)))
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], rtol=1e-5, atol=1e-5)
    for a in auxs[1:]:
        assert abs(a - auxs[0]) < 1e-4
    assert auxs[0] > 0.0


def test_moe_decoder_incremental_decode_matches_parallel():
    """KV-cached step-by-step decode through MoE layers (T==1 dense-combine
    path) must match the parallel teacher-forced decoder (dispatch path)."""
    cfg = TINY.replace(moe_experts=2, moe_top_k=1,
                       moe_capacity_factor=4.0)  # ample: no drops
    d, nh = cfg.e_in, cfg.nhead
    p = T.decoder_init(jax.random.PRNGKey(0), d, nh, cfg.ffn_dim,
                       cfg.num_layers, moe=cfg.moe_experts)
    B, Tt, Ts = 2, 6, 5
    x = jax.random.normal(jax.random.PRNGKey(1), (B, Tt, d))
    memory = jax.random.normal(jax.random.PRNGKey(2), (B, Ts, d))
    no_tgt_pad = jnp.zeros((B, Tt), bool)
    no_mem_pad = jnp.zeros((B, Ts), bool)
    ctx = _eval_ctx()
    want = T.decoder(p, ctx, x, memory, no_tgt_pad, no_mem_pad, nh, 0.0,
                     moe_opts=cfg.moe_opts)

    cache = T.init_cache(p, memory, Tt, nh)
    mem_bias = T.padding_bias(no_mem_pad)
    got = []
    for i in range(Tt):
        y, cache = T.decoder_step(p, ctx, x[:, i:i + 1], jnp.int32(i),
                                  cache, mem_bias, nh, 0.0,
                                  moe_opts=cfg.moe_opts)
        got.append(y)
    got = jnp.concatenate(got, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Train step integration + expert-parallel sharding
# ---------------------------------------------------------------------------


def test_moe_train_step_updates_experts_and_reports_aux():
    cfg = TINY.replace(moe_experts=2, moe_top_k=1)
    args = _args()
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    enc0 = ts.params["text_m"]["encoder"]["layers"][0]
    assert "moe" in enc0 and "lin1" not in enc0
    assert enc0["moe"]["lin1"]["w"].shape == (2, cfg.e_in, cfg.ffn_dim)

    t, m, tl, ml = _batch()
    batches = {"ae": (t[None], m[None], tl[None], ml[None])}
    step = jax.jit(make_train_step(cfg, args))
    ts2, metrics = step(ts, jax.random.PRNGKey(1), batches)
    assert "ae/moe" in metrics and np.isfinite(float(metrics["ae/moe"]))
    d = jnp.abs(ts2.params["text_m"]["encoder"]["layers"][0]["moe"]["lin1"]["w"]
                - enc0["moe"]["lin1"]["w"]).max()
    assert float(d) > 0.0


def test_moe_aux_weight_changes_gradients():
    """The load-balance term must reach the router's gradients."""
    cfg = TINY.replace(moe_experts=4, moe_top_k=1)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, _args())
    batch = _batch()

    def router_grad(w):
        g = jax.grad(lambda p: ae_loss_fn(
            p, ts.net_state, jax.random.PRNGKey(3), batch, cfg,
            _args(moe_aux_weight=w, objective_eval_mode=True), 1.0)[0]
        )(ts.params)
        return np.asarray(g["text_m"]["encoder"]["layers"][0]
                          ["moe"]["router"]["w"])

    g0, g1 = router_grad(0.0), router_grad(1.0)
    assert not np.allclose(g0, g1)


def test_moe_ep_sharded_train_step():
    """dp2 x tp2 x ep2 mesh on the 8-virtual-device CPU backend: expert
    weights shard over 'ep', one jitted step runs, metrics finite."""
    from unast_tpu.parallel import make_mesh, shard_train_step
    from unast_tpu.parallel.mesh import train_state_shardings
    from jax.sharding import PartitionSpec as P

    cfg = TINY.replace(moe_experts=4, moe_top_k=1)
    args = _args(train_batch_size=4)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    mesh = make_mesh(2, 2, ep=2)
    assert dict(mesh.shape) == {"dp": 2, "tp": 2, "ep": 2}

    sh = train_state_shardings(mesh, ts)
    moe_sh = sh.params["text_m"]["encoder"]["layers"][0]["moe"]
    assert moe_sh["lin1"]["w"].spec == P("ep", None, "tp")
    assert moe_sh["lin2"]["w"].spec == P("ep", "tp", None)
    assert moe_sh["router"]["w"].spec == P()

    t, m, tl, ml = _batch(B=4)
    batches = {"ae": (t[None], m[None], tl[None], ml[None])}
    step, ts_placed = shard_train_step(
        make_train_step(cfg, args), mesh, ts, batches)
    ts2, metrics = step(ts_placed, jax.random.PRNGKey(1), batches)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert "ae/moe" in metrics
