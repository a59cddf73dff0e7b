"""Reference torch-checkpoint importer (unast_tpu/compat/torch_import.py).

Verifies the key->tree mapping against the oracle weight copiers used by
the objective-parity tests (those copiers are themselves validated by
forward/loss parity in test_ref_parity.py), for both backbones, plus a
full CLI round-trip: torch.save in the reference's format ->
torch_import.main -> load_ckp -> identical params.
"""

import argparse

import numpy as np
import pytest
import jax

import ref_oracle

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="/root/reference not present")

DIMS = dict(num_mels=80, hidden=32, e_in=32, t_emb_dim=32, s_pre_hid=32,
            ffn_dim=64, num_layers=2, nhead=2, disc_hid=16,
            disc_num_layers=2)


def _ref_args(model_type):
    a = argparse.Namespace(
        model_type=model_type, s_eos_weight=5.0, t_eos_weight=3.0,
        use_discriminator=True, disc_bidirectional=True,
        s_pre_drop=0.5, s_post_drop=0.1, t_pre_drop=0.5, t_post_drop=0.1,
        e_drop=0.2, d_drop=0.1, **DIMS)
    if model_type == "rnn":
        a.e_bi = True
        a.d_attn = "lsa"
        a.attn_dim = 8
    return a


def _build_ref(model_type, seed=0):
    import torch
    ns = ref_oracle.load_reference()
    torch.manual_seed(seed)
    a = _ref_args(model_type)
    if model_type == "transformer":
        tm, sm = ns.network.TextTransformer(a), ns.network.SpeechTransformer(a)
        d_in = a.hidden
    else:
        tm, sm = ns.network.TextRNN(a), ns.network.SpeechRNN(a)
        d_in = a.hidden * 2
    disc = ns.network.LSTMDiscriminator(d_in, a.disc_hid, bidirectional=True,
                                        num_layers=a.disc_num_layers)
    m = ns.network.UNAST(tm, sm, disc, None)
    m.eval()
    return m


def _assert_trees_equal(got, want):
    gl, gt = jax.tree_util.tree_flatten(got)
    wl, wt = jax.tree_util.tree_flatten(want)
    assert gt == wt, f"tree structures differ:\n{gt}\nvs\n{wt}"
    for g, w in zip(gl, wl):
        np.testing.assert_array_equal(np.asarray(g, np.float32),
                                      np.asarray(w, np.float32))


@pytest.mark.parametrize("model_type", ["transformer", "rnn"])
def test_import_state_dict_matches_oracle_copier(model_type):
    from unast_tpu.compat import import_state_dict

    m = _build_ref(model_type)
    if model_type == "transformer":
        want_p, want_s = ref_oracle.copy_transformer_weights(m, _cfg(model_type))
    else:
        want_p, want_s = ref_oracle.copy_rnn_weights(m, _cfg(model_type))
    got_p, got_s = import_state_dict(m.state_dict(), _cfg(model_type))
    _assert_trees_equal(got_p, want_p)
    _assert_trees_equal(got_s, want_s)


def _cfg(model_type):
    from unast_tpu.train.config import parse_with_config, model_config_from_args
    extra = (["--e_bi", "true", "--d_attn", "lsa", "--attn_dim", "8"]
             if model_type == "rnn" else [])
    skip = ("ffn_dim", "nhead") if model_type == "rnn" else ()
    a = parse_with_config([
        "--model_type", model_type, "--compute_dtype", "float32",
        "--use_discriminator", "true", "--disc_bidirectional", "true",
        "--max_mel_len", "815", "--max_text_len", "300", *extra,
    ] + [f"--{k}={v}" for k, v in DIMS.items() if k not in skip])
    return model_config_from_args(a)


def test_cli_round_trip(tmp_path):
    """torch.save (reference format) -> CLI import -> load_ckp -> the
    imported params drive our forward pass."""
    import torch
    import jax.numpy as jnp
    from unast_tpu.compat.torch_import import main
    from unast_tpu.train.config import parse_with_config
    from unast_tpu.train.steps import init_train_state
    from unast_tpu.train.checkpoint import load_ckp
    from unast_tpu.compat import import_state_dict
    from unast_tpu import nn
    from unast_tpu.models import unast as U

    m = _build_ref("transformer", seed=7)
    ck = tmp_path / "model_best.ckpt"
    torch.save({"epoch": 3, "valid_loss_min": 0.42,
                "state_dict": m.state_dict(), "optimizer": {}}, str(ck))

    flags = ["--model_type", "transformer", "--compute_dtype", "float32",
             "--use_discriminator", "true", "--disc_bidirectional", "true",
             "--max_mel_len", "815", "--max_text_len", "300",
             ] + [f"--{k}={v}" for k, v in DIMS.items()]
    out = tmp_path / "imported"
    main([str(ck), str(out)] + flags)

    args = parse_with_config(flags)
    from unast_tpu.train.config import model_config_from_args
    cfg = model_config_from_args(args)
    template = init_train_state(jax.random.PRNGKey(0), cfg, args)
    epoch, best, ts, _ = load_ckp(str(out / "model_most_recent.ckpt"),
                                  template)
    assert epoch == 3 and abs(best - 0.42) < 1e-9
    want_p, _ = import_state_dict(m.state_dict())
    _assert_trees_equal(ts.params, want_p)

    # imported weights drive a forward pass
    text = jnp.asarray(np.array([[5, 6, 7, 2, 0, 0]]), jnp.int32)
    (logits, *_), _ = U.text_ae(ts.params, ts.net_state, nn.Ctx.eval(), cfg,
                                text, jnp.asarray([4], jnp.int32),
                                ret_enc_hid=True)
    assert np.isfinite(np.asarray(logits)).all()

    # export CLI: Orbax ckpt -> reference torch format; the reference model
    # loads it strict=True and its state_dict equals the original's
    from unast_tpu.compat.torch_export import main as export_main
    back = tmp_path / "back.ckpt"
    export_main([str(out / "model_most_recent.ckpt"), str(back)] + flags)
    blob = torch.load(str(back), map_location="cpu", weights_only=False)
    assert blob["epoch"] == 3
    m.load_state_dict(blob["state_dict"], strict=True)
    for k, v in m.state_dict().items():
        np.testing.assert_allclose(v.numpy(), blob["state_dict"][k].numpy())


def test_vocoder_import_forward_parity(tmp_path):
    """Reference Vocoder (CBHG) torch forward == our vocoder with imported
    weights. This doubles as the CBHG torch-parity golden (no oracle copier
    existed for it). hidden must be 256: the reference CBHG hard-codes
    projection_size=256 (src/module.py:541), so that's the only runnable
    reference vocoder width."""
    import torch
    import jax.numpy as jnp
    from unast_tpu.compat import import_vocoder_state_dict
    from unast_tpu.compat.torch_import import main
    from unast_tpu.infer.vocoder import load_vocoder_ckpt
    from unast_tpu.models import unast as U
    from unast_tpu import nn

    ns = ref_oracle.load_reference()
    torch.manual_seed(11)
    n_fft = 512
    v = ns.network.Vocoder(80, 256, n_fft)
    v.eval()
    mel = np.random.default_rng(5).random((2, 9, 80)).astype(np.float32)
    with torch.no_grad():
        want = v(torch.as_tensor(mel)).numpy()

    vp, vs = import_vocoder_state_dict(v.state_dict())
    vp = jax.tree_util.tree_map(jnp.asarray, vp)
    vs = jax.tree_util.tree_map(jnp.asarray, vs)
    got, _ = U.vocoder(vp, vs, nn.Ctx.eval(), jnp.asarray(mel))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)

    # CLI --vocoder round trip into infer/vocoder.py's pickle format
    ck = tmp_path / "vocoder.ckpt"
    torch.save({"epoch": 1, "state_dict": v.state_dict()}, str(ck))
    out = tmp_path / "vocoder.pkl"
    main([str(ck), str(out), "--vocoder"])
    vp2, _ = load_vocoder_ckpt(str(out))
    np.testing.assert_array_equal(
        np.asarray(vp2["post"]["w"]), np.asarray(vp["post"]["w"]))


@pytest.mark.parametrize("model_type", ["transformer", "rnn"])
def test_export_round_trip(model_type, tmp_path):
    """Two-way migration: our params -> reference state_dict loads with
    strict=True into a freshly built reference model, and
    import(export(x)) == x leaf-exact."""
    import jax.numpy as jnp
    from unast_tpu.compat import import_state_dict
    from unast_tpu.compat.torch_export import export_state_dict
    from unast_tpu.models import unast as U

    cfg = _cfg(model_type)
    params, state = U.unast_init(jax.random.PRNGKey(4), cfg)
    sd = export_state_dict(params, state)

    m = _build_ref(model_type, seed=9)
    missing, unexpected = m.load_state_dict(sd, strict=True), None
    assert not missing.missing_keys and not missing.unexpected_keys

    got_p, got_s = import_state_dict(m.state_dict(), cfg)
    _assert_trees_equal(got_p, params)
    _assert_trees_equal(got_s, state)


def test_export_rejects_tpu_only_extensions():
    """Quantized / MoE / r>1 trees have no reference layout — export must
    fail with a clear error instead of emitting a broken state_dict."""
    import pytest
    from unast_tpu import nn
    from unast_tpu.compat.torch_export import export_state_dict
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import TINY

    params, state = U.unast_init(jax.random.PRNGKey(0), TINY)
    with pytest.raises(AssertionError, match="quantized"):
        export_state_dict(nn.quant.quantize_params(params), state)

    moe_p, moe_s = U.unast_init(jax.random.PRNGKey(0),
                                TINY.replace(moe_experts=2))
    with pytest.raises(AssertionError, match="MoE"):
        export_state_dict(moe_p, moe_s)

    r_p, r_s = U.unast_init(jax.random.PRNGKey(0),
                            TINY.replace(reduction_factor=2))
    with pytest.raises(AssertionError, match="reduction_factor"):
        export_state_dict(r_p, r_s)
