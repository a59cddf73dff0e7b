"""Objective-level parity vs the reference implementation (VERDICT r1 #4).

Builds the reference's torch UNAST (transformer variant) at tiny scale,
copies ALL weights into our functional param trees, runs the reference's own
objective step functions (src/train.py:199-354) and our steps.py loss fns on
the SAME fixed batch — both deterministic (eval mode, augmentation off) —
and asserts every loss component matches within float tolerance.

This measures objective-COMPOSITION parity end-to-end (task methods x loss
fns x discriminator plumbing), on top of the module-level goldens in
test_models.py.
"""

import argparse

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import ref_oracle

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="/root/reference not present")

B, TT, TM, NMELS = 2, 12, 20, 80
DIMS = dict(num_mels=NMELS, hidden=32, e_in=32, t_emb_dim=32, s_pre_hid=32,
            ffn_dim=64, num_layers=2, nhead=2, disc_hid=16,
            disc_num_layers=2)


def _ref_args():
    return argparse.Namespace(
        model_type="transformer", s_eos_weight=5.0, t_eos_weight=3.0,
        use_discriminator=True, disc_bidirectional=True,
        s_pre_drop=0.5, s_post_drop=0.1, t_pre_drop=0.5, t_post_drop=0.1,
        e_drop=0.2, d_drop=0.1, **DIMS)


def _our_args():
    from unast_tpu.train.config import parse_with_config
    a = parse_with_config([
        "--model_type", "transformer", "--compute_dtype", "float32",
        "--s_eos_weight", "5.0", "--t_eos_weight", "3.0",
        "--use_discriminator", "true", "--disc_bidirectional", "true",
        "--max_mel_len", "815", "--max_text_len", "300",
    ] + [f"--{k}={v}" for k, v in DIMS.items()])
    a.objective_eval_mode = True  # deterministic objective composition
    return a


def _fixed_batch():
    rng = np.random.default_rng(42)
    text_len = np.array([TT, TT - 3], np.int64)
    mel_len = np.array([TM, TM - 5], np.int64)
    text = rng.integers(3, 46, size=(B, TT)).astype(np.int64)
    for i in range(B):
        text[i, text_len[i] - 1] = 2  # EOS
        text[i, text_len[i]:] = 0     # PAD
    mel = rng.random((B, TM, NMELS)).astype(np.float32)
    for i in range(B):
        mel[i, mel_len[i]:] = 0.0
    return text, mel, text_len, mel_len


@pytest.fixture(scope="module")
def parity_setup():
    import torch
    ns = ref_oracle.load_reference()
    ref_oracle.patch_deterministic(ns)

    torch.manual_seed(0)
    args_r = _ref_args()
    text_m = ns.network.TextTransformer(args_r)
    speech_m = ns.network.SpeechTransformer(args_r)
    disc = ns.network.LSTMDiscriminator(
        args_r.hidden, args_r.disc_hid, bidirectional=True,
        num_layers=args_r.disc_num_layers)
    model = ns.network.UNAST(text_m, speech_m, disc, None)
    model.eval()

    args_j = _our_args()
    from unast_tpu.train.config import model_config_from_args
    cfg = model_config_from_args(args_j)
    params, state = ref_oracle.copy_transformer_weights(model, cfg)

    text, mel, text_len, mel_len = _fixed_batch()
    batch_t = (torch.as_tensor(text), torch.as_tensor(mel),
               torch.as_tensor(text_len), torch.as_tensor(mel_len))
    xy = ns.train.process_batch(batch_t)
    batch_j = (jnp.asarray(text, jnp.int32), jnp.asarray(mel),
               jnp.asarray(text_len, jnp.int32),
               jnp.asarray(mel_len, jnp.int32))
    return ns, model, args_r, xy, (cfg, args_j, params, state, batch_j)


def test_copier_covers_all_params(parity_setup):
    """Our copied tree has exactly as many scalars as the torch model."""
    _, model, _, _, (cfg, _, params, _, _) = parity_setup
    from unast_tpu.models import unast as U
    assert U.num_params(params) == model.num_params()


def _ref_losses(ns, model, args_r, xy):
    import torch
    out = {}
    with torch.no_grad():
        t_ae, s_ae, d_ae = ns.train.autoencoder_step(
            model, xy, args_r, use_dis_loss=True)
        asr, tts, d_sp = ns.train.supervised_step(
            model, xy, args_r, use_dis_loss=True)
        t_cm, s_cm, d_cm = ns.train.crossmodel_step(
            model, xy, args_r, use_dis_loss=True)
        d, _ = ns.train.discriminator_step(model, xy, args_r)
    for k, v in (("t_ae", t_ae), ("s_ae", s_ae), ("d_ae", d_ae),
                 ("asr", asr), ("tts", tts), ("d_sp", d_sp),
                 ("t_cm", t_cm), ("s_cm", s_cm), ("d_cm", d_cm), ("d", d)):
        out[k] = float(v)
    return out


def _our_losses(cfg, args_j, params, state, batch_j):
    from unast_tpu.train import steps as S
    key = jax.random.PRNGKey(0)
    out = {}
    _, (aux, _) = S.ae_loss_fn(params, state, key, batch_j, cfg, args_j, 1.0)
    out.update(t_ae=aux["t_ae"], s_ae=aux["s_ae"], d_ae=aux["d_ae"])
    _, (aux, _) = S.sp_loss_fn(params, state, key, batch_j, cfg, args_j, 1.0)
    out.update(asr=aux["asr"], tts=aux["tts"], d_sp=aux["d_sp"])
    _, (aux, _) = S.cm_loss_fn(params, state, key, batch_j, cfg, args_j, 1.0)
    out.update(t_cm=aux["t_cm"], s_cm=aux["s_cm"], d_cm=aux["d_cm"])
    disc_p = params["discriminator"]
    gen_p = {k: v for k, v in params.items() if k != "discriminator"}
    _, aux = S.disc_loss_fn(disc_p, gen_p, state, key, batch_j, cfg,
                            args_j, 1.0)
    out["d"] = aux["d"]
    return {k: float(v) for k, v in out.items()}


def test_objective_losses_match_reference(parity_setup):
    ns, model, args_r, xy, ours = parity_setup
    ref = _ref_losses(ns, model, args_r, xy)
    got = _our_losses(*ours)
    for k in ref:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=2e-3, atol=2e-3,
            err_msg=f"objective loss '{k}': ours={got[k]} ref={ref[k]}")


def test_cm_pseudo_pairs_match_reference(parity_setup):
    """The greedy pseudo-text inside back-translation matches the reference
    token-for-token (same weights, eval mode) — the strongest evidence the
    KV-cached while_loop decode reproduces the reference's full-prefix
    re-decode."""
    import torch
    ns, model, args_r, xy, (cfg, args_j, params, state, batch_j) = parity_setup
    (text_t, mel_t, text_len_t, mel_len_t), _ = xy
    with torch.no_grad():
        s_e_o, s_mask = model.speech_m.encode(mel_t, mel_len_t)
        ref_pred, ref_lens = model.text_m.infer_sequence(s_e_o, s_mask)

    from unast_tpu import nn
    from unast_tpu.models import networks as N
    text, mel, text_len, mel_len = batch_j
    ectx = nn.Ctx(rng=jax.random.PRNGKey(0), train=False)
    (s_enc, s_pad), _ = N.speech_encode(params["speech_m"],
                                        state["speech_m"], ectx, cfg,
                                        mel, mel_len)
    (our_pred, our_lens), _ = N.text_infer(params["text_m"], state["text_m"],
                                           ectx, cfg, s_enc, s_pad)
    ref_lens_np = ref_lens.numpy()
    np.testing.assert_array_equal(np.asarray(our_lens), ref_lens_np)
    ref_np = ref_pred.numpy()
    ours_np = np.asarray(our_pred)
    for i in range(B):
        n = int(ref_lens_np[i])
        np.testing.assert_array_equal(ours_np[i, :n], ref_np[i, :n],
                                      err_msg=f"pseudo text row {i}")


# ---------------------------------------------------------------------------
# RNN-backbone parity. The text-side DECODE paths deviate deliberately
# (causal conv prenet vs the reference's O(T^2) same-pad prefix re-run,
# documented at models/networks.py:25-30), so t_ae/asr/cm losses are not
# expected to match; everything else is asserted: speech_ae, teacher-forced
# tts (speech decode over text memory), the discriminator objective, and
# per-step LSA decode goldens.
# ---------------------------------------------------------------------------


def _our_rnn_args():
    from unast_tpu.train.config import parse_with_config
    dims = dict(DIMS)
    a = parse_with_config([
        "--model_type", "rnn", "--compute_dtype", "float32",
        "--s_eos_weight", "5.0", "--t_eos_weight", "3.0",
        "--use_discriminator", "true", "--disc_bidirectional", "true",
        "--e_bi", "true", "--d_attn", "lsa", "--attn_dim", "8",
        "--max_mel_len", "815", "--max_text_len", "300",
    ] + [f"--{k}={v}" for k, v in dims.items() if k not in ("ffn_dim", "nhead")])
    a.objective_eval_mode = True
    return a


@pytest.fixture(scope="module")
def rnn_parity_setup():
    import torch
    ns = ref_oracle.load_reference()
    ref_oracle.patch_deterministic(ns)

    torch.manual_seed(3)
    args_r = _ref_args()
    args_r.model_type = "rnn"
    args_r.e_bi = True
    args_r.d_attn = "lsa"
    args_r.attn_dim = 8
    text_m = ns.network.TextRNN(args_r)
    speech_m = ns.network.SpeechRNN(args_r)
    disc = ns.network.LSTMDiscriminator(
        args_r.hidden * 2, args_r.disc_hid, bidirectional=True,
        num_layers=args_r.disc_num_layers)
    model = ns.network.UNAST(text_m, speech_m, disc, None)
    model.eval()

    args_j = _our_rnn_args()
    from unast_tpu.train.config import model_config_from_args
    cfg = model_config_from_args(args_j)
    params, state = ref_oracle.copy_rnn_weights(model, cfg)

    text, mel, text_len, mel_len = _fixed_batch()
    batch_t = (torch.as_tensor(text), torch.as_tensor(mel),
               torch.as_tensor(text_len), torch.as_tensor(mel_len))
    xy = ns.train.process_batch(batch_t)
    batch_j = (jnp.asarray(text, jnp.int32), jnp.asarray(mel),
               jnp.asarray(text_len, jnp.int32),
               jnp.asarray(mel_len, jnp.int32))
    return ns, model, args_r, xy, (cfg, args_j, params, state, batch_j)


def test_rnn_copier_covers_all_params(rnn_parity_setup):
    _, model, _, _, (cfg, _, params, _, _) = rnn_parity_setup
    from unast_tpu.models import unast as U
    assert U.num_params(params) == model.num_params()


def test_rnn_speech_losses_match_reference(rnn_parity_setup):
    """speech_ae and teacher-forced tts losses + the discriminator
    objective match the reference for the RNN/LSA backbone."""
    import torch
    ns, model, args_r, xy, (cfg, args_j, params, state, batch_j) = \
        rnn_parity_setup
    (text_t, mel_t, tl_t, ml_t), (gold_char, gold_mel, gold_stop) = xy

    from unast_tpu import nn
    from unast_tpu.models import unast as U
    from unast_tpu.train import losses as L
    from unast_tpu.train.steps import disc_loss_fn
    text, mel, text_len, mel_len = batch_j
    ectx = lambda: nn.Ctx(rng=jax.random.PRNGKey(0), train=False)
    gold_stop_j = L.stop_label_from_lens(mel_len, mel.shape[1])

    with torch.no_grad():
        pre_r, post_r, stop_r = model.speech_ae(mel_t, ml_t)
        s_ae_ref = ns.train.speech_loss(gold_mel, gold_stop, pre_r, post_r,
                                        ml_t, stop_r, args_r.s_eos_weight)
        tts_out = model.tts(text_t, tl_t, mel_t, ml_t)
        tts_ref = ns.train.speech_loss(gold_mel, gold_stop, tts_out[0],
                                       tts_out[1], ml_t, tts_out[2],
                                       args_r.s_eos_weight)
        d_ref, _ = ns.train.discriminator_step(model, xy, args_r)

    (pre, post, stop), _ = U.speech_ae(params, state, ectx(), cfg, mel, mel_len)
    s_ae = L.speech_loss(mel, gold_stop_j, pre, post, mel_len, stop,
                         args_j.s_eos_weight)
    np.testing.assert_allclose(float(s_ae), float(s_ae_ref), rtol=2e-3,
                               atol=2e-3)

    (pre, post, stop, _), _ = U.tts(params, state, ectx(), cfg, text,
                                    text_len, mel, mel_len)
    tts_l = L.speech_loss(mel, gold_stop_j, pre, post, mel_len, stop,
                          args_j.s_eos_weight)
    np.testing.assert_allclose(float(tts_l), float(tts_ref), rtol=2e-3,
                               atol=2e-3)

    disc_p = params["discriminator"]
    gen_p = {k: v for k, v in params.items() if k != "discriminator"}
    _, aux = disc_loss_fn(disc_p, gen_p, state, jax.random.PRNGKey(0),
                          batch_j, cfg, args_j, 1.0)
    np.testing.assert_allclose(float(aux["d"]), float(d_ref), rtol=2e-3,
                               atol=2e-3)


def test_rnn_decoder_lsa_step_matches_torch(rnn_parity_setup):
    """Per-step parity of the LSA-attentive decoder: 6 decode steps with
    the stateful reference attention vs our explicit LSAState carry."""
    import torch
    ns, model, _, _, (cfg, _, params, _, _) = rnn_parity_setup
    from unast_tpu import nn
    from unast_tpu.models import rnn as R

    dec_t = model.speech_m.decoder
    torch.manual_seed(11)
    Bd, S, E = 2, 9, cfg.enc_out_dim
    memory_t = torch.randn(Bd, S, E)
    lens_t = torch.tensor([9, 6])
    pad_t = torch.arange(S)[None] >= lens_t[:, None]
    h0 = torch.zeros(dec_t.rnn.num_layers, Bd, cfg.hidden)
    xs = torch.randn(6, Bd, cfg.e_in)

    with torch.no_grad():
        dec_t.attention_layer.init_memory(memory_t)
        hc_t = (h0.clone(), h0.clone())
        ref_outs = []
        for i in range(6):
            out, hc_t = dec_t(xs[i].unsqueeze(1), hc_t, memory_t, pad_t)
            ref_outs.append(out[:, 0])
        dec_t.attention_layer.clear_memory()

    p = params["speech_m"]["decoder"]
    memory = jnp.asarray(memory_t.numpy())
    pad = jnp.asarray(pad_t.numpy())
    attn = R.lsa_init_state(p["attn"], memory)
    hc = (jnp.zeros((dec_t.rnn.num_layers, Bd, cfg.hidden)),
          jnp.zeros((dec_t.rnn.num_layers, Bd, cfg.hidden)))
    ectx = nn.Ctx.eval()
    for i in range(6):
        out, hc, attn = R.rnn_decoder_step(
            p, ectx, jnp.asarray(xs[i].numpy()), hc, memory, pad, attn,
            0.0, "lsa")
        np.testing.assert_allclose(np.asarray(out),
                                   ref_outs[i].numpy(), atol=2e-5,
                                   err_msg=f"decode step {i}")
