"""Model-stack tests: golden parity against torch (weights copied into the
functional param trees, eval mode) plus internal consistency of the
KV-cached decode paths and the UNAST task surface."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import torch.nn as tnn

from unast_tpu import nn
from unast_tpu.models import (
    ModelConfig, TINY, modules as M, transformer as T, rnn as R,
    networks as N, unast as U,
)

KEY = jax.random.PRNGKey(0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


# ---------------------------------------------------------------------------
# Primitive parity
# ---------------------------------------------------------------------------


def test_batchnorm_matches_torch():
    torch.manual_seed(0)
    bn = tnn.BatchNorm1d(8)
    x = torch.randn(4, 8, 12)  # [B, C, T]
    bn.train()
    y_train = bn(x)
    p, s = nn.batchnorm_init(8)
    xj = t2j(x.permute(0, 2, 1))  # [B, T, C]
    yj, new_s = nn.batchnorm(p, s, xj, train=True)
    np.testing.assert_allclose(np.asarray(yj),
                               y_train.detach().numpy().transpose(0, 2, 1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s["var"]),
                               bn.running_var.numpy(), atol=1e-4)
    bn.eval()
    y_eval = bn(x)
    yj_eval, _ = nn.batchnorm(p, new_s, xj, train=False)
    np.testing.assert_allclose(np.asarray(yj_eval),
                               y_eval.detach().numpy().transpose(0, 2, 1),
                               atol=1e-5)


def test_causal_conv_matches_torch_pad_trim():
    """Left-pad causal conv == reference pad-4-then-trim-right-4 scheme."""
    torch.manual_seed(1)
    conv = tnn.Conv1d(6, 10, kernel_size=5, padding=4)
    x = torch.randn(2, 6, 20)
    y_ref = conv(x)[:, :, :-4]
    p = {"w": t2j(conv.weight.permute(2, 1, 0)), "b": t2j(conv.bias)}
    yj = nn.conv1d(p, t2j(x.permute(0, 2, 1)), padding=(4, 0))
    np.testing.assert_allclose(np.asarray(yj),
                               y_ref.detach().numpy().transpose(0, 2, 1),
                               atol=1e-5)


def test_lstm_encoder_matches_torch_packed():
    """Masked-scan encoder == torch LSTM over pack_padded_sequence,
    bidirectional, 2 layers (reference RNNEncoder src/module.py:297-336)."""
    torch.manual_seed(2)
    B, Tm, D, H, L = 3, 11, 8, 6, 2
    rnn = tnn.LSTM(D, H, num_layers=L, bidirectional=True, batch_first=True)
    x = torch.randn(B, Tm, D)
    lens = torch.tensor([11, 7, 4])
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x, lens, batch_first=True, enforce_sorted=False)
    out_p, (hn, cn) = rnn(packed)
    out_ref, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out_p, batch_first=True, total_length=Tm)

    # Copy weights: torch per (layer, direction) l{li}{'_reverse' if bwd}
    layers = []
    for li in range(L):
        layer = {}
        for dirname, suffix in (("fwd", ""), ("bwd", "_reverse")):
            layer[dirname] = {
                "wi": t2j(getattr(rnn, f"weight_ih_l{li}{suffix}").T),
                "wh": t2j(getattr(rnn, f"weight_hh_l{li}{suffix}").T),
                "bi": t2j(getattr(rnn, f"bias_ih_l{li}{suffix}")),
                "bh": t2j(getattr(rnn, f"bias_hh_l{li}{suffix}")),
            }
        layers.append(layer)
    p = {"layers": layers}
    ctx = nn.Ctx.eval()
    out_j, (h_j, c_j) = R.rnn_encoder(p, ctx, t2j(x), jnp.array([11, 7, 4]),
                                      dropout_p=0.0)
    # rnn_encoder (without reduce) returns concat [fwd, bwd] per layer.
    np.testing.assert_allclose(np.asarray(out_j), out_ref.detach().numpy(),
                               atol=1e-5)
    # torch hn: [L*2, B, H] ordered (l0 fwd, l0 bwd, l1 fwd, l1 bwd)
    hn = hn.view(L, 2, B, H)
    h_ref = torch.cat([hn[:, 0], hn[:, 1]], dim=-1)  # [L, B, 2H]
    np.testing.assert_allclose(np.asarray(h_j), h_ref.detach().numpy(),
                               atol=1e-5)


def _copy_mha(mha_t, d):
    w = mha_t.in_proj_weight  # [3D, D]
    b = mha_t.in_proj_bias
    return {
        "q": {"w": t2j(w[:d].T), "b": t2j(b[:d])},
        "k": {"w": t2j(w[d:2 * d].T), "b": t2j(b[d:2 * d])},
        "v": {"w": t2j(w[2 * d:].T), "b": t2j(b[2 * d:])},
        "out": {"w": t2j(mha_t.out_proj.weight.T), "b": t2j(mha_t.out_proj.bias)},
    }


def _copy_encoder_layer(lt, d):
    return {
        "attn": _copy_mha(lt.self_attn, d),
        "lin1": {"w": t2j(lt.linear1.weight.T), "b": t2j(lt.linear1.bias)},
        "lin2": {"w": t2j(lt.linear2.weight.T), "b": t2j(lt.linear2.bias)},
        "ln1": {"scale": t2j(lt.norm1.weight), "bias": t2j(lt.norm1.bias)},
        "ln2": {"scale": t2j(lt.norm2.weight), "bias": t2j(lt.norm2.bias)},
    }


def _copy_decoder_layer(lt, d):
    return {
        "self": _copy_mha(lt.self_attn, d),
        "cross": _copy_mha(lt.multihead_attn, d),
        "lin1": {"w": t2j(lt.linear1.weight.T), "b": t2j(lt.linear1.bias)},
        "lin2": {"w": t2j(lt.linear2.weight.T), "b": t2j(lt.linear2.bias)},
        "ln1": {"scale": t2j(lt.norm1.weight), "bias": t2j(lt.norm1.bias)},
        "ln2": {"scale": t2j(lt.norm2.weight), "bias": t2j(lt.norm2.bias)},
        "ln3": {"scale": t2j(lt.norm3.weight), "bias": t2j(lt.norm3.bias)},
    }


def test_transformer_encoder_matches_torch():
    torch.manual_seed(3)
    d, nhead, ffn, L = 16, 4, 32, 2
    enc_t = tnn.TransformerEncoder(
        tnn.TransformerEncoderLayer(d, nhead, ffn, dropout=0.0), L)
    enc_t.eval()
    B, Tm = 3, 9
    x = torch.randn(B, Tm, d)
    lens = torch.tensor([9, 6, 3])
    pad = torch.arange(Tm)[None, :] >= lens[:, None]
    y_ref = enc_t(x.transpose(0, 1), None, pad).transpose(0, 1)

    p = {"layers": [_copy_encoder_layer(enc_t.layers[i], d) for i in range(L)]}
    y = T.encoder(p, nn.Ctx.eval(), t2j(x), t2j(pad).astype(bool),
                  nhead, 0.0)
    np.testing.assert_allclose(np.asarray(y)[~np.asarray(t2j(pad))],
                               y_ref.detach().numpy()[~pad.numpy()],
                               atol=1e-4)


def test_transformer_decoder_matches_torch():
    torch.manual_seed(4)
    d, nhead, ffn, L = 16, 4, 32, 2
    dec_t = tnn.TransformerDecoder(
        tnn.TransformerDecoderLayer(d, nhead, ffn, dropout=0.0), L)
    dec_t.eval()
    B, Tt, Ts = 2, 7, 9
    tgt = torch.randn(B, Tt, d)
    mem = torch.randn(B, Ts, d)
    t_lens = torch.tensor([7, 5])
    s_lens = torch.tensor([9, 6])
    tgt_pad = torch.arange(Tt)[None, :] >= t_lens[:, None]
    mem_pad = torch.arange(Ts)[None, :] >= s_lens[:, None]
    causal = torch.triu(torch.ones(Tt, Tt), 1).bool()
    y_ref = dec_t(tgt.transpose(0, 1), mem.transpose(0, 1), causal, None,
                  tgt_pad, mem_pad).transpose(0, 1)

    p = {"layers": [_copy_decoder_layer(dec_t.layers[i], d) for i in range(L)]}
    y = T.decoder(p, nn.Ctx.eval(), t2j(tgt), t2j(mem),
                  t2j(tgt_pad).astype(bool), t2j(mem_pad).astype(bool),
                  nhead, 0.0)
    np.testing.assert_allclose(np.asarray(y)[~np.asarray(t2j(tgt_pad))],
                               y_ref.detach().numpy()[~tgt_pad.numpy()],
                               atol=1e-4)


def test_kv_cache_step_equals_parallel():
    """Incremental decoder_step over a forced input sequence must reproduce
    the parallel teacher-forced decoder exactly (no padding)."""
    d, nhead, ffn, L = 16, 4, 32, 2
    key = jax.random.PRNGKey(5)
    p = T.decoder_init(key, d, nhead, ffn, L)
    B, Tt, Ts = 2, 6, 5
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, (B, Tt, d))
    mem = jax.random.normal(k2, (B, Ts, d))
    no_pad_t = jnp.zeros((B, Tt), bool)
    no_pad_s = jnp.zeros((B, Ts), bool)
    ctx = nn.Ctx.eval()
    y_par = T.decoder(p, ctx, x, mem, no_pad_t, no_pad_s, nhead, 0.0)

    cache = T.init_cache(p, mem, Tt, nhead)
    mem_bias = T.padding_bias(no_pad_s)
    outs = []
    for i in range(Tt):
        y_i, cache = T.decoder_step(p, ctx, x[:, i:i + 1], i, cache,
                                    mem_bias, nhead, 0.0)
        outs.append(y_i)
    y_inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_inc), np.asarray(y_par), atol=1e-5)


# ---------------------------------------------------------------------------
# Decode loops: shapes + stop semantics
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tr_model():
    cfg = TINY
    params, state = U.unast_init(KEY, cfg)
    return cfg, params, state


@pytest.fixture(scope="module")
def rnn_model():
    cfg = TINY.replace(model_type="rnn", d_attn="lsa", e_bi=True)
    params, state = U.unast_init(jax.random.PRNGKey(1), cfg)
    return cfg, params, state


def _text_batch(cfg, b=2):
    t = cfg.max_text_len
    k = jax.random.PRNGKey(7)
    ids = jax.random.randint(k, (b, t), 3, 46)
    lens = jnp.array([t, t - 4])[:b]
    # place EOS at len-1
    ids = ids.at[jnp.arange(b), lens - 1].set(2)
    pos = jnp.arange(t)[None, :]
    ids = jnp.where(pos < lens[:, None], ids, 0)
    return ids, lens


def _mel_batch(cfg, b=2):
    t = cfg.max_mel_len
    mel = jax.random.uniform(jax.random.PRNGKey(8), (b, t, cfg.num_mels))
    lens = jnp.array([t, t - 6])[:b]
    mel = mel * M.lens_to_mask(lens, t)[..., None]
    return mel, lens


@pytest.mark.parametrize("model_fix", ["tr_model", "rnn_model"])
def test_unast_tasks(model_fix, request):
    cfg, params, state = request.getfixturevalue(model_fix)
    ids, t_lens = _text_batch(cfg)
    mel, m_lens = _mel_batch(cfg)
    ctx = nn.Ctx(rng=jax.random.PRNGKey(9), train=True)

    logits, st = U.text_ae(params, state, ctx, cfg, ids, t_lens)
    assert logits.shape == (2, cfg.max_text_len, 46)

    (pre, post, stop), st = U.speech_ae(params, state, ctx, cfg, mel, m_lens)
    assert pre.shape == mel.shape and post.shape == mel.shape
    assert stop.shape == (2, cfg.max_mel_len)

    out, st = U.tts(params, state, ctx, cfg, ids, t_lens, mel, m_lens)
    assert out[0].shape == mel.shape

    logits, st = U.asr(params, state, ctx, cfg, ids, t_lens, mel, m_lens)
    assert logits.shape == (2, cfg.max_text_len, 46)

    # inference paths
    ectx = nn.Ctx.eval()
    (pre, post, stops, stop_lens), _ = U.tts(params, state, ectx, cfg,
                                             ids, t_lens, mel, m_lens,
                                             infer=True)
    assert pre.shape == (2, cfg.max_mel_len, cfg.num_mels)
    assert stop_lens.shape == (2,)
    # frames past stop must be zero
    mask = np.asarray(M.lens_to_mask(stop_lens, cfg.max_mel_len))
    assert np.all(np.asarray(pre)[~mask] == 0)

    (ids_out, stop_lens), _ = U.asr(params, state, ectx, cfg, ids, t_lens,
                                    mel, m_lens, infer=True)
    assert ids_out.shape == (2, cfg.max_text_len)
    tmask = np.asarray(M.lens_to_mask(stop_lens, cfg.max_text_len))
    assert np.all(np.asarray(ids_out)[~tmask] == 0)

    # cross-modal (the expensive back-translation paths)
    logits, _ = U.cm_text_in(params, state, ctx, cfg, ids, t_lens,
                             infer_mel_len=8)
    assert logits.shape == (2, cfg.max_text_len, 46)
    (pre, post, stop), _ = U.cm_speech_in(params, state, ctx, cfg, mel,
                                          m_lens, infer_text_len=6)
    assert pre.shape == mel.shape


def test_discriminator_shapes(tr_model):
    cfg, params, state = tr_model
    ids, t_lens = _text_batch(cfg)
    ctx = nn.Ctx(rng=jax.random.PRNGKey(10), train=True)
    (logits, latents, lens, mask), _ = U.text_ae(params, state, ctx, cfg,
                                                 ids, t_lens, ret_enc_hid=True)
    cfg_d = cfg.replace(use_discriminator=True)
    p_full, _ = U.unast_init(jax.random.PRNGKey(3), cfg_d)
    out = U.lstm_discriminator(p_full["discriminator"], ctx, latents, lens)
    assert out.shape == (2,)

    p_mlp = U.mlp_discriminator_init(jax.random.PRNGKey(4), cfg.enc_out_dim, 32)
    out = U.mlp_discriminator(p_mlp, ctx, latents)
    assert out.shape == latents.shape[:2]


def test_vocoder_shapes():
    cfg = TINY
    p, s = U.vocoder_init(jax.random.PRNGKey(11), cfg, n_fft=256)
    mel = jax.random.uniform(jax.random.PRNGKey(12), (2, 16, cfg.num_mels))
    ctx = nn.Ctx(rng=jax.random.PRNGKey(13), train=True)
    mag, new_s = U.vocoder(p, s, ctx, mel)
    assert mag.shape == (2, 16, 129)


def test_infer_jits(tr_model):
    """The whole greedy TTS inference path must be jittable."""
    cfg, params, state = tr_model
    ids, t_lens = _text_batch(cfg)

    @jax.jit
    def run(params, state, ids, t_lens):
        ectx = nn.Ctx.eval()
        (enc, mask), _ = N.text_encode(params["text_m"], state["text_m"],
                                       ectx, cfg, ids, t_lens)
        (pre, post, stops, stop_lens), _ = N.speech_infer(
            params["speech_m"], state["speech_m"], ectx, cfg, enc, mask)
        return pre

    out = run(params, state, ids, t_lens)
    assert out.shape == (2, cfg.max_mel_len, cfg.num_mels)


def test_num_params(tr_model):
    cfg, params, _ = tr_model
    assert U.num_params(params) > 10000


def test_bfloat16_compute_path(tr_model):
    """tts/asr forward + greedy infer under compute_dtype=bfloat16: bf16
    activations, finite f32 losses."""
    cfg_f32, params, state = tr_model
    cfg = cfg_f32.replace(compute_dtype="bfloat16")
    ids, t_lens = _text_batch(cfg)
    mel, m_lens = _mel_batch(cfg)
    ctx = nn.Ctx(rng=jax.random.PRNGKey(3), train=True)
    (pre, post, stop, _), _ = U.tts(params, state, ctx, cfg, ids, t_lens,
                                    mel, m_lens)
    assert pre.dtype == jnp.bfloat16
    from unast_tpu.train import losses as L
    gold_stop = L.stop_label_from_lens(m_lens, mel.shape[1])
    loss = L.speech_loss(mel, gold_stop, pre, post, m_lens, stop, 5.0)
    assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
    (pre_i, post_i, stops_i, stop_lens), _ = U.tts(
        params, state, nn.Ctx.eval(), cfg, ids, t_lens, mel, m_lens,
        infer=True)
    assert pre_i.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(pre_i, np.float32)).all()


def test_scan_layers_matches_unrolled():
    """scan_layers=True produces identical outputs to the unrolled stack
    (eval mode), including the KV-cached incremental decode."""
    cfg_u = TINY
    cfg_s = TINY.replace(scan_layers=True)
    params, state = U.unast_init(jax.random.PRNGKey(2), cfg_u)
    ids, t_lens = _text_batch(cfg_u)
    mel, m_lens = _mel_batch(cfg_u)
    ectx = nn.Ctx.eval()
    (enc_u, _), _ = N.text_encode(params["text_m"], state["text_m"], ectx,
                                  cfg_u, ids, t_lens)
    (enc_s, _), _ = N.text_encode(params["text_m"], state["text_m"], ectx,
                                  cfg_s, ids, t_lens)
    np.testing.assert_allclose(np.asarray(enc_u), np.asarray(enc_s),
                               atol=1e-5, rtol=1e-5)
    out_u, _ = U.tts(params, state, ectx, cfg_u, ids, t_lens, mel, m_lens,
                     infer=True)
    out_s, _ = U.tts(params, state, ectx, cfg_s, ids, t_lens, mel, m_lens,
                     infer=True)
    np.testing.assert_allclose(np.asarray(out_u[0]), np.asarray(out_s[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_u[3]), np.asarray(out_s[3]))


def test_text_prenet_step_matches_full_causal():
    """The incremental per-layer-buffer prenet evaluation used in
    text_rnn_infer reproduces the full-sequence causal conv stack at EVERY
    position (including the first ones, where intermediate activations
    differ from raw zero padding)."""
    cfg = TINY
    key = jax.random.PRNGKey(6)
    p, s = M.text_prenet_init(key, cfg)
    B, T = 2, 10
    emb = jax.random.normal(jax.random.PRNGKey(7), (B, T, cfg.t_emb_dim))
    ectx = nn.Ctx.eval()
    full, _ = M.text_prenet_convs(p, s, ectx, emb, cfg, causal=True)
    bufs = M.text_prenet_step_init(p, B, cfg, emb.dtype)
    for i in range(T):
        y, bufs = M.text_prenet_step(p, s, ectx, emb[:, i], bufs, cfg)
        np.testing.assert_allclose(np.asarray(y), np.asarray(full[:, i]),
                                   atol=1e-5, err_msg=f"position {i}")


def test_beam_search_and_sampling(tr_model):
    """Beam search (K=1 == greedy; K=3 score >= greedy score) and
    temperature sampling decode."""
    cfg, params, state = tr_model
    ids, t_lens = _text_batch(cfg)
    ectx = nn.Ctx.eval()
    (mem, mask), _ = N.text_encode(params["text_m"], state["text_m"], ectx,
                                   cfg, ids, t_lens)
    greedy, g_lens = N.text_tr_infer(params["text_m"], ectx, cfg, mem, mask)
    beam1, b1_lens = N.text_tr_beam_search(params["text_m"], ectx, cfg,
                                           mem, mask, beam=1)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))
    np.testing.assert_array_equal(np.asarray(g_lens), np.asarray(b1_lens))

    beam3, b3_lens = N.text_tr_beam_search(params["text_m"], ectx, cfg,
                                           mem, mask, beam=3)
    assert beam3.shape == greedy.shape
    m = np.asarray(beam3)
    assert np.all(m[~np.asarray(M.lens_to_mask(b3_lens, cfg.max_text_len))] == 0)

    sctx = nn.Ctx(rng=jax.random.PRNGKey(5), train=False)
    s1, _ = N.text_tr_infer(params["text_m"], sctx, cfg, mem, mask,
                            temperature=1.0)
    sctx2 = nn.Ctx(rng=jax.random.PRNGKey(6), train=False)
    s2, _ = N.text_tr_infer(params["text_m"], sctx2, cfg, mem, mask,
                            temperature=1.0)
    assert s1.shape == greedy.shape
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))  # stochastic


def test_fused_proj_matches_separate_linears():
    """_fused_proj (one [D, n*D] matmul over concatenated weights) must
    reproduce the separate per-projection linears exactly — the param tree
    keeps distinct q/k/v entries for torch-checkpoint parity."""
    d = 32
    ks = jax.random.split(KEY, 4)
    ps = [nn.linear_init(k, d, d, torch_default=True) for k in ks[:3]]
    x = jax.random.normal(ks[3], (2, 5, d), jnp.float32)
    fused = T._fused_proj(ps, x)
    for y, p in zip(fused, ps):
        np.testing.assert_allclose(np.asarray(y), np.asarray(nn.linear(p, x)),
                                   atol=1e-6)


def test_spec_infer_matches_greedy(tr_model):
    """Speculative decode (CTC-draft verify) returns EXACTLY the greedy
    AR transcript for good, corrupted, and garbage drafts — only the
    round count varies (1-2 rounds when the draft IS the answer, up to
    one per token for garbage)."""
    cfg, params, state = tr_model
    ids, t_lens = _text_batch(cfg)
    ectx = nn.Ctx.eval()
    (mem, mask), _ = N.text_encode(params["text_m"], state["text_m"], ectx,
                                   cfg, ids, t_lens)
    greedy, g_lens = N.text_tr_infer(params["text_m"], ectx, cfg, mem, mask)
    greedy, g_lens = np.asarray(greedy), np.asarray(g_lens)

    # (a) draft == the greedy output itself: verified in <= 2 rounds
    s_ids, s_lens, rounds = N.text_tr_spec_infer(
        params["text_m"], ectx, cfg, mem, mask, jnp.asarray(greedy))
    np.testing.assert_array_equal(np.asarray(s_ids), greedy)
    np.testing.assert_array_equal(np.asarray(s_lens), g_lens)
    assert int(rounds) <= 2, int(rounds)

    # (b) corrupted draft (a few wrong tokens): still exact, a few rounds
    bad = greedy.copy()
    bad[:, [1, 5]] = 7
    s_ids, s_lens, r_bad = N.text_tr_spec_infer(
        params["text_m"], ectx, cfg, mem, mask, jnp.asarray(bad))
    np.testing.assert_array_equal(np.asarray(s_ids), greedy)
    np.testing.assert_array_equal(np.asarray(s_lens), g_lens)

    # (c) garbage draft (all PAD): still exact (degenerates toward AR)
    s_ids, s_lens, r_pad = N.text_tr_spec_infer(
        params["text_m"], ectx, cfg, mem, mask,
        jnp.zeros_like(jnp.asarray(greedy)))
    np.testing.assert_array_equal(np.asarray(s_ids), greedy)
    np.testing.assert_array_equal(np.asarray(s_lens), g_lens)
    assert int(rounds) <= int(r_bad) <= int(r_pad)

    # train-mode ctx is rejected (verify must be deterministic)
    with pytest.raises(ValueError):
        N.text_tr_spec_infer(params["text_m"],
                             nn.Ctx(rng=jax.random.PRNGKey(0), train=True),
                             cfg, mem, mask, jnp.asarray(greedy))
