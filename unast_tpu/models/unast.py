"""UNAST facade + discriminators + CBHG vocoder.

Parity targets: UNAST (src/network.py:88-152) with the six task methods —
text_ae / speech_ae / cm_text_in / cm_speech_in / tts / asr; Discriminator
MLP (:154-170); LSTMDiscriminator (:172-186); Vocoder (:627-655).

All tasks are pure functions (params, state, ctx, cfg, batch) ->
(outputs, new_state). `torch.no_grad()` pseudo-pair generation in the
cross-modal steps becomes jax.lax.stop_gradient over non-differentiated
greedy decodes (SURVEY.md §7).
"""

from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn
from .config import ModelConfig, EOS_IDX
from . import modules as M
from . import networks as N
from . import rnn as R


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def unast_init(key, cfg: ModelConfig):
    """Returns (params, state) for the full model (+ discriminator if
    cfg.use_discriminator; input dim is 2*hidden for bidirectional RNN
    latents, hidden for transformer — src/train.py:922-924)."""
    k_t, k_s, k_d = jax.random.split(key, 3)
    text_p, text_s = N.text_init(k_t, cfg)
    speech_p, speech_s = N.speech_init(k_s, cfg)
    params = {"text_m": text_p, "speech_m": speech_p}
    state = {"text_m": text_s, "speech_m": speech_s}
    if cfg.use_discriminator:
        params["discriminator"] = lstm_discriminator_init(
            k_d, cfg.enc_out_dim, cfg.disc_hid, cfg.disc_bidirectional,
            cfg.disc_num_layers)
    return params, state


def num_params(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def _merge(state, **updates):
    out = dict(state)
    out.update(updates)
    return out


def _latent(enc_outputs, cfg: ModelConfig):
    """The per-position latent the discriminator sees: transformer memory, or
    the RNN encoder's output sequence (src/train.py:296-335)."""
    if cfg.model_type == "transformer":
        return enc_outputs
    return enc_outputs[1]


# ---------------------------------------------------------------------------
# The six task methods
# ---------------------------------------------------------------------------


def text_ae(params, state, ctx, cfg: ModelConfig, text, text_len,
            ret_enc_hid=False, cross_weights_out=None):
    """Denoising text autoencoder (src/network.py:98-99)."""
    (enc, mask), ts = N.text_encode(params["text_m"], state["text_m"], ctx,
                                    cfg, text, text_len, noise_in=True)
    logits, ts = N.text_decode_sequence(params["text_m"], ts, ctx, cfg,
                                        text, text_len, enc, mask,
                                        cross_weights_out=cross_weights_out)
    new_state = _merge(state, text_m=ts)
    if ret_enc_hid:
        return (logits, _latent(enc, cfg), text_len, mask), new_state
    return logits, new_state


def speech_ae(params, state, ctx, cfg: ModelConfig, mel, mel_len,
              ret_enc_hid=False, cross_weights_out=None):
    """Denoising speech autoencoder (src/network.py:100-101)."""
    (enc, mask), ss = N.speech_encode(params["speech_m"], state["speech_m"],
                                      ctx, cfg, mel, mel_len, noise_in=True)
    (pre, post, stop, lens), ss = N.speech_decode_sequence(
        params["speech_m"], ss, ctx, cfg, mel, mel_len, enc, mask,
        cross_weights_out=cross_weights_out)
    new_state = _merge(state, speech_m=ss)
    if ret_enc_hid:
        return (pre, post, stop, _latent(enc, cfg), mel_len, mask), new_state
    return (pre, post, stop), new_state


def cm_text_in(params, state, ctx, cfg: ModelConfig, text, text_len,
               ret_enc_hid=False, infer_mel_len: Optional[int] = None):
    """Back-translation, text side in: no-grad TTS pseudo-speech, then
    grad speech-encode -> text-decode (src/network.py:103-112)."""
    sg = jax.lax.stop_gradient
    (t_enc, t_mask), _ = N.text_encode(params["text_m"], state["text_m"],
                                       ctx, cfg, text, text_len)
    (_, post_pred, _, pred_lens), _ = N.speech_infer(
        params["speech_m"], state["speech_m"], ctx, cfg, t_enc, t_mask,
        max_len=infer_mel_len)
    post_pred, pred_lens = sg(post_pred), sg(pred_lens)
    (s_enc, s_mask), ss = N.speech_encode(params["speech_m"],
                                          state["speech_m"], ctx, cfg,
                                          post_pred, pred_lens)
    logits, ts = N.text_decode_sequence(params["text_m"], state["text_m"],
                                        ctx, cfg, text, text_len,
                                        s_enc, s_mask)
    new_state = _merge(state, text_m=ts, speech_m=ss)
    if ret_enc_hid:
        return (logits, _latent(s_enc, cfg), pred_lens, s_mask), new_state
    return logits, new_state


def _cm_ctc_draft(params, cfg: ModelConfig, s_enc, s_mask, max_len):
    """One-pass CTC greedy transcript off the speech-encoder memory (the
    jointly trained hybrid head, train/steps.py sp_loss_fn). Returns
    (ids, lens) shaped like the AR decode's output, EOS appended."""
    from . import ctc as CT
    logits = nn.linear(params["speech_m"]["ctc_head"],
                       s_enc).astype(jnp.float32)
    ids, lens = CT.ctc_greedy_decode(logits, s_mask, max_len)
    # AR pseudo-text carries EOS inside its stop span; mirror that so the
    # downstream text_encode sees the same sequence convention.
    b = ids.shape[0]
    ids = ids.at[jnp.arange(b), jnp.minimum(lens, max_len - 1)].set(
        jnp.where(lens < max_len, EOS_IDX, ids[jnp.arange(b),
                                              max_len - 1]))
    lens = jnp.minimum(lens + 1, max_len)
    return ids, lens


def cm_speech_in(params, state, ctx, cfg: ModelConfig, mel, mel_len,
                 ret_enc_hid=False, infer_text_len: Optional[int] = None,
                 text_decode: str = "ar"):
    """Back-translation, speech side in (src/network.py:114-123).

    text_decode selects how the no-grad pseudo-transcript is produced
    (TPU-native decode levers over the reference's always-sequential
    greedy loop, src/network.py:463-481):
      'ar'   — reference behavior: KV-cached greedy AR decode.
      'spec' — CTC-drafted speculative decode (networks.
               text_tr_spec_infer): exactly the eval-mode greedy
               transcript in ~(draft-errors+1) parallel passes.
               Deliberate deviation: the pseudo-decode runs with an
               eval Ctx (no dropout) — verification requires a
               deterministic scorer.
      'ctc'  — the CTC head's one-pass greedy output IS the pseudo-
               text (no AR decode at all; cheapest).
    'spec'/'ctc' require cfg.ctc_weight > 0 (the jointly-trained hybrid
    head) and the transformer backbone."""
    sg = jax.lax.stop_gradient
    (s_enc, s_mask), _ = N.speech_encode(params["speech_m"],
                                         state["speech_m"], ctx, cfg,
                                         mel, mel_len)
    if text_decode != "ar":
        if cfg.ctc_weight <= 0 or cfg.model_type != "transformer":
            raise ValueError(
                "cm text_decode 'spec'/'ctc' needs ctc_weight>0 and the "
                "transformer backbone")
        cap = infer_text_len or cfg.max_text_len
        if text_decode == "ctc":
            text_pred, text_pred_len = _cm_ctc_draft(
                params, cfg, s_enc, s_mask, cap)
        else:
            from . import ctc as CT
            logits = nn.linear(params["speech_m"]["ctc_head"],
                               s_enc).astype(jnp.float32)
            draft, _ = CT.ctc_greedy_decode(logits, s_mask, cap)
            text_pred, text_pred_len, _ = N.text_tr_spec_infer(
                params["text_m"], nn.Ctx.eval(), cfg, s_enc, s_mask,
                draft, max_len=cap)
    else:
        (text_pred, text_pred_len), _ = N.text_infer(
            params["text_m"], state["text_m"], ctx, cfg, s_enc, s_mask,
            max_len=infer_text_len)
    text_pred, text_pred_len = sg(text_pred), sg(text_pred_len)
    (t_enc, t_mask), ts = N.text_encode(params["text_m"], state["text_m"],
                                        ctx, cfg, text_pred, text_pred_len)
    (pre, post, stop, _), ss = N.speech_decode_sequence(
        params["speech_m"], state["speech_m"], ctx, cfg, mel, mel_len,
        t_enc, t_mask)
    new_state = _merge(state, text_m=ts, speech_m=ss)
    if ret_enc_hid:
        return (pre, post, stop, _latent(t_enc, cfg), text_pred_len, t_mask), new_state
    return (pre, post, stop), new_state


def tts(params, state, ctx, cfg: ModelConfig, text, text_len, mel, mel_len,
        infer=False, ret_enc_hid=False, cross_weights_out=None):
    """text -> mel (src/network.py:125-134). `cross_weights_out` (list)
    collects the teacher-forced decoder's cross-attention probs for the
    guided-attention loss (capability add; transformer only)."""
    (t_enc, t_mask), ts = N.text_encode(params["text_m"], state["text_m"],
                                        ctx, cfg, text, text_len)
    if infer:
        (pre, post, stop, stop_lens), ss = N.speech_infer(
            params["speech_m"], state["speech_m"], ctx, cfg, t_enc, t_mask)
    else:
        (pre, post, stop, stop_lens), ss = N.speech_decode_sequence(
            params["speech_m"], state["speech_m"], ctx, cfg, mel, mel_len,
            t_enc, t_mask, cross_weights_out=cross_weights_out)
    new_state = _merge(state, text_m=ts, speech_m=ss)
    if ret_enc_hid:
        return (pre, post, stop, stop_lens, _latent(t_enc, cfg)), new_state
    return (pre, post, stop, stop_lens), new_state


def asr(params, state, ctx, cfg: ModelConfig, text, text_len, mel, mel_len,
        infer=False, ret_enc_hid=False, cross_weights_out=None):
    """mel -> text (src/network.py:136-145). infer=True returns
    (ids, stop_lens); else teacher-forced logits."""
    (s_enc, s_mask), ss = N.speech_encode(params["speech_m"],
                                          state["speech_m"], ctx, cfg,
                                          mel, mel_len)
    if infer:
        out, ts = N.text_infer(params["text_m"], state["text_m"], ctx, cfg,
                               s_enc, s_mask)
    else:
        out, ts = N.text_decode_sequence(params["text_m"], state["text_m"],
                                         ctx, cfg, text, text_len,
                                         s_enc, s_mask,
                                         cross_weights_out=cross_weights_out)
    new_state = _merge(state, text_m=ts, speech_m=ss)
    if ret_enc_hid:
        return (out, _latent(s_enc, cfg)), new_state
    return out, new_state


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------


def mlp_discriminator_init(key, enc_dim: int, hidden: int = 1024):
    """Lample-style 3x1024 LeakyReLU(.2) MLP (src/network.py:154-170)."""
    ks = jax.random.split(key, 4)
    return {
        "fc1": nn.linear_init(ks[0], enc_dim, hidden, torch_default=True),
        "fc2": nn.linear_init(ks[1], hidden, hidden, torch_default=True),
        "fc3": nn.linear_init(ks[2], hidden, hidden, torch_default=True),
        "fc4": nn.linear_init(ks[3], hidden, 1, torch_default=True),
    }


def mlp_discriminator(p, ctx: nn.Ctx, x, dropout_p=0.2, slope=0.2):
    for name in ("fc1", "fc2", "fc3"):
        x = nn.dropout(ctx, jax.nn.leaky_relu(nn.linear(p[name], x), slope),
                       dropout_p)
    return jnp.squeeze(nn.linear(p["fc4"], x), -1)


def lstm_discriminator_init(key, d_in: int, hidden: int,
                            bidirectional: bool, num_layers: int):
    """RNNEncoder over the latent sequence, final top-layer h -> logit
    (src/network.py:172-186)."""
    k1, k2 = jax.random.split(key)
    return {
        "rnn": R.rnn_encoder_init(k1, d_in, hidden, num_layers, bidirectional),
        "fc2": nn.linear_init(k2, hidden, 1, torch_default=True),
    }


def lstm_discriminator(p, ctx: nn.Ctx, latents, lens,
                       dropout_p=0.2, slope=0.2):
    """latents: [B, S, D] (padded with zeros), lens: [B]. Returns [B] logits."""
    _, (h, _) = R.rnn_encoder(p["rnn"], ctx, latents, lens, dropout_p)
    top = h[-1]  # [B, H] (bidirectional states already linear-reduced)
    return jnp.squeeze(
        nn.linear(p["fc2"], nn.dropout(ctx, jax.nn.leaky_relu(top, slope),
                                       dropout_p)), -1)


# ---------------------------------------------------------------------------
# CBHG Vocoder: mel -> magnitude spectrogram (src/network.py:627-655)
# ---------------------------------------------------------------------------


def vocoder_init(key, cfg: ModelConfig, n_fft: int = 2048):
    ks = jax.random.split(key, 3)
    cbhg_p, cbhg_s = M.cbhg_init(ks[1], cfg.hidden,
                                 projection_size=cfg.hidden)
    params = {
        "pre": nn.conv1d_init(ks[0], cfg.num_mels, cfg.hidden, 1),
        "cbhg": cbhg_p,
        "post": nn.conv1d_init(ks[2], cfg.hidden, n_fft // 2 + 1, 1),
    }
    return params, {"cbhg": cbhg_s}


def vocoder(p, s, ctx: nn.Ctx, mel, dtype=None):
    """mel [B, T, num_mels] -> mag [B, T, n_fft//2+1]. Returns (mag, state)."""
    if dtype is not None:
        mel = mel.astype(dtype)
    x = nn.conv1d(p["pre"], mel, padding=(0, 0))
    x, cbhg_s = M.cbhg(p["cbhg"], s["cbhg"], ctx, x)
    return nn.conv1d(p["post"], x, padding=(0, 0)), {"cbhg": cbhg_s}
