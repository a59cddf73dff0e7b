"""Loss functions — parity with reference src/train.py:100-164.

All reductions accumulate in float32. Shapes are [B, T, ...] fixed; padding
is handled by masks exactly as the reference does (note the reference does
NOT mask the stop-BCE over padded frames — src/train.py:117-121 — and we
reproduce that since it is loss-relevant).
"""

import jax
import jax.numpy as jnp

from ..models.config import PAD_IDX, EOS_IDX
from ..models.modules import lens_to_mask


def masked_mse(gold_mel, pred_mel, mel_mask):
    """Mean squared error over unmasked elements (src/train.py:100-103).
    mel_mask: broadcastable to gold_mel, 1=keep."""
    diff2 = (gold_mel.astype(jnp.float32) - pred_mel.astype(jnp.float32)) ** 2
    m = jnp.broadcast_to(mel_mask, gold_mel.shape).astype(jnp.float32)
    return jnp.sum(diff2 * m) / jnp.maximum(jnp.sum(m), 1.0)


def text_loss(gold_char, logits, eos_weight: float = 1.0):
    """Cross entropy over [B, T] tokens with per-class EOS weight and PAD
    ignore (src/train.py:105-111; torch weighted-CE normalizes by the sum of
    applied weights)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, gold_char[..., None], axis=-1)[..., 0]
    w = jnp.where(gold_char == EOS_IDX, eos_weight, 1.0)
    w = jnp.where(gold_char == PAD_IDX, 0.0, w)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def bce_with_logits(logits, labels, pos_weight=None):
    """torch F.binary_cross_entropy_with_logits semantics, mean reduction."""
    x = logits.astype(jnp.float32)
    y = labels.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(x)
    log_np = jax.nn.log_sigmoid(-x)
    if pos_weight is not None:
        loss = -(pos_weight * y * log_p + (1.0 - y) * log_np)
    else:
        loss = -(y * log_p + (1.0 - y) * log_np)
    return jnp.mean(loss)


def speech_loss(gold_mel, stop_label, pred_mel, post_pred_mel, mel_len,
                stop_pred, eos_weight: float = 1.0):
    """pre-MSE + post-MSE + stop BCE with positional pos_weight
    (src/train.py:113-122). stop_label: [B, T] one-hot at the last frame;
    stop_pred: [B, T] logits. The stop BCE is unmasked, as in the reference."""
    t = pred_mel.shape[1]
    mel_mask = lens_to_mask(mel_len, t)[..., None]
    pred_loss = masked_mse(gold_mel, pred_mel, mel_mask)
    post_loss = masked_mse(gold_mel, post_pred_mel, mel_mask)
    stop_weight = jnp.where(stop_label == 1, eos_weight, 1.0)
    stop_loss = bce_with_logits(stop_pred, stop_label, pos_weight=stop_weight)
    return pred_loss + post_loss + stop_loss


def soft_cross_entropy(logits, soft_targets, size_average: bool = True):
    """CE accepting soft targets over axis 1 (src/train.py:124-145)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
    per = jnp.sum(-soft_targets.astype(jnp.float32) * logp, axis=1)
    return jnp.mean(per) if size_average else jnp.sum(per)


def discriminator_loss(output, target):
    """BCE-with-logits (src/train.py:147-148)."""
    return bce_with_logits(output, target)


def discriminator_target(batch_size: int, target_type: str,
                         smoothing: float = 0.1):
    """Smoothed labels: text -> 0.9, speech -> 0.1 (src/train.py:150-164)."""
    t = jnp.full((batch_size,), 1.0 - smoothing, jnp.float32)
    if target_type == "speech":
        t = 1.0 - t
    return t


def stop_label_from_lens(mel_len, max_len: int):
    """one_hot(mel_len - 1) gold stop labels (src/train.py:87-89)."""
    return jax.nn.one_hot(mel_len - 1, max_len, dtype=jnp.float32)


def guided_attention_loss(attn, q_len, k_len, sigma: float = 0.2):
    """Diagonal guided-attention loss (Tachibana et al. 2017) — capability
    add beyond the reference (it has no alignment prior, which is why its
    transformer grounds poorly on the joint objective; VERDICT r1 #2).

    attn: [..., Tq, Tk] cross-attention probs (any number of leading
    layer/batch/head dims, batch dim must be axis -4 or broadcastable with
    q_len/k_len of shape [B]); loss = mean over valid (q, k) positions of
    attn * (1 - exp(-((q/Ql - k/Kl)^2) / (2 sigma^2))).
    """
    tq, tk = attn.shape[-2], attn.shape[-1]
    qs = jnp.arange(tq, dtype=jnp.float32)[:, None]       # [Tq, 1]
    ks = jnp.arange(tk, dtype=jnp.float32)[None, :]       # [1, Tk]
    ql = jnp.maximum(q_len.astype(jnp.float32), 1.0)[:, None, None]  # [B,1,1]
    kl = jnp.maximum(k_len.astype(jnp.float32), 1.0)[:, None, None]
    w = 1.0 - jnp.exp(-((qs / ql - ks / kl) ** 2) / (2.0 * sigma ** 2))
    valid = ((qs < ql) & (ks < kl)).astype(jnp.float32)    # [B, Tq, Tk]
    # broadcast [B, Tq, Tk] against attn [..., B, H, Tq, Tk]
    w = w[:, None, :, :]
    valid = valid[:, None, :, :]
    num = jnp.sum(attn.astype(jnp.float32) * w * valid)
    den = jnp.maximum(jnp.sum(jnp.broadcast_to(valid, attn.shape)), 1.0)
    return num / den
