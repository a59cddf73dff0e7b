"""Input augmentation under jax.random — parity with reference
src/utils.py:40-75 (noise_fn lives model-side in models/modules.py since the
reference applies it inside encode()).

SpecAugment note: the reference's "frequency" mask indexes
`res[i][:][f_zero:f_zero+f]`, which in torch is the TIME axis — both masks
actually mask time spans (SURVEY.md §2.1 #54). We reproduce that
loss-relevant behavior by default and offer the intended frequency masking
behind `true_freq_mask=True`.
"""

import jax
import jax.numpy as jnp


def specaugment(rng, mel, mel_len, freq_mask: int = 20, time_mask: int = 100,
                replace_with_zero: bool = False, true_freq_mask: bool = False):
    """mel: [B, T, M]; two random spans replaced by the per-utterance mean
    (over the full padded tensor, as the reference's res[i].mean())."""
    b, t, m = mel.shape
    ks = jax.random.split(rng, 6)
    f_len = jax.random.randint(ks[0], (b,), 0, max(freq_mask, 1))
    t_len = jax.random.randint(ks[1], (b,), 0, max(time_mask, 1))
    # reference guard: if mel_len - t <= 0, resample t in [0, mel_len // 2)
    bad = (mel_len - t_len) <= 0
    t_alt = jax.random.randint(ks[2], (b,), 0, jnp.maximum(mel_len // 2, 1))
    t_len = jnp.where(bad, t_alt, t_len)
    f_len = jnp.minimum(f_len, jnp.maximum(mel_len - 1, 0))

    def rand_start(key, span):
        hi = jnp.maximum(mel_len - span, 1)
        return (jax.random.uniform(key, (b,)) * hi).astype(jnp.int32)

    f_zero = rand_start(ks[3], f_len)
    t_zero = rand_start(ks[4], t_len)

    fill = jnp.zeros((b,), mel.dtype) if replace_with_zero else jnp.mean(
        mel, axis=(1, 2))
    pos_t = jnp.arange(t)[None, :]
    span_t = (pos_t >= t_zero[:, None]) & (pos_t < (t_zero + t_len)[:, None])
    if true_freq_mask:
        pos_f = jnp.arange(m)[None, :]
        f_len_f = jnp.minimum(f_len, m)
        hi = jnp.maximum(m - f_len_f, 1)
        f0 = (jax.random.uniform(ks[5], (b,)) * hi).astype(jnp.int32)
        span_f = (pos_f >= f0[:, None]) & (pos_f < (f0 + f_len_f)[:, None])
        mask = span_t[:, :, None] | span_f[:, None, :]
    else:
        span_f_as_t = (pos_t >= f_zero[:, None]) & (pos_t < (f_zero + f_len)[:, None])
        mask = (span_t | span_f_as_t)[:, :, None]
    return jnp.where(mask, fill[:, None, None], mel)
