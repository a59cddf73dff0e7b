"""MelGAN neural vocoder (models/melgan.py, train/melgan.py) — a
model-family addition over the reference (Griffin-Lim-only wav path,
src/utils.py:61-103)."""

import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.models import melgan as G
from unast_tpu.train.melgan import (crop_batch, make_vocoder_step,
                                    mr_stft_loss, stft_mag)


def test_forward_upsamples_exactly_hop():
    p = G.melgan_init(jax.random.PRNGKey(0), base=32)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 80))
    wav = G.melgan_forward(p, mel)
    assert wav.shape == (2, 8 * P.hop_length)
    w = np.asarray(wav)
    assert np.isfinite(w).all()
    assert np.abs(w).max() <= 1.0  # tanh-bounded


def test_stft_mag_matches_numpy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal((1, 4096)).astype(np.float32)
    got = np.asarray(stft_mag(jnp.asarray(y), 512, 128))
    win = np.hanning(512)
    n_frames = 1 + (4096 - 512) // 128
    want = np.stack([np.abs(np.fft.rfft(y[0, t * 128:t * 128 + 512] * win))
                     for t in range(n_frames)])
    assert got.shape[1] == n_frames
    np.testing.assert_allclose(got[0], want, rtol=1e-3, atol=1e-3)


def test_mr_stft_loss_zero_for_identical():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    loss, sc = mr_stft_loss(y, y)
    assert float(loss) < 1e-5 and float(sc) < 1e-6
    z = jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32))
    loss2, sc2 = mr_stft_loss(z, y)
    assert float(loss2) > 0.1 and float(sc2) > 0.1


def test_crop_batch_alignment():
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    ds = SyntheticSpeechDataset(size=2, seed=0)
    mel, wav = crop_batch(ds, np.random.default_rng(0), 3, 16, P.hop_length)
    assert mel.shape == (3, 16, 80)
    assert wav.shape == (3, 16 * P.hop_length)
    assert np.isfinite(mel).all() and np.isfinite(wav).all()
    # the crop really is a slice of the item's wav (find it back)
    it0 = ds[0]
    assert it0["wav"].dtype == np.float32


def test_vocoder_step_learns():
    """~25 steps on one fixed crop: multi-res STFT loss must drop."""
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.melgan import init_voc_state

    class A:  # minimal args
        lr = 5e-4
        melgan_base = 32

    ds = SyntheticSpeechDataset(size=1, seed=0)
    mel, wav = crop_batch(ds, np.random.default_rng(1), 2, 12, P.hop_length)
    vs = init_voc_state(jax.random.PRNGKey(0), A())
    step = jax.jit(make_vocoder_step(A()), donate_argnums=(0,))
    mel_j, wav_j = jnp.asarray(mel), jnp.asarray(wav)
    first = last = None
    for _ in range(25):
        vs, m = step(vs, mel_j, wav_j)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        if first is None:
            first = vals
        last = vals
    assert last["voc/stft"] < 0.8 * first["voc/stft"], (first, last)


def test_synthesizer_melgan_wav_path():
    """Synthesizer(melgan_params=...) produces waveforms via the neural
    vocoder (combined with the NAR mel path: the full one-pass pipeline)."""
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import fastspeech as F
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import TINY

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    n_params, n_state = F.fastspeech_init(jax.random.PRNGKey(1), cfg)
    n_params["dur"]["fc"]["b"] = n_params["dur"]["fc"]["b"] + 2.0
    mg = G.melgan_init(jax.random.PRNGKey(2), base=32)
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(cfg.max_mel_len,), max_batch=2,
                      nar_pv=(n_params, n_state), melgan_params=mg)
    wavs = syn.tts(["hello", "cat"])
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and np.isfinite(w).all()


def test_discriminator_multiscale_shapes():
    p = G.discriminator_init(jax.random.PRNGKey(0))
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 4400))
    outs = G.discriminator_forward(p, wav)
    assert len(outs) == 3
    t_prev = None
    for feats, logits in outs:
        assert len(feats) == 5
        assert logits.shape[0] == 2 and logits.shape[2] == 1
        if t_prev is not None:  # each scale sees a 2x shorter signal
            assert logits.shape[1] <= t_prev
        t_prev = logits.shape[1]
        for f in feats:
            assert np.isfinite(np.asarray(f)).all()


def test_adversarial_step_trains_both_players():
    """One jitted hinge-GAN step: finite losses, generator AND
    discriminator move; repeated steps stay finite."""
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.melgan import (init_adv_state, init_voc_state,
                                        make_adversarial_step)

    class A:
        lr = 1e-4
        melgan_base = 32

    ds = SyntheticSpeechDataset(size=1, seed=0)
    mel, wav = crop_batch(ds, np.random.default_rng(1), 2, 8, P.hop_length)
    vs = init_voc_state(jax.random.PRNGKey(0), A())
    ats = init_adv_state(jax.random.PRNGKey(1), vs, A())
    step = jax.jit(make_adversarial_step(A()), donate_argnums=(0,))
    g0 = np.asarray(jax.tree_util.tree_leaves(ats.gen)[0]).copy()
    d0 = np.asarray(jax.tree_util.tree_leaves(ats.disc)[0]).copy()
    mel_j, wav_j = jnp.asarray(mel), jnp.asarray(wav)
    for _ in range(3):
        ats, m = step(ats, mel_j, wav_j)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
    assert not np.allclose(g0, np.asarray(jax.tree_util.tree_leaves(ats.gen)[0]))
    assert not np.allclose(d0, np.asarray(jax.tree_util.tree_leaves(ats.disc)[0]))
    assert vals["adv/fm"] > 0.0


def test_tts_long_splits_and_concatenates():
    """tts_long handles text past max_text_len: word-boundary segments,
    one concatenated waveform with pauses."""
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import fastspeech as F
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import TINY
    from unast_tpu.text import raw_text_to_phoneme_ids

    cfg = TINY  # max_text_len 16
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    n_params, n_state = F.fastspeech_init(jax.random.PRNGKey(1), cfg)
    n_params["dur"]["fc"]["b"] = n_params["dur"]["fc"]["b"] + 2.0
    mg = G.melgan_init(jax.random.PRNGKey(2), base=32)
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(16,),
                      mel_buckets=(cfg.max_mel_len,), max_batch=4,
                      nar_pv=(n_params, n_state), melgan_params=mg)
    text = "the quick brown fox jumps over the lazy dog again and again"
    assert len(raw_text_to_phoneme_ids(text)) > cfg.max_text_len
    wav = syn.tts_long(text, pause_s=0.05)
    assert wav.ndim == 1 and np.isfinite(wav).all()
    short = syn.tts_long("cat", pause_s=0.05)  # single-segment path
    assert short.ndim == 1
    assert len(wav) > len(short)


def test_synthesizer_chunked_vocode_exact():
    """Synthesizer._melgan_vocode with melgan_chunk set reproduces the
    whole-utterance melgan_forward EXACTLY (boundary-truncated windows are
    true slices), including when the bucket is not a chunk multiple —
    the batch-knee fix must not change a single sample."""
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import TINY

    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), TINY)
    mg = G.melgan_init(jax.random.PRNGKey(1), base=64)
    rng = np.random.default_rng(0)
    mel_b = jnp.asarray(rng.random((3, 200, 80)), jnp.float32)
    full = np.asarray(G.melgan_forward(mg, mel_b))
    for chunk in (16, 64, 150, 256):  # 256: win>T -> whole-utterance fallback
        syn = Synthesizer(a_params, a_state, TINY, melgan_params=mg,
                          text_buckets=(8,), mel_buckets=(16,),
                          max_batch=4, melgan_chunk=chunk)
        got = np.asarray(syn._melgan_vocode(mel_b))
        # bitwise-identical math per slice; different window shapes let
        # XLA reassociate conv reductions -> 1e-7-level float residue
        np.testing.assert_allclose(got, full, rtol=0, atol=1e-6,
                                   err_msg=f"chunk {chunk}")
    # auto mode: tiny batches stay whole-utterance (device array out)
    syn = Synthesizer(a_params, a_state, TINY, melgan_params=mg,
                      text_buckets=(8,), mel_buckets=(16,), max_batch=4)
    got = np.asarray(syn._melgan_vocode(mel_b))
    np.testing.assert_allclose(got, full, rtol=0, atol=1e-6)


def test_mpd_shapes_and_period_fold():
    """Multi-period discriminator: per-period logits [B, ceil(n/p), p, 1],
    5 feature maps, finite."""
    p = G.mpd_init(jax.random.PRNGKey(0))
    n = 40 * P.hop_length
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, n))
    outs = G.mpd_forward(p, wav)
    assert len(outs) == 5
    for (feats, logits), period in zip(outs, G._PERIODS):
        assert len(feats) == 5
        assert logits.shape[0] == 2 and logits.shape[2] == period
        assert logits.shape[3] == 1
        assert np.isfinite(np.asarray(logits)).all()


def test_adv_disc_forward_dispatch_and_legacy():
    """adv_disc_forward: dict trees concatenate sub-discriminator outputs;
    a bare MSD list (round-2 checkpoints) still works."""
    key = jax.random.PRNGKey(0)
    wav = jax.random.normal(jax.random.PRNGKey(1), (2, 4400))
    both = G.adv_disc_init(key, "msd+mpd")
    outs = G.adv_disc_forward(both, wav)
    assert len(outs) == 3 + 5  # 3 scales + 5 periods
    legacy = G.discriminator_init(key)
    lo = G.adv_disc_forward(legacy, wav)
    ref = G.discriminator_forward(legacy, wav)
    assert len(lo) == len(ref) == 3
    np.testing.assert_array_equal(np.asarray(lo[0][1]),
                                  np.asarray(ref[0][1]))


def test_adversarial_step_mpd_trains():
    """Hinge-GAN step with the HiFi-GAN multi-period discriminator:
    finite metrics, both players move."""
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.train.melgan import (init_adv_state, init_voc_state,
                                        make_adversarial_step)

    class A:
        lr = 1e-4
        melgan_base = 32
        melgan_disc = "mpd"

    ds = SyntheticSpeechDataset(size=1, seed=0)
    mel, wav = crop_batch(ds, np.random.default_rng(1), 2, 8, P.hop_length)
    vs = init_voc_state(jax.random.PRNGKey(0), A())
    ats = init_adv_state(jax.random.PRNGKey(1), vs, A())
    assert set(ats.disc) == {"mpd"}
    step = jax.jit(make_adversarial_step(A()), donate_argnums=(0,))
    g0 = np.asarray(jax.tree_util.tree_leaves(ats.gen)[0]).copy()
    d0 = np.asarray(jax.tree_util.tree_leaves(ats.disc)[0]).copy()
    for _ in range(2):
        ats, m = step(ats, jnp.asarray(mel), jnp.asarray(wav))
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
    assert not np.allclose(
        g0, np.asarray(jax.tree_util.tree_leaves(ats.gen)[0]))
    assert not np.allclose(
        d0, np.asarray(jax.tree_util.tree_leaves(ats.disc)[0]))


def test_synthesizer_pcm16_path_matches_float():
    """pcm16=True: tts returns int16 waveforms that are exactly the
    device-quantized float path (same trim bounds, values within 1 LSB of
    round(clip(w) * 32767))."""
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import fastspeech as F
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import TINY

    cfg = TINY
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    n_params, n_state = F.fastspeech_init(jax.random.PRNGKey(1), cfg)
    n_params["dur"]["fc"]["b"] = n_params["dur"]["fc"]["b"] + 2.0
    mg = G.melgan_init(jax.random.PRNGKey(2), base=32)
    kw = dict(text_buckets=(16,), mel_buckets=(cfg.max_mel_len,),
              max_batch=2, nar_pv=(n_params, n_state), melgan_params=mg)
    syn_f = Synthesizer(a_params, a_state, cfg, **kw)
    syn_i = Synthesizer(a_params, a_state, cfg, pcm16=True, **kw)
    wf = syn_f.tts(["hello", "cat"])
    wi = syn_i.tts(["hello", "cat"])
    for f, i in zip(wf, wi):
        assert i.dtype == np.int16
        # trim bounds may differ by at most one trim hop at the edges
        # (quantization perturbs frame RMS at the dB threshold); on this
        # deterministic input they should be identical
        assert abs(len(i) - len(f)) <= P.trim_hop_length, (len(i), len(f))
        n = min(len(i), len(f))
        q = np.round(np.clip(f[:n], -1, 1) * 32767.0)
        assert np.max(np.abs(q - i[:n].astype(np.float64))) <= 1.0


def test_trim_silence_i16_matches_float_bounds():
    rng = np.random.default_rng(3)
    w = np.concatenate([np.zeros(3000, np.float32),
                        rng.normal(0, .4, 20000).astype(np.float32),
                        np.zeros(6000, np.float32)])
    w = np.clip(w, -1, 1)
    i = np.round(w * 32767).astype(np.int16)
    from unast_tpu import native
    _, bf = native.trim_silence(w)
    ti, bi = native.trim_silence_i16(i)
    assert bf == bi
    np.testing.assert_array_equal(ti, i[bi[0]:bi[1]])


def test_hifigan_forward_shapes_and_bounds():
    p = G.hifigan_init(jax.random.PRNGKey(0), base=32)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 80))
    wav = G.hifigan_forward(p, mel)
    assert wav.shape == (2, 8 * P.hop_length)
    w = np.asarray(wav)
    assert np.isfinite(w).all()
    assert np.abs(w).max() <= 1.0


def test_generator_dispatch_and_receptive_field():
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 80))
    pm = G.melgan_init(jax.random.PRNGKey(0), base=32)
    ph = G.hifigan_init(jax.random.PRNGKey(0), base=32)
    np.testing.assert_array_equal(np.asarray(G.generator_forward(pm, mel)),
                                  np.asarray(G.melgan_forward(pm, mel)))
    np.testing.assert_array_equal(np.asarray(G.generator_forward(ph, mel)),
                                  np.asarray(G.hifigan_forward(ph, mel)))
    assert G.receptive_field(pm) == 24
    assert G.receptive_field(ph) == 48


def test_hifigan_vocoder_step_learns():
    from unast_tpu.train.melgan import init_voc_state

    class A:
        lr = 5e-4
        melgan_base = 32
        melgan_gen = "hifigan"

    from unast_tpu.data.dataset import SyntheticSpeechDataset
    ds = SyntheticSpeechDataset(size=1, seed=0)
    vs = init_voc_state(jax.random.PRNGKey(0), A())
    assert "mrf" in vs.params
    step = jax.jit(make_vocoder_step(A()), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    losses = []
    for _ in range(30):
        mel, wav = crop_batch(ds, rng, 4, 16, P.hop_length)
        vs, m = step(vs, jnp.asarray(mel), jnp.asarray(wav))
        losses.append(float(m["voc/stft"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_hifigan_streaming_chunked_equals_full():
    """The streaming/chunked exactness contract holds for the MRF
    generator with its wider derived receptive field."""
    from unast_tpu.infer.streaming import MelganStreamer
    p = G.hifigan_init(jax.random.PRNGKey(0), base=32)
    mel = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (137, 80)),
                     np.float32)
    t_pad = -(-137 // 32) * 32
    padded = np.zeros((t_pad, 80), np.float32)
    padded[:137] = mel
    full = np.asarray(G.hifigan_forward(p, jnp.asarray(padded)[None])[0]
                      )[: 137 * P.hop_length]
    s = MelganStreamer(p, P.hop_length, chunk=32)  # ctx derived from tree
    assert s.ctx == 48
    got = np.concatenate(list(s.stream(mel)))
    assert got.shape == full.shape
    np.testing.assert_allclose(got, full, rtol=2e-5, atol=2e-5)


def test_hifigan_adversarial_step_trains():
    from unast_tpu.train.melgan import (AdvTrainState, init_adv_state,
                                        init_voc_state,
                                        make_adversarial_step)

    class A:
        lr = 1e-4
        melgan_base = 32
        melgan_gen = "hifigan"
        melgan_disc = "mpd"

    from unast_tpu.data.dataset import SyntheticSpeechDataset
    ds = SyntheticSpeechDataset(size=1, seed=0)
    vs = init_voc_state(jax.random.PRNGKey(0), A())
    ats = init_adv_state(jax.random.PRNGKey(1), vs, A())
    step = jax.jit(make_adversarial_step(A()), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    g0 = jax.tree_util.tree_leaves(ats.gen)[0].copy()
    d0 = jax.tree_util.tree_leaves(ats.disc)[0].copy()
    for _ in range(2):
        mel, wav = crop_batch(ds, rng, 2, 16, P.hop_length)
        ats, m = step(ats, jnp.asarray(mel), jnp.asarray(wav))
    assert np.isfinite(float(m["voc/stft"]))
    assert not np.array_equal(g0, jax.tree_util.tree_leaves(ats.gen)[0])
    assert not np.array_equal(d0, jax.tree_util.tree_leaves(ats.disc)[0])
