"""Numerical parity tests: JAX DSP vs the numpy golden path."""

import numpy as np
import pytest

import jax.numpy as jnp

from unast_tpu.audio import (
    AudioParams, mel_filterbank, hann_window, hz_to_mel, mel_to_hz,
    stft, istft, frame_signal, overlap_add, preemphasis, deemphasis,
    wav_to_mel_mag, griffin_lim, mag_to_wav, ref_dsp,
)

P = AudioParams()
SMALL = AudioParams(n_fft=512, frame_shift=0.0125, frame_length=0.02)
RNG = np.random.default_rng(0)


def make_tone(seconds=1.0, sr=22050):
    t = np.arange(int(seconds * sr)) / sr
    y = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 931 * t)
        + 0.02 * RNG.standard_normal(len(t))
    )
    return y.astype(np.float32)


class TestFilters:
    def test_mel_scale_round_trip(self):
        f = np.array([0.0, 440.0, 999.0, 1000.0, 4000.0, 11025.0])
        np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)

    def test_filterbank_shape_and_support(self):
        w = mel_filterbank(P.sr, P.n_fft, P.num_mels)
        assert w.shape == (80, 1025)
        assert (w >= 0).all()
        # Every filter has support; peaks strictly increase in frequency.
        peaks = w.argmax(axis=1)
        assert (np.diff(peaks) > 0).all()
        assert w.sum(axis=1).min() > 0

    def test_slaney_normalization(self):
        # Slaney norm: filter areas ~ uniform in the linear region.
        w = mel_filterbank(P.sr, P.n_fft, P.num_mels)
        areas = w.sum(axis=1) * (P.sr / 2 / (P.n_freqs - 1))
        # area of triangle height 2/bw width bw = 1 (approximately, gridded)
        np.testing.assert_allclose(areas[5:70], 1.0, atol=0.1)

    def test_hann_window_periodic_padded(self):
        w = hann_window(P.win_length, P.n_fft)
        assert w.shape == (2048,)
        lpad = (2048 - 1102) // 2
        assert w[lpad - 1] == 0 and w[lpad] == 0  # periodic: first sample 0
        assert abs(w[lpad + 551] - 1.0) < 1e-6    # peak mid-window


class TestFraming:
    def test_frame_signal_matches_gather(self):
        y = RNG.standard_normal(8000).astype(np.float32)
        n_fft, hop = 512, 160
        frames = np.asarray(frame_signal(jnp.asarray(y), n_fft, hop))
        n_frames = 1 + (len(y) - n_fft) // hop
        idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
        np.testing.assert_allclose(frames, y[idx], atol=0)

    def test_overlap_add_matches_scatter(self):
        frames = RNG.standard_normal((37, 512)).astype(np.float32)
        hop = 160
        out_len = 512 + hop * 36
        got = np.asarray(overlap_add(jnp.asarray(frames), hop, out_len))
        want = np.zeros(out_len, dtype=np.float64)
        for t in range(37):
            want[t * hop : t * hop + 512] += frames[t]
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestStftParity:
    def test_stft_matches_numpy(self):
        y = make_tone(0.7)
        got = np.asarray(stft(jnp.asarray(y), P)).T  # -> (F, T)
        want = ref_dsp.stft(y.astype(np.float64), P)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-4)

    def test_istft_round_trip(self):
        y = make_tone(0.6)
        spec = stft(jnp.asarray(y), P)
        back = np.asarray(istft(spec, P))
        n = min(len(back), len(y))
        # Interior samples reconstruct (edges lose window coverage).
        np.testing.assert_allclose(back[2048:n - 2048], y[2048:n - 2048],
                                   atol=1e-3)

    def test_istft_matches_numpy(self):
        y = make_tone(0.5)
        spec_np = ref_dsp.stft(y.astype(np.float64), P)
        got = np.asarray(istft(jnp.asarray(spec_np.T), P))
        want = ref_dsp.istft(spec_np, P)
        n = min(len(got), len(want))
        np.testing.assert_allclose(got[:n], want[:n], atol=1e-3)


class TestPreemphasis:
    def test_preemphasis_matches(self):
        y = make_tone(0.2)
        got = np.asarray(preemphasis(jnp.asarray(y), 0.97))
        want = ref_dsp.preemphasis(y, 0.97)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_deemphasis_inverts_preemphasis(self):
        y = make_tone(0.2)
        pre = ref_dsp.preemphasis(y, 0.97)
        back = np.asarray(deemphasis(jnp.asarray(pre), 0.97))
        np.testing.assert_allclose(back, y, atol=1e-3)

    def test_deemphasis_matches_iir(self):
        y = RNG.standard_normal(1000).astype(np.float32)
        got = np.asarray(deemphasis(jnp.asarray(y), 0.97))
        want = ref_dsp.deemphasis(y.astype(np.float64), 0.97)
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestWavToMel:
    def test_matches_reference_pipeline(self):
        y = make_tone(1.5)
        mel_j, mag_j, n_frames = wav_to_mel_mag(y, P)
        mel_n, mag_n = ref_dsp.wav_to_mel_mag(y, P)
        assert n_frames == mel_n.shape[0]
        np.testing.assert_allclose(
            np.asarray(mel_j)[:n_frames], mel_n, atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(mag_j)[:n_frames], mag_n, atol=5e-4)

    def test_output_ranges(self):
        y = make_tone(0.8)
        mel, mag, n = wav_to_mel_mag(y, P)
        # 1e-8 clip bound, allowing for its float32 representation
        assert float(jnp.min(mel)) >= 9.9e-9 and float(jnp.max(mel)) <= 1.0
        assert float(jnp.min(mag)) >= 9.9e-9 and float(jnp.max(mag)) <= 1.0

    def test_empty_input(self):
        mel, mag, n = wav_to_mel_mag(np.zeros(0, dtype=np.float32), P)
        assert n == 0

    def test_all_zero_input_survives(self):
        # trim threshold is relative to the signal max, so silence is kept
        # (librosa.effects.trim semantics); outputs must stay finite.
        mel, mag, n = wav_to_mel_mag(np.zeros(10, dtype=np.float32), P)
        assert n == 1
        assert np.isfinite(np.asarray(mel)).all()

    def test_trim_silence(self):
        y = make_tone(0.5)
        padded = np.concatenate([np.zeros(11025, np.float32), y,
                                 np.zeros(11025, np.float32)])
        trimmed, (s, e) = ref_dsp.trim_silence(padded, P)
        assert s > 8000 and e < len(padded) - 8000
        assert len(trimmed) == e - s


class TestGriffinLim:
    def test_griffin_lim_reconstructs_tone(self):
        # A pure (noiseless, deterministic) tone's magnitude should
        # reconstruct with low spectral-convergence error.
        t = np.arange(int(0.5 * 22050)) / 22050
        y = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.3 * np.sin(2 * np.pi * 931 * t)).astype(np.float32)
        spec = np.abs(np.asarray(stft(jnp.asarray(y), SMALL)))
        wav = np.asarray(griffin_lim(jnp.asarray(spec), SMALL))
        spec2 = np.abs(np.asarray(stft(jnp.asarray(wav), SMALL)))[: spec.shape[0]]
        # Spectral convergence: relative L2 between target and result mags.
        # (~0.19 is GL's fixed point at these small-window settings; the
        # numpy reference converges to the same value.)
        err = np.linalg.norm(spec2 - spec) / np.linalg.norm(spec)
        assert err < 0.25

    def test_griffin_lim_matches_numpy_reference(self):
        t = np.arange(int(0.4 * 22050)) / 22050
        y = (0.6 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
        spec = np.abs(np.asarray(stft(jnp.asarray(y), SMALL)))
        wav_j = np.asarray(griffin_lim(jnp.asarray(spec), SMALL))
        wav_n = ref_dsp.griffin_lim(spec.T.astype(np.float64), SMALL)
        n = min(len(wav_j), len(wav_n))
        np.testing.assert_allclose(wav_j[:n], wav_n[:n], atol=2e-3)

    def test_mag_to_wav_runs(self):
        y = make_tone(0.4)
        _, mag, n = wav_to_mel_mag(y, SMALL)
        wav = mag_to_wav(np.asarray(mag)[:n], SMALL)
        assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()


def test_fast_griffin_lim_momentum_converges_faster():
    """Fast GL (gl_momentum=0.99, Perraudin et al.) reaches lower spectral-
    convergence error than plain GL at the same small iteration budget;
    momentum=0 stays the exact reference update."""
    t = np.arange(int(0.5 * 22050)) / 22050
    y = (0.5 * np.sin(2 * np.pi * 220 * t)
         + 0.3 * np.sin(2 * np.pi * 931 * t)).astype(np.float32)
    p8 = SMALL.replace(n_iter=8)
    spec = np.abs(np.asarray(stft(jnp.asarray(y), p8)))

    def sc_err(p):
        wav = np.asarray(griffin_lim(jnp.asarray(spec), p))
        spec2 = np.abs(np.asarray(stft(jnp.asarray(wav), p)))[: spec.shape[0]]
        return np.linalg.norm(spec2 - spec) / np.linalg.norm(spec)

    plain = sc_err(p8)
    fast = sc_err(p8.replace(gl_momentum=0.99))
    assert np.isfinite(fast)
    assert fast < plain * 0.8, (plain, fast)


def test_mcd_properties():
    """MCD (audio/metrics.py): zero on identity, positive and monotonic in
    distortion size, robust to length mismatch (common-frame alignment)."""
    from unast_tpu.audio.metrics import mcd, mel_cepstra
    from unast_tpu.audio.params import DEFAULT as P

    rng = np.random.default_rng(0)
    mel = rng.random((50, 80)).astype(np.float32)
    assert mcd(mel, mel, P) == 0.0
    small = mcd(mel, np.clip(mel + 0.01 * rng.standard_normal(mel.shape),
                             0, 1), P)
    big = mcd(mel, np.clip(mel + 0.1 * rng.standard_normal(mel.shape),
                           0, 1), P)
    assert 0 < small < big
    # common-length alignment (tiny residue: BLAS blocking differs with T)
    assert mcd(mel, mel[:30], P) < 1e-9
    c = mel_cepstra(mel, P)
    assert c.shape == (50, 13) and np.isfinite(c).all()


def test_formant_timbre_mel_separability():
    """timbre='formant' phoneme signatures must stay multiple mel bins
    apart (the round-trip-intelligibility property the harmonic corpus
    lacks: its 12 Hz id spacing is sub-mel-bin and pid%37 collides ids —
    see data/dataset.py::synth_audio)."""
    from unast_tpu.audio import ref_dsp
    from unast_tpu.audio.params import DEFAULT as P
    from unast_tpu.data.dataset import synth_audio

    rng = np.random.default_rng(0)
    tpl = []
    for pid in range(46):
        w = synth_audio(np.asarray([pid] * 8, np.int32), P.sr, rng,
                        phoneme_dur_s=0.08, timbre="formant")
        mel, _ = ref_dsp.wav_to_mel_mag(w, P, trim=False)
        tpl.append(np.asarray(mel[3:-3]).mean(0))
    tpl = np.stack(tpl)
    d = np.sqrt(((tpl[None] - tpl[:, None]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    # no identical ids, and every pair separated by a solid margin
    assert d.min() > 0.5, d.min()
    # nearest-template classification robust to blur + noise
    errs = 0
    for p in range(46):
        noisy = tpl[p] + rng.standard_normal(80) * 0.09
        noisy = np.convolve(noisy, [0.25, 0.5, 0.25], mode="same")
        errs += int(np.argmin(((tpl - noisy) ** 2).sum(1)) != p)
    assert errs == 0, errs


def test_synth_audio_dur_jitter():
    """dur_jitter: per-phoneme lengths follow the intrinsic id factor
    (learnable) times bounded noise, the returned durations tile the
    waveform exactly, and dur_jitter=0 reproduces the historical
    constant-duration corpus bit-exactly."""
    from unast_tpu.data.dataset import _DUR_FACTOR, synth_audio

    ids = np.asarray([3, 17, 30, 5, 44, 9, 3, 3], np.int32)
    base = int(0.05 * 22050)
    wav, durs = synth_audio(ids, 22050, np.random.default_rng(1),
                            phoneme_dur_s=0.05, timbre="formant",
                            dur_jitter=0.2, return_durs=True)
    assert len(durs) == len(ids)
    assert wav.shape[0] == durs.sum()
    # each length within its id's intrinsic factor ± noise
    fac = _DUR_FACTOR[ids]
    assert (durs >= (base * fac * 0.8 - 1)).all()
    assert (durs <= (base * fac * 1.2 + 1)).all()
    # the identity part dominates: repeated id 3 varies by < ±20%,
    # while id 44 vs id 3 differ by their factor ratio
    d3 = durs[ids == 3]
    assert d3.max() / d3.min() < 1.5
    assert durs.std() > 0
    # dur_jitter=0 consumes no extra rng draws: byte-identical to the
    # historical two-arg call
    a = synth_audio(ids, 22050, np.random.default_rng(2),
                    phoneme_dur_s=0.05, timbre="formant")
    b, d0 = synth_audio(ids, 22050, np.random.default_rng(2),
                        phoneme_dur_s=0.05, timbre="formant",
                        dur_jitter=0.0, return_durs=True)
    np.testing.assert_array_equal(a, b)
    assert (d0 == base).all()


def test_wav_to_mel_mag_batch_matches_scalar():
    """The batched offline-preprocessor path (one shared bucket, vmapped
    core) equals the per-clip wav_to_mel_mag over each clip's valid
    frames, across mixed lengths and both trim settings."""
    from unast_tpu.audio import dsp

    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.3
            for n in (5000, 22050, 61003, 9000)]
    for trim in (False, True):
        mel_b, mag_b, nf = dsp.wav_to_mel_mag_batch(wavs, trim=trim)
        mel_b = np.asarray(mel_b)
        mag_b = np.asarray(mag_b)
        for i, y in enumerate(wavs):
            mel, mag, n = dsp.wav_to_mel_mag(y, trim=trim)
            assert nf[i] == n
            np.testing.assert_allclose(mel_b[i, :n], np.asarray(mel[:n]),
                                       atol=2e-6)
            np.testing.assert_allclose(mag_b[i, :n], np.asarray(mag[:n]),
                                       atol=2e-6)


def test_wav_to_mel_mag_batch_pinned_bucket():
    """bucket_s pins ONE canonical program shape: results equal the
    auto-bucket path over valid frames, and clips longer than the pin
    raise (a silent truncation would corrupt the corpus cache)."""
    import pytest

    from unast_tpu.audio import dsp

    rng = np.random.default_rng(1)
    wavs = [rng.standard_normal(n).astype(np.float32) * 0.3
            for n in (5000, 30000, 1)]  # incl. a final-chunk pad stub
    mel_a, _, nf_a = dsp.wav_to_mel_mag_batch(wavs, trim=False)
    mel_p, _, nf_p = dsp.wav_to_mel_mag_batch(wavs, trim=False,
                                              bucket_s=2.0)
    assert np.asarray(mel_p).shape[1] >= np.asarray(mel_a).shape[1]
    np.testing.assert_array_equal(nf_a, nf_p)
    for i in range(len(wavs)):
        n = int(nf_a[i])
        np.testing.assert_allclose(np.asarray(mel_p)[i, :n],
                                   np.asarray(mel_a)[i, :n], atol=2e-6)
    with pytest.raises(AssertionError):
        dsp.wav_to_mel_mag_batch(
            [np.zeros(int(22050 * 2.5), np.float32)], trim=False,
            bucket_s=2.0)
