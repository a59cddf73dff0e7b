"""Packed dataset shards (data/shard.py + native shard reader) — data-
pipeline addition over the reference's per-utterance .npy files
(src/prepare_data.py:10-46)."""

import numpy as np
import pytest

from unast_tpu import native
from unast_tpu.data.batching import BatchIterator, collate
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.data.shard import PackedShardDataset, write_shard


@pytest.fixture(scope="module")
def shard(tmp_path_factory):
    ds = SyntheticSpeechDataset(size=6, seed=0)
    path = str(tmp_path_factory.mktemp("shard") / "corpus.unsh")
    write_shard((ds[i] for i in range(len(ds))), path)
    return ds, PackedShardDataset(path)


def test_roundtrip_items_exact(shard):
    ds, ps = shard
    assert len(ps) == len(ds)
    for i in range(len(ds)):
        a, b = ds[i], ps[i]
        np.testing.assert_array_equal(a["ids"], b["ids"])
        # mel stored f16: equality after the same rounding
        np.testing.assert_array_equal(
            a["mel"].astype(np.float16).astype(np.float32), b["mel"])


def test_lens_match_index(shard):
    ds, ps = shard
    tl, ml = ps.lens(list(range(len(ps))))
    for i in range(len(ds)):
        assert tl[i] == len(ds[i]["ids"])
        assert ml[i] == len(ds[i]["mel"])


def test_collate_matches_python_collate(shard):
    ds, ps = shard
    idx = [3, 0, 5, 5]
    got = ps.collate_batch(idx, text_cap=20, mel_cap=64)
    items = [{"ids": ps[i]["ids"], "mel": ps[i]["mel"]} for i in idx]
    want = collate(items, 20, 64)
    np.testing.assert_array_equal(got["text"], want["text"])
    np.testing.assert_array_equal(got["mel"], want["mel"])
    np.testing.assert_array_equal(got["text_len"], want["text_len"])
    np.testing.assert_array_equal(got["mel_len"], want["mel_len"])


def test_native_collate_matches_numpy_fallback(shard):
    _, ps = shard
    if ps._h is None:
        pytest.skip("native lib unavailable")
    idx = [1, 4, 2]
    got = ps.collate_batch(idx, text_cap=24, mel_cap=48)
    h = ps._h
    try:
        ps._h = None  # force the numpy fallback
        want = ps.collate_batch(idx, text_cap=24, mel_cap=48)
    finally:
        ps._h = h
    for k in ("text", "mel", "text_len", "mel_len"):
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_truncation_clamps_lengths(shard):
    _, ps = shard
    tl, ml = ps.lens([0])
    got = ps.collate_batch([0], text_cap=3, mel_cap=5)
    assert got["text"].shape == (1, 3) and got["mel"].shape == (1, 5, 80)
    assert got["text_len"][0] == min(3, tl[0])
    assert got["mel_len"][0] == min(5, ml[0])


def test_batch_iterator_fast_path(shard):
    ds, ps = shard
    it_fast = BatchIterator(ps, 4, 20, 64, seed=7)
    it_ref = BatchIterator(ds, 4, 20, 64, seed=7)
    a = it_fast.next_batch()
    b = it_ref.next_batch()
    # same seed -> same index order -> identical batches (mod f16)
    np.testing.assert_array_equal(a["text"], b["text"])
    np.testing.assert_array_equal(
        a["mel"], b["mel"].astype(np.float16).astype(np.float32))
    sa = it_fast.next_stacked(2)
    sb = it_ref.next_stacked(2)
    np.testing.assert_array_equal(sa[0], sb[0])
    np.testing.assert_array_equal(
        sa[1], sb[1].astype(np.float16).astype(np.float32))
    np.testing.assert_array_equal(sa[2], sb[2])
    np.testing.assert_array_equal(sa[3], sb[3])


def test_f16_conversion_specials(tmp_path):
    """The C f16->f32 covers normals, subnormals, zeros, and big values."""
    vals = np.array([[0.0, 1.0, -1.0, 0.5004883, 6.1e-5, 5.96e-8,
                      65504.0, -3.14159, 2e-6, 1e-7] * 8], np.float32)
    items = [{"ids": np.array([5], np.int32),
              "mel": np.tile(vals.T, (1, 80))[:10]}]
    path = str(tmp_path / "s.unsh")
    write_shard(items, path)
    ps = PackedShardDataset(path)
    if ps._h is None:
        pytest.skip("native lib unavailable")
    got = ps.collate_batch([0], 1, 10)
    want = np.tile(vals.T, (1, 80))[:10].astype(np.float16
                                                ).astype(np.float32)
    np.testing.assert_array_equal(got["mel"][0], want)


def test_corrupt_shard_fails_at_open(tmp_path):
    """A truncated shard must be rejected by the native reader at OPEN
    (not as an OOB read later); the python side falls back cleanly."""
    ds = SyntheticSpeechDataset(size=2, seed=0)
    path = str(tmp_path / "c.unsh")
    write_shard((ds[i] for i in range(2)), path)
    data = open(path, "rb").read()
    open(path, "wb").write(data[: len(data) // 2])  # truncate payload
    if native.available():
        assert native.shard_open(path) is None
    import pytest as _pytest
    with _pytest.raises(Exception):
        ps = PackedShardDataset(path)
        ps.collate_batch([0, 1], 16, 64)


def test_subset_shard_view(shard):
    """SubsetShard remaps indices (train/held-out split of one shard)
    while preserving item identity, lens, and the collate fast path."""
    from unast_tpu.data.shard import SubsetShard

    ds, ps = shard
    idx = np.array([4, 1, 5])
    sub = SubsetShard(ps, idx)
    assert len(sub) == 3
    for k, orig in enumerate(idx):
        np.testing.assert_array_equal(sub[k]["ids"], ps[int(orig)]["ids"])
        np.testing.assert_array_equal(sub[k]["mel"], ps[int(orig)]["mel"])
    tl, ml = sub.lens([0, 2])
    wtl, wml = ps.lens([4, 5])
    np.testing.assert_array_equal(tl, wtl)
    np.testing.assert_array_equal(ml, wml)
    got = sub.collate_batch([2, 0], text_cap=20, mel_cap=64)
    want = ps.collate_batch([5, 4], text_cap=20, mel_cap=64)
    for key in ("text", "mel", "text_len", "mel_len"):
        np.testing.assert_array_equal(got[key], want[key])


def test_subset_shard_batch_iterator(shard):
    """BatchIterator over a SubsetShard only ever yields subset items."""
    from unast_tpu.data.shard import SubsetShard

    ds, ps = shard
    sub = SubsetShard(ps, [0, 2])
    it = BatchIterator(sub, 2, 20, 64, seed=3)
    allowed = {ps[i]["ids"][:20].astype(np.int32).tobytes() for i in (0, 2)}
    for _ in range(3):
        b = it.next_batch()
        for r, tl in zip(b["text"], b["text_len"]):
            assert r[:tl].astype(np.int32).tobytes() in allowed


# ---- wav shards + window-read crops (vocoder-training fast path) ----

from unast_tpu.data.shard import (MelWavCrops, WavShardDataset,
                                  write_wav_shard)


@pytest.fixture(scope="module")
def wav_pair(tmp_path_factory):
    """Aligned mel + wav shards: wav lengths follow each item's mel frames
    (hop 4 for test speed), with one SHORT wav to exercise padding."""
    rng = np.random.default_rng(0)
    hop = 4
    ds = SyntheticSpeechDataset(size=6, seed=0)
    items = [ds[i] for i in range(len(ds))]
    wavs = []
    for j, it in enumerate(items):
        n = it["mel"].shape[0] * hop - (7 if j == 2 else 0)
        wavs.append((rng.standard_normal(n) * 0.3).astype(np.float32))
    d = tmp_path_factory.mktemp("wavshard")
    mp = str(d / "c.unsh")
    wp = str(d / "c.unwv")
    write_shard(iter(items), mp)
    write_wav_shard(wavs, wp, sr=22050)
    return items, wavs, PackedShardDataset(mp), WavShardDataset(wp), hop


def test_wav_shard_roundtrip_quantization(wav_pair):
    items, wavs, mel_ds, wav_ds, hop = wav_pair
    assert len(wav_ds) == len(wavs) and wav_ds.sr == 22050
    for i, w in enumerate(wavs):
        got = wav_ds[i]
        # float in -> int16 (write_wav quantization) -> /32768 out
        expect = (np.clip(w, -1, 1) * 32767.0).astype(np.int16) / 32768.0
        np.testing.assert_array_equal(got, expect.astype(np.float32))


def test_wav_shard_int16_exact(tmp_path):
    pcm = (np.arange(-5, 6) * 1000).astype(np.int16)
    p = str(tmp_path / "i.unwv")
    write_wav_shard([pcm], p)
    got = WavShardDataset(p)[0]
    np.testing.assert_array_equal(got, pcm.astype(np.float32) / 32768.0)


def test_wav_crop_is_slice_with_padding(wav_pair):
    _, wavs, _, wav_ds, _ = wav_pair
    full = wav_ds[1]
    np.testing.assert_array_equal(wav_ds.crop(1, 3, 9), full[3:12])
    tail = wav_ds.crop(1, len(full) - 4, 10)  # past the end: zero-pad
    np.testing.assert_array_equal(tail[:4], full[-4:])
    assert (tail[4:] == 0).all()


def test_mel_crop_is_slice_with_padding(wav_pair):
    items, _, mel_ds, _, _ = wav_pair
    full = mel_ds[0]["mel"]
    np.testing.assert_array_equal(mel_ds.mel_crop(0, 2, 5), full[2:7])
    f = full.shape[0]
    tail = mel_ds.mel_crop(0, f - 2, 6)
    np.testing.assert_array_equal(tail[:2], full[-2:])
    assert (tail[2:] == 0).all()


def test_crop_batch_fast_path_matches_slow(wav_pair):
    """crop_batch over MelWavCrops (window reads) must equal crop_batch
    over equivalent in-memory items, same seed — incl. the short wav."""
    from unast_tpu.train.melgan import crop_batch

    items, wavs, mel_ds, wav_ds, hop = wav_pair
    view = MelWavCrops(mel_ds, wav_ds)
    slow_items = [{"mel": mel_ds[i]["mel"], "wav": wav_ds[i]}
                  for i in range(len(wavs))]
    f_m, f_w = crop_batch(view, np.random.default_rng(7), 16, 5, hop)
    s_m, s_w = crop_batch(slow_items, np.random.default_rng(7), 16, 5, hop)
    np.testing.assert_array_equal(f_m, s_m)
    np.testing.assert_array_equal(f_w, s_w)


def test_melwav_crops_subset_indices(wav_pair):
    items, wavs, mel_ds, wav_ds, hop = wav_pair
    sub = MelWavCrops(mel_ds, wav_ds, indices=[4, 1])
    assert len(sub) == 2
    np.testing.assert_array_equal(sub[0]["mel"], mel_ds[4]["mel"])
    np.testing.assert_array_equal(sub[1]["wav"], wav_ds[1])
    mf, ns = sub.crop_lens(1)
    assert mf == items[1]["mel"].shape[0] and ns == len(wavs[1])


def test_wav_shard_from_dir_aligns_with_trimmed_mel(tmp_path):
    """prepare.write_wav_shard_from_dir must pack the TRIMMED sample span
    (the span the mel analysis actually covered, wav_to_mel_mag trim=True)
    — real speech files carry leading/trailing silence that would
    otherwise skew every MelWavCrops vocoder crop pair."""
    from unast_tpu.audio import ref_dsp
    from unast_tpu.audio.params import DEFAULT as P
    from unast_tpu.data.prepare import write_wav_shard_from_dir
    from unast_tpu.infer.synthesize import write_wav

    rng = np.random.default_rng(3)
    tone = (0.5 * np.sin(2 * np.pi * 220.0 *
                         np.arange(int(0.5 * P.sr)) / P.sr)
            + 0.01 * rng.standard_normal(int(0.5 * P.sr)))
    sil = np.zeros(int(0.3 * P.sr), np.float32)
    y = np.concatenate([sil, tone.astype(np.float32), sil])
    wdir = tmp_path / "wavs"
    wdir.mkdir()
    write_wav(str(wdir / "a.wav"), y)
    out = str(tmp_path / "a.unwv")
    write_wav_shard_from_dir([("a", "text")], str(wdir), out)
    ds = WavShardDataset(out)

    # the stored float wav equals write_wav's PCM16 payload over the
    # SAME bounds the (float) mel-path trim selects
    pcm = (np.clip(y, -1, 1) * 32767.0).astype(np.int16)
    _, (s, e) = ref_dsp.trim_silence(pcm.astype(np.float32) / 32768.0, P)
    assert s > 0 and e < len(y), "fixture must actually be trimmed"
    np.testing.assert_array_equal(
        ds[0], pcm[s:e].astype(np.float32) / 32768.0)
    # frame t of the trimmed-analysis mel <-> samples [t*hop,(t+1)*hop):
    # run the ACTUAL mel analysis on the raw wav (it trims internally)
    # and tie its frame count to the shard payload's sample count
    mel, _ = ref_dsp.wav_to_mel_mag(y)
    assert mel.shape[0] == 1 + len(ds[0]) // P.hop_length

    # trim=False keeps the raw payload (corpora whose mels skip trim)
    out2 = str(tmp_path / "b.unwv")
    write_wav_shard_from_dir([("a", "text")], str(wdir), out2, trim=False)
    np.testing.assert_array_equal(
        WavShardDataset(out2)[0], pcm.astype(np.float32) / 32768.0)


def test_realism_clip_trim_and_shard_alignment(tmp_path):
    """add_realism clips (silence tails + noise floor + breath) must (a)
    actually engage the silence trim, (b) keep every speech sample inside
    the trimmed span, and (c) ride the wav-shard/mel alignment contract
    end to end (VERDICT r3 item 6)."""
    from unast_tpu.audio import ref_dsp
    from unast_tpu.audio.params import DEFAULT as P
    from unast_tpu.data.dataset import add_realism, synth_audio
    from unast_tpu.data.prepare import write_wav_shard_from_dir
    from unast_tpu.infer.synthesize import write_wav

    rng = np.random.default_rng(7)
    ids = rng.integers(4, 44, size=12).astype(np.int32)
    speech = synth_audio(ids, P.sr, rng, phoneme_dur_s=0.08)
    y = add_realism(speech, rng, P.sr)
    assert len(y) > len(speech) + int(0.4 * P.sr)

    _, (s, e) = ref_dsp.trim_silence(y, P)
    # (a) trim removes a nontrivial leading+trailing span...
    assert s > 0 and e < len(y)
    # ...(b) but not more than the added silence (no speech lost; the
    # trim RMS frames are centered with half-frame reach)
    lead = len(y) - len(speech) - int(
        np.argmax(np.abs(y[-P.sr:]) > 0.01))  # loose bound
    assert s <= len(y) - len(speech) + P.trim_frame_length

    # (c) shard payload == PCM16 over the same trimmed span, and the mel
    # frame count ties to it
    wdir = tmp_path / "wavs"
    wdir.mkdir()
    write_wav(str(wdir / "r.wav"), y)
    out = str(tmp_path / "r.unwv")
    write_wav_shard_from_dir([("r", "x")], str(wdir), out)
    ds = WavShardDataset(out)
    mel, _ = ref_dsp.wav_to_mel_mag(y)
    assert mel.shape[0] == 1 + len(ds[0]) // P.hop_length


def test_realism_oracle_offset_contract():
    """ADVICE r4 (medium): on --realism clips the trim keeps the breath,
    shifting the mel frame origin. add_realism(return_offsets=True) +
    the trim start must reconstruct that shift exactly, so
    corpus_rehearsal's `durs[0] += lead+breath-s0` puts every phoneme
    boundary at its true position in trimmed (mel-origin) coordinates."""
    from unast_tpu.audio import ref_dsp
    from unast_tpu.audio.params import DEFAULT as P
    from unast_tpu.data.dataset import add_realism, synth_audio

    rng = np.random.default_rng(11)
    ids = rng.integers(4, 44, size=10).astype(np.int32)
    speech, durs = synth_audio(ids, P.sr, rng, phoneme_dur_s=0.08,
                               return_durs=True)
    assert int(np.sum(durs)) == len(speech)
    y, (lead_n, breath_n, tail_n) = add_realism(speech, rng, P.sr,
                                                return_offsets=True)
    assert lead_n + breath_n + len(speech) + tail_n == len(y)
    _, (s0, e0) = ref_dsp.trim_silence(y, P)
    # Trim start lands inside the prepended span (no speech trimmed) but
    # keeps a nonzero prefix (the above-gate breath), i.e. the old
    # unshifted sidecar really was early:
    assert 0 < s0 <= lead_n + breath_n
    off = max(0, lead_n + breath_n - s0)
    assert off > 0
    shifted = durs.astype(np.int64).copy()
    shifted[0] += off
    bounds = np.cumsum(shifted)
    # Final boundary == true end of speech in trimmed coordinates; the
    # trim end keeps all of it (noise floor above the gate to speech end)
    speech_end_trimmed = lead_n + breath_n + len(speech) - s0
    assert int(bounds[-1]) == speech_end_trimmed
    assert e0 - s0 >= speech_end_trimmed - P.trim_hop_length
