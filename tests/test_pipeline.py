"""End-to-end pipeline tests: evaluation harness, training loop smoke on
synthetic data, checkpoint save/load, vocoder trainer, sharded multi-chip
train step on the 8-virtual-device CPU mesh, and the driver entry points."""

import json
import os
import shutil

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from unast_tpu.train.config import parse_with_config, model_config_from_args


CFG_ARGV = ["--config", "configs/transformer_test.json",
            "--sched_type", "multistep", "--synthetic",
            "--synthetic_size", "8", "--eval_batch_size", "2",
            "--epochs", "1", "--epoch_steps", "1"]


@pytest.fixture(scope="module")
def args():
    a = parse_with_config(CFG_ARGV)
    a.checkpoint_path = "/tmp/unast_tpu_test_ckpt"
    shutil.rmtree(a.checkpoint_path, ignore_errors=True)
    return a


def test_evaluate_harness(args):
    from unast_tpu.train.steps import init_train_state
    from unast_tpu.train.loop import initialize_datasets, _val_batches
    from unast_tpu.infer.evaluate import evaluate

    cfg = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    datasets = initialize_datasets(args)
    batches = _val_batches(args, datasets["val"])
    per, losses = evaluate(ts.params, ts.net_state, cfg, args, batches)
    assert 0.0 <= per  # untrained model: arbitrary but finite PER
    for k in ("t_ae", "s_ae", "tts", "asr", "s_cm", "t_cm", "dis"):
        assert k in losses and np.isfinite(losses[k]).all()

    # test mode: dumps
    out_dir = "/tmp/unast_tpu_test_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    args.out_test_dir = out_dir
    per, losses, d_score = evaluate(ts.params, ts.net_state, cfg, args,
                                    batches, is_test=True)
    assert os.path.exists(os.path.join(out_dir, "text_preds.json"))
    dumped = json.load(open(os.path.join(out_dir, "text_preds.json")))
    assert len(dumped) >= 2
    mels = os.listdir(os.path.join(out_dir, "mels"))
    assert len(mels) >= 2


def test_train_loop_and_checkpoint(args):
    from unast_tpu.train.loop import train
    from unast_tpu.train.checkpoint import load_ckp
    from unast_tpu.train.steps import init_train_state

    ts, best = train(args)
    ckpt = os.path.join(args.checkpoint_path, "model_most_recent.ckpt")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(args.checkpoint_path, "metrics.jsonl"))

    cfg = model_config_from_args(args)
    template = init_train_state(jax.random.PRNGKey(0), cfg, args)
    epoch, best_loaded, ts2, rng = load_ckp(ckpt, template)
    assert epoch == 1
    a = jax.tree_util.tree_leaves(ts.params)[0]
    b = jax.tree_util.tree_leaves(ts2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_vocoder_trainer():
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.infer.vocoder import train_vocoder, make_mags

    args = parse_with_config([
        "--train_batch_size", "2", "--data_mel_len", "64", "--epochs", "2",
        "--lr", "0.001", "--sched_type", "multistep", "--seed", "0",
        "--grad_clip", "1.0"])
    args.hidden_size = 32
    args.n_fft = 2048  # synthetic mags carry the full 1025 freq bins
    args.valid_size = 2
    ds = SyntheticSpeechDataset(size=6, seed=0)
    params, vstate, losses = train_vocoder(args, ds, epochs=2)
    assert len(losses) == 2 and all(np.isfinite(losses))
    # training reduces the sum loss on this tiny problem
    assert losses[-1] < losses[0] * 1.5


def test_griffin_lim_cli(tmp_path):
    from unast_tpu.infer.synthesize import vocode, write_wav
    from unast_tpu.audio.params import AudioParams

    p = AudioParams(n_fft=512, frame_shift=128 / 22050,
                    frame_length=256 / 22050, n_iter=4)
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    rng = np.random.default_rng(0)
    mag = rng.random((40, 257)).astype(np.float32) * 0.3
    np.save(mels_dir / "EX-001.mag.npy", mag)
    list_file = tmp_path / "list.csv"
    list_file.write_text("EX-001|text|text\n")
    out_dir = tmp_path / "wavs"
    vocode(str(list_file), str(mels_dir), str(out_dir), p)
    assert (out_dir / "EX-001.wav").exists()


def test_dryrun_multichip_virtual8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as g
    fn, example_args = g.entry()
    out = jax.jit(fn)(*example_args)
    assert out.shape[-1] == 80


def test_multihost_helpers_single_process():
    from unast_tpu.parallel import make_mesh
    from unast_tpu.parallel.multihost import (HostShardedDataset,
                                              global_batch_from_local)
    from unast_tpu.data.dataset import SyntheticSpeechDataset

    ds = SyntheticSpeechDataset(size=8, seed=0)
    sharded = HostShardedDataset(ds)
    assert len(sharded) == 8  # single process sees everything
    mesh = make_mesh(dp=8, tp=1)
    local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    out = global_batch_from_local(mesh, local)
    assert out["x"].shape == (8, 4)
    np.testing.assert_allclose(np.asarray(out["x"]), local["x"])


def test_synthesize_text_end_to_end():
    """text -> phonemes -> greedy TTS -> mel lift -> Griffin-Lim -> wav,
    one call, no vocoder checkpoint needed."""
    from unast_tpu.models import TINY, unast as U
    from unast_tpu.infer.synthesize import synthesize_text
    from unast_tpu.audio.params import AudioParams

    params, state = U.unast_init(jax.random.PRNGKey(0), TINY)
    # force full-length decode so there is audio to synthesize
    params["speech_m"]["postnet"]["stop_proj"]["b"] = (
        params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)
    p = AudioParams(n_fft=2048, n_iter=2)
    wav = synthesize_text(params, state, TINY, "hello world",
                          audio_params=p)
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()


def test_serving_api():
    from unast_tpu.models import TINY, unast as U
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.audio.params import AudioParams

    params, state = U.unast_init(jax.random.PRNGKey(0), TINY)
    syn = Synthesizer(params, state, TINY,
                      audio_params=AudioParams(n_iter=2),
                      text_buckets=(8, 16), mel_buckets=(16, 24),
                      max_batch=2)
    mels = syn.tts_mels(["hi there", "ok"])
    assert len(mels) == 2
    for m in mels:
        assert m.ndim == 2 and m.shape[1] == TINY.num_mels
    texts = syn.asr([np.sin(np.arange(4000) / 20).astype(np.float32) * 0.4])
    assert len(texts) == 1 and isinstance(texts[0], str)


def test_serving_api_data_parallel():
    """Data-parallel serving: a dp-mesh Synthesizer must produce the same
    mels/transcripts as the single-device one (params replicated, request
    batch sharded over 'dp', odd chunks padded by replicating the last
    request)."""
    from unast_tpu.models import TINY, unast as U
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.parallel.mesh import make_mesh

    params, state = U.unast_init(jax.random.PRNGKey(0), TINY)
    kw = dict(text_buckets=(8, 16), mel_buckets=(16, 24), max_batch=4)
    base = Synthesizer(params, state, TINY, **kw)
    dp = Synthesizer(params, state, TINY, mesh=make_mesh(dp=4), **kw)

    texts = ["hi there", "ok", "go now"]  # 3 -> pads to 4 over dp=4
    ref = base.tts_mels(texts)
    got = dp.tts_mels(texts)
    assert len(got) == 3
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)

    rng = np.random.default_rng(1)
    mels = [rng.normal(size=(t, TINY.num_mels)).astype(np.float32) * 0.1
            for t in (10, 14)]
    ref_ids = base.asr_ids(mels)
    got_ids = dp.asr_ids(mels)
    assert len(got_ids) == 2
    for r, g in zip(ref_ids, got_ids):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_train_loop_sharded_dp_tp():
    """The real training loop over a (4, 2) virtual mesh."""
    a = parse_with_config(CFG_ARGV + ["--dp", "4", "--tp", "2",
                                      "--train_batch_size", "4"])
    a.checkpoint_path = "/tmp/unast_tpu_test_ckpt_sharded"
    shutil.rmtree(a.checkpoint_path, ignore_errors=True)
    from unast_tpu.train.loop import train
    ts, best = train(a)
    assert os.path.exists(os.path.join(a.checkpoint_path, "metrics.jsonl"))


def test_real_data_path_end_to_end(tmp_path):
    """The real-data path (reference src/prepare_data.py:10-46 +
    src/preprocess.py:14-51): wavs on disk -> prepare.py offline mel/mag
    cache -> LJSpeechDataset off the cache -> one jitted train step and one
    eval batch."""
    from unast_tpu.data import prepare
    from unast_tpu.data.dataset import (LJSpeechDataset, synth_audio,
                                        synth_sentence)
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.infer.synthesize import write_wav
    from unast_tpu.infer.evaluate import evaluate
    from unast_tpu.text import raw_text_to_phoneme_ids
    from unast_tpu.train.steps import init_train_state, make_train_step

    # stage a miniature LJSpeech layout: metadata.csv + wavs/
    root = tmp_path / "LJMini"
    (root / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        text = synth_sentence(rng, (2, 3))
        ids = np.asarray(raw_text_to_phoneme_ids(text), np.int32)
        wav = synth_audio(ids, 22050, rng, phoneme_dur_s=0.05)
        fid = f"MINI-{i:03d}"
        write_wav(str(root / "wavs" / f"{fid}.wav"), wav)
        rows.append(f"{fid}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")

    # offline preprocessing CLI (numpy reference DSP path)
    cache = root / "mel_cache"
    prepare.main(["--data_path", str(root), "--cache_dir", str(cache),
                  "--cpu"])
    assert len(list(cache.glob("*.mel.npy"))) == 8
    assert len(list(cache.glob("*.mag.npy"))) == 8

    ds = LJSpeechDataset(str(root / "metadata.csv"), str(cache))
    item = ds[0]
    assert item["mel"].ndim == 2 and item["mel"].shape[1] == 80
    assert item["ids"].dtype == np.int32 and len(item["ids"]) > 2

    # one jitted train step off the cache-backed dataset
    a = parse_with_config(CFG_ARGV + ["--data_mel_len", "128",
                                      "--max_mel_len", "128"])
    cfg = model_config_from_args(a)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, a)
    bg = BatchGetter(a, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(a, use_discriminator=True))
    from unast_tpu.train.steps import make_train_step as mts
    step = jax.jit(mts(cfg, a))
    ts, m = step(ts, jax.random.PRNGKey(1), batches)
    assert np.isfinite(float(m["grad_norm"]))

    # and one eval batch
    from unast_tpu.train.loop import _val_batches
    per, losses = evaluate(ts.params, ts.net_state, cfg, a,
                           _val_batches(a, ds))
    assert np.isfinite(per)


def test_all_configs_parse():
    """Every shipped config parses and yields a valid ModelConfig; covers
    the reference's full 18-file design space incl. rnn_d.json,
    transformer_d_test.json, and the default train.json
    (src/configs/*.json, src/train.json)."""
    import glob
    from unast_tpu.models import unast as U
    names = sorted(glob.glob("configs/*.json"))
    assert len(names) >= 19
    for name in names:
        a = parse_with_config(["--config", name])
        cfg = model_config_from_args(a)
        assert cfg.hidden > 0 and cfg.model_type in ("transformer", "rnn")
    # the three round-2 additions are present
    base = {os.path.basename(n) for n in names}
    assert {"rnn_d.json", "transformer_d_test.json", "train.json"} <= base


def test_reference_splits_shipped():
    """The reference's exact split membership ships in-package
    (src/data/splits/*.csv, 25,600 rows): sizes match, labeled/unlabeled
    partition full_train, and val/test are disjoint from it."""
    from unast_tpu.data.dataset import load_manifest
    from unast_tpu.data.splits import REFERENCE_SPLITS_DIR, SPLIT_SIZES

    rows = {}
    for name, size in SPLIT_SIZES.items():
        path = os.path.join(REFERENCE_SPLITS_DIR, name + ".csv")
        rows[name] = load_manifest(path)
        assert len(rows[name]) == size, (name, len(rows[name]))
    ids = {k: {fid for fid, _ in v} for k, v in rows.items()}
    assert ids["labeled_train"] | ids["unlabeled_train"] == ids["full_train"]
    assert not ids["labeled_train"] & ids["unlabeled_train"]
    assert not ids["val"] & ids["full_train"]
    assert not ids["test"] & ids["full_train"]
    assert not ids["val"] & ids["test"]
    # spot-check exact identity of the first labeled utterance
    assert rows["labeled_train"][0][0] == "LJ011-0287"


def test_train_loop_sp_warmup_and_ga():
    """The supervised warm-start curriculum + guided attention run through
    the real training loop (BENCHMARKS.md round-2 convergence study)."""
    a = parse_with_config(CFG_ARGV + ["--sp_warmup_steps", "2",
                                      "--ga_weight", "0.2"])
    a.checkpoint_path = "/tmp/unast_tpu_test_ckpt_warm"
    shutil.rmtree(a.checkpoint_path, ignore_errors=True)
    from unast_tpu.train.loop import train
    ts, best = train(a)
    assert os.path.exists(os.path.join(a.checkpoint_path, "metrics.jsonl"))


def test_train_resume_from_checkpoint(args):
    """Resume semantics: load_path restores epoch/best and training
    continues from there (reference src/train.py:936-942)."""
    from unast_tpu.train.loop import train
    ckpt = os.path.join(args.checkpoint_path, "model_most_recent.ckpt")
    assert os.path.exists(ckpt), "run after test_train_loop_and_checkpoint"
    a2 = parse_with_config(CFG_ARGV + ["--epochs", "2"])
    a2.checkpoint_path = args.checkpoint_path
    a2.load_path = ckpt
    ts, best = train(a2)  # resumes at epoch 1, runs one more epoch
    meta = json.load(open(ckpt + ".meta.json"))
    assert meta["epoch"] == 2


def test_train_loop_fast_prng():
    """--fast_prng (hardware RBG PRNG for in-step randomness) runs the full
    loop end-to-end and trains. Restores the default impl afterwards."""
    import jax as _jax
    a = parse_with_config(CFG_ARGV + ["--fast_prng", "true"])
    a.checkpoint_path = "/tmp/unast_tpu_test_ckpt_rbg"
    shutil.rmtree(a.checkpoint_path, ignore_errors=True)
    from unast_tpu.train.loop import train
    try:
        ts, best = train(a)
        assert int(ts.step) > 0
    finally:
        _jax.config.update("jax_default_prng_impl", "threefry2x32")


def test_serving_tts_wav_batched_vocode():
    """Synthesizer.tts: batched fixed-bucket vocoding (one GL program per
    (rows, bucket)) returns one silence-trimmed waveform per request."""
    from unast_tpu.models import TINY, unast as U
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.audio.params import AudioParams

    params, state = U.unast_init(jax.random.PRNGKey(0), TINY)
    # force full-length decode so there is audio energy to keep
    params["speech_m"]["postnet"]["stop_proj"]["b"] = (
        params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)
    syn = Synthesizer(params, state, TINY,
                      audio_params=AudioParams(n_iter=2),
                      text_buckets=(8,), mel_buckets=(16, 24), max_batch=2)
    wavs = syn.tts(["hello world", "ok then", "more"])  # 2 chunks: 2 + 1
    assert len(wavs) == 3
    for w in wavs:
        assert w.ndim == 1 and np.isfinite(w).all()


def test_train_loop_auto_resume():
    """--auto_resume picks up model_most_recent.ckpt from checkpoint_path
    without an explicit --load_path (preemption-safe restart)."""
    from unast_tpu.train.loop import train
    a = parse_with_config(CFG_ARGV)
    a.checkpoint_path = "/tmp/unast_tpu_test_ckpt_autoresume"
    shutil.rmtree(a.checkpoint_path, ignore_errors=True)
    ts1, _ = train(a)

    b = parse_with_config(CFG_ARGV + ["--auto_resume", "true",
                                      "--epochs", "2"])
    b.checkpoint_path = a.checkpoint_path
    ts2, _ = train(b)
    # first run did 1 epoch_step; resumed run continues to step 2
    assert int(ts2.step) == int(ts1.step) + 1


def test_sequence_parallel_matches_unsharded():
    """The same tiny train step over a (dp1, tp1, sp2) mesh must produce
    the same metrics as the unsharded step — GSPMD sequence sharding is a
    layout choice, not a semantic one."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.parallel import make_mesh, shard_train_step, batch_shardings
    from unast_tpu.train.steps import init_train_state, make_train_step

    args, cfg = g._tiny_cfg_args()
    args.train_batch_size = 4
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=8, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=True))
    step_fn = make_train_step(cfg, args)

    _, ref_m = jax.jit(step_fn)(ts, jax.random.PRNGKey(1), batches)
    ref = {k: float(v) for k, v in ref_m.items()}

    mesh = make_mesh(1, 1, 2)
    sharded_step, ts_sh = shard_train_step(step_fn, mesh, ts, batches)
    b_sh = jax.device_put(batches, batch_shardings(mesh, batches))
    _, sp_m = sharded_step(ts_sh, jax.random.PRNGKey(1), b_sh)
    for k, v in ref.items():
        np.testing.assert_allclose(float(sp_m[k]), v, rtol=2e-4, atol=2e-4,
                                   err_msg=k)


def test_multihost_two_process_train():
    """REAL multi-process distributed training on CPU: two OS processes,
    one virtual device each, glued by jax.distributed into a 2-device
    global dp mesh — the loop's pod path (per-host dataset shards +
    make_array_from_process_local_data batch assembly) end-to-end."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    worker = os.path.join(os.path.dirname(__file__), "mh_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for pid in (0, 1)]
    try:
        # generous: two JAX processes share this host's single core, so
        # the one compile takes ~8 min here (seconds on a real machine)
        # Wall budget: seconds on a real machine, ~8-10 min on the 1-core
        # CI host when quiet — and the round-4 full-suite run measured
        # 1103 s under concurrent chip-job load (the old 1100 s limit
        # failed exactly there, twice). 2400 s keeps the hang-detector
        # role without flaking on host contention.
        outs = [p.communicate(timeout=2400)[0] for p in procs]
    finally:
        for p in procs:           # never leak workers, even on timeout
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"p{pid} failed:\n{out[-3000:]}"
        assert f"[p{pid}] DONE step=1" in out, out[-3000:]


def test_async_checkpoint_roundtrip():
    """save_ckp(async_save=True) returns after the host snapshot; a second
    save drains the in-flight one, and load_ckp (which also drains)
    restores the exact state (--async_ckpt path)."""
    import __graft_entry__ as g
    from unast_tpu.train.checkpoint import save_ckp, load_ckp, wait_for_saves
    from unast_tpu.train.steps import init_train_state

    targs, tcfg = g._tiny_cfg_args()
    ts = init_train_state(jax.random.PRNGKey(3), tcfg, targs)
    path = "/tmp/unast_tpu_test_ckpt_async"
    shutil.rmtree(path, ignore_errors=True)
    save_ckp(0, 1.5, ts, False, path, rng=jax.random.PRNGKey(9),
             async_save=True)
    save_ckp(1, 1.25, ts, True, path, rng=jax.random.PRNGKey(10),
             async_save=True)
    epoch, best, ts2, _ = load_ckp(
        os.path.join(path, "model_most_recent.ckpt"), ts)
    assert epoch == 2 and abs(best - 1.25) < 1e-9
    a = jax.tree_util.tree_leaves(ts.params)[0]
    b = jax.tree_util.tree_leaves(ts2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert os.path.exists(os.path.join(path, "model_best.ckpt"))
    wait_for_saves()


def test_params_ema_transform_math():
    """params_ema holds EMA of POST-update params in the chain state."""
    import optax
    from unast_tpu.train.optim import find_ema, params_ema

    tx = optax.chain(optax.sgd(0.1), params_ema(0.9))
    params = {"w": jnp.ones((4,))}
    st = tx.init(params)
    np.testing.assert_allclose(np.asarray(find_ema(st)["w"]), 1.0)
    up, st = tx.update({"w": jnp.ones((4,))}, st, params)
    # new param = 1 - 0.1 = 0.9; ema = 0.9*1.0 + 0.1*0.9 = 0.99
    np.testing.assert_allclose(np.asarray(find_ema(st)["w"]), 0.99,
                               rtol=1e-6)


def test_train_loop_ema():
    """--ema_decay: the loop trains, and ema_params(ts) returns a full
    param tree that differs from the live params but matches structure."""
    from unast_tpu.train.loop import train
    from unast_tpu.train.steps import ema_params
    a = parse_with_config(CFG_ARGV + ["--ema_decay", "0.9"])
    a.checkpoint_path = "/tmp/unast_tpu_test_ckpt_ema"
    shutil.rmtree(a.checkpoint_path, ignore_errors=True)
    ts, _ = train(a)
    ep = ema_params(ts)
    assert ep is not None
    assert jax.tree_util.tree_structure(ep) == \
        jax.tree_util.tree_structure(ts.params)
    w_live = np.asarray(ts.params["text_m"]["postnet"]["fc"]["w"])
    w_ema = np.asarray(ep["text_m"]["postnet"]["fc"]["w"])
    assert not np.allclose(w_live, w_ema)
    d_live = np.asarray(
        jax.tree_util.tree_leaves(ts.params["discriminator"])[0])
    d_ema = np.asarray(jax.tree_util.tree_leaves(ep["discriminator"])[0])
    np.testing.assert_array_equal(d_live, d_ema)


def test_prepare_shard_out(tmp_path):
    """prepare.py --shard_out packs the offline cache into one shard whose
    items match the LJSpeechDataset view (mod f16 mel storage)."""
    from unast_tpu.data import prepare
    from unast_tpu.data.dataset import (LJSpeechDataset, synth_audio,
                                        synth_sentence)
    from unast_tpu.data.shard import PackedShardDataset
    from unast_tpu.infer.synthesize import write_wav
    from unast_tpu.text import raw_text_to_phoneme_ids

    root = tmp_path / "LJMini"
    (root / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        text = synth_sentence(rng, (2, 3))
        ids = np.asarray(raw_text_to_phoneme_ids(text), np.int32)
        wav = synth_audio(ids, 22050, rng, phoneme_dur_s=0.05)
        fid = f"MINI-{i:03d}"
        write_wav(str(root / "wavs" / f"{fid}.wav"), wav)
        rows.append(f"{fid}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    cache = root / "mel_cache"
    shard = root / "corpus.unsh"
    prepare.main(["--data_path", str(root), "--cache_dir", str(cache),
                  "--cpu", "--shard_out", str(shard)])
    ps = PackedShardDataset(str(shard))
    ds = LJSpeechDataset(str(root / "metadata.csv"), str(cache))
    assert len(ps) == len(ds) == 4
    for i in range(4):
        np.testing.assert_array_equal(ps[i]["ids"], ds[i]["ids"])
        np.testing.assert_array_equal(
            ps[i]["mel"],
            ds[i]["mel"].astype(np.float16).astype(np.float32))


def test_prepare_f0_cache(tmp_path):
    """prepare.py --f0 caches frame F0 and LJSpeechDataset(include_f0=True)
    serves it aligned with the mel frames."""
    from unast_tpu.data import prepare
    from unast_tpu.data.dataset import (LJSpeechDataset, synth_audio,
                                        synth_sentence)
    from unast_tpu.infer.synthesize import write_wav
    from unast_tpu.text import raw_text_to_phoneme_ids

    root = tmp_path / "LJMini"
    (root / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(2):
        text = synth_sentence(rng, (2, 3))
        ids = np.asarray(raw_text_to_phoneme_ids(text), np.int32)
        wav = synth_audio(ids, 22050, rng)
        fid = f"MINI-{i:03d}"
        write_wav(str(root / "wavs" / f"{fid}.wav"), wav)
        rows.append(f"{fid}|{text}|{text}")
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    cache = root / "mel_cache"
    prepare.main(["--data_path", str(root), "--cache_dir", str(cache),
                  "--cpu", "--f0"])
    ds = LJSpeechDataset(str(root / "metadata.csv"), str(cache),
                         include_f0=True)
    it = ds[0]
    assert "f0" in it and it["f0"].ndim == 1
    assert len(it["f0"]) <= len(it["mel"])
    v = it["f0"][it["f0"] > 0]
    assert len(v) > 5 and 80 < np.median(v) < 600


def test_pp_train_step_matches_unsharded():
    """--pp 2: the FULL 4-objective train step with the encoder/decoder
    stacks GPipe-staged over a (dp2, pp2) mesh must match the unsharded
    sequential step's metrics (layer dropout zeroed: the pipelined stack
    folds dropout keys per (layer, micro-batch) — a documented stream
    deviation; every other rng stream is call-order identical)."""
    import __graft_entry__ as g
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.parallel import (batch_shardings, make_mesh, set_pp_mesh,
                                    shard_train_step)
    from unast_tpu.train.config import model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step

    args, _ = g._tiny_cfg_args()
    args.train_batch_size = 4
    args.e_drop = args.d_drop = 0.0
    # scan_layers for the reference too: both stack styles consume exactly
    # ONE ctx.next_rng() per stack call, keeping every downstream rng
    # stream (noise_fn, prenet dropout) call-order identical; the unrolled
    # path consumes per-op counters instead.
    args.scan_layers = True
    cfg_seq = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg_seq, args)
    ds = SyntheticSpeechDataset(size=8, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, use_discriminator=True))

    _, ref_m = jax.jit(make_train_step(cfg_seq, args))(
        ts, jax.random.PRNGKey(1), batches)
    ref = {k: float(v) for k, v in ref_m.items()}

    args.pp = 2
    cfg_pp = model_config_from_args(args)
    assert cfg_pp.pp == 2
    mesh = make_mesh(2, 1, pp=2)
    try:
        step_fn = make_train_step(cfg_pp, args)
        sharded_step, ts_sh = shard_train_step(step_fn, mesh, ts, batches)
        b_sh = jax.device_put(batches, batch_shardings(mesh, batches))
        _, pp_m = sharded_step(ts_sh, jax.random.PRNGKey(1), b_sh)
        for k, v in ref.items():
            np.testing.assert_allclose(float(pp_m[k]), v, rtol=2e-4,
                                       atol=2e-4, err_msg=k)
    finally:
        set_pp_mesh(None)
