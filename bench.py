"""Benchmark harness. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md north star #1): wav->mel preprocessing
throughput of the jitted TPU pipeline vs the measured single-thread CPU
reference path (the reference publishes no numbers, so the baseline is
measured in-process from the numpy implementation of its librosa algorithm,
unast_tpu/audio/ref_dsp.py). Target: >= 10x.

Run `python bench.py --all` for the full suite across the five BASELINE.json
configs (wav->mel, Griffin-Lim, TTS/ASR greedy inference, training step).
"""

import argparse
import json
import sys
import time

import numpy as np


def _time(fn, iters=5, warmup=2):
    """Median wall time of fn(). fn must force completion by FETCHING a
    scalar from the device output (float(x[0,...])): on the axon TPU tunnel
    block_until_ready does not reliably block, and fetching via a NEW op
    (e.g. .sum() outside jit) triggers a per-op compile — so kernels under
    test should return a small array whose indexing is compiled during
    warmup."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_wav_to_mel(n_clips=256, clip_s=10.0):
    """Throughput of wav->mel on device (batched via vmap over clips) vs the
    reference CPU path, in clips/s of `clip_s`-second audio.

    Baseline stability (VERDICT r1 #8): the CPU reference is measured on ONE
    fixed seeded clip, >=5 runs, median; the JSON carries the baseline
    median and IQR so vs_baseline is reproducible across rounds."""
    import jax
    import jax.numpy as jnp
    from unast_tpu.audio import dsp, ref_dsp
    from unast_tpu.audio.params import DEFAULT as P

    rng = np.random.default_rng(0)
    n = int(clip_s * P.sr)
    clips = rng.standard_normal((n_clips, n)).astype(np.float32) * 0.1

    # --- measured CPU baseline: fixed clip, median of >= 5 runs ---
    base_times = []
    for _ in range(5):
        t0 = time.perf_counter()
        ref_dsp.wav_to_mel_mag(clips[0], P, trim=False)
        base_times.append(time.perf_counter() - t0)
    cpu_per_clip = float(np.median(base_times))
    base_iqr = float(np.percentile(base_times, 75)
                     - np.percentile(base_times, 25))
    baseline_cps = 1.0 / cpu_per_clip

    # --- jitted TPU path: batched framing->rfft->mel over all clips ---
    half = P.n_fft // 2

    @jax.jit
    def batched(x):
        def one(y):
            y = dsp.preemphasis(y, P.preemphasis)
            y = jnp.pad(y, half, mode="reflect")
            mel, mag = dsp._wav_to_mel_mag_core(y, P)
            return mel
        return jax.vmap(one)(x)

    xs = jnp.asarray(clips)
    dt = _time(lambda: float(batched(xs)[0, 0, 0]))
    tpu_cps = n_clips / dt
    return {"metric": "wav_to_mel_throughput", "value": round(tpu_cps, 2),
            "unit": f"clips/s ({clip_s:.0f}s audio)",
            "vs_baseline": round(tpu_cps / baseline_cps, 2),
            "baseline_clips_per_s": round(baseline_cps, 2),
            "baseline_iqr_s": round(base_iqr, 5)}


def bench_griffin_lim(frames=512):
    import jax
    import jax.numpy as jnp
    from unast_tpu.audio import dsp, ref_dsp
    from unast_tpu.audio.params import DEFAULT as P

    rng = np.random.default_rng(0)
    mag = (rng.random((frames, P.n_fft // 2 + 1)).astype(np.float32)) * 0.1

    t0 = time.perf_counter()
    ref_dsp.griffin_lim(mag.T.astype(np.float64), P.replace(n_iter=4))
    cpu_per_iter = (time.perf_counter() - t0) / 4

    gl = jax.jit(lambda m: dsp.griffin_lim(m, P))
    mag_j = jnp.asarray(mag)
    dt = _time(lambda: float(gl(mag_j)[0]), iters=3, warmup=2)
    audio_s = frames * P.hop_length / P.sr
    rtf = dt / audio_s
    return {"metric": "griffin_lim_rtf", "value": round(rtf, 4),
            "unit": "x realtime (60 iters)",
            "vs_baseline": round((cpu_per_iter * P.n_iter) / dt, 2)}


def bench_tts_infer():
    """Greedy text->mel with KV cache; reports RTF of generated audio.
    Baseline ratio proxies the reference's no-cache full-prefix re-decode
    cost model (sum_t t / T ~ T/2 decoder re-runs)."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    cfg = ModelConfig()  # full-size: d=256, 4 layers, 815-frame cap
    params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
    # Force the stop head to never fire so the decode runs the FULL 815
    # steps (an untrained stop head would fire immediately and make the
    # measurement a 2-step no-op).
    params["speech_m"]["postnet"]["stop_proj"]["b"] = (
        params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)
    b, tt = 1, 64
    text = jnp.ones((b, tt), jnp.int32)
    text_len = jnp.full((b,), tt, jnp.int32)

    @jax.jit
    def infer(params, state, text, text_len):
        out, _ = U.tts(params, state, nn.Ctx.eval(), cfg, text, text_len,
                       None, None, infer=True)
        return out[1], out[3]

    dt = _time(lambda: float(infer(params, state, text, text_len)[0][0, 0, 0]),
               iters=3, warmup=2)
    audio_s = cfg.max_mel_len * P.hop_length / P.sr  # worst case full cap
    rtf = dt / audio_s
    # vs_baseline: ratio to the BASELINE.json north-star target (RTF 0.05);
    # the reference's own RTF is not measurable without torch-side timing.
    return {"metric": "tts_greedy_rtf", "value": round(rtf, 4),
            "unit": "x realtime (815-frame cap)",
            "vs_baseline": round(0.05 / max(rtf, 1e-9), 2)}


def bench_serving(n_batches=4, max_batch=8):
    """End-to-end serving throughput through the Synthesizer API at the
    flagship scale: batched text requests -> phonemize -> bucket-pad ->
    KV-cached greedy TTS -> stop-length-trimmed mels. Reports utterances/s
    and the synthesized-audio RTF of the whole serving path (host text
    frontend + padding included, Griffin-Lim excluded — that is
    bench_griffin_lim). Stop head forced silent so every decode runs the
    full 815 frames (worst case)."""
    import time as _time_mod
    import jax
    import numpy as np
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    cfg = ModelConfig()
    params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
    params["speech_m"]["postnet"]["stop_proj"]["b"] = (
        params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)
    syn = Synthesizer(params, state, cfg, text_buckets=(64,),
                      mel_buckets=(816,), max_batch=max_batch)
    texts = ["the quick brown fox jumps over the lazy dog"] * max_batch
    syn.tts_mels(texts)  # warm the bucket
    t0 = _time_mod.perf_counter()
    tot = 0
    for _ in range(n_batches):
        mels = syn.tts_mels(texts)
        tot += len(mels)
    np.asarray(mels[-1])
    dt = _time_mod.perf_counter() - t0
    utt_s = tot / dt
    audio_s = tot * cfg.max_mel_len * P.hop_length / P.sr
    rtf = dt / audio_s
    return {"metric": "serving_tts_throughput", "value": round(utt_s, 2),
            "unit": f"utterances/s (batch {max_batch}, full 815-frame "
                    f"decode; serving RTF {rtf:.4f})",
            "vs_baseline": round(0.05 / max(rtf, 1e-9), 2)}


def bench_serve_nar(n_batches=4, max_batch=32, pcm16=True):
    """Full ONE-PASS production serving path: batched text requests ->
    phonemize -> FastSpeech NAR mel (Synthesizer(nar_pv=...)) -> MelGAN
    neural vocoder -> waveforms. No autoregressive loop and no Griffin-Lim
    anywhere — the whole text->wav pipeline is two conv/attention forward
    passes. Worst case: duration bias forced high so every utterance
    regulates to the full 815-frame cap. Compare bench_serving (AR decode,
    mel only) and BASELINE's RTF < 0.05 target."""
    import time as _time_mod
    import jax
    import numpy as np
    from unast_tpu.infer.serve import Synthesizer
    from unast_tpu.models import fastspeech as F
    from unast_tpu.models import melgan as G
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    cfg = ModelConfig()
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    n_params, n_state = F.fastspeech_init(jax.random.PRNGKey(1), cfg)
    # worst case: saturate predicted durations -> full 815-frame cap
    n_params["dur"]["fc"]["b"] = n_params["dur"]["fc"]["b"] + 10.0
    mg = G.melgan_init(jax.random.PRNGKey(2))
    syn = Synthesizer(a_params, a_state, cfg, text_buckets=(64,),
                      mel_buckets=(816,), max_batch=max_batch,
                      nar_pv=(n_params, n_state), melgan_params=mg,
                      pcm16=pcm16)
    texts = ["the quick brown fox jumps over the lazy dog"] * max_batch
    syn.tts(texts)  # warm both programs
    t0 = _time_mod.perf_counter()
    tot = 0
    for _ in range(n_batches):
        wavs = syn.tts(texts)
        tot += len(wavs)
    np.asarray(wavs[-1])
    dt = _time_mod.perf_counter() - t0
    utt_s = tot / dt
    audio_s = tot * cfg.max_mel_len * P.hop_length / P.sr
    rtf = dt / audio_s
    fmt = "PCM16" if pcm16 else "f32"
    return {"metric": "serving_nar_text_to_wav_throughput",
            "value": round(utt_s, 2),
            "unit": f"utterances/s (batch {max_batch}, full 815-frame NAR "
                    f"mel + neural vocoder, {fmt} out; "
                    f"serving RTF {rtf:.5f})",
            "vs_baseline": round(0.05 / max(rtf, 1e-9), 2)}


def bench_ctc(b=1):
    """One-pass CTC ASR (models/ctc.py) vs the AR KV-cached greedy text
    decode at the same flagship scale over a FULL 815-frame utterance.
    Also reports a batch-32 throughput (the batch-1 number is tunnel-
    latency-bound)."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models import ctc as C
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    cfg = ModelConfig()
    mel = jax.random.uniform(jax.random.PRNGKey(0),
                             (b, cfg.max_mel_len + 1, 80))
    mel_len = jnp.full((b,), cfg.max_mel_len + 1, jnp.int32)

    c_params, c_state = C.ctc_asr_init(jax.random.PRNGKey(1), cfg)

    @jax.jit
    def ctc(params, state, mel, mel_len):
        (ids, lens), _ = C.ctc_asr_infer(params, state, nn.Ctx.eval(),
                                         cfg, mel, mel_len)
        return ids, lens

    dt_ctc = _time(lambda: int(ctc(c_params, c_state, mel, mel_len)
                               [0][0, 0]), iters=5, warmup=2)

    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def ar(params, state, mel, mel_len):
        (ids, lens), _ = U.asr(params, state, nn.Ctx.eval(), cfg,
                               None, None, mel, mel_len, infer=True)
        return ids

    dt_ar = _time(lambda: int(ar(a_params, a_state, mel, mel_len)[0, 0]),
                  iters=3, warmup=2)

    bb = 32
    mel_b = jax.random.uniform(jax.random.PRNGKey(2),
                               (bb, cfg.max_mel_len + 1, 80))
    len_b = jnp.full((bb,), cfg.max_mel_len + 1, jnp.int32)
    dt_b = _time(lambda: int(ctc(c_params, c_state, mel_b, len_b)[0][0, 0]),
                 iters=5, warmup=2)

    audio_s = cfg.max_mel_len * P.hop_length / P.sr
    rtf = dt_ctc / audio_s
    return {"metric": "ctc_asr_rtf", "value": round(rtf, 5),
            "unit": f"x realtime (815-frame one-pass; AR greedy = "
                    f"{dt_ar / audio_s:.4f}; batch-{bb} = "
                    f"{dt_b / (bb * audio_s):.6f} RTF, {bb / dt_b:.0f} "
                    f"utt/s)",
            "vs_baseline": round(dt_ar / dt_ctc, 2),
            "ctc_s": round(dt_ctc, 4), "ar_s": round(dt_ar, 4),
            "ctc_batch32_s": round(dt_b, 4)}


def bench_vocoder(batch=16, frames=816):
    """CBHG vocoder (mel->magnitude, src/train_vocoder.py scale: conv bank
    K16 + highway + bidirectional GRU) inference RTF on device. The GRU is
    a lax.scan over time — sequential per step but batch-parallel, so the
    batch dim is what fills the chip."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    cfg = ModelConfig()
    params, vstate = U.vocoder_init(jax.random.PRNGKey(0), cfg, P.n_fft)
    mel = jax.random.uniform(jax.random.PRNGKey(1),
                             (batch, frames, cfg.num_mels), jnp.float32)

    @jax.jit
    def run(mel):
        mag, _ = U.vocoder(params, vstate, nn.Ctx.eval(), mel)
        return mag

    dt = _time(lambda: float(run(mel)[0, 0, 0]), iters=3, warmup=2)
    audio_s = batch * frames * P.hop_length / P.sr
    rtf = dt / audio_s
    return {"metric": "vocoder_rtf", "value": round(rtf, 5),
            "unit": f"x realtime (batch {batch}, {frames} frames)",
            "vs_baseline": round(0.05 / max(rtf, 1e-9), 2)}


def bench_asr_infer():
    """Greedy mel->text decode (BASELINE.json config #4): full 300-step
    KV-cached text decode over an 815-frame utterance encoding."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig, EOS_IDX
    from unast_tpu.audio.params import DEFAULT as P

    cfg = ModelConfig()
    params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
    # Suppress EOS so the decode runs the full 300 steps.
    params["text_m"]["postnet"]["fc"]["b"] = (
        params["text_m"]["postnet"]["fc"]["b"].at[EOS_IDX].add(-100.0))
    b, tm = 1, 815
    mel = jnp.zeros((b, tm, cfg.num_mels), jnp.float32)
    mel_len = jnp.full((b,), tm, jnp.int32)

    @jax.jit
    def infer(params, state, mel, mel_len):
        (ids, stop_lens), _ = U.asr(params, state, nn.Ctx.eval(), cfg,
                                    None, None, mel, mel_len, infer=True)
        return ids, stop_lens

    dt = _time(lambda: int(infer(params, state, mel, mel_len)[0][0, 0]),
               iters=3, warmup=2)
    audio_s = tm * P.hop_length / P.sr
    rtf = dt / audio_s
    return {"metric": "asr_greedy_rtf", "value": round(rtf, 4),
            "unit": "x realtime (300-token cap)",
            "vs_baseline": round(0.05 / max(rtf, 1e-9), 2)}


def bench_train_step():
    import jax
    import jax.numpy as jnp
    from unast_tpu.train.config import parse_with_config, model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset

    # Representative but tunnel-compilable shapes: the full 816/304 step
    # with in-graph back-translation compiles for >35 min through the axon
    # tunnel; 256-frame mels cover ~3.2 s utterances with the same program
    # structure (all four objectives + discriminator, grads, while_loops).
    args = parse_with_config([
        "--train_batch_size", "4", "--data_mel_len", "256",
        "--data_text_len", "128", "--max_mel_len", "256",
        "--max_text_len", "128", "--cm_infer_mel_len", "32",
        "--cm_infer_text_len", "16", "--ae_steps", "4", "--cm_steps", "8",
        "--sp_steps", "4", "--d_steps", "4", "--use_discriminator", "true"])
    cfg = model_config_from_args(args)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    ds = SyntheticSpeechDataset(size=8, seed=0)
    bg = BatchGetter(args, ds, ds, ds)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(args, True))
    step = jax.jit(make_train_step(cfg, args))
    ts, m = step(ts, jax.random.PRNGKey(1), batches)
    float(m['grad_norm'])
    dt = _time(lambda: float(step(ts, jax.random.PRNGKey(2), batches)[1]['grad_norm']),
               iters=2, warmup=0)
    return {"metric": "train_step_time", "value": round(dt, 3),
            "unit": "s per 16-microbatch outer step", "vs_baseline": 1.0}


def _peak_flops(dtype: str = "bfloat16") -> float:
    """Per-chip peak FLOP/s by device kind (public spec sheets); bf16."""
    import jax
    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
        "v5p": 459e12, "v4": 275e12, "v6e": 918e12, "trillium": 918e12,
        "v3": 123e12, "v2": 45e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12  # assume v5e (BASELINE.md target hardware)


def bench_attention(iters=32, T=816):
    """Flash (Pallas) vs XLA attention at the flagship shape
    (B4, H4, T, D64), `iters` CHAINED calls inside one jit so the
    per-call time resolves above the ~27 ms tunnel latency floor
    (VERDICT r1 #6). vs_baseline = XLA time / flash time. Pass a larger T
    (e.g. 4096) to see the long-context regime where the Pallas kernel
    wins (BENCHMARKS.md)."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.ops import flash_attention
    from unast_tpu.models.transformer import attention_core, padding_bias

    B, H, D = 4, 4, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, T, H, D), jnp.bfloat16)
    lens = jnp.full((B,), T, jnp.int32)
    pad = jnp.zeros((B, T), bool)
    bias = padding_bias(pad)
    ectx = nn.Ctx.eval()

    def chain(fn):
        @jax.jit
        def run(q, k, v):
            def body(x, _):
                return fn(x, k, v), None
            out, _ = jax.lax.scan(body, q, None, length=iters)
            return out
        return run

    flash_run = chain(lambda x, k, v: flash_attention(x, k, v, lens))
    xla_run = chain(lambda x, k, v: attention_core(x, k, v, bias, ectx, 0.0))

    t_flash = _time(lambda: float(flash_run(q, k, v)[0, 0, 0, 0]), iters=5)
    t_xla = _time(lambda: float(xla_run(q, k, v)[0, 0, 0, 0]), iters=5)
    us_flash = t_flash / iters * 1e6
    us_xla = t_xla / iters * 1e6
    return {"metric": "flash_attention_us_per_call",
            "value": round(us_flash, 1),
            "unit": f"us (B{B} H{H} T{T} D{D}, xla={us_xla:.1f}us)",
            "vs_baseline": round(us_xla / us_flash, 3),
            "xla_us_per_call": round(us_xla, 1)}


def bench_train_mfu(batch_sizes=(32, 128)):
    """MFU + frames/s of the supervised (tts+asr fwd+bwd) train step at the
    flagship config (d=256, 4L, 4H, ffn1024 — src/configs/transformer_trans
    .json scale), 256-frame mels, batch swept to fill the chip (VERDICT r1
    #3). The supervised step is the static MXU-dominant graph, so XLA's
    cost_analysis FLOP count is exact (the cm decode loops are
    latency-bound, not FLOP-bound, and are excluded)."""
    import jax
    import jax.numpy as jnp
    from unast_tpu.train.config import parse_with_config, model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset

    peak = _peak_flops()
    best = None
    for bs, fast_prng in [(b, False) for b in batch_sizes] + [
            (batch_sizes[-1], True)]:
        # fast_prng: hardware RBG PRNG for dropout/noise randomness
        # (--fast_prng in the trainer); threefry mask generation is a major
        # train-mode cost (see BENCHMARKS.md)
        jax.config.update("jax_default_prng_impl",
                          "rbg" if fast_prng else "threefry2x32")
        args = parse_with_config([
            "--train_batch_size", str(bs), "--data_mel_len", "256",
            "--data_text_len", "128", "--max_mel_len", "256",
            "--max_text_len", "128", "--ae_steps", "0", "--cm_steps", "0",
            "--sp_steps", "1", "--d_steps", "0",
            "--use_discriminator", "false",
            "--compute_dtype", "bfloat16"])
        cfg = model_config_from_args(args)
        ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
        ds = SyntheticSpeechDataset(size=8, seed=0)
        bg = BatchGetter(args, ds, ds, ds)
        batches = {"sp": jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(args, False))["sp"]}
        step = jax.jit(make_train_step(cfg, args))  # no donate: ts reused
        flops = None
        try:
            compiled = step.lower(ts, jax.random.PRNGKey(1), batches).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception as e:
            print(f"[mfu] cost_analysis unavailable ({e!r}); "
                  "falling back to analytic", file=sys.stderr)
        if flops is None:
            # analytic: 3x (fwd+bwd) x 2 x params-in-matmuls x tokens,
            # two decoders + two encoders over (mel 256 + text 128) tokens
            from unast_tpu.models import unast as U
            n_par = U.num_params(ts.params)
            flops = 3 * 2 * n_par * bs * (256 + 128)
        ts, m = step(ts, jax.random.PRNGKey(1), batches)
        float(m["grad_norm"])
        dt = _time(lambda: float(
            step(ts, jax.random.PRNGKey(2), batches)[1]["grad_norm"]),
            iters=3, warmup=1)
        mfu = flops / dt / peak
        frames_s = bs * 256 / dt
        res = {"metric": "train_mfu", "value": round(mfu, 4),
               "unit": f"MFU (bs={bs}{', fast_prng' if fast_prng else ''}, "
                       f"{frames_s:,.0f} mel frames/s, "
                       f"{flops / dt / 1e12:.2f} TFLOP/s of "
                       f"{peak / 1e12:.0f} peak)",
               "vs_baseline": round(mfu, 4),
               "batch_size": bs, "fast_prng": fast_prng,
               "frames_per_s": round(frames_s, 1),
               "tflops_per_s": round(flops / dt / 1e12, 2),
               "step_s": round(dt, 4)}
        print(json.dumps(res), file=sys.stderr)
        if best is None or res["value"] > best["value"]:
            best = res
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    return best


def bench_moe(batch_size=128, experts=4):
    """MoE supervised train step at flagship scale vs the dense FFN:
    step time + MFU for dense / grouped-dispatch / ragged (dropless)
    paths. Iso-FLOPs per token at top-1 (each token still runs one
    ffn_dim-wide expert), ~E x the FFN params — the interesting number is
    the routing overhead each path pays on one chip."""
    import jax
    import jax.numpy as jnp
    from unast_tpu.train.config import parse_with_config, model_config_from_args
    from unast_tpu.train.steps import init_train_state, make_train_step
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.dataset import SyntheticSpeechDataset

    peak = _peak_flops()
    results = {}
    for name, extra in (
            ("dense", []),
            ("dispatch", ["--moe_experts", str(experts),
                          "--moe_impl", "dispatch"]),
            ("ragged", ["--moe_experts", str(experts),
                        "--moe_impl", "ragged"])):
        args = parse_with_config([
            "--train_batch_size", str(batch_size), "--data_mel_len", "256",
            "--data_text_len", "128", "--max_mel_len", "256",
            "--max_text_len", "128", "--ae_steps", "0", "--cm_steps", "0",
            "--sp_steps", "1", "--d_steps", "0",
            "--use_discriminator", "false",
            "--compute_dtype", "bfloat16"] + extra)
        cfg = model_config_from_args(args)
        ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
        ds = SyntheticSpeechDataset(size=8, seed=0)
        bg = BatchGetter(args, ds, ds, ds)
        batches = {"sp": jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(args, False))["sp"]}
        step = jax.jit(make_train_step(cfg, args))
        flops = None
        try:
            compiled = step.lower(ts, jax.random.PRNGKey(1), batches).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        ts, m = step(ts, jax.random.PRNGKey(1), batches)
        float(m["grad_norm"])
        dt = _time(lambda: float(
            step(ts, jax.random.PRNGKey(2), batches)[1]["grad_norm"]),
            iters=3, warmup=1)
        results[name] = {"step_s": round(dt, 4),
                         "frames_per_s": round(batch_size * 256 / dt, 1)}
        if flops:
            results[name]["mfu"] = round(flops / dt / peak, 4)
        print(json.dumps({name: results[name]}), file=sys.stderr)
    overhead = results["ragged"]["step_s"] / results["dense"]["step_s"]
    return {"metric": "moe_step_overhead_vs_dense",
            "value": round(overhead, 3),
            "unit": f"x dense step time (E={experts} top-1 ragged, bs"
                    f"{batch_size}; dispatch="
                    f"{results['dispatch']['step_s']}s, ragged="
                    f"{results['ragged']['step_s']}s, dense="
                    f"{results['dense']['step_s']}s)",
            "vs_baseline": round(1.0 / overhead, 3),
            **{f"{k}_{kk}": vv for k, v in results.items()
               for kk, vv in v.items()}}


def bench_quant(b=1):
    """Weight-streaming ladder for the KV-cached greedy TTS decode (the
    latency-bound serving path): params stored f32 (4 B/weight from HBM
    each of the ~815 steps) vs bf16 (2 B) vs int8 weight-only quantization
    (1 B, nn/quant.py). Activations bf16 throughout. Measured at the
    flagship d=256 scale (per-step matmuls are latency-bound there, so
    quantization is a footprint not a speed lever) AND at d=1024/6L where
    the per-step weight read dominates. vs_baseline = f32/int8 at the
    wide scale."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    out = {}
    for label, widths in (
            ("d256", {}),
            ("d1024", dict(hidden=1024, e_in=1024, t_emb_dim=1024,
                           s_pre_hid=1024, ffn_dim=4096, num_layers=6,
                           nhead=8))):
        cfg = ModelConfig(compute_dtype="bfloat16", **widths)
        params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
        params["speech_m"]["postnet"]["stop_proj"]["b"] = (
            params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)
        text = jnp.ones((b, 64), jnp.int32)
        text_len = jnp.full((b,), 64, jnp.int32)

        def infer_fn(cfg):
            @jax.jit
            def infer(params, state, text, text_len):
                o, _ = U.tts(params, state, nn.Ctx.eval(), cfg, text,
                             text_len, None, None, infer=True)
                return o[1], o[3]
            return infer

        variants = {
            "f32": params,
            "bf16": jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params),
            "int8": nn.quant.quantize_params(params),
        }
        audio_s = cfg.max_mel_len * P.hop_length / P.sr
        times = {}
        for name, pv in variants.items():
            fn = infer_fn(cfg)
            dt = _time(lambda: float(
                fn(pv, state, text, text_len)[0][0, 0, 0]),
                iters=3, warmup=2)
            times[name] = dt
            print(json.dumps({f"{label}/{name}": {
                "decode_s": round(dt, 4),
                "rtf": round(dt / audio_s, 5)}}), file=sys.stderr)
        out[label] = times
    t = out["d1024"]
    return {"metric": "tts_decode_int8_speedup_vs_f32",
            "value": round(t["f32"] / t["int8"], 3),
            "unit": f"x at d=1024/6L (batch {b}, 815-step decode: f32 "
                    f"{t['f32']:.3f}s, bf16 {t['bf16']:.3f}s, int8 "
                    f"{t['int8']:.3f}s; d256 f32 "
                    f"{out['d256']['f32']:.3f}s -> int8 "
                    f"{out['d256']['int8']:.3f}s)",
            "vs_baseline": round(t["f32"] / t["int8"], 3),
            **{f"{lk}_{k}_s": round(v, 4) for lk, tt in out.items()
               for k, v in tt.items()}}


def bench_reduction(b=1, rs=(1, 2, 4)):
    """Decode-step reduction ladder: full-cap greedy TTS decode at
    reduction_factor r in {1, 2, 4} (r frames per autoregressive step ->
    ~r-fold fewer latency-bound while_loop iterations). vs_baseline =
    r=1 time / r=4 time."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    times = {}
    for r in rs:
        cfg = ModelConfig(compute_dtype="bfloat16", reduction_factor=r)
        params, state = U.unast_init(jax.random.PRNGKey(0), cfg)
        params["speech_m"]["postnet"]["stop_proj"]["b"] = (
            params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)
        text = jnp.ones((b, 64), jnp.int32)
        text_len = jnp.full((b,), 64, jnp.int32)

        @jax.jit
        def infer(params, state, text, text_len):
            o, _ = U.tts(params, state, nn.Ctx.eval(), cfg, text,
                         text_len, None, None, infer=True)
            return o[1], o[3]

        dt = _time(lambda: float(infer(params, state, text,
                                       text_len)[0][0, 0, 0]),
                   iters=3, warmup=2)
        times[r] = dt
        audio_s = cfg.max_mel_len * P.hop_length / P.sr
        print(json.dumps({f"r{r}": {"decode_s": round(dt, 4),
                                    "rtf": round(dt / audio_s, 5)}}),
              file=sys.stderr)
    r_hi = max(rs)
    return {"metric": "tts_decode_reduction_speedup",
            "value": round(times[1] / times[r_hi], 3),
            "unit": f"x (r={r_hi} vs r=1, batch {b}, full-cap decode: " +
                    ", ".join(f"r{r}={times[r]:.3f}s" for r in rs) + ")",
            "vs_baseline": round(times[1] / times[r_hi], 3),
            **{f"r{r}_s": round(t, 4) for r, t in times.items()}}


def bench_nar(b=1, tt=64):
    """FastSpeech one-pass NAR text->mel (models/fastspeech.py) vs the AR
    KV-cached greedy decode at the same flagship scale and 815-frame cap.
    The NAR program is static-shape over the full cap, so an untrained
    duration predictor times identically to a trained one."""
    import jax
    import jax.numpy as jnp
    from unast_tpu import nn
    from unast_tpu.models import fastspeech as F
    from unast_tpu.models import unast as U
    from unast_tpu.models.config import ModelConfig
    from unast_tpu.audio.params import DEFAULT as P

    cfg = ModelConfig()  # flagship d=256/4L, 815-frame cap
    text = jnp.ones((b, tt), jnp.int32)
    text_len = jnp.full((b,), tt, jnp.int32)

    params, state = F.fastspeech_init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def nar(params, state, text, text_len):
        (_, post, out_lens, _), _ = F.fastspeech_forward(
            params, state, nn.Ctx.eval(), cfg, text, text_len,
            max_len=cfg.max_mel_len)
        return post, out_lens

    dt_nar = _time(lambda: float(nar(params, state, text, text_len)
                                 [0][0, 0, 0]), iters=5, warmup=2)

    # AR comparison point at identical scale (stop head silenced so the
    # decode runs the full 815 steps — worst case, same as bench_tts_infer).
    a_params, a_state = U.unast_init(jax.random.PRNGKey(0), cfg)
    a_params["speech_m"]["postnet"]["stop_proj"]["b"] = (
        a_params["speech_m"]["postnet"]["stop_proj"]["b"] - 100.0)

    @jax.jit
    def ar(params, state, text, text_len):
        out, _ = U.tts(params, state, nn.Ctx.eval(), cfg, text, text_len,
                       None, None, infer=True)
        return out[1]

    dt_ar = _time(lambda: float(ar(a_params, a_state, text, text_len)
                                [0, 0, 0]), iters=3, warmup=2)

    # batch-1 NAR sits at the ~27 ms tunnel-latency floor; a batched call
    # resolves the actual compute throughput.
    bb = 32
    text_b = jnp.ones((bb, tt), jnp.int32)
    len_b = jnp.full((bb,), tt, jnp.int32)
    dt_b = _time(lambda: float(nar(params, state, text_b, len_b)[0][0, 0, 0]),
                 iters=5, warmup=2)

    audio_s = cfg.max_mel_len * P.hop_length / P.sr
    rtf = dt_nar / audio_s
    return {"metric": "nar_tts_rtf", "value": round(rtf, 5),
            "unit": f"x realtime (815-frame one-pass; AR same scale = "
                    f"{dt_ar / audio_s:.4f}; batch-{bb} NAR = "
                    f"{dt_b / (bb * audio_s):.6f} RTF, "
                    f"{bb / dt_b:.0f} utt/s)",
            "vs_baseline": round(dt_ar / dt_nar, 2),
            "nar_s": round(dt_nar, 4), "ar_s": round(dt_ar, 4),
            "nar_batch32_s": round(dt_b, 4)}


def bench_melgan(batch=16, frames=816):
    """Neural vocoder (models/melgan.py) mel->wav RTF vs the Griffin-Lim
    serving path (mel -> pseudo-inverse mag lift -> 60-iteration GL) at the
    same batch/length — the two mel->wav options in Synthesizer."""
    import jax
    import jax.numpy as jnp
    from unast_tpu.audio import dsp
    from unast_tpu.audio.params import DEFAULT as P
    from unast_tpu.models import melgan as G

    params = G.melgan_init(jax.random.PRNGKey(0))
    mel = jax.random.uniform(jax.random.PRNGKey(1), (batch, frames, 80))

    voc = jax.jit(lambda p, m: G.melgan_forward(p, m))
    lift = jnp.asarray(dsp.mel_to_mag_pseudo_inverse(P))
    gl = jax.jit(lambda l, m: jax.vmap(
        lambda x: dsp._mag_to_wav_core(x, P))(jnp.clip(m @ l, 1e-8, 1.0)))

    dt_nn = _time(lambda: float(voc(params, mel)[0, 0]), iters=5, warmup=2)
    dt_gl = _time(lambda: float(gl(lift, mel)[0, 0]), iters=3, warmup=2)
    audio_s = batch * frames * P.hop_length / P.sr
    rtf = dt_nn / audio_s
    return {"metric": "melgan_vocoder_rtf", "value": round(rtf, 6),
            "unit": f"x realtime (batch {batch} x {frames} frames; "
                    f"griffin-lim path = {dt_gl / audio_s:.6f})",
            "vs_baseline": round(dt_gl / dt_nn, 2),
            "melgan_s": round(dt_nn, 4), "gl_s": round(dt_gl, 4)}


def bench_data(n_items=256, batch=32, iters=50):
    """Host data pipeline: batches/s from the packed-shard native collate
    (data/shard.py, one mmap + one C call per batch) vs the reference-
    style cache layout (one .npy pair per utterance loaded per item —
    src/prepare_data.py:10-46 — then python collate)."""
    import os
    import tempfile
    from unast_tpu.data.batching import BatchIterator
    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.data.shard import PackedShardDataset, write_shard

    ds = SyntheticSpeechDataset(size=n_items, seed=0)
    root = tempfile.mkdtemp()
    for i in range(n_items):
        it = ds[i]
        np.save(os.path.join(root, f"ids-{i}.npy"), it["ids"])
        np.save(os.path.join(root, f"mel-{i}.npy"),
                it["mel"].astype(np.float32))
    path = os.path.join(root, "bench.unsh")
    write_shard((ds[i] for i in range(n_items)), path)
    ps = PackedShardDataset(path)

    class NpyDirDataset:  # the reference's per-utterance cache layout
        def __len__(self):
            return n_items

        def __getitem__(self, i):
            return {"ids": np.load(os.path.join(root, f"ids-{i}.npy")),
                    "mel": np.load(os.path.join(root, f"mel-{i}.npy"))}

    def run(dataset):
        it = BatchIterator(dataset, batch, 304, 816, seed=1)
        it.next_batch()  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            it.next_batch()
        return iters / (time.perf_counter() - t0)

    fast = run(ps)
    slow = run(NpyDirDataset())
    return {"metric": "data_pipeline_batches_per_s", "value": round(fast, 1),
            "unit": f"batches/s (bs{batch}, 304/816 caps; npy-per-item "
                    f"path = {slow:.1f}, native={'yes' if ps._h else 'NO'})",
            "vs_baseline": round(fast / slow, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--which", default="wav_to_mel",
                    choices=["wav_to_mel", "griffin_lim", "tts", "asr",
                             "train", "attention", "mfu", "serve",
                             "vocoder", "moe", "quant", "reduction", "nar",
                             "melgan", "data", "serve_nar", "ctc"])
    args = ap.parse_args()
    if args.all:
        for fn in (bench_wav_to_mel, bench_griffin_lim, bench_tts_infer,
                   bench_asr_infer, bench_serving, bench_vocoder,
                   bench_train_step, bench_attention, bench_train_mfu,
                   bench_nar, bench_ctc, bench_melgan, bench_serve_nar,
                   bench_data):
            print(json.dumps(fn()))
        return
    fn = {"wav_to_mel": bench_wav_to_mel, "griffin_lim": bench_griffin_lim,
          "tts": bench_tts_infer, "asr": bench_asr_infer,
          "train": bench_train_step, "attention": bench_attention,
          "mfu": bench_train_mfu, "serve": bench_serving,
          "vocoder": bench_vocoder, "moe": bench_moe,
          "quant": bench_quant, "reduction": bench_reduction,
          "nar": bench_nar, "melgan": bench_melgan,
          "data": bench_data, "serve_nar": bench_serve_nar,
          "ctc": bench_ctc}[args.which]
    print(json.dumps(fn()))


if __name__ == "__main__":
    main()
