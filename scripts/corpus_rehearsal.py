"""Reference-scale rehearsal on the REAL LJSpeech transcripts (VERDICT r2
#2): the experiment shape the reference actually runs — 12,500 train
utterances (src/get_dataset.sh:9-11, src/data/splits/full_train.csv) —
flows through the full pipeline end to end:

  A. G2P over ALL 13,100 real transcripts in the in-package split CSVs:
     coverage stats (lexicon hit / rule fallback / unmapped-char rate),
     throughput, memoization footprint.
  B. Shape-matched audio synthesis for full_train (synthetic harmonic
     stacks over the REAL phonemized texts — audio content is synthetic,
     every SHAPE is real), then the offline preprocessor
     (data/prepare.py, device DSP, --no_mag) and the packed-shard writer.
  C. One full 4-objective "epoch" at flagship scale on the chip: enough
     outer steps for the unsupervised stream to traverse the 12.5k-item
     shard once, at the reference's FULL 816-frame / 304-token caps.

Writes nothing into the repo; scratch lives under --workdir (default
/root/rehearsal). Run: python scripts/corpus_rehearsal.py
[--phase a|b|c|all] [--limit N for a fast smoke]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from unast_tpu.data.splits import REFERENCE_SPLITS_DIR
from unast_tpu.data.dataset import load_manifest

ALL_SPLITS = ("full_train", "val", "test")


def phase_a(args):
    """G2P coverage over every real transcript."""
    from unast_tpu.text import raw_text_to_phoneme_ids
    from unast_tpu.text import morph
    from unast_tpu.text.cleaners import clean_text
    from unast_tpu.text.phonemizer import lexicon_lookup, _word_re
    from unast_tpu.text.symbols import symbols

    rows = []
    for s in ALL_SPLITS:
        rows += load_manifest(os.path.join(REFERENCE_SPLITS_DIR, s + ".csv"))
    if args.limit:
        rows = rows[:args.limit]
    n_words = lex_hits = morph_hits = 0
    token_counts, star_words = [], 0
    uniq_oov = set()
    t0 = time.perf_counter()
    for fid, text in rows:
        cleaned = clean_text(text, ["english_cleaners"])
        for m in _word_re.finditer(cleaned):
            w = m.group(0).lower()
            ws = w.strip("'")
            n_words += 1
            if lexicon_lookup(w) or lexicon_lookup(ws):
                lex_hits += 1
            elif (morph.derive(w, lexicon_lookup)
                  or morph.derive(ws, lexicon_lookup)):
                morph_hits += 1
            else:
                uniq_oov.add(w)
        ids = raw_text_to_phoneme_ids(text)
        token_counts.append(len(ids))
        star_words += sum(1 for t in ids if symbols[t] == "*")
    dt = time.perf_counter() - t0
    tc = np.asarray(token_counts)
    stats = {
        "transcripts": len(rows),
        "g2p_seconds": round(dt, 1),
        "transcripts_per_s": round(len(rows) / dt, 1),
        "words": n_words,
        "lexicon_hit_rate": round(lex_hits / n_words, 4),
        "morph_derivation_rate": round(morph_hits / n_words, 4),
        "rule_fallback_rate": round(
            1 - (lex_hits + morph_hits) / n_words, 4),
        "unique_rule_fallback_words": len(uniq_oov),
        "fail_char_rate": round(star_words / max(1, int(tc.sum())), 6),
        "tokens_per_utt": {"mean": round(float(tc.mean()), 1),
                           "p50": int(np.percentile(tc, 50)),
                           "p95": int(np.percentile(tc, 95)),
                           "max": int(tc.max())},
        "over_304_cap_pct": round(float((tc > 304).mean() * 100), 2),
    }
    print("[A] G2P coverage:", json.dumps(stats, indent=2))
    return stats


def phase_b(args):
    """Synthesize shape-matched audio for full_train, run prepare +
    shard."""
    from unast_tpu.data import prepare
    from unast_tpu.infer.synthesize import write_wav
    from unast_tpu.text import raw_text_to_phoneme_ids

    rows = load_manifest(os.path.join(REFERENCE_SPLITS_DIR,
                                      "full_train.csv"))
    if args.limit:
        rows = rows[:args.limit]
    root = args.workdir
    wavs = os.path.join(root, "wavs")
    os.makedirs(wavs, exist_ok=True)
    rng = np.random.default_rng(0)
    from unast_tpu.data.dataset import synth_audio
    t0 = time.perf_counter()
    cap = int(10.0 * 22050)  # LJSpeech clips are <= ~10.1 s
    kept, dropped, cap_dropped, oracle_durs = [], 0, 0, {}
    for i, (fid, text) in enumerate(rows):
        path = os.path.join(wavs, fid + ".wav")
        ids = np.asarray(raw_text_to_phoneme_ids(text), np.int32)
        if args.max_tokens and len(ids) > args.max_tokens:
            # token filter: at phoneme_dur >= 0.07 the longest ~4% of
            # transcripts would exceed the 10 s LJSpeech-shaped audio cap
            # (truncated audio with full text corrupts ASR/TTS targets)
            dropped += 1
            continue
        if not os.path.exists(path):  # resumable
            wav, durs = synth_audio(ids, 22050, rng,
                                    phoneme_dur_s=args.phoneme_dur,
                                    timbre=args.timbre,
                                    dur_jitter=args.dur_jitter,
                                    return_durs=True)
            durs = durs.astype(np.int32)
            if args.realism:
                # real-recording front end: room-tone silence tails (the
                # trim path becomes active), noise floor, breath onset
                # (data/dataset.py::add_realism).
                from unast_tpu.audio.params import DEFAULT as AP
                from unast_tpu.audio.ref_dsp import trim_silence
                from unast_tpu.data.dataset import add_realism
                wav, (lead_n, breath_n, _tail_n) = add_realism(
                    wav, rng, 22050, return_offsets=True)
                if len(wav) - _tail_n > cap:
                    # lead silence + breath + speech would not fit: DROP
                    # the clip (like the token filter) — truncating the
                    # end of speech while metadata keeps the full
                    # transcript corrupts ASR/TTS targets (ADVICE r4).
                    cap_dropped += 1
                    continue
                wav = wav[:cap]  # truncates appended tail silence only
                # Alignment oracle: the breath sits above the trim gate,
                # so the mel frame origin is the trim start INSIDE the
                # prepended span — token 0 absorbs the kept prefix
                # (residual lead + breath). Compute the prefix with the
                # same trim the mel cache applies (ADVICE r4: the
                # sidecar was silently ~7-13 frames early on every
                # --realism clip).
                _, (s0, _) = trim_silence(wav, AP)
                durs[0] += max(0, lead_n + breath_n - s0)
            else:
                wav = wav[:cap]
            oracle_durs[fid] = durs
            write_wav(path, wav)
        kept.append(f"{fid}|{text}|{text}")
        if (i + 1) % 1000 == 0:
            print(f"[B] synth {i + 1}/{len(rows)}", file=sys.stderr)
    if dropped:
        print(f"[B] token filter (> {args.max_tokens}): dropped {dropped} "
              f"of {len(rows)}")
    if cap_dropped:
        print(f"[B] 10 s cap (realism overhead): dropped {cap_dropped} "
              f"of {len(rows)}")
    with open(os.path.join(root, "metadata.csv"), "w") as f:
        f.write("\n".join(kept) + "\n")
    if oracle_durs:
        # per-phoneme sample counts — the alignment oracle for
        # scripts/align_probe.py (only for freshly synthesized clips;
        # resumed runs that skip existing wavs keep the old sidecar)
        np.savez(os.path.join(root, "oracle_durs.npz"), **oracle_durs)
    t_synth = time.perf_counter() - t0
    print(f"[B] audio synthesis: {len(rows)} clips in {t_synth:.0f}s")

    cache = os.path.join(root, "mel_cache")
    shard = os.path.join(root, "full_train.unsh")
    t0 = time.perf_counter()
    prepare.main(["--data_path", root, "--cache_dir", cache, "--no_mag",
                  "--shard_out", shard,
                  "--wav_shard_out", os.path.join(root, "full_train.unwv")])
    t_prep = time.perf_counter() - t0
    print(f"[B] prepare+shard: {t_prep:.0f}s total "
          f"({len(rows) / t_prep:.1f} clips/s end-to-end), shard "
          f"{os.path.getsize(shard) / 1e6:.0f} MB")
    return {"clips": len(rows), "synth_s": round(t_synth, 1),
            "prepare_shard_s": round(t_prep, 1)}


def phase_c(args):
    """One flagship full-cap 4-objective epoch over the 12.5k shard."""
    import jax
    import jax.numpy as jnp
    from unast_tpu.data.batching import BatchGetter
    from unast_tpu.data.shard import PackedShardDataset
    from unast_tpu.train.config import (model_config_from_args,
                                        parse_with_config)
    from unast_tpu.train.steps import init_train_state, make_train_step

    shard = os.path.join(args.workdir, "full_train.unsh")
    ds = PackedShardDataset(shard)
    print(f"[C] shard: {len(ds)} items")
    targs = parse_with_config([
        "--use_discriminator", "true",
        "--max_mel_len", "816", "--max_text_len", "304",
        "--data_mel_len", "816", "--data_text_len", "304",
        "--ae_steps", "4", "--cm_steps", "8", "--sp_steps", "4",
        "--d_steps", "4", "--train_batch_size", "16",
        "--cm_infer_mel_len", "816", "--cm_infer_text_len", "304",
        "--sched_type", "transformer", "--compute_dtype", "bfloat16",
        "--reduction_factor", str(args.rf),
        "--ctc_weight", str(args.ctc_weight),
        "--cm_text_decode", args.cm_text_decode])
    # NOTE: threefry (reference-reproducible default). Passing --fast_prng
    # here would need train.config.apply_runtime_flags(targs) BEFORE any
    # PRNGKey creation to take effect.
    cfg = model_config_from_args(targs)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, targs)
    bg = BatchGetter(targs, ds, ds, ds)
    step = jax.jit(make_train_step(cfg, targs), donate_argnums=(0,))
    items_per_step = (targs.ae_steps + targs.cm_steps) * \
        targs.train_batch_size
    n_steps = -(-len(ds) // items_per_step)
    print(f"[C] epoch = {n_steps} outer steps "
          f"({items_per_step} unsup items each)")
    rng = jax.random.PRNGKey(1)
    # warm step (compile; persistent cache makes repeats hot)
    batches = jax.tree_util.tree_map(
        jnp.asarray, bg.step_batches(targs, True))
    t0 = time.perf_counter()
    ts, m = step(ts, jax.random.fold_in(rng, 0), batches)
    print(f"[C] first step (incl. compile): "
          f"{time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    data_s = 0.0
    for i in range(1, n_steps):
        td = time.perf_counter()
        batches = jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(targs, True))
        data_s += time.perf_counter() - td
        ts, m = step(ts, jax.random.fold_in(rng, i), batches)
    vals = {k: float(v) for k, v in m.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    dt = time.perf_counter() - t0
    stats = {"outer_steps": n_steps, "epoch_wall_s": round(dt, 1),
             "steps_per_s": round((n_steps - 1) / dt, 2),
             "host_data_s": round(data_s, 1),
             "grad_norm": round(vals["grad_norm"], 3)}
    print("[C] epoch:", json.dumps(stats))
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["a", "b", "c", "all"])
    ap.add_argument("--workdir", default="/root/rehearsal")
    ap.add_argument("--timbre", default="harmonic",
                    choices=["harmonic", "formant"],
                    help="phoneme->spectrum mapping of the synthetic "
                         "audio; 'formant' ids are mel-bin-separated, the "
                         "round-trip-intelligibility corpus (see "
                         "data/dataset.py::synth_audio)")
    ap.add_argument("--phoneme_dur", type=float, default=0.04,
                    help="seconds per phoneme tone. 0.04 (882 samples) is "
                         "SHORTER than the 1102-sample DSP window, so no "
                         "analysis frame lies inside one phoneme and "
                         "regression synthesis cannot round-trip (measured: "
                         "segment-template acc 100%% gold vs ~20%% NAR); "
                         ">= 0.07 gives every phoneme in-window-pure frames "
                         "-- pair with --max_tokens 142 to respect the 10 s "
                         "audio cap")
    ap.add_argument("--max_tokens", type=int, default=0,
                    help="drop transcripts longer than this many phoneme "
                         "tokens (0 = keep all)")
    ap.add_argument("--dur_jitter", type=float, default=0.0,
                    help="per-phoneme duration jitter: each tone's length "
                         "is _DUR_FACTOR[pid] * U(1-j, 1+j) * phoneme_dur "
                         "(intrinsic 0.6-1.5 per-id factor + noise, "
                         "data/dataset.py::synth_audio). 0 = the "
                         "historical constant-duration corpus, on which "
                         "NAR duration modeling is TRIVIAL (a uniform "
                         "predictor matches the oracle grid exactly); "
                         "> 0 makes the duration task non-degenerate and "
                         "writes the oracle_durs.npz sidecar")
    ap.add_argument("--realism", action="store_true",
                    help="phase-b: silence tails + noise floor + breath "
                         "onset on every clip (add_realism) -- exercises "
                         "the silence-trim alignment end to end "
                         "(VERDICT r3 item 6)")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--ctc_weight", type=float, default=0.0,
                    help="phase-c: joint hybrid CTC head weight "
                         "(required > 0 for --cm_text_decode ctc/spec)")
    ap.add_argument("--cm_text_decode", default="ar",
                    choices=["ar", "spec", "ctc"],
                    help="phase-c: pseudo-transcript decode inside the "
                         "cm objective (the text-side decode lever)")
    ap.add_argument("--rf", type=int, default=1,
                    help="phase-c model reduction_factor: r mel frames "
                         "per speech-decoder step. r=4 measured ~2x on "
                         "the full-cap greedy decode that dominates the "
                         "cm micro-batches (BENCHMARKS 'reduction "
                         "factor') -- the A/B lever for the epoch wall "
                         "time (VERDICT r3 item 5)")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    if args.phase in ("a", "all"):
        phase_a(args)
    if args.phase in ("b", "all"):
        phase_b(args)
    if args.phase in ("c", "all"):
        phase_c(args)
