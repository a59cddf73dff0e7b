"""Learnability check: train the (small) UNAST model on the synthetic corpus
and report whether the objective losses and PER improve.

Run:  python scripts/convergence_check.py [--steps 60] [--model_type transformer]

This is the automated analogue of the reference's 'watch the PER per epoch'
methodology (SURVEY.md §4.5): single-modality AE losses must drop sharply and
ASR PER must fall below the untrained baseline within ~60 outer steps.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unast_tpu.train.config import parse_with_config, model_config_from_args
from unast_tpu.train.steps import init_train_state, make_train_step
from unast_tpu.data.batching import BatchGetter, BatchIterator
from unast_tpu.data.dataset import SyntheticSpeechDataset
from unast_tpu.infer.metrics import compute_per
from unast_tpu.models import unast as U
from unast_tpu import nn


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--model_type", default="transformer")
    ap.add_argument("--preset", default="small", choices=["small", "full"],
                    help="'full' trains the flagship d=256/4L model")
    ap.add_argument("--report", default=None, help="write JSON report here")
    ap.add_argument("--ga_weight", type=float, default=0.0,
                    help="guided-attention loss weight (transformer lever)")
    ap.add_argument("--steps_per_log", type=int, default=10)
    ap.add_argument("--corpus_size", type=int, default=32,
                    help="synthetic corpus size; 32 is memorizable (the "
                         "joint objective can satisfy itself as a pure LM), "
                         "larger forces audio grounding")
    ap.add_argument("--sp_warmup", type=int, default=0,
                    help="supervised-only steps BEFORE the joint mixture "
                         "(grounding curriculum: anchor the cross-modal "
                         "alignment first, then add DAE/back-translation/"
                         "adversarial objectives)")
    known, extra = ap.parse_known_args(argv)

    if known.preset == "full":
        argv_cfg = [
            "--model_type", known.model_type,
            "--use_discriminator", "true",
            "--max_mel_len", "256", "--max_text_len", "40",
            "--data_mel_len", "256", "--data_text_len", "40",
            "--cm_infer_mel_len", "64", "--cm_infer_text_len", "16",
            "--ae_steps", "2", "--cm_steps", "1", "--sp_steps", "2",
            "--d_steps", "1", "--train_batch_size", "8",
            "--sched_type", "multistep", "--lr", "3e-4",
            "--optim_type", "adamw", "--compute_dtype", "bfloat16"]
    else:
        argv_cfg = [
            "--model_type", known.model_type,
            "--hidden", "64", "--e_in", "64", "--t_emb_dim", "64",
            "--s_pre_hid", "64", "--ffn_dim", "128", "--num_layers", "2",
            "--nhead", "2", "--use_discriminator", "true", "--disc_hid", "16",
            "--disc_num_layers", "1", "--max_mel_len", "112",
            "--max_text_len", "32", "--data_mel_len", "112",
            "--data_text_len", "32",
            "--cm_infer_mel_len", "16", "--cm_infer_text_len", "8",
            "--ae_steps", "2", "--cm_steps", "1", "--sp_steps", "2",
            "--d_steps", "1", "--train_batch_size", "8",
            "--sched_type", "multistep", "--lr", "1e-3",
            "--optim_type", "adamw", "--compute_dtype", "bfloat16"]
    argv_cfg += ["--ga_weight", str(known.ga_weight)] + extra
    args = parse_with_config(argv_cfg)
    if args.fast_prng:
        jax.config.update("jax_default_prng_impl", "rbg")
    cfg = model_config_from_args(args)

    # phoneme_dur 0.04s -> ~3.2 frames/phoneme, so whole utterances fit the
    # 64-frame cap (at the default 0.08s half of each utterance is cut off
    # and ASR has an irreducible error floor).
    dur = 0.04 if known.preset == "small" else 0.08
    ds = SyntheticSpeechDataset(size=known.corpus_size, seed=0,
                                phoneme_dur_s=dur)
    bg = BatchGetter(args, ds, ds, ds)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, args)
    step = jax.jit(make_train_step(cfg, args), donate_argnums=(0,))

    def measure_per(ts, show=False):
        it = BatchIterator(ds, 8, args.data_text_len, args.data_mel_len, seed=9)
        b = it.next_batch()
        (ids, lens), _ = U.asr(ts.params, ts.net_state, nn.Ctx.eval(), cfg,
                               None, None, jnp.asarray(b["mel"]),
                               jnp.asarray(b["mel_len"]), infer=True)
        ids, lens = np.asarray(ids), np.asarray(lens)
        if show:
            # teacher-forced argmax accuracy for comparison
            logits, _ = U.asr(ts.params, ts.net_state, nn.Ctx.eval(), cfg,
                              jnp.asarray(b["text"]), jnp.asarray(b["text_len"]),
                              jnp.asarray(b["mel"]), jnp.asarray(b["mel_len"]))
            pred_tf = np.asarray(jnp.argmax(logits, -1))
            mask = (np.arange(b["text"].shape[1])[None] < b["text_len"][:, None])
            acc = (pred_tf == b["text"])[mask].mean()
            # grounding diagnostic: decode against the WRONG audio. If the
            # shuffled PER is no worse, the decoder is ignoring the speech
            # memory and free-running as a pure corpus LM.
            perm = np.roll(np.arange(len(b["mel"])), 1)
            (ids_s, lens_s), _ = U.asr(
                ts.params, ts.net_state, nn.Ctx.eval(), cfg, None, None,
                jnp.asarray(b["mel"][perm]), jnp.asarray(b["mel_len"][perm]),
                infer=True)
            per_shuf = compute_per(b["text"], np.asarray(ids_s),
                                   b["text_len"], np.asarray(lens_s))
            print(f"  teacher-forced token acc: {acc:.3f}")
            print(f"  PER with shuffled audio: {per_shuf:.3f} "
                  "(= normal PER means the decode ignores audio)")
            print(f"  gt[0]  ({b['text_len'][0]}): "
                  f"{b['text'][0][:b['text_len'][0]].tolist()}")
            print(f"  hyp[0] ({lens[0]}): {ids[0][:lens[0]].tolist()}")
        return compute_per(b["text"], ids, b["text_len"], lens)

    per0 = measure_per(ts)
    print(f"untrained PER: {per0:.3f}")
    rng = jax.random.PRNGKey(17)
    if known.sp_warmup > 0:
        wargs = parse_with_config(argv_cfg + [
            "--ae_steps", "0", "--cm_steps", "0", "--d_steps", "0",
            "--use_discriminator", "false"])
        wcfg = cfg.replace(use_discriminator=False)
        wstep = jax.jit(make_train_step(wcfg, wargs), donate_argnums=(0,))
        wrng = jax.random.PRNGKey(23)
        for s in range(known.sp_warmup):
            wb = {"sp": jax.tree_util.tree_map(
                jnp.asarray, bg.step_batches(wargs, False))["sp"]}
            ts, m = wstep(ts, jax.random.fold_in(wrng, s), wb)
            if (s + 1) % known.steps_per_log == 0:
                print(f"[sp_warmup] step {s + 1}: "
                      f"asr {float(m['sp/asr']):.3f} "
                      f"tts {float(m['sp/tts']):.3f}")
        print(f"after sp_warmup({known.sp_warmup}): PER {measure_per(ts):.3f}")
    first, last = None, None
    t0 = time.time()
    for s in range(known.steps):
        batches = jax.tree_util.tree_map(
            jnp.asarray, bg.step_batches(args, True))
        ts, m = step(ts, jax.random.fold_in(rng, s), batches)
        host = {k: float(v) for k, v in m.items()}
        if first is None:
            first = host
        last = host
        if (s + 1) % known.steps_per_log == 0:
            print(f"step {s + 1}: t_ae {host['ae/t_ae']:.3f} "
                  f"s_ae {host['ae/s_ae']:.3f} asr {host['sp/asr']:.3f} "
                  f"tts {host['sp/tts']:.3f}")
    dt = time.time() - t0
    per1 = measure_per(ts, show=True)
    print(f"trained PER: {per1:.3f}  ({known.steps} steps in {dt:.1f}s, "
          f"{known.steps / dt:.2f} steps/s)")

    report = {
        "steps": known.steps, "seconds": dt,
        "per_untrained": per0, "per_trained": per1,
        "losses_first": first, "losses_last": last,
    }
    checks = {
        "t_ae_improved": last["ae/t_ae"] < first["ae/t_ae"],
        "s_ae_improved": last["ae/s_ae"] < first["ae/s_ae"],
        "asr_improved": last["sp/asr"] < first["sp/asr"],
        "tts_improved": last["sp/tts"] < first["sp/tts"],
        "per_improved_or_equal": per1 <= per0 + 0.02,
    }
    report["checks"] = checks
    print(json.dumps(checks))
    if known.report:
        with open(known.report, "w") as f:
            json.dump(report, f, indent=2)
    if not all(checks.values()):
        print("CONVERGENCE CHECK FAILED", file=sys.stderr)
        sys.exit(1)
    print("CONVERGENCE CHECK PASSED")


if __name__ == "__main__":
    main()
