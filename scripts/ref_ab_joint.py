"""A/B: train the REFERENCE torch implementation on the same synthetic
corpus + joint objective mixture as scripts/convergence_check.py, and track
greedy ASR PER.

Purpose (VERDICT r1 #2): establish whether the reference transformer ALSO
plateaus on the joint adversarial objective at small scale, so the observed
gap between our transformer and RNN backbones can be recorded as measured
parity (or fixed). Uses the reference's own objective step functions
(src/train.py:199-354) and optimizer/freeze dance (src/train.py:567-638),
driven through tests/ref_oracle.py.

Run:  python scripts/ref_ab_joint.py --steps 1000 [--max_seconds 5400]
"""

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

import numpy as np


def pad_batch(items, torch):
    """Dynamic per-batch padding like the reference collate
    (src/preprocess.py:82-121), without the sort."""
    tl = np.array([len(it["ids"]) for it in items], np.int64)
    ml = np.array([it["mel"].shape[0] for it in items], np.int64)
    text = np.zeros((len(items), tl.max()), np.int64)
    mel = np.zeros((len(items), ml.max(), items[0]["mel"].shape[1]), np.float32)
    for i, it in enumerate(items):
        text[i, :tl[i]] = it["ids"]
        mel[i, :ml[i]] = it["mel"]
    return (torch.as_tensor(text), torch.as_tensor(mel),
            torch.as_tensor(tl), torch.as_tensor(ml))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--max_seconds", type=float, default=5400)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--report", default="/tmp/ref_ab_joint.json")
    ap.add_argument("--cm_mel_cap", type=int, default=16)
    ap.add_argument("--cm_text_cap", type=int, default=8)
    a = ap.parse_args()

    import torch
    import ref_oracle
    ns = ref_oracle.load_reference()
    rtrain = ns.train

    from unast_tpu.data.dataset import SyntheticSpeechDataset
    from unast_tpu.infer.metrics import compute_per

    # same corpus + mixture as convergence_check.py 'small' preset
    args = argparse.Namespace(
        model_type="transformer", num_mels=80, hidden=64, e_in=64,
        t_emb_dim=64, s_pre_hid=64, ffn_dim=128, num_layers=2, nhead=2,
        s_pre_drop=0.5, s_post_drop=0.1, t_pre_drop=0.5, t_post_drop=0.1,
        e_drop=0.2, d_drop=0.1, s_eos_weight=5.0, t_eos_weight=1.0,
        use_discriminator=True, disc_hid=16, disc_bidirectional=True,
        disc_num_layers=1, ae_steps=2, cm_steps=1, sp_steps=2, d_steps=1,
        grad_clip=1.0)

    torch.manual_seed(0)
    text_m = ns.network.TextTransformer(args)
    speech_m = ns.network.SpeechTransformer(args)
    disc = ns.network.LSTMDiscriminator(
        args.hidden, args.disc_hid, bidirectional=True,
        num_layers=args.disc_num_layers)
    model = ns.network.UNAST(text_m, speech_m, disc, None)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=1e-6)

    # Cap the back-translation greedy decode lengths to the same values as
    # our convergence gate (cm_infer_mel_len 16 / cm_infer_text_len 8):
    # without a cap the reference's no-cache O(prefix^2) re-decode makes a
    # joint step take minutes on this host (measured <0.01 steps/s).
    import functools
    orig_text_infer = model.text_m.infer_sequence
    model.speech_m.infer_sequence = functools.partial(
        model.speech_m.infer_sequence, max_len=a.cm_mel_cap)
    model.text_m.infer_sequence = functools.partial(
        orig_text_infer, max_len=a.cm_text_cap)

    ds = SyntheticSpeechDataset(size=32, seed=0, phoneme_dur_s=0.04)
    rng = np.random.default_rng(17)
    B = 8

    def batch():
        idx = rng.choice(len(ds), B, replace=False)
        items = [ds[int(i)] for i in idx]
        x = pad_batch(items, torch)
        return rtrain.process_batch(x)

    def measure_per():
        model.eval()
        items = [ds[i] for i in range(8)]
        text, mel, tl, ml = pad_batch(items, torch)
        with torch.no_grad():
            s_e_o, s_masks = model.speech_m.encode(mel, ml)
            ids, lens = orig_text_infer(s_e_o, s_masks, max_len=40)
        model.train()
        ids = ids.numpy()
        pad = np.zeros((ids.shape[0], max(0, 40 - ids.shape[1])), ids.dtype)
        return compute_per(text.numpy(), np.concatenate([ids, pad], 1),
                           tl.numpy(), lens.numpy())

    accum = args.ae_steps + args.cm_steps + args.sp_steps
    per_curve = [(0, float(measure_per()))]
    print(f"step 0: PER {per_curve[0][1]:.3f}", flush=True)
    model.train()
    t0 = time.time()
    s = 0
    while s < a.steps and time.time() - t0 < a.max_seconds:
        # generator phase: discriminator frozen (src/train.py:607,465-471)
        rtrain.freeze_model_parameters(model.discriminator)
        opt.zero_grad()
        losses = {}
        for _ in range(args.ae_steps):
            t_ae, s_ae, d_ae = rtrain.autoencoder_step(model, batch(), args,
                                                       use_dis_loss=True)
            ((t_ae + s_ae + d_ae) / accum).backward()
            losses["t_ae"], losses["s_ae"] = float(t_ae), float(s_ae)
        for _ in range(args.cm_steps):
            t_cm, s_cm, d_cm = rtrain.crossmodel_step(model, batch(), args,
                                                      use_dis_loss=True)
            ((t_cm + s_cm + d_cm) / accum).backward()
        for _ in range(args.sp_steps):
            asr_l, tts_l, d_sp = rtrain.supervised_step(model, batch(), args,
                                                        use_dis_loss=True)
            ((asr_l + tts_l + d_sp) / accum).backward()
            losses["asr"], losses["tts"] = float(asr_l), float(tts_l)
        torch.nn.utils.clip_grad_norm_(model.parameters(), args.grad_clip)
        opt.step()
        rtrain.unfreeze_model_parameters(model.discriminator)
        # discriminator phase (src/train.py:631-638)
        opt.zero_grad()
        for _ in range(args.d_steps):
            d_loss, _ = rtrain.discriminator_step(model, batch(), args)
            (d_loss / args.d_steps).backward()
            losses["d"] = float(d_loss)
        torch.nn.utils.clip_grad_norm_(model.parameters(), args.grad_clip)
        opt.step()
        s += 1
        if s % a.eval_every == 0:
            per = float(measure_per())
            per_curve.append((s, per))
            rate = s / (time.time() - t0)
            print(f"step {s}: PER {per:.3f} asr {losses.get('asr', -1):.3f} "
                  f"tts {losses.get('tts', -1):.3f} ({rate:.2f} steps/s)",
                  flush=True)
            with open(a.report, "w") as f:
                json.dump({"per_curve": per_curve, "steps_done": s,
                           "seconds": time.time() - t0,
                           "losses_last": losses}, f, indent=2)
    per = float(measure_per())
    per_curve.append((s, per))
    print(f"final: step {s} PER {per:.3f}")
    with open(a.report, "w") as f:
        json.dump({"per_curve": per_curve, "steps_done": s,
                   "seconds": time.time() - t0}, f, indent=2)


if __name__ == "__main__":
    main()
