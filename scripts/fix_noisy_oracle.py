"""Recover trim-offset-corrected oracle durations for a --realism corpus
whose sidecar was written by the pre-fix corpus_rehearsal (ADVICE r4
medium: add_realism ran AFTER durations were recorded, so the kept
prefix — residual lead silence + breath — shifted the mel frame origin
by ~7-13 frames on every clip while the sidecar still described bare
speech).

Post-hoc recovery, no re-synthesis needed: the wav shard payload spans
the trimmed wav exactly (data/prepare.py --wav_shard_out packs over the
mel path's trim span), the trim end sits at the end of speech (the
-45 dB noise floor rides above the -60 dB gate until speech ends; the
-75 dB tail is cut), and the sidecar's durations sum to the bare speech
length. Hence per clip:

    kept_prefix_samples = trimmed_len - sum(durs)   (>= 0, ± <=1 trim hop)

Folding the prefix into token 0 (exactly what the fixed corpus_rehearsal
now records at synthesis time) restores every downstream boundary:
cum_k = prefix + sum(durs[:k]) in trimmed = mel coordinates.

Run: python scripts/fix_noisy_oracle.py [--workdir /root/rehearsal_noisy]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--workdir", default="/root/rehearsal_noisy")
ap.add_argument("--out", default="",
                help="output npz (default <workdir>/oracle_durs_fixed.npz)")
A = ap.parse_args()

from unast_tpu.audio.params import DEFAULT as P
from unast_tpu.data.shard import WavShardDataset

wavs = WavShardDataset(os.path.join(A.workdir, "full_train.unwv"))
with open(os.path.join(A.workdir, "metadata.csv"), encoding="utf-8") as f:
    fids = [ln.split("|")[0] for ln in f if ln.strip()]
assert len(fids) == len(wavs), (len(fids), len(wavs))
durs_npz = np.load(os.path.join(A.workdir, "oracle_durs.npz"))

out = {}
offsets = []
for i, fid in enumerate(fids):
    durs = durs_npz[fid].astype(np.int64)
    ns = int(wavs.lens([i])[0])
    off = ns - int(durs.sum())
    if off < -P.trim_hop_length:
        # should not happen: speech trimmed (prefix can't be negative
        # beyond trim quantization)
        print(f"WARN {fid}: negative offset {off}", file=sys.stderr)
    off = max(0, off)
    durs[0] += off
    out[fid] = durs.astype(np.int32)
    offsets.append(off)

offsets = np.asarray(offsets, np.float64) / P.hop_length  # frames
dst = A.out or os.path.join(A.workdir, "oracle_durs_fixed.npz")
np.savez(dst, **out)
print(f"corrected {len(out)} clips -> {dst}")
print(f"kept-prefix offset (frames): mean {offsets.mean():.1f}  "
      f"p5 {np.percentile(offsets, 5):.1f}  p50 "
      f"{np.percentile(offsets, 50):.1f}  p95 "
      f"{np.percentile(offsets, 95):.1f}  max {offsets.max():.1f}")
