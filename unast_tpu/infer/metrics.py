"""Evaluation metrics.

compute_per — parity with reference compute_per (src/utils.py:24-34), which
is jiwer WER over space-joined phoneme-ID strings: global (summed) edit
distance over summed reference lengths. jiwer is not in this image, so the
word-level Levenshtein is implemented here (host-side numpy; 300 utterances
is trivially cheap — SURVEY.md §7 'no need to port edit distance to
device').

compute_d_score — parity with src/train.py:977-983.
"""

from typing import Sequence

import numpy as np


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Token-level Levenshtein distance (two-row DP)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = np.arange(m + 1)
    cur = np.empty(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cur[0] = i
        sub = prev[:-1] + (np.asarray(hyp) != ref[i - 1])
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev, cur = cur, prev
    return int(prev[m])


def compute_per(ground_truth, hypothesis, gt_lens, hyp_lens) -> float:
    """ground_truth/hypothesis: [B, T] id arrays; lens: [B]. Equivalent to
    jiwer.wer over space-joined id strings: sum(edit) / sum(ref_len).
    Uses the C++ batch Levenshtein (unast_tpu/native) when built."""
    gt = np.asarray(ground_truth)
    hyp = np.asarray(hypothesis)
    gt_lens = np.asarray(gt_lens, np.int32)
    hyp_lens = np.asarray(hyp_lens, np.int32)
    from .. import native
    dists = native.levenshtein_batch(gt, hyp, gt_lens, hyp_lens)
    return float(np.sum(dists)) / max(1, int(np.sum(gt_lens)))


def compute_d_score(outputs, targets) -> int:
    """Count of thresholded discriminator predictions matching rounded
    targets (src/train.py:977-983)."""
    preds = np.round(1.0 / (1.0 + np.exp(-np.asarray(outputs, np.float64))))
    return int(np.sum(preds == np.round(np.asarray(targets, np.float64))))
