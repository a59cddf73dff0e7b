"""Fixed-shape batching.

Parity target: collate_fn_transformer (src/preprocess.py:82-121) — zero-pad
text and mel, return (text, mel, text_len, mel_len) — minus the
sort-by-text-length (an RNN-era artifact; we keep lengths and masks
instead, SURVEY.md §7). The reference pads to the per-batch max, which on
TPU would retrace XLA per batch; we pad to FIXED maxima (one compiled
program) — the TPU-native replacement for dynamic shapes.

BatchGetter parity (src/train.py:32-78): three shuffled infinitely-cycling
streams (supervised / unsupervised / full) with drop_last semantics.
"""

from typing import Iterator, Optional, Sequence

import numpy as np


def collate(items: Sequence[dict], text_len: int, mel_len: int,
            n_mels: int = 80, include_mag: bool = False,
            n_freqs: int = 1025):
    """Pad a list of items to fixed [B, text_len] / [B, mel_len, n_mels].
    Items longer than the fixed shapes are truncated (lengths clamped)."""
    b = len(items)
    text = np.zeros((b, text_len), np.int32)
    mel = np.zeros((b, mel_len, n_mels), np.float32)
    t_lens = np.zeros((b,), np.int32)
    m_lens = np.zeros((b,), np.int32)
    mag = np.zeros((b, mel_len, n_freqs), np.float32) if include_mag else None
    fnames = []
    for i, it in enumerate(items):
        ids = it["ids"][:text_len]
        m = it["mel"][:mel_len]
        text[i, :len(ids)] = ids
        mel[i, :len(m)] = m
        t_lens[i] = len(ids)
        m_lens[i] = len(m)
        if include_mag:
            mg = it["mag"][:mel_len]
            mag[i, :len(mg)] = mg
        fnames.append(it.get("fname", str(i)))
    out = {"text": text, "mel": mel, "text_len": t_lens, "mel_len": m_lens,
           "fnames": fnames}
    if include_mag:
        out["mag"] = mag
    return out


def as_tuple(batch):
    """(text, mel, text_len, mel_len) — process_batch layout
    (src/train.py:80-94; the gold stop label is built in-step)."""
    return batch["text"], batch["mel"], batch["text_len"], batch["mel_len"]


class BatchIterator:
    """Infinite shuffled iterator with drop_last=True semantics."""

    def __init__(self, dataset, batch_size: int, text_len: int, mel_len: int,
                 seed: int = 0, include_mag: bool = False,
                 n_mels: int = 80):
        self.ds = dataset
        self.bs = batch_size
        self.text_len = text_len
        self.mel_len = mel_len
        self.include_mag = include_mag
        self.n_mels = n_mels
        self._rng = np.random.default_rng(seed)
        self._order = None
        self._pos = 0

    def _reshuffle(self):
        self._order = self._rng.permutation(len(self.ds))
        self._pos = 0

    def next_batch(self):
        if self._order is None or self._pos + self.bs > len(self._order):
            self._reshuffle()
        idx = self._order[self._pos:self._pos + self.bs]
        self._pos += self.bs
        return collate([self.ds[int(i)] for i in idx], self.text_len,
                       self.mel_len, n_mels=self.n_mels,
                       include_mag=self.include_mag)

    def next_stacked(self, n: int):
        """Stack n micro-batches along a new leading axis — the layout the
        jitted accumulated train step scans over."""
        bs = [self.next_batch() for _ in range(n)]
        return tuple(np.stack([as_tuple(b)[j] for b in bs]) for j in range(4))


class BatchGetter:
    """Three infinite streams: supervised (labeled), unsupervised, and full
    (discriminator) — src/train.py:32-78."""

    def __init__(self, args, supervised_ds, unsupervised_ds, full_ds,
                 n_mels: int = 80):
        kw = dict(batch_size=args.train_batch_size,
                  text_len=args.data_text_len, mel_len=args.data_mel_len,
                  n_mels=n_mels)
        self.supervised = BatchIterator(supervised_ds, seed=args.seed + 1, **kw)
        self.unsupervised = BatchIterator(unsupervised_ds, seed=args.seed + 2, **kw)
        self.full = BatchIterator(full_ds, seed=args.seed + 3, **kw)

    def step_batches(self, args, use_discriminator: bool):
        """All stacked micro-batches for ONE outer train step:
        ae/cm from the unsupervised stream, sp from the supervised stream,
        d from the full stream (src/train.py:607-638)."""
        batches = {
            "ae": self.unsupervised.next_stacked(args.ae_steps),
            "cm": self.unsupervised.next_stacked(args.cm_steps),
            "sp": self.supervised.next_stacked(args.sp_steps),
        }
        if use_discriminator:
            batches["d"] = self.full.next_stacked(args.d_steps)
        return batches
