"""CBHG vocoder training + inference.

Parity targets: src/train_vocoder.py (sum-reduced L1/L2 regression of
mel->magnitude, Adam/AdamW, per-batch scheduler step, grad clip, epoch
checkpoints, random train/valid split) and src/inf_vocoder.py (make_mags:
run the vocoder over predicted-mel dumps, save truncated .mag.npy).

TPU-native: one jitted update over fixed-shape batches. Deviation: batches
are padded to a fixed frame count rather than the per-batch max, so the
(unmasked, reference-faithful) sum loss covers more zero-padding; relative
training signal is unchanged.
"""

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import nn
from ..models import unast as U
from ..models.config import ModelConfig
from ..train.optim import make_optimizer
from ..data.batching import BatchIterator


def vocoder_loss(params, vstate, ctx, mel, mag, loss_type: str):
    pred, new_state = U.vocoder(params, vstate, ctx, mel)
    diff = pred.astype(jnp.float32) - mag.astype(jnp.float32)
    if loss_type == "l1":
        loss = jnp.sum(jnp.abs(diff))
    else:
        loss = jnp.sum(diff ** 2)
    return loss, new_state


def make_vocoder_step(args, tx):
    loss_type = getattr(args, "loss_type", "l1")

    @jax.jit
    def step(params, vstate, opt_state, rng, mel, mag):
        ctx = nn.Ctx(rng=rng, train=True)
        (loss, new_state), grads = jax.value_and_grad(
            vocoder_loss, has_aux=True)(params, vstate, ctx, mel, mag,
                                        loss_type)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, loss

    return step


def train_vocoder(args, dataset, epochs: Optional[int] = None):
    """dataset items must carry 'mel' and 'mag'. Returns
    (params, vstate, per-epoch mean losses)."""
    cfg = ModelConfig(hidden=getattr(args, "hidden_size", 256),
                      num_mels=args.num_mels)
    n_fft = getattr(args, "n_fft", 2048)
    params, vstate = U.vocoder_init(jax.random.PRNGKey(args.seed), cfg, n_fft)
    tx = make_optimizer(args)
    opt_state = tx.init(params)
    step = make_vocoder_step(args, tx)

    valid_size = min(getattr(args, "valid_size", 0) or max(1, len(dataset) // 10),
                     max(0, len(dataset) - 1))
    rng_np = np.random.default_rng(args.seed)
    indices = rng_np.permutation(len(dataset))
    split = len(indices) - valid_size
    train_idx, valid_idx = indices[:split], indices[split:]
    assert len(train_idx) > 0, "vocoder training needs at least one item"

    class _Subset:
        def __init__(self, ds, idx):
            self.ds, self.idx = ds, idx
        def __len__(self):
            return len(self.idx)
        def __getitem__(self, i):
            return self.ds[int(self.idx[i])]

    it = BatchIterator(_Subset(dataset, train_idx), args.train_batch_size,
                       text_len=8, mel_len=args.data_mel_len,
                       seed=args.seed, include_mag=True,
                       n_mels=args.num_mels)
    steps_per_epoch = max(1, len(train_idx) // args.train_batch_size)
    epoch_losses = []
    rng = jax.random.PRNGKey(args.seed + 5)
    for epoch in range(epochs or args.epochs):
        losses = []
        for s in range(steps_per_epoch):
            b = it.next_batch()
            params, vstate, opt_state, loss = step(
                params, vstate, opt_state,
                jax.random.fold_in(rng, epoch * steps_per_epoch + s),
                jnp.asarray(b["mel"]), jnp.asarray(b["mag"]))
            losses.append(float(loss))
        epoch_losses.append(float(np.mean(losses)))
    return params, vstate, epoch_losses


@functools.partial(jax.jit, static_argnames=())
def _vocode_batch(params, vstate, mel):
    mag, _ = U.vocoder(params, vstate, nn.Ctx.eval(), mel)
    return mag


def save_vocoder_ckpt(params, vstate, path: str):
    import pickle
    with open(path, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, (params, vstate)), f)


def load_vocoder_ckpt(path: str):
    import pickle
    with open(path, "rb") as f:
        params, vstate = pickle.load(f)
    return (jax.tree_util.tree_map(jnp.asarray, params),
            jax.tree_util.tree_map(jnp.asarray, vstate))


def make_mags(params, vstate, mels_dir: str, fnames, out_dir: Optional[str]
              = None, batch_size: int = 8, mel_len: int = 816):
    """Predicted-mel dumps -> .mag.npy per utterance (src/inf_vocoder.py:48-64)."""
    out_dir = out_dir or mels_dir
    os.makedirs(out_dir, exist_ok=True)
    for i in range(0, len(fnames), batch_size):
        chunk = fnames[i:i + batch_size]
        mels, lens = [], []
        for f in chunk:
            m = np.load(os.path.join(mels_dir, f + ".pt.npy")) \
                if os.path.exists(os.path.join(mels_dir, f + ".pt.npy")) \
                else np.load(os.path.join(mels_dir, f + ".pt"))
            lens.append(min(len(m), mel_len))
            pad = np.zeros((mel_len, m.shape[1]), np.float32)
            pad[:lens[-1]] = m[:mel_len]
            mels.append(pad)
        mags = np.asarray(_vocode_batch(params, vstate, jnp.asarray(mels)))
        for f, mag, ln in zip(chunk, mags, lens):
            np.save(os.path.join(out_dir, f + ".mag.npy"), mag[:ln])


def main(argv=None):
    """CLI: train the vocoder (default) or run make_mags with --infer.
    Parity: src/train_vocoder.py:162-179 and src/inf_vocoder.py:66-75."""
    import argparse
    from ..train.config import parse_with_config
    from ..data.dataset import LJSpeechDataset, SyntheticSpeechDataset

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--infer", action="store_true")
    ap.add_argument("--vocoder_ckpt", default="vocoder.pkl")
    known, rest = ap.parse_known_args(argv)
    args = parse_with_config(rest)
    if not hasattr(args, "hidden_size"):
        args.hidden_size = args.hidden
    if not hasattr(args, "n_fft"):
        args.n_fft = 2048

    if known.infer:
        params, vstate = load_vocoder_ckpt(known.vocoder_ckpt)
        mels_dir = os.path.join(args.out_test_dir, "mels")
        # eval dumps use np.save(fname + '.pt') which writes '<f>.pt.npy'
        fnames = sorted(f[: -len(".pt.npy")] for f in os.listdir(mels_dir)
                        if f.endswith(".pt.npy") and not f.endswith(".mag.npy"))
        make_mags(params, vstate, mels_dir, fnames,
                  mel_len=args.data_mel_len)
        print(f"wrote {len(fnames)} .mag.npy files to {mels_dir}")
        return

    if args.synthetic:
        ds = SyntheticSpeechDataset(size=args.synthetic_size, seed=args.seed)
    else:
        splits_dir = args.splits_dir or os.path.join(args.data_path, "splits")
        ds = LJSpeechDataset(os.path.join(splits_dir, "full_train.csv"),
                             os.path.join(args.data_path, "mel_cache"),
                             include_mag=True)
    params, vstate, losses = train_vocoder(args, ds)
    save_vocoder_ckpt(params, vstate, known.vocoder_ckpt)
    print(f"final vocoder loss: {losses[-1]:.2f} -> {known.vocoder_ckpt}")


if __name__ == "__main__":
    main()
