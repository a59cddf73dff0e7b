"""Debug single-modality trainers — parity with train_text_auto /
train_speech_auto (src/train.py:767-854, "Purely for testing purposes"):
plain (noised) autoencoder training of ONE modality to sanity-check
convergence before the full 4-objective loop.

Run:  python -m unast_tpu.train.debug --config configs/transformer_test.json \
          --synthetic --modality text
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import nn
from ..models import unast as U
from ..data.batching import BatchIterator
from . import losses as L
from .config import parse_with_config, model_config_from_args
from .loop import initialize_datasets
from .optim import make_optimizer, split_params


def make_single_modality_step(cfg, args, modality: str, tx):
    def loss_fn(params, net_state, rng, batch):
        text, mel, text_len, mel_len = batch
        ctx = nn.Ctx(rng=rng, train=True)
        if modality == "text":
            logits, st = U.text_ae(params, net_state, ctx, cfg, text, text_len)
            loss = L.text_loss(text, logits, args.t_eos_weight)
        else:
            gold_stop = L.stop_label_from_lens(mel_len, mel.shape[1])
            (pre, post, stop), st = U.speech_ae(params, net_state, ctx, cfg,
                                                mel, mel_len)
            loss = L.speech_loss(mel, gold_stop, pre, post, mel_len, stop,
                                 args.s_eos_weight)
        return loss, st

    @jax.jit
    def step(params, net_state, opt_state, rng, batch):
        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, net_state, rng, batch)
        gen_grads = {k: v for k, v in grads.items() if k != "discriminator"}
        gen_params, disc = split_params(params)
        updates, opt_state = tx.update(gen_grads, opt_state, gen_params)
        gen_params = optax.apply_updates(gen_params, updates)
        new_params = dict(gen_params)
        if disc is not None:
            new_params["discriminator"] = disc
        return new_params, new_state, opt_state, loss

    return step


def train_single_modality(args, modality: str, steps: int = None):
    """Returns the per-step loss history."""
    cfg = model_config_from_args(args)
    params, net_state = U.unast_init(jax.random.PRNGKey(args.seed), cfg)
    tx = make_optimizer(args)
    gen_params, _ = split_params(params)
    opt_state = tx.init(gen_params)
    step = make_single_modality_step(cfg, args, modality, tx)

    datasets = initialize_datasets(args)
    it = BatchIterator(datasets["unlabeled"], args.train_batch_size,
                       text_len=args.data_text_len,
                       mel_len=args.data_mel_len, seed=args.seed,
                       n_mels=args.num_mels)
    rng = jax.random.PRNGKey(args.seed + 7)
    history = []
    n = steps or args.epochs * args.epoch_steps
    for i in range(n):
        b = it.next_batch()
        batch = (jnp.asarray(b["text"]), jnp.asarray(b["mel"]),
                 jnp.asarray(b["text_len"]), jnp.asarray(b["mel_len"]))
        params, net_state, opt_state, loss = step(
            params, net_state, opt_state, jax.random.fold_in(rng, i), batch)
        history.append(float(loss))
        if (i + 1) % 10 == 0:
            print(f"[{modality}_auto] step {i + 1}/{n} "
                  f"loss {np.mean(history[-10:]):.4f}")
    return params, net_state, history


def main(argv=None):
    args = parse_with_config(argv)
    modality = getattr(args, "modality", None) or "text"
    train_single_modality(args, modality)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--modality", default="text", choices=["text", "speech"])
    known, rest = ap.parse_known_args()
    args = parse_with_config(rest)
    args.modality = known.modality
    train_single_modality(args, known.modality)
