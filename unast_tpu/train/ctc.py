"""CTC ASR trainer (models/ctc.py): supervised one-pass speech->text.

Capability add over the reference (AR-only ASR decode,
src/network.py:440-458): trains the shared speech encoder + CTC head
with optax.ctc_loss; greedy decode is part of the same forward pass, so
both training and serving are loop-free.

CLI: python -m unast_tpu.train.ctc [--ctc_steps N] [--synthetic ...]
Gate: scripts/ctc_check.py (greedy PER ~0 on the synthetic corpus).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import nn
from ..models import ctc as C
from ..models.config import ModelConfig
from .optim import make_optimizer, make_schedule


class CtcTrainState(NamedTuple):
    params: dict
    net_state: dict
    opt: object
    step: jnp.ndarray


def init_ctc_state(key, cfg: ModelConfig, args) -> CtcTrainState:
    params, net_state = C.ctc_asr_init(key, cfg)
    tx = make_optimizer(args, make_schedule(args))
    return CtcTrainState(params, net_state, tx.init(params),
                         jnp.zeros((), jnp.int32))


def make_ctc_step(cfg: ModelConfig, args):
    """step(ts, rng, batch) -> (new_ts, metrics); jit with donate (0,)."""
    tx = make_optimizer(args, make_schedule(args))

    def step(ts: CtcTrainState, rng, batch):
        def loss_fn(params):
            ctx = nn.Ctx(rng=rng, train=True)
            logits, pad, ns = C.ctc_logits(params, ts.net_state, ctx, cfg,
                                           batch["mel"], batch["mel_len"])
            loss = C.ctc_loss(logits, pad, batch["text"],
                              batch["text_len"])
            return loss, ns

        (loss, ns), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params)
        updates, opt = tx.update(grads, ts.opt, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return (CtcTrainState(params, ns, opt, ts.step + 1),
                {"ctc/loss": loss, "grad_norm": optax.global_norm(grads)})

    return step


def eval_per(ts: CtcTrainState, cfg: ModelConfig, batch) -> float:
    """Greedy-CTC phoneme error rate against gold transcripts."""
    from ..infer.metrics import compute_per

    @jax.jit
    def infer(params, net_state, mel, mel_len):
        (ids, lens), _ = C.ctc_asr_infer(params, net_state, nn.Ctx.eval(),
                                         cfg, mel, mel_len)
        return ids, lens

    ids, lens = infer(ts.params, ts.net_state, jnp.asarray(batch["mel"]),
                      jnp.asarray(batch["mel_len"]))
    return compute_per(batch["text"], np.asarray(ids), batch["text_len"],
                       np.asarray(lens))


def main(argv=None):
    import os

    from ..data.batching import BatchIterator
    from ..data.dataset import LJSpeechDataset, SyntheticSpeechDataset
    from .checkpoint import save_ckp
    from .config import model_config_from_args, parse_with_config

    args = parse_with_config(argv)
    cfg = model_config_from_args(args)
    n_steps = int(getattr(args, "ctc_steps", 0) or 2000)
    if getattr(args, "synthetic", False) or not os.path.isdir(args.data_path):
        ds = SyntheticSpeechDataset(size=int(args.synthetic_size), seed=0)
    else:
        from ..data.splits import REFERENCE_SPLITS_DIR
        local = os.path.join(args.data_path, "splits")
        splits = (local if os.path.isdir(local) else REFERENCE_SPLITS_DIR)
        ds = LJSpeechDataset(
            os.path.join(splits, "labeled_train.csv"),
            os.path.join(args.data_path, "mel_cache"))
    it = BatchIterator(ds, args.train_batch_size, args.data_text_len,
                       args.data_mel_len, seed=args.seed + 1)
    ts = init_ctc_state(jax.random.PRNGKey(0), cfg, args)
    step = jax.jit(make_ctc_step(cfg, args), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    keys = ("text", "text_len", "mel", "mel_len")
    for i in range(n_steps):
        raw = it.next_batch()
        batch = {k: jnp.asarray(raw[k]) for k in keys}
        ts, m = step(ts, jax.random.fold_in(rng, i), batch)
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss {float(m['ctc/loss']):.4f}")
    eval_it = BatchIterator(ds, args.eval_batch_size, args.data_text_len,
                            args.data_mel_len, seed=9)
    per = eval_per(ts, cfg, eval_it.next_batch())
    print(f"greedy CTC PER: {per:.4f}")
    if args.checkpoint_path:
        save_ckp(0, per, ts, True, args.checkpoint_path)
    return ts, per


if __name__ == "__main__":
    main()
