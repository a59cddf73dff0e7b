"""Training driver — parity with reference train() (src/train.py:567-696):
per epoch, epoch_steps outer steps of {accumulated 4-objective generator
step + discriminator step}, then temporary checkpoint -> evaluate ->
best-by-PER checkpoint -> periodic epoch checkpoint.

Run:  python -m unast_tpu.train.loop --config configs/transformer_test.json \
          --synthetic --epochs 1
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import BatchGetter, BatchIterator
from ..data.dataset import LJSpeechDataset, SyntheticSpeechDataset
from ..infer.evaluate import evaluate
from .config import (parse_with_config, model_config_from_args,
                     apply_runtime_flags)
from .checkpoint import save_ckp, load_ckp, wait_for_saves
from .observe import MetricsWriter, log_loss_metrics, check_nan, maybe_profile
from .steps import init_train_state, make_train_step


def initialize_datasets(args):
    """labeled / unlabeled / val / full (+ test) — src/train.py:961-975."""
    if args.synthetic:
        size = args.synthetic_size
        mk = lambda seed, n: SyntheticSpeechDataset(size=n, seed=seed)
        return {
            "labeled": mk(1, max(2, size // 8)),
            "unlabeled": mk(2, size),
            "val": mk(3, max(2, size // 8)),
            "full": mk(4, size),
            "test": mk(5, max(2, size // 8)),
        }
    # Default split identity = the reference's exact CSVs (shipped in-package)
    # unless the user staged their own under <data_path>/splits or passed
    # --splits_dir explicitly.
    from ..data.splits import REFERENCE_SPLITS_DIR
    local = os.path.join(args.data_path, "splits")
    splits_dir = args.splits_dir or (
        local if os.path.isdir(local) else REFERENCE_SPLITS_DIR)
    cache_dir = os.path.join(args.data_path, "mel_cache")
    ds = lambda name: LJSpeechDataset(
        os.path.join(splits_dir, name + ".csv"), cache_dir)
    return {"labeled": ds("labeled_train"), "unlabeled": ds("unlabeled_train"),
            "val": ds("val"), "full": ds("full_train"), "test": ds("test")}


def _fit_eval_bs(n: int, requested: int) -> int:
    """Largest batch size <= requested that divides the set, so evaluation
    covers EVERY utterance (the reference instead asserts divisibility,
    src/train.py:987)."""
    bs = max(1, min(requested, n))
    while n % bs != 0:
        bs -= 1
    return bs


def _val_batches(args, val_ds):
    """Fixed-shape eval batches covering the whole validation set."""
    bs = _fit_eval_bs(len(val_ds), args.eval_batch_size)
    if bs != args.eval_batch_size:
        print(f"[eval] batch size {args.eval_batch_size} -> {bs} "
              f"(divides {len(val_ds)})")
    it = BatchIterator(val_ds, batch_size=bs,
                       text_len=args.data_text_len, mel_len=args.data_mel_len,
                       seed=args.seed, n_mels=args.num_mels)
    n = len(val_ds) // bs
    it._reshuffle()
    return [it.next_batch() for _ in range(n)]


def train(args):
    # --fast_prng: hardware RBG PRNG for all in-step randomness (dropout
    # masks, DAE noise, SpecAugment). Measured 1.6x faster full train step
    # on v5e at the flagship scale (BENCHMARKS.md) — threefry mask
    # generation is a major cost of train-mode steps. Off by default: rbg
    # changes the random streams (init + dropout), so
    # reference-reproducible runs keep threefry.
    apply_runtime_flags(args)
    from ..parallel.multihost import (maybe_initialize_distributed,
                                      HostShardedDataset)
    maybe_initialize_distributed()
    cfg = model_config_from_args(args)
    datasets = initialize_datasets(args)
    n_proc = jax.process_count()
    if n_proc > 1:
        # Pod path: each host reads a strided corpus shard and contributes
        # train_batch_size/n_proc rows per micro-batch; the global sharded
        # batch is assembled below (make_array_from_process_local_data) and
        # XLA's dp psum reduces grads over ICI/DCN as usual.
        assert args.train_batch_size % n_proc == 0, (
            f"global batch {args.train_batch_size} must divide over "
            f"{n_proc} hosts")
        args.train_batch_size //= n_proc
        for k in ("labeled", "unlabeled", "full"):
            datasets[k] = HostShardedDataset(datasets[k])
    batch_getter = BatchGetter(args, datasets["labeled"],
                               datasets["unlabeled"], datasets["full"],
                               n_mels=args.num_mels)
    if not args.cm_infer_mel_len:
        args.cm_infer_mel_len = cfg.max_mel_len
    if not args.cm_infer_text_len:
        args.cm_infer_text_len = cfg.max_text_len

    key = jax.random.PRNGKey(args.seed)
    ts = init_train_state(key, cfg, args)
    s_epoch, best = 0, 300.0
    if not args.load_path and getattr(args, "auto_resume", False):
        # Preemption-safe restart: pick up the newest checkpoint in
        # checkpoint_path without an explicit --load_path (capability add;
        # the reference resumes only via explicit load_path,
        # src/train.py:936-942).
        cand = os.path.join(args.checkpoint_path, "model_most_recent.ckpt")
        if os.path.exists(cand):
            args.load_path = cand
            print(f"[INFO] auto_resume: {cand}")
    if args.load_path and os.path.exists(args.load_path):
        s_epoch, best, ts, _ = load_ckp(args.load_path, ts)
        print(f"[INFO] Training from epoch {s_epoch}.")

    if getattr(args, "sp_warmup_steps", 0) and s_epoch == 0:
        # Grounding curriculum (BENCHMARKS.md round-2 convergence study):
        # anchor the cross-modal alignment with supervised-only steps before
        # enabling the DAE/back-translation/adversarial mixture. Runs
        # single-device ahead of any mesh sharding.
        import copy
        wargs = copy.copy(args)
        wargs.ae_steps = wargs.cm_steps = wargs.d_steps = 0
        wargs.sp_steps = max(1, args.sp_steps)
        wcfg = cfg.replace(use_discriminator=False)
        wstep = jax.jit(make_train_step(wcfg, wargs), donate_argnums=(0,))
        wrng = jax.random.PRNGKey(args.seed + 29)
        t0 = time.time()
        for s in range(args.sp_warmup_steps):
            wb = jax.tree_util.tree_map(
                jnp.asarray, batch_getter.step_batches(wargs, False))
            ts, wm = wstep(ts, jax.random.fold_in(wrng, s), wb)
        print(f"[sp_warmup] {args.sp_warmup_steps} supervised-only steps "
              f"in {time.time() - t0:.1f}s "
              f"(final asr {float(wm['sp/asr']):.3f} "
              f"tts {float(wm['sp/tts']):.3f})")

    step_fn = make_train_step(cfg, args)
    mesh = None
    sp = getattr(args, "sp", 1) or 1
    ep = getattr(args, "ep", 1) or 1
    if args.dp * args.tp * sp * ep > 1:
        from ..parallel import make_mesh, shard_train_step, batch_shardings
        mesh = make_mesh(args.dp, args.tp, sp, ep)
        print(f"mesh: {dict(mesh.shape)} over "
              f"{args.dp * args.tp * sp * ep} devices")
        example = jax.tree_util.tree_map(
            jnp.asarray, batch_getter.step_batches(args, cfg.use_discriminator))
        train_step, ts = shard_train_step(step_fn, mesh, ts, example,
                                          zero=getattr(args, "zero", 0))
        if n_proc > 1:
            # each host holds only its local rows; assemble the global
            # sharded batch arrays across processes
            _b_shard = lambda b: jax.tree_util.tree_map(
                lambda leaf, s: jax.make_array_from_process_local_data(
                    s, np.asarray(leaf)), b, batch_shardings(mesh, b))
        else:
            _b_shard = lambda b: jax.device_put(b, batch_shardings(mesh, b))
    else:
        train_step = jax.jit(step_fn, donate_argnums=(0,))
        _b_shard = lambda b: b
    writer = MetricsWriter(
        jsonl_path=os.path.join(args.checkpoint_path, "metrics.jsonl"),
        tb_log_path=args.tb_log_path)

    from ..models.unast import num_params
    print(f"Training model with {num_params(ts.params)} parameters")

    from .steps import ema_params
    _eval_params = lambda: (ema_params(ts) if getattr(args, "ema_decay", 0.0)
                            else None) or ts.params

    val_batches = _val_batches(args, datasets["val"])
    per, eval_losses = evaluate(_eval_params(), ts.net_state, cfg, args,
                                val_batches)
    log_loss_metrics(eval_losses, s_epoch - 1, eval_=True)

    # Host-side prefetch: the next step's batches are collated on a worker
    # thread while the device runs the current step (the reference gets the
    # same overlap from DataLoader workers, src/train.py:37-54).
    import queue as _queue
    import threading

    prefetch_q: "_queue.Queue" = _queue.Queue(maxsize=2)
    stop_prefetch = threading.Event()

    def _producer():
        while not stop_prefetch.is_set():
            try:
                b = batch_getter.step_batches(args, cfg.use_discriminator)
            except Exception as e:  # surface data errors in the main thread
                b = e
            while not stop_prefetch.is_set():
                try:
                    prefetch_q.put(b, timeout=0.5)
                    break
                except _queue.Full:
                    continue
            if isinstance(b, Exception):
                return

    producer = threading.Thread(target=_producer, daemon=True)
    producer.start()

    rng = jax.random.PRNGKey(args.seed + 17)
    step_count = s_epoch * args.epoch_steps
    for epoch in range(s_epoch, args.epochs):
        epoch_losses = {}
        t0 = time.time()
        with maybe_profile(args.profile_dir if epoch == s_epoch else None):
            for s in range(args.epoch_steps):
                batches = prefetch_q.get()
                if isinstance(batches, Exception):
                    raise batches
                batches = _b_shard(jax.tree_util.tree_map(jnp.asarray, batches))
                step_rng = jax.random.fold_in(rng, step_count)
                ts, metrics = train_step(ts, step_rng, batches)
                step_count += 1
                if step_count % max(1, args.log_every) == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    check_nan(host, step_count, args.checkpoint_path)
                    writer.scalars(step_count, host, prefix="train/")
                    for k, v in host.items():
                        epoch_losses.setdefault(k, []).append(v)
        dt = time.time() - t0
        print(f"Epoch {epoch}: {args.epoch_steps} steps in {dt:.1f}s "
              f"({args.epoch_steps / dt:.2f} steps/s)")

        # pre-save so a crash in eval loses nothing (src/train.py:666-667)
        save_ckp(epoch, 300.0, ts, False, args.checkpoint_path,
                 temporary_save=True, rng=step_rng,
                 async_save=getattr(args, "async_ckpt", False))
        per, eval_losses = evaluate(_eval_params(), ts.net_state, cfg, args,
                                    val_batches)
        log_loss_metrics(epoch_losses, epoch)
        log_loss_metrics(eval_losses, epoch, eval_=True)
        writer.scalars(step_count, {k: np.mean(v) for k, v in
                                    eval_losses.items()}, prefix="eval/")
        writer.scalars(step_count, {"per": per}, prefix="eval/")

        save_ckp(epoch, per, ts, per < best, args.checkpoint_path,
                 rng=step_rng, async_save=getattr(args, "async_ckpt", False))
        if args.tb_log_path:
            from .observe import log_example
            try:
                idx = int(np.random.randint(0, len(datasets["val"])))
                log_example(writer, ts.params, ts.net_state, cfg,
                            datasets["val"][idx], step_count, "eval")
            except Exception as e:  # logging must never kill training
                print(f"[observe] example logging failed: {e}")
        print("Eval_ epoch {:-3d} PER {:0.3f}%".format(epoch, per * 100))
        if per < best:
            print("\t Best score - saving model!")
            best = per
        if args.save_every and (epoch + 1) % args.save_every == 0:
            save_ckp(epoch, per, ts, per < best, args.checkpoint_path,
                     epoch_save=True, rng=step_rng,
                     async_save=getattr(args, "async_ckpt", False))
    stop_prefetch.set()
    wait_for_saves()
    writer.close()
    return ts, best


def evaluate_main(args):
    """Test-set evaluation with dumps (src/train.py:985-998)."""
    cfg = model_config_from_args(args)
    datasets = initialize_datasets(args)
    test_ds = datasets["test"]
    bs = _fit_eval_bs(len(test_ds), args.eval_batch_size)
    it = BatchIterator(test_ds, batch_size=bs,
                       text_len=args.data_text_len, mel_len=args.data_mel_len,
                       seed=args.seed, n_mels=args.num_mels)
    it._order = np.arange(len(test_ds))  # unshuffled, reference shuffle=False
    n = len(test_ds) // bs
    batches = [it.next_batch() for _ in range(n)]

    ts = init_train_state(jax.random.PRNGKey(args.seed), cfg, args)
    if args.load_path and os.path.exists(args.load_path):
        _, _, ts, _ = load_ckp(args.load_path, ts)
    per, eval_losses, d_score = evaluate(ts.params, ts.net_state, cfg, args,
                                         batches, is_test=True)
    log_loss_metrics(eval_losses, 0, eval_=True)
    print(f"per : {per}")
    print(f"d_score : {d_score}")
    return per, d_score


def main(argv=None):
    from ..parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()  # must precede any backend use
    args = parse_with_config(argv)
    print(f"devices: {jax.devices()}")
    if args.is_eval_test:
        print("#### DOING EVALUATION ####")
        evaluate_main(args)
    else:
        print("#### TRAINING ####")
        train(args)


if __name__ == "__main__":
    main()
