#!/usr/bin/env python3
"""Training entry point — reference-compatible CLI (``train.py`` upstream).

Trains MDGAT (or the SuperGlue baseline) on KITTI keypoint pairs with the
gap loss, validating on seq 9 each epoch, checkpointing per epoch with the
reference's run-name scheme and best-model naming, and logging the same
tensorboard scalars (``Train/val_loss``, ``Train/epoch_loss``).

TPU-native execution: batches are sharded over the device mesh's ``data``
axis (the DataParallel replacement); the train step is one jitted XLA
program; data preprocessing (GT correspondences, descriptor normalization)
runs as a second jitted program.
"""

import os
import time

import numpy as np

from mdgat_tpu.cli import (build_parser, config_from_args,
                           maybe_generate_synthetic, setup_jax)


def resolve_resume(cfg):
    """Load a resume checkpoint with the reference's semantics
    (``train.py:159-164,202-204``): fresh Adam is built at the
    *checkpointed* ``lr_schedule`` (not the CLI lr), ``best_loss`` resets
    to 1, ``start_epoch`` to 1; Adam moments are NOT restored.

    Returns ``(params, bn_state, meta, lr, best_loss)``.
    """
    import jax
    import jax.numpy as jnp
    from mdgat_tpu.core.checkpoint import (load_checkpoint,
                                           load_pth_checkpoint)
    if cfg.resume_model.endswith(".pth"):
        params, bn_state, meta = load_pth_checkpoint(
            cfg.resume_model, cfg, dtype=np.dtype(cfg.param_dtype))
    else:
        ck = load_checkpoint(cfg.resume_model)
        params = jax.tree.map(jnp.asarray, ck["params"])
        bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])
        meta = ck["meta"]
    return params, bn_state, meta, float(meta["lr_schedule"]), 1.0


def main():
    args = build_parser("train").parse_args()
    cfg = config_from_args(args, "train")
    setup_jax(cfg, args)

    import jax
    import jax.numpy as jnp
    from mdgat_tpu.core.checkpoint import save_checkpoint
    from mdgat_tpu.data import (SparseDataset, model_inputs,
                                prefetch_batches, prepare_batch_fn)
    from mdgat_tpu.models import build_model
    from mdgat_tpu.parallel import make_mesh, replicate, shard_batch
    from mdgat_tpu.parallel.multihost import (globalize_batch, is_primary,
                                              process_batch_rows)
    from mdgat_tpu.train import (TrainState, create_train_state,
                                 make_eval_step, make_train_step)
    from mdgat_tpu.utils import PhaseTimer, ScalarLogger

    cfg = maybe_generate_synthetic(cfg, args)

    # multi-host: host-side side effects (tensorboard events, checkpoint
    # writes) belong to process 0 only; every process still computes the
    # same replicated state/metrics
    primary = is_primary()
    log_path = cfg.run_dir("./logs")
    model_out_path = cfg.run_dir(cfg.model_out_path)
    os.makedirs(log_path, exist_ok=True)
    os.makedirs(model_out_path, exist_ok=True)
    logger = ScalarLogger(log_path) if primary else None
    print(f"Train {cfg.net} | k={cfg.k} | descriptor={cfg.descriptor} | "
          f"loss={cfg.loss_method} | dataset={cfg.dataset}\n"
          f"model_out_path: {model_out_path}\nlog_path: {log_path}")

    model = build_model(cfg)
    start_epoch, best_loss = 1, 1e6
    lr = cfg.learning_rate
    resume_loaded = None
    if cfg.resume:
        params, bn_state, meta, lr, best_loss = resolve_resume(cfg)
        resume_loaded = (params, bn_state)
        print(f"Resume from {cfg.resume_model} at epoch {meta['epoch']}, "
              f"loss {meta['loss']:.4f}, lr {lr}")
    state, tx = create_train_state(model, jax.random.PRNGKey(cfg.seed), lr)
    if resume_loaded is not None:
        params, bn_state = resume_loaded
        state = TrainState(params, bn_state, tx.init(params), state.step)

    train_set = SparseDataset(cfg, "train")
    val_set = SparseDataset(cfg, "val")
    prepare = prepare_batch_fn(cfg.threshold, cfg.mutual_check,
                               cfg.compute_dtype,
                               "float64" if cfg.compute_dtype == "float64"
                               else "float32")

    mesh = make_mesh(data=cfg.data_parallel or None,
                     seq=cfg.seq_parallel)
    n_data = mesh.shape["data"]
    # multi-host (parallel/multihost.py): every process builds the same
    # global mesh and dispatches the same programs; each host loads only
    # its own contiguous block of batch rows and the global batch array
    # is assembled from the per-process shards
    multihost = jax.process_count() > 1
    batch_rows = (process_batch_rows(mesh, cfg.batch_size,
                                     shard_seq=cfg.seq_parallel > 1)
                  if multihost else None)

    def to_device(d):
        if multihost:
            return globalize_batch(d, mesh, cfg.batch_size,
                                   shard_seq=cfg.seq_parallel > 1)
        return shard_batch(d, mesh, shard_seq=cfg.seq_parallel > 1)

    state = replicate(state, mesh)
    use_smap = cfg.resolve_shard_map(n_data)
    if use_smap and cfg.batch_size % n_data != 0:
        # the shard_map in_specs need equal batch shards — same graceful
        # fallback as make_eval_runtime (parallel/smap.py)
        print(f"[warn] batch_size {cfg.batch_size} not divisible by the "
              f"{n_data}-device data axis; shard_map training disabled "
              "(set --batch_size to a multiple or --shard_map false)")
        use_smap = False
    if (use_smap and cfg.seq_parallel > 1
            and cfg.max_keypoints % cfg.seq_parallel != 0):
        # the seq in_specs need equal keypoint shards; sharding
        # propagation handles an uneven split (implicit GSPMD padding)
        print(f"[warn] max_keypoints {cfg.max_keypoints} not divisible by "
              f"the {cfg.seq_parallel}-device seq axis; shard_map training "
              "disabled (set --max_keypoints to a multiple)")
        use_smap = False
    if use_smap:
        # explicit per-shard execution: the Pallas kernels have no SPMD
        # partitioning rule under plain jit (operands would be
        # all-gathered); shard_map runs them per batch shard with pmean'd
        # grads + psum'd BN batch stats (parallel/smap.py)
        from mdgat_tpu.parallel import (make_shard_map_eval_step,
                                        make_shard_map_train_step)
        train_step = make_shard_map_train_step(model, tx, mesh,
                                               donate=cfg.donate_state)
        eval_step = make_shard_map_eval_step(model, mesh)
    else:
        train_step = make_train_step(model, tx, donate=cfg.donate_state)
        eval_step = make_eval_step(model)
    timer = PhaseTimer()

    print(f"mesh: {dict(mesh.shape)} | shard_map: {use_smap} | "
          f"train pairs: {len(train_set)} | val pairs: {len(val_set)}")

    for epoch in range(start_epoch, cfg.epoch + 1):
        t_epoch = time.time()
        step_losses, n_steps = [], 0
        # producer-thread batch prefetch (host IO/assembly overlaps the
        # async device steps — the reference's DataLoader(num_workers=1),
        # train.py:166-171); exceptions propagate to this loop
        for batch in prefetch_batches(
                lambda: train_set.batches(cfg.batch_size, shuffle=True,
                                          seed=cfg.seed + epoch,
                                          rows=batch_rows),
                cfg.prefetch):
            with timer("prepare"):
                prepared = prepare(batch)
                sharded = to_device(model_inputs(prepared))
            with timer("train_step"):
                # async dispatch: losses stay on device until epoch end so
                # the host never blocks on a per-step readback
                state, metrics = train_step(state, sharded)
            step_losses.append(metrics["loss"])
            n_steps += 1
            if args.steps_per_epoch and n_steps >= args.steps_per_epoch:
                break
        epoch_loss = float(np.mean([np.asarray(l) for l in step_losses])) \
            if step_losses else 0.0

        # validation (reference: every epoch on seq 9, train.py:263-285)
        val_losses = []
        for batch in prefetch_batches(
                lambda: val_set.batches(cfg.batch_size, shuffle=False,
                                        rows=batch_rows),
                cfg.prefetch):
            prepared = prepare(batch)
            sharded = to_device(model_inputs(prepared))
            out = eval_step(state.params, state.bn_state, sharded)
            val_losses.append(jnp.mean(out["loss"]))
            if args.steps_per_epoch and len(val_losses) >= max(
                    1, args.steps_per_epoch // 4):
                break
        mean_val_loss = float(np.mean([np.asarray(l) for l in val_losses])) \
            if val_losses else np.inf
        dt = time.time() - t_epoch
        print(f"Epoch [{epoch}/{cfg.epoch}] {dt:.1f}s | epoch_loss "
              f"{epoch_loss:.4f} | val_loss {mean_val_loss:.4f} | "
              f"best {best_loss:.4f}")

        if mean_val_loss <= best_loss + 1e-5:
            best_loss = mean_val_loss
            out_file = (f"{model_out_path}/best_model_epoch_{epoch}"
                        f"(val_loss{best_loss}).npz")
        else:
            out_file = f"{model_out_path}/model_epoch_{epoch}.npz"
        if primary:
            params_host = jax.device_get(state.params)
            bn_host = jax.device_get(state.bn_state)
            opt_host = jax.device_get(state.opt_state)
            # all five reference checkpoint fields incl. the optimizer
            # state and current lr (train.py:288-294)
            save_checkpoint(out_file, params_host, bn_host,
                            opt_state=opt_host, epoch=epoch, lr=lr,
                            loss=mean_val_loss)
            print(f"Checkpoint saved to {out_file}")
            logger.add_scalar("Train/val_loss", mean_val_loss, epoch)
            logger.add_scalar("Train/epoch_loss", epoch_loss, epoch)

    print(timer.report())
    if logger is not None:
        logger.close()


if __name__ == "__main__":
    main()
