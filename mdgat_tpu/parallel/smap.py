"""Explicit shard_map execution — the multi-chip path for the Pallas
kernels.

Under plain ``jit`` + sharding propagation, ``pallas_call`` has no
partitioning rule: XLA all-gathers its operands and every device runs the
kernel on the FULL batch (verified on the virtual mesh — 4 all-gathers
and a replicated output for a batch-sharded input). The XLA-op path
partitions fine, which is why the round-2 dryruns scaled; the kernels did
not. This module wraps the train/eval steps in ``jax.shard_map`` over the
mesh ``data`` axis so each device runs its own batch shard through the
kernels, with the cross-device semantics made explicit:

* gradients / loss: per-shard ``jax.grad`` then ``pmean`` over ``data``
  (the DataParallel-equivalent reduction, reference ``train.py:190-196``);
* train-mode BatchNorm: batch statistics psum over ``data`` inside the
  model (``ops/mlp.py`` ``bn_cross_replica`` + the fused train-layer
  epilogue), so per-shard execution is numerically the global-batch
  computation — matching the plain-jit path and the reference;
* optimizer update: computed identically on every device from the
  pmean'd gradients (state stays replicated, no broadcast needed).

Sequence (``seq``) parallelism stays on the propagation path: the fused
kernels need the full keypoint axis per example, so seq-sharded runs use
the XLA kernels (``use_pallas`` off) — the existing behavior.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from mdgat_tpu.train.loop import TrainState


def make_shard_map_train_step(model, tx: optax.GradientTransformation,
                              mesh: Mesh, donate: bool = True) -> Callable:
    """(state, batch) -> (state, metrics), batch sharded over ``data``."""

    def shard_step(state: TrainState, batch: Dict):
        def loss_fn(params, bn_state):
            out, new_bn = model.apply(params, bn_state, batch, train=True,
                                      axis_name="data")
            return jnp.mean(out["loss"]), new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state)
        # equal shard sizes: pmean of shard means == global mean, and the
        # pmean'd grads equal the global-batch gradient
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
        return (TrainState(new_params, new_bn, new_opt, state.step + 1),
                metrics)

    # check_vma=False: core ops (e.g. the Sinkhorn scan in ops/transport.py)
    # build carries from unvarying constants, which trips the static
    # varying-manual-axes check; the cross-device reductions here are
    # explicit (pmean grads/loss, psum'd BN stats), so every P() output is
    # genuinely replica-identical.
    smapped = jax.shard_map(shard_step, mesh=mesh,
                            in_specs=(P(), P("data")),
                            out_specs=(P(), P()), check_vma=False)
    return jax.jit(smapped, donate_argnums=(0,) if donate else ())


def make_shard_map_eval_step(model, mesh: Mesh) -> Callable:
    """(params, bn_state, batch) -> outputs; batch + outputs sharded
    over ``data`` (eval BN uses running stats — no collectives)."""

    def fwd(params, bn_state, batch):
        out, _ = model.apply(params, bn_state, batch, train=False)
        return out

    smapped = jax.shard_map(fwd, mesh=mesh,
                            in_specs=(P(), P(), P("data")),
                            out_specs=P("data"), check_vma=False)
    return jax.jit(smapped)


def make_eval_runtime(model, cfg, params, bn_state, batch_size: int):
    """Eval-CLI execution setup: ``(eval_step, params, bn_state,
    shard_inputs)``.

    Multi-device data axis with the Pallas kernels enabled
    (``Config.resolve_shard_map``) -> the shard_map per-shard-kernel eval
    step with replicated params and a ``shard_batch`` input hook for the
    EvalPipeline; otherwise the plain jitted step (single device, or
    sharding propagation handles the XLA-op path). Falls back to plain
    with a warning when ``batch_size`` doesn't divide over the mesh (the
    shard_map in_specs need equal shards)."""
    import sys

    from mdgat_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from mdgat_tpu.train.loop import make_eval_step

    mesh = make_mesh(data=cfg.data_parallel or None, seq=1)
    n_data = mesh.shape["data"]
    if not cfg.resolve_shard_map(n_data):
        return make_eval_step(model), params, bn_state, None
    if batch_size % n_data != 0:
        print(f"[warn] batch_size {batch_size} not divisible by the "
              f"{n_data}-device data axis; shard_map eval disabled "
              "(set --batch_size to a multiple or --shard_map false)",
              file=sys.stderr)
        return make_eval_step(model), params, bn_state, None
    step = make_shard_map_eval_step(model, mesh)
    params, bn_state = replicate((params, bn_state), mesh)
    return step, params, bn_state, (lambda d: shard_batch(d, mesh))
