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

When the mesh also has a ``seq`` axis (>1), the keypoint dimension is
context-parallel: the GNN runs on local query rows with per-layer
all-gathered key/value ACTIVATIONS (O(N·C) over ICI — never the N×M
score slab), and the O(iters·N·M) OT/decision/loss tail runs on
all-gathered descriptors, replicated over the small seq axis (the
redundancy costs (s−1)/s of a ~5%-of-step stage; distributing the
per-iteration Sinkhorn row/col reductions would pay 2·iters collectives
instead). The gradient contract making this exact: the loss cotangent
entering each member's backward is scaled by 1/s (``_scale_grad``), so
the replicated tail's s-fold gradient double-count cancels, the gather
transposes (psum-scatter) hand each member its local rows' full
cotangent, and one uniform ``psum(grads, "seq")`` + ``pmean(grads,
"data")`` is the exact global-batch gradient for EVERY parameter —
replicated-path (``bin_score``) and sharded-path (GNN/encoder) alike.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from mdgat_tpu.train.loop import TrainState


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _scale_grad(x, scale: float):
    """Identity forward; cotangent scaled by ``scale`` in the backward."""
    return x


def _scale_grad_fwd(x, scale):
    return x, None


def _scale_grad_bwd(scale, _, g):
    return (g * scale,)


_scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


def _seq_size(mesh: Mesh) -> int:
    return dict(mesh.shape).get("seq", 1)


def _seq_in_specs(keys) -> Dict[str, P]:
    from mdgat_tpu.parallel.mesh import batch_pspec
    return {k: batch_pspec(k, shard_seq=True) for k in keys}


def make_shard_map_train_step(model, tx: optax.GradientTransformation,
                              mesh: Mesh, donate: bool = True) -> Callable:
    """(state, batch) -> (state, metrics), batch sharded over ``data``
    (and, when the mesh has a >1 ``seq`` axis, keypoints over ``seq``)."""
    n_seq = _seq_size(mesh)
    bn_axes = "data" if n_seq == 1 else ("data", "seq")
    seq_axis = None if n_seq == 1 else "seq"

    def shard_step(state: TrainState, batch: Dict):
        def loss_fn(params, bn_state):
            out, new_bn = model.apply(params, bn_state, batch, train=True,
                                      axis_name=bn_axes, seq_axis=seq_axis,
                                      seq_size=n_seq)
            loss = jnp.mean(out["loss"])
            if n_seq > 1:
                # see module docstring: cancels the replicated tail's
                # s-fold gradient double-count
                loss = _scale_grad(loss, 1.0 / n_seq)
            return loss, new_bn

        (loss, new_bn), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.bn_state)
        # equal shard sizes: pmean of shard means == global mean, and the
        # pmean'd grads equal the global-batch gradient
        if n_seq > 1:
            grads = jax.lax.psum(grads, "seq")
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")  # identical across seq members
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
    if n_seq == 1:
        smapped = jax.shard_map(shard_step, mesh=mesh,
                                in_specs=(P(), P("data")),
                                out_specs=(P(), P()), check_vma=False)
        return jax.jit(smapped, donate_argnums=(0,) if donate else ())

    # seq-sharded batches need per-key in_specs ([B,N,...] keys split over
    # (data, seq), [B,...] keys over data only) — built per key-set and
    # cached so each batch signature wraps + compiles once
    @functools.lru_cache(maxsize=None)
    def _compiled(keys):
        smapped = jax.shard_map(shard_step, mesh=mesh,
                                in_specs=(P(), _seq_in_specs(keys)),
                                out_specs=(P(), P()), check_vma=False)
        return jax.jit(smapped, donate_argnums=(0,) if donate else ())

    def step(state, batch):
        return _compiled(tuple(sorted(batch)))(state, batch)

    # keep the jitted surface (lower/compile for HLO inspection — used by
    # __graft_entry__.dryrun_multichip's collective-structure assertions)
    step.lower = lambda state, batch: \
        _compiled(tuple(sorted(batch))).lower(state, batch)
    return step


def make_shard_map_eval_step(model, mesh: Mesh) -> Callable:
    """(params, bn_state, batch) -> outputs; batch + outputs sharded
    over ``data`` (eval BN uses running stats — no collectives). With a
    >1 ``seq`` mesh axis, keypoint axes are additionally sharded over
    ``seq``; outputs are full-N per data shard (the tail runs on gathered
    descriptors, identical across seq members)."""
    n_seq = _seq_size(mesh)

    def fwd(params, bn_state, batch):
        out, _ = model.apply(params, bn_state, batch, train=False,
                             seq_axis=None if n_seq == 1 else "seq",
                             seq_size=n_seq)
        return out

    if n_seq == 1:
        smapped = jax.shard_map(fwd, mesh=mesh,
                                in_specs=(P(), P(), P("data")),
                                out_specs=P("data"), check_vma=False)
        return jax.jit(smapped)

    @functools.lru_cache(maxsize=None)
    def _compiled(keys):
        smapped = jax.shard_map(fwd, mesh=mesh,
                                in_specs=(P(), P(), _seq_in_specs(keys)),
                                out_specs=P("data"), check_vma=False)
        return jax.jit(smapped)

    def step(params, bn_state, batch):
        return _compiled(tuple(sorted(batch)))(params, bn_state, batch)

    step.lower = lambda params, bn_state, batch: \
        _compiled(tuple(sorted(batch))).lower(params, bn_state, batch)
    return step


def make_eval_runtime(model, cfg, params, bn_state, batch_size: int):
    """Eval-CLI execution setup: ``(eval_step, params, bn_state,
    shard_inputs)``.

    Multi-device mesh with the Pallas kernels enabled
    (``Config.resolve_shard_map``) -> the shard_map per-shard-kernel eval
    step with replicated params and a ``shard_batch`` input hook for the
    EvalPipeline (keypoint axes additionally sharded over a >1 ``seq``
    axis — context-parallel eval); otherwise the plain jitted step
    (single device, or sharding propagation handles the XLA-op path).
    Falls back to plain with a warning when ``batch_size`` doesn't divide
    over the data axis or the keypoint count over the seq axis (the
    shard_map in_specs need equal shards; fixed-size batches are
    ``max_keypoints`` rows, variable-N batches are 128-multiple
    buckets — data/pipeline.py)."""
    import sys

    from mdgat_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from mdgat_tpu.train.loop import make_eval_step

    if jax.process_count() > 1:
        # Multi-host eval is embarrassingly parallel: each process
        # evaluates its own contiguous pair block (eval_pair_range) on a
        # mesh of its LOCAL devices only — no cross-host arrays, every
        # device of the local mesh addressable, per-pair readbacks stay
        # host-local. The per-pair metric records merge at the end
        # (multihost.py::allgather_host_vector). cfg.batch_size and
        # cfg.data_parallel are therefore PER-PROCESS quantities here.
        local = jax.local_devices()
        n_data = min(cfg.data_parallel or len(local),
                     len(local) // cfg.seq_parallel)
        mesh = make_mesh(data=max(n_data, 1), seq=cfg.seq_parallel,
                         devices=local)
    else:
        mesh = make_mesh(data=cfg.data_parallel or None,
                         seq=cfg.seq_parallel)
    n_data, n_seq = mesh.shape["data"], mesh.shape["seq"]
    if not cfg.resolve_shard_map(n_data):
        return make_eval_step(model), params, bn_state, None
    if batch_size % n_data != 0:
        print(f"[warn] batch_size {batch_size} not divisible by the "
              f"{n_data}-device data axis; shard_map eval disabled "
              "(set --batch_size to a multiple or --shard_map false)",
              file=sys.stderr)
        return make_eval_step(model), params, bn_state, None
    kpt_grain = cfg.max_keypoints if cfg.ensure_kpts_num else 128
    if n_seq > 1 and kpt_grain % n_seq != 0:
        print(f"[warn] keypoint counts (multiples of {kpt_grain}) not "
              f"divisible by the {n_seq}-device seq axis; shard_map eval "
              "disabled (set --seq_parallel to a divisor)",
              file=sys.stderr)
        return make_eval_step(model), params, bn_state, None
    step = make_shard_map_eval_step(model, mesh)
    params, bn_state = replicate((params, bn_state), mesh)
    return step, params, bn_state, (
        lambda d: shard_batch(d, mesh, shard_seq=n_seq > 1))
