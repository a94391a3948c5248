"""Jitted train/eval steps with optax — the reference train loop's core.

Reference semantics (``train.py:219-312``): Adam(lr=1e-4) over all params
(``train.py:204-208``), loss = mean over the per-example loss vector
(``train.py:243-248``), float64 everywhere (``net.double()``,
``train.py:222``; here: the configurable ``compute_dtype``, f32 by default
on TPU), validation every epoch on seq 9, per-epoch checkpointing.

The step donates the previous state buffers (HBM-friendly) and is safe to
jit over a sharded batch: with batch arrays sharded over the mesh ``data``
axis and state replicated, XLA inserts the gradient reductions (the
DataParallel-gather equivalent, SURVEY.md §2.6 X1).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, key, learning_rate: float,
                       optimizer: Optional[optax.GradientTransformation] = None
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    params, bn_state = model.init(key)
    tx = optimizer if optimizer is not None else optax.adam(learning_rate)
    opt_state = tx.init(params)
    return TrainState(params, bn_state, opt_state,
                      jnp.zeros((), jnp.int32)), tx


def make_train_step(model, tx: optax.GradientTransformation,
                    donate: bool = True) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics)."""

    def step(state: TrainState, batch: Dict):
        def loss_fn(params, bn_state):
            out, new_bn = model.apply(params, bn_state, batch, train=True)
            return jnp.mean(out["loss"]), (out, new_bn)

        grads, (out, new_bn) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.bn_state)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": jnp.mean(out["loss"]),
            "grad_norm": optax.global_norm(grads),
        }
        return TrainState(new_params, new_bn, new_opt, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model) -> Callable:
    """Returns jitted (params, bn_state, batch) -> outputs (eval mode)."""

    def step(params, bn_state, batch):
        out, _ = model.apply(params, bn_state, batch, train=False)
        return out

    return jax.jit(step)
