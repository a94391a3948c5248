"""Point-wise MLP with BatchNorm — the reference's core building block.

The reference builds every encoder/propagation MLP from 1x1 ``nn.Conv1d`` +
``BatchNorm1d`` + ReLU stacks (``models/mdgat.py:34-46``). A 1x1 conv over a
``[B, C, N]`` tensor is exactly a per-point dense layer, so the TPU-native
formulation is a plain matmul over the ``[B, N, C]`` layout — this maps the
whole MLP onto the MXU with XLA fusing bias/BN/ReLU into the matmul epilogue.

BatchNorm semantics match ``torch.nn.BatchNorm1d``: normalization over the
(batch, points) axes per channel with biased variance, eps=1e-5; running
stats updated with momentum 0.1 and *unbiased* batch variance. Both train
mode (batch stats, used by the reference during training, ``train.py:222``)
and eval mode (running stats, ``net.eval()``) are supported.

Parameters are explicit pytrees:
  layer:  {"w": [Cin, Cout], "b": [Cout]}           (dense == conv1x1)
  bn:     {"scale": [C], "bias": [C]}               (learnable)
  bn state: {"mean": [C], "var": [C]}               (running stats)
"""

from __future__ import annotations

import contextvars
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.1

# Cross-replica BatchNorm: under an explicit shard_map execution (see
# parallel/smap.py) each device holds a batch SHARD, but train-mode BN
# must normalize with GLOBAL batch statistics to match the reference's
# single-process numerics (torch BatchNorm1d over the full batch;
# DataParallel replicas each saw the full gathered stats only because the
# reference ran BN on gathered activations). The axis name is trace-time
# state set by the model's apply() — signatures stay unchanged; the stat
# reductions below psum over it when set. A ContextVar (not a module
# global) so concurrent traces — e.g. EvalPipeline's worker threads —
# can't cross-contaminate each other's axis.
_BN_AXIS: contextvars.ContextVar = contextvars.ContextVar(
    "mdgat_bn_axis", default=None)


class bn_cross_replica:
    """Context manager: BN batch stats psum over ``axis_name`` while
    tracing (no-op when ``axis_name`` is None)."""

    def __init__(self, axis_name):
        self.axis_name = axis_name

    def __enter__(self):
        self._token = _BN_AXIS.set(self.axis_name)
        return self

    def __exit__(self, *exc):
        _BN_AXIS.reset(self._token)
        return False


def bn_axis_name():
    """The active cross-replica BN axis (None outside shard_map)."""
    return _BN_AXIS.get()


# ---------------------------------------------------------------------------
# init — matches torch defaults so converted / fresh checkpoints behave alike
# ---------------------------------------------------------------------------

def conv1x1_init(key, c_in: int, c_out: int, dtype=jnp.float32, zero_bias=False):
    """Kaiming-uniform init identical to ``torch.nn.Conv1d`` defaults.

    torch uses kaiming_uniform(a=sqrt(5)) on the weight => bound
    sqrt(6 / ((1 + a^2) * fan_in)) = 1/sqrt(fan_in), and
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on the bias.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in)
    w = jax.random.uniform(kw, (c_in, c_out), dtype, -bound, bound)
    if zero_bias:
        b = jnp.zeros((c_out,), dtype)
    else:
        b = jax.random.uniform(kb, (c_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def conv1x1_apply(p, x):
    """Per-point dense layer: x [..., N, Cin] -> [..., N, Cout]."""
    return jnp.matmul(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def _bn_init(c: int, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _bn_state_init(c: int, dtype=jnp.float32):
    return {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def mlp_init(key, channels: Sequence[int], do_bn: bool = True,
             dtype=jnp.float32, zero_last_bias: bool = False,
             bn_on_last: bool = False):
    """Params for MLP(channels) mirroring ``models/mdgat.py:34-46``.

    Layer i maps channels[i-1] -> channels[i]; BN+ReLU on all but the last
    layer (``bn_on_last=True`` puts them on every layer — the PointNet++
    convention, ``pointnet_util.py:215-217``). ``zero_last_bias``
    reproduces the reference's ``nn.init.constant_(encoder[-1].bias, 0.0)``
    on selected encoders.
    """
    n = len(channels)
    keys = jax.random.split(key, n - 1)
    layers = []
    for i in range(1, n):
        zero_b = zero_last_bias and i == n - 1
        layer = {"lin": conv1x1_init(keys[i - 1], channels[i - 1], channels[i],
                                     dtype, zero_bias=zero_b)}
        if do_bn and (bn_on_last or i < n - 1):
            layer["bn"] = _bn_init(channels[i], dtype)
        layers.append(layer)
    return layers


def mlp_state_init(channels: Sequence[int], do_bn: bool = True,
                   dtype=jnp.float32, bn_on_last: bool = False):
    """Running-stat state aligned with :func:`mlp_init` (None where no BN)."""
    n = len(channels)
    return [(_bn_state_init(channels[i], dtype)
             if (do_bn and (bn_on_last or i < n - 1)) else None)
            for i in range(1, n)]


def _batchnorm(bn, st, x, train: bool, axes):
    """BatchNorm over ``axes`` (all but channel). Returns (y, new_state)."""
    scale = bn["scale"].astype(x.dtype)
    bias = bn["bias"].astype(x.dtype)
    if train:
        axis = bn_axis_name()
        if axis is None:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)  # biased, as torch normalizes with
            n = x.size // mean.size
        else:
            # shard_map execution: GLOBAL batch stats across replicas
            n_local = 1
            for a in axes:
                n_local *= x.shape[a]
            n = n_local * jax.lax.psum(1, axis)
            mean = jax.lax.psum(jnp.sum(x, axis=axes), axis) / n
            var = jax.lax.psum(jnp.sum((x - mean) ** 2, axis=axes),
                               axis) / n
        unbiased = var * (n / max(n - 1, 1))
        # torch: running_mean <- batch mean, running_var <- unbiased batch var
        new_st = {
            "mean": (1 - BN_MOMENTUM) * st["mean"] + BN_MOMENTUM * mean.astype(st["mean"].dtype),
            "var": (1 - BN_MOMENTUM) * st["var"] + BN_MOMENTUM * unbiased.astype(st["var"].dtype),
        }
    else:
        mean = st["mean"].astype(x.dtype)
        var = st["var"].astype(x.dtype)
        new_st = st
    inv = jax.lax.rsqrt(var + jnp.asarray(BN_EPS, x.dtype))
    return (x - mean) * inv * scale + bias, new_st


def mlp_apply(params, state, x, train: bool = False,
              valid_mask: Optional[jnp.ndarray] = None,
              relu_on_last: bool = False):
    """Apply the MLP to x [..., N, C].

    ``valid_mask`` [..., N] (optional) excludes padded points from batch-stat
    computation so fixed-shape padding does not perturb BN statistics; padded
    rows still produce (garbage) outputs which callers mask downstream.

    ``x`` may be a tuple of channel-blocks ``(x0, x1, ...)`` standing for
    ``concat(x, -1)``: the first layer's kernel is split over the blocks
    (``cat(x) @ w == sum_i x_i @ w_i``) so the concatenated tensor is never
    materialized — at the train config the per-layer [B, N, 2C] concat was
    a pure HBM copy. Numerics differ from the materialized concat only by
    float reassociation of the matmul.

    Returns (y, new_state) where new_state mirrors ``state``.
    """
    new_state = []
    h = x
    n_layers = len(params)
    for i, layer in enumerate(params):
        if i == 0 and isinstance(h, (tuple, list)):
            w = layer["lin"]["w"]
            acc = None
            off = 0
            for part in h:
                c = part.shape[-1]
                t = jnp.matmul(part, w[off:off + c].astype(part.dtype))
                acc = t if acc is None else acc + t
                off += c
            h = acc + layer["lin"]["b"].astype(acc.dtype)
        else:
            h = conv1x1_apply(layer["lin"], h)
        st = state[i] if state is not None else None
        if "bn" in layer:
            if valid_mask is not None and train:
                # masked batch stats: reduce over all non-channel axes
                # (+ the cross-replica axis under shard_map, see _BN_AXIS)
                m = valid_mask[..., None].astype(h.dtype)
                axes = tuple(range(h.ndim - 1))
                axis = bn_axis_name()
                if axis is None:
                    cnt = jnp.maximum(jnp.sum(m), 1.0)
                    mean = jnp.sum(h * m, axis=axes) / cnt
                    var = jnp.sum((h - mean) ** 2 * m, axis=axes) / cnt
                else:
                    cnt = jnp.maximum(
                        jax.lax.psum(jnp.sum(m), axis), 1.0)
                    mean = jax.lax.psum(
                        jnp.sum(h * m, axis=axes), axis) / cnt
                    var = jax.lax.psum(
                        jnp.sum((h - mean) ** 2 * m, axis=axes), axis) / cnt
                inv = jax.lax.rsqrt(var + jnp.asarray(BN_EPS, h.dtype))
                scale = layer["bn"]["scale"].astype(h.dtype)
                bias = layer["bn"]["bias"].astype(h.dtype)
                h = (h - mean) * inv * scale + bias
                nf = cnt
                unbiased = var * (nf / jnp.maximum(nf - 1.0, 1.0))
                new_st = {
                    "mean": (1 - BN_MOMENTUM) * st["mean"] + BN_MOMENTUM * mean.astype(st["mean"].dtype),
                    "var": (1 - BN_MOMENTUM) * st["var"] + BN_MOMENTUM * unbiased.astype(st["var"].dtype),
                }
            else:
                axes = tuple(range(h.ndim - 1))
                h, new_st = _batchnorm(layer["bn"], st, h, train, axes)
            new_state.append(new_st)
        else:
            new_state.append(st)
        if relu_on_last or i < n_layers - 1:
            h = jax.nn.relu(h)
    return h, new_state
