"""Keypoint / descriptor encoders (``models/mdgat.py:53-188``).

All encoders are point-wise MLPs over the ``[B, N, C]`` layout (the
reference's 1x1 convs over ``[B, C, N]``). Variants:

* ``KeypointEncoder``   — MLP([4, *layers, D]) over concat(xyz, score)
  (``models/mdgat.py:176-188``), zero-init final bias.
* ``DescriptorEncoder`` — MLP([33, *layers, D]) over FPFH
  (``models/mdgat.py:144-155``), zero-init final bias.
* ``DescriptorGlobalEncoder`` — the above + global max-pool context concat
  + MLP([2D, 2D, D]) (``models/mdgat.py:156-174``; 'DescriptorGloabalEncoder'
  (sic) upstream).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from mdgat_tpu.ops.mlp import mlp_apply, mlp_init, mlp_state_init


def keypoint_encoder_init(key, feature_dim: int, layers: Sequence[int],
                          dtype=jnp.float32):
    ch = [4] + list(layers) + [feature_dim]
    return {"mlp": mlp_init(key, ch, dtype=dtype, zero_last_bias=True)}, \
        {"mlp": mlp_state_init(ch, dtype=dtype)}


def keypoint_encoder_apply(params, state, kpts, scores, train=False,
                           valid_mask=None):
    x = jnp.concatenate([kpts, scores[..., None]], axis=-1)
    y, st = mlp_apply(params["mlp"], state["mlp"], x, train, valid_mask)
    return y, {"mlp": st}


def descriptor_encoder_init(key, feature_dim: int, layers: Sequence[int],
                            dtype=jnp.float32, in_dim: int = 33):
    ch = [in_dim] + list(layers) + [feature_dim]
    return {"mlp": mlp_init(key, ch, dtype=dtype, zero_last_bias=True)}, \
        {"mlp": mlp_state_init(ch, dtype=dtype)}


def descriptor_encoder_apply(params, state, desc, train=False,
                             valid_mask=None):
    y, st = mlp_apply(params["mlp"], state["mlp"], desc, train, valid_mask)
    return y, {"mlp": st}


def descriptor_global_encoder_init(key, feature_dim: int,
                                   layers: Sequence[int], dtype=jnp.float32,
                                   in_dim: int = 33):
    k1, k2 = jax.random.split(key)
    ch1 = [in_dim] + list(layers) + [feature_dim]
    ch2 = [feature_dim * 2, feature_dim * 2, feature_dim]
    return (
        {"mlp": mlp_init(k1, ch1, dtype=dtype, zero_last_bias=True),
         "mlp2": mlp_init(k2, ch2, dtype=dtype, zero_last_bias=True)},
        {"mlp": mlp_state_init(ch1, dtype=dtype),
         "mlp2": mlp_state_init(ch2, dtype=dtype)},
    )


def descriptor_global_encoder_apply(params, state, desc, train=False,
                                    valid_mask=None):
    y, st1 = mlp_apply(params["mlp"], state["mlp"], desc, train, valid_mask)
    z = _global_context_concat(y, valid_mask)
    out, st2 = mlp_apply(params["mlp2"], state["mlp2"], z, train, valid_mask)
    return out, {"mlp": st1, "mlp2": st2}


def _global_context_concat(y, valid_mask):
    """concat(y, global max-pool of y broadcast to every point) — the
    'global aware' pattern shared by DescriptorGloabalEncoder and
    pointnetDescriptorEncoder (``models/superglue.py:199-219``)."""
    if valid_mask is not None:
        neg = jnp.asarray(-1e30, y.dtype)
        masked = jnp.where(valid_mask[..., None], y, neg)
    else:
        masked = y
    glob = jnp.max(masked, axis=-2, keepdims=True)        # [B, 1, D]
    glob = jnp.broadcast_to(glob, y.shape)
    return jnp.concatenate([y, glob], axis=-1)


def pointnet_descriptor_encoder_init(key, feature_dim: int,
                                     dtype=jnp.float32):
    """SuperGlue's ``pointnetDescriptorEncoder``
    (``models/superglue.py:206-219``): a global-aware MLP([2D, 2D, D])
    over already-computed descriptors, zero-init final bias. The reference
    constructs it for the pointnet descriptor modes (superglue.py:346-360)
    though its shipped forward never calls it (superglue.py:421-424)."""
    ch = [feature_dim * 2, feature_dim * 2, feature_dim]
    return {"mlp": mlp_init(key, ch, dtype=dtype, zero_last_bias=True)}, \
        {"mlp": mlp_state_init(ch, dtype=dtype)}


def pointnet_descriptor_encoder_apply(params, state, desc, train=False,
                                      valid_mask=None):
    z = _global_context_concat(desc, valid_mask)
    y, st = mlp_apply(params["mlp"], state["mlp"], z, train, valid_mask)
    return y, {"mlp": st}
