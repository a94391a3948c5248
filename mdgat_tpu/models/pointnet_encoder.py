"""Learned-descriptor encoders from raw clouds (PointnetEncoder /
PointnetEncoderMsg, ``models/mdgat.py:53-143``).

Pipeline (per cloud): multi-scale keypoint-centered grouping (SetKptsMsg)
-> pointwise set abstraction over [kpts_xyz, pooled features] -> concat
with the KeypointEncoder positional embedding -> MLP([2D, 2D, D]).

Raw cloud layout: [B, Np, 8] (x, y, z + 5 extra channels); the reference
splits xyz = first 3 rows, 'normals' = remaining 5 (``models/mdgat.py:73-78``
with ``in_channel=5``).

Configs (exact reference hyperparameters):
* single-scale ('pointnet'): SetKptsMsg(256, [2], [32], 5, [[64,64,128]])
  -> SA(131 -> [256,256,128])               (``models/mdgat.py:59-60``)
* multi-scale ('pointnetmsg'): radii [1,1.5,2.25], nsamples [16,32,128],
  mlps [[32,32,64],[64,64,128],[64,96,128]] -> SA(323 -> [256,256,128])
  (``models/mdgat.py:104-106``)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from mdgat_tpu.models.encoders import (keypoint_encoder_apply,
                                       keypoint_encoder_init)
from mdgat_tpu.ops.mlp import mlp_apply, mlp_init, mlp_state_init
from mdgat_tpu.ops.pointnet import (set_abstraction_all_apply,
                                    set_kpts_msg_apply)

SSG_SPEC = {"radius_list": (2.0,), "nsample_list": (32,),
            "mlps": ((64, 64, 128),), "in_channel": 5}
# SuperGlue's own single-scale variant uses radius 1 (superglue.py:113)
SG_SSG_SPEC = {"radius_list": (1.0,), "nsample_list": (32,),
               "mlps": ((64, 64, 128),), "in_channel": 5}
MSG_SPEC = {"radius_list": (1.0, 1.5, 2.25), "nsample_list": (16, 32, 128),
            "mlps": ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            "in_channel": 5}


def _spec(msg: bool, superglue: bool = False):
    if msg:
        return MSG_SPEC          # identical in both nets (superglue.py:71)
    return SG_SSG_SPEC if superglue else SSG_SPEC


def pointnet_encoder_init(key, feature_dim: int, kenc_layers: Sequence[int],
                          msg: bool = False, dtype=jnp.float32,
                          superglue: bool = False):
    """``superglue=True`` builds SuperGlue's kenc-less variant
    (``models/superglue.py:108-153``): no positional-encoding fusion, no
    output MLP — the raw sa2 features are the descriptors."""
    spec = _spec(msg, superglue)
    keys = jax.random.split(key, len(spec["mlps"]) + 3)
    sa1_p, sa1_s = [], []
    for i, mlp in enumerate(spec["mlps"]):
        ch = [spec["in_channel"] + 3] + list(mlp)
        sa1_p.append(mlp_init(keys[i], ch, dtype=dtype, bn_on_last=True))
        sa1_s.append(mlp_state_init(ch, dtype=dtype, bn_on_last=True))
    scale_out = sum(m[-1] for m in spec["mlps"])
    sa2_ch = [scale_out + 3, 256, 256, feature_dim]
    sa2_p = mlp_init(keys[-3], sa2_ch, dtype=dtype, bn_on_last=True)
    sa2_s = mlp_state_init(sa2_ch, dtype=dtype, bn_on_last=True)
    params = {"sa1": sa1_p, "sa2": sa2_p}
    state = {"sa1": sa1_s, "sa2": sa2_s}
    if not superglue:
        mlp_ch = [feature_dim * 2, feature_dim * 2, feature_dim]
        params["mlp"] = mlp_init(keys[-2], mlp_ch, dtype=dtype)
        state["mlp"] = mlp_state_init(mlp_ch, dtype=dtype)
        params["kenc"], state["kenc"] = keypoint_encoder_init(
            keys[-1], feature_dim, kenc_layers, dtype)
    return params, state


def pointnet_encoder_apply(params, state, cloud, kpts, scores,
                           msg: bool = False, train: bool = False,
                           superglue: bool = False):
    """cloud [B, Np, 8]; kpts [B, S, 3]; scores [B, S] -> ([B, S, D], st).

    Mirrors ``PointnetEncoder.forward`` (``models/mdgat.py:71-97``):
    sa1 (keypoint-centered grouping) -> sa2 (pointwise) -> concat with
    positional encoding -> output MLP. With ``superglue=True`` the kenc/MLP
    stages are absent and sa2's output is returned directly
    (``models/superglue.py:126-153``).
    """
    spec = _spec(msg, superglue)
    xyz = cloud[..., :3]
    feats = cloud[..., 3:3 + spec["in_channel"]]
    pooled, sa1_s = set_kpts_msg_apply(
        params["sa1"], state["sa1"], xyz, feats, kpts,
        spec["radius_list"], spec["nsample_list"], train)
    desc, sa2_s = set_abstraction_all_apply(
        params["sa2"], state["sa2"], kpts, pooled, train)
    if superglue:
        return desc, {"sa1": sa1_s, "sa2": sa2_s}
    kemb, kenc_s = keypoint_encoder_apply(
        params["kenc"], state["kenc"], kpts, scores, train)
    h = jnp.concatenate([kemb, desc], axis=-1)
    out, mlp_s = mlp_apply(params["mlp"], state["mlp"], h, train)
    new_state = {"sa1": sa1_s, "sa2": sa2_s, "mlp": mlp_s, "kenc": kenc_s}
    return out, new_state
