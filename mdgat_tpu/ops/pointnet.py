"""PointNet++ grouping/abstraction ops, TPU-native.

Reference: ``models/pointnet/pointnet_util.py`` (P1-P7 in SURVEY.md §2.4).
The torch code uses a sort-based radius query and advanced-indexing
gathers; here the radius query is a *top-k over index keys* (no full sort,
no scatter), gathers are clamped ``take_along_axis`` with an explicit
zero-fill mask (the reference's appended zero sentinel row,
``pointnet_util.py:70-73``), and FPS is a ``fori_loop``.

Semantics preserved exactly:
* ``query_ball_point`` (``pointnet_util.py:101-121``): per center, the
  ``nsample`` *lowest-index* in-radius points; short balls backfill with
  the first found index; empty balls keep the N sentinel.
* zero-sentinel gathers: ``idx == N`` yields a zero row, so an empty
  ball's relative coordinates become ``-center`` and features become 0
  (``PointNetSetKptsMsg``, ``pointnet_util.py:326-331``).
* grouped feature order in the Kpts-MSG path is [features, rel_xyz]
  (``pointnet_util.py:331``), the reverse of the FPS path's
  [rel_xyz, features] (``pointnet_util.py:151``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from mdgat_tpu.ops.geometry import pairwise_dist2


def ball_query(xyz, centers, radius: float, nsample: int):
    """Radius grouping indices [B, S, nsample] with N as empty sentinel.

    Equivalent to ``query_ball_point``: the reference sorts
    ``where(in_radius, idx, N)`` ascending and slices the first nsample;
    that equals taking the nsample smallest keys, done here via a single
    ``top_k`` on negated keys (top_k is an XLA HLO; no O(N log N) sort).
    """
    b, n, _ = xyz.shape
    d2 = pairwise_dist2(centers, xyz)                      # [B, S, N]
    idx = jnp.arange(n, dtype=jnp.int32)[None, None, :]
    key = jnp.where(d2 <= radius ** 2, idx, n)             # [B, S, N]
    # nsample smallest keys == top_k of (n - key)
    topv = jax.lax.top_k(n - key, nsample)[0]
    group_idx = n - topv                                    # ascending keys
    first = group_idx[..., :1]
    return jnp.where(group_idx == n, first, group_idx)      # backfill


def gather_zero_sentinel(points, idx):
    """Gather rows of points [B, N, C] at idx [B, S, K]; idx == N -> zeros
    (``index_points``, ``pointnet_util.py:43-74``)."""
    b, n, c = points.shape
    valid = (idx < n)[..., None]
    safe = jnp.minimum(idx, n - 1)
    flat = safe.reshape(b, -1)                               # [B, S*K]
    g = jnp.take_along_axis(points, flat[..., None], axis=1)
    g = g.reshape(*idx.shape, c)
    return g * valid.astype(points.dtype)


def farthest_point_sample(xyz, npoint: int, start: Optional[jnp.ndarray] = None,
                          mask=None):
    """Iterative FPS (``pointnet_util.py:77-98``). ``start`` [B] optional
    initial indices (the reference randomizes; default 0 for determinism).
    Returns [B, npoint] int32."""
    b, n, _ = xyz.shape
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    big = jnp.asarray(1e10, xyz.dtype)
    dist0 = jnp.full((b, n), big, xyz.dtype)
    if mask is not None:
        dist0 = jnp.where(mask, dist0, -1.0)  # never pick padded points

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None].astype(jnp.int32), axis=1)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.where(d < distance, d, distance)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids = jnp.zeros((b, npoint), jnp.int32)
    centroids, _, _ = jax.lax.fori_loop(
        0, npoint, body, (centroids, dist0, start.astype(jnp.int32)))
    return centroids


def grouped_mlp_apply(params, state, grouped, train: bool):
    """Conv2d(1x1)+BN2d+ReLU stack over grouped features [B, S, K, C].

    BN2d normalizes per channel over (B, K, S) — our layout's axes
    (0, 1, 2) — matching ``pointnet_util.py:215-217, 337-340``.
    """
    from mdgat_tpu.ops.mlp import mlp_apply
    return mlp_apply(params, state, grouped, train, relu_on_last=True)


def set_kpts_msg_apply(params, state, xyz, features, kpts,
                       radius_list: Sequence[float],
                       nsample_list: Sequence[int], train: bool):
    """PointNetSetKptsMsg (``pointnet_util.py:284-346``): multi-scale
    grouping centered at the given keypoints.

    xyz [B, N, 3]; features [B, N, D] or None; kpts [B, S, 3].
    params/state: lists (one MLP stack per scale).
    Returns ([B, S, sum(D'_i)], new_state).
    """
    b, s, _ = kpts.shape
    outs = []
    new_state = []
    for i, radius in enumerate(radius_list):
        idx = ball_query(xyz, kpts, radius, nsample_list[i])  # [B,S,K]
        gx = gather_zero_sentinel(xyz, idx) - kpts[:, :, None, :]
        if features is not None:
            gf = gather_zero_sentinel(features, idx)
            grouped = jnp.concatenate([gf, gx], axis=-1)      # [feat, xyz]
        else:
            grouped = gx
        h, st = grouped_mlp_apply(params[i], state[i], grouped, train)
        outs.append(jnp.max(h, axis=2))                       # pool over K
        new_state.append(st)
    return jnp.concatenate(outs, axis=-1), new_state


def set_abstraction_all_apply(params, state, xyz, features, train: bool):
    """PointNetSetAbstraction(group_all=True) as shipped: a *pointwise*
    MLP over concat(xyz, features) — the max-pool is commented out in the
    reference (``pointnet_util.py:219``), so no pooling happens and the
    caller reshapes the per-point features (``models/mdgat.py:83-86``).

    xyz [B, S, 3]; features [B, S, D]. Returns ([B, S, D'], new_state).
    """
    h = jnp.concatenate([xyz, features], axis=-1) if features is not None \
        else xyz
    return grouped_mlp_apply(params, state, h, train)


def set_abstraction_msg_apply(params, state, xyz, features,
                              npoint: int, radius_list: Sequence[float],
                              nsample_list: Sequence[int], train: bool,
                              fps_start=None):
    """PointNetSetAbstractionMsg (``pointnet_util.py:224-282``): FPS
    centroids + multi-scale ball grouping, per-scale conv stacks, max-pool,
    scale concat. Returns (centers [B,S,3], feats [B,S,sum(D'_i)], state).

    Grouped feature order here is [rel_xyz, features] — note the reference
    *Kpts*-MSG variant uses the reverse order (see set_kpts_msg_apply)."""
    fps_idx = farthest_point_sample(xyz, npoint, fps_start)
    centers = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
    outs, new_state = [], []
    for i, radius in enumerate(radius_list):
        idx = ball_query(xyz, centers, radius, nsample_list[i])
        gx = gather_zero_sentinel(xyz, idx) - centers[:, :, None, :]
        if features is not None:
            gf = gather_zero_sentinel(features, idx)
            grouped = jnp.concatenate([gx, gf], axis=-1)
        else:
            grouped = gx
        h, st = grouped_mlp_apply(params[i], state[i], grouped, train)
        outs.append(jnp.max(h, axis=2))
        new_state.append(st)
    return centers, jnp.concatenate(outs, axis=-1), new_state


def feature_propagation_apply(params, state, xyz1, xyz2, points1, points2,
                              train: bool):
    """PointNetFeaturePropagation (``pointnet_util.py:349-399``): inverse-
    distance weighted 3-NN interpolation of points2 (at xyz2) onto xyz1,
    optional skip-concat with points1, then a conv1x1+BN+ReLU stack.

    xyz1 [B,N,3]; xyz2 [B,S,3]; points1 [B,N,D1] or None; points2 [B,S,D2].
    """
    b, n, _ = xyz1.shape
    s = xyz2.shape[1]
    if s == 1:
        interp = jnp.broadcast_to(points2, (b, n, points2.shape[-1]))
    else:
        d2 = pairwise_dist2(xyz1, xyz2)                       # [B, N, S]
        negd, idx = jax.lax.top_k(-d2, 3)                     # 3 nearest
        recip = 1.0 / (-negd + 1e-8)
        w = recip / jnp.sum(recip, axis=-1, keepdims=True)    # [B, N, 3]
        gathered = gather_zero_sentinel(points2, idx)         # [B, N, 3, D2]
        interp = jnp.sum(gathered * w[..., None], axis=2)
    h = interp if points1 is None else \
        jnp.concatenate([points1, interp], axis=-1)
    from mdgat_tpu.ops.mlp import mlp_apply
    return mlp_apply(params, state, h, train, relu_on_last=True)


def sample_and_group_apply(params, state, xyz, features, npoint: int,
                           radius: float, nsample: int, train: bool,
                           fps_start=None):
    """FPS-centered single-scale abstraction (``sample_and_group`` +
    conv stack, ``pointnet_util.py:124-157``), with max-pool over the
    group — provided for the standard PointNet++ SSG pathway."""
    fps_idx = farthest_point_sample(xyz, npoint, fps_start)
    centers = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
    idx = ball_query(xyz, centers, radius, nsample)
    gx = gather_zero_sentinel(xyz, idx) - centers[:, :, None, :]
    if features is not None:
        gf = gather_zero_sentinel(features, idx)
        grouped = jnp.concatenate([gx, gf], axis=-1)          # [xyz, feat]
    else:
        grouped = gx
    h, st = grouped_mlp_apply(params, state, grouped, train)
    return centers, jnp.max(h, axis=2), st
