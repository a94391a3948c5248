"""Rigid-registration geometry: pairwise distances, GT correspondences,
Kabsch/SVD pose fit, pose-error metrics.

The reference computes GT correspondences per pair on the host with
``scipy.spatial.distance.cdist`` + argmins (``load_data.py:257-285``) and
fits poses with a one-step SVD "ICP" (``utils/utils_test.py:73-110``).
Here both are jit-able, batched device functions (the O(N^2) distance
matrix is a single MXU matmul), with mask support for fixed-shape padding.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


def pairwise_dist2(a, b):
    """Squared Euclidean distances [.., N, M] between a [.., N, 3], b [.., M, 3].

    Computed via the matmul expansion |a|^2 - 2ab + |b|^2 (MXU-friendly),
    clamped at 0 against cancellation.
    """
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    inner = jnp.matmul(a, jnp.swapaxes(b, -1, -2),
                       preferred_element_type=a.dtype)
    return jnp.maximum(a2 - 2.0 * inner + jnp.swapaxes(b2, -1, -2), 0.0)


class GTMatches(NamedTuple):
    matches0: jnp.ndarray  # [.., N] int32, -1 = unmatched
    matches1: jnp.ndarray  # [.., M] int32
    rep: jnp.ndarray       # [..] int32 — repeatability count (#rows < tau)


def gt_correspondences(kpts0_w, kpts1_w, threshold: float,
                       mutual_check: bool = False,
                       mask0: Optional[jnp.ndarray] = None,
                       mask1: Optional[jnp.ndarray] = None) -> GTMatches:
    """Pose-based ground-truth correspondence generation.

    Reproduces ``load_data.py:257-285``: nearest-neighbor in world frame,
    distance threshold tau (0.5 m default); non-mutual by default. Inputs
    are world-frame keypoints [.., N, 3] / [.., M, 3]; batched via leading
    dims. Masks mark valid (non-padded) points.
    """
    d2 = pairwise_dist2(kpts0_w, kpts1_w)
    big = jnp.asarray(1e30, d2.dtype)
    if mask0 is not None:
        d2 = jnp.where(mask0[..., :, None], d2, big)
    if mask1 is not None:
        d2 = jnp.where(mask1[..., None, :], d2, big)
    t2 = jnp.asarray(threshold, d2.dtype) ** 2

    # nearest kp1 for each kp0 (axis -1) and vice versa (axis -2)
    nn0 = jnp.argmin(d2, axis=-1).astype(jnp.int32)   # [.., N] "min2"
    v0 = jnp.min(d2, axis=-1)                         # [.., N] "min1v"
    nn1 = jnp.argmin(d2, axis=-2).astype(jnp.int32)   # [.., M] "min1"
    v1 = jnp.min(d2, axis=-2)                         # [.., M] "min2v"

    ok0 = v0 < t2
    ok1 = v1 < t2
    neg1 = jnp.asarray(-1, jnp.int32)

    if mutual_check:
        # load_data.py:274-279: matches = intersect1d(min1f, xx).
        # xx  = kp1 indices j that are mutual NNs: min2[min1[j]] == j
        # min1f = the set {nn0[i] : ok0[i]} — kp1 indices reachable from a
        # thresholded kp0 (not necessarily via the mutual partner).
        jm = jnp.arange(nn1.shape[-1], dtype=jnp.int32)
        mutual_j = jnp.take_along_axis(nn0, nn1, axis=-1) == jm
        in_f = jnp.any(ok0[..., :, None]
                       & (nn0[..., :, None] == jm[None, :]), axis=-2)
        sel = mutual_j & in_f                          # kp1-side selected
        matches1 = jnp.where(sel, nn1, neg1)
        # scatter to kp0 side: matches0[nn1[j]] = j for selected j
        n = nn0.shape[-1]
        sel_rows = jnp.where(sel, nn1, n)              # n = drop slot

        def scatter(rows, js, selv):
            out = jnp.full((n + 1,), -1, jnp.int32)
            out = out.at[rows].set(jnp.where(selv, js, -1))
            return out[:n]

        js = jnp.broadcast_to(
            jnp.arange(nn1.shape[-1], dtype=jnp.int32), nn1.shape)
        flat = scatter
        for _ in range(nn0.ndim - 1):
            flat = jax.vmap(flat)
        matches0 = flat(sel_rows, js, sel)
    else:
        matches0 = jnp.where(ok0, nn0, neg1)
        matches1 = jnp.where(ok1, nn1, neg1)

    rep = jnp.sum(ok0, axis=-1).astype(jnp.int32)
    if mask0 is not None:
        matches0 = jnp.where(mask0, matches0, neg1)
    if mask1 is not None:
        matches1 = jnp.where(mask1, matches1, neg1)
    return GTMatches(matches0, matches1, rep)


def transform_points(T, pts):
    """Apply a 4x4 rigid transform to [.., N, 3] points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.matmul(pts, jnp.swapaxes(R, -1, -2)) + t[..., None, :]


def kabsch(P, Q, weights: Optional[jnp.ndarray] = None):
    """One-step SVD rigid fit mapping P -> Q (``solve_icp``,
    ``utils/utils_test.py:73-110``).

    P, Q: [.., N, 3]. ``weights`` [.., N] enables masked/weighted fits for
    fixed-shape batching (weight 0 = ignore). NOTE: like the reference,
    R = U @ Vh without the det-reflection fix; callers that need a proper
    rotation can pass ``fix_reflection`` via :func:`kabsch_proper`.
    """
    if weights is None:
        up = jnp.mean(P, axis=-2, keepdims=True)
        uq = jnp.mean(Q, axis=-2, keepdims=True)
        Pc, Qc = P - up, Q - uq
        H = jnp.matmul(jnp.swapaxes(Qc, -1, -2), Pc)
    else:
        w = weights[..., None]
        s = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
        up = jnp.sum(P * w, axis=-2, keepdims=True) / s
        uq = jnp.sum(Q * w, axis=-2, keepdims=True) / s
        Pc, Qc = (P - up) * w, Q - uq
        H = jnp.matmul(jnp.swapaxes(Qc, -1, -2), Pc)
    U, _, Vh = jnp.linalg.svd(H, full_matrices=True)
    R = jnp.matmul(U, Vh)
    t = uq[..., 0, :] - jnp.einsum("...ij,...j->...i", R, up[..., 0, :])
    T = jnp.zeros(P.shape[:-2] + (4, 4), P.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def kabsch_proper(P, Q, weights: Optional[jnp.ndarray] = None):
    """Kabsch with the det(R) reflection fix (proper rotation guaranteed)."""
    T = kabsch(P, Q, weights)
    R = T[..., :3, :3]
    d = jnp.linalg.det(R)
    # re-solve with the last singular vector flipped when det < 0
    flip = jnp.where(d < 0, -1.0, 1.0)
    if weights is None:
        up = jnp.mean(P, axis=-2, keepdims=True)
        uq = jnp.mean(Q, axis=-2, keepdims=True)
        H = jnp.matmul(jnp.swapaxes(Q - uq, -1, -2), P - up)
    else:
        w = weights[..., None]
        s = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
        up = jnp.sum(P * w, axis=-2, keepdims=True) / s
        uq = jnp.sum(Q * w, axis=-2, keepdims=True) / s
        H = jnp.matmul(jnp.swapaxes((Q - uq) * w, -1, -2), P - up)
    U, _, Vh = jnp.linalg.svd(H, full_matrices=True)
    D = jnp.ones(U.shape[:-1], U.dtype).at[..., -1].set(flip)
    R = jnp.matmul(U * D[..., None, :], Vh)
    t = uq[..., 0, :] - jnp.einsum("...ij,...j->...i", R, up[..., 0, :])
    T = jnp.zeros(P.shape[:-2] + (4, 4), P.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def registration_errors(T, T_gt, clamp_arccos: bool = False):
    """RTE / RRE of ``calculate_error`` (``utils/utils_test.py:41-71``).

    ``T_error = T^-1 @ T_gt``; RTE = |t|; RRE = arccos((tr(R)-1)/2). The
    reference does NOT clamp the arccos argument (can yield NaN,
    ``utils/utils_test.py:68-70``); ``clamp_arccos=True`` opts into the
    numerically safe version.
    """
    T_err = jnp.matmul(jnp.linalg.inv(T), T_gt)
    rte = jnp.linalg.norm(T_err[..., :3, 3], axis=-1)
    f_theta = (T_err[..., 0, 0] + T_err[..., 1, 1] + T_err[..., 2, 2] - 1.0) / 2
    if clamp_arccos:
        f_theta = jnp.clip(f_theta, -1.0, 1.0)
    rre = jnp.arccos(f_theta)
    return rte, rre


def inlier_count(T, mkpts0, mkpts1, radius: float = 1.0,
                 weights: Optional[jnp.ndarray] = None):
    """Inliers: matched kp1 transported by T within ``radius`` of kp0
    (``utils/utils_test.py:55-63``)."""
    moved = transform_points(T, mkpts1)
    d = jnp.linalg.norm(moved - mkpts0, axis=-1)
    ok = d < radius
    if weights is not None:
        ok = ok & (weights > 0)
    return jnp.sum(ok, axis=-1)
