"""Fused log-Sinkhorn optimal transport as a single Pallas TPU kernel.

The XLA version (``mdgat_tpu.ops.transport``) round-trips the dense [N,M]
coupling block through HBM on every half-iteration (row pass + col pass x
iters). This kernel pins the block in VMEM for the entire iteration loop —
one HBM read of the scores, one write of the results, with all 2*iters
logsumexp sweeps on-chip. At N=M=512 f32 the block is 1 MB, far under the
~16 MB VMEM budget, so the whole transport is compute-bound on the VPU.

Semantics identical to :func:`mdgat_tpu.ops.transport.log_optimal_transport`
(the dustbin-decomposed form of reference ``models/mdgat.py:279-308``),
including the zero-mass initialization of padded potentials. Forward-only
(inference/eval path): training uses the differentiable XLA scan.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdgat_tpu.ops.transport import OTScores, _big_neg


def _kernel(scalars_ref, dense_ref, logmu_ref, lognu_ref,
            out_ref, binrow_ref, bincol_ref, corner_ref, *, iters: int):
    Z = dense_ref[0]                          # [N, M]
    log_mu = logmu_ref[0]                     # [N, 1]
    log_nu = lognu_ref[0]                     # [1, M]
    alpha = scalars_ref[0, 0, 0]
    lmub = scalars_ref[0, 0, 1]
    lnub = scalars_ref[0, 0, 2]
    norm = scalars_ref[0, 0, 3]
    dt = Z.dtype
    neg = jnp.asarray(_big_neg(dt), dt)
    half_neg = neg * 0.5

    u0 = jnp.where(log_mu > half_neg, jnp.zeros_like(log_mu), neg)
    v0 = jnp.where(log_nu > half_neg, jnp.zeros_like(log_nu), neg)
    zero = jnp.zeros((), dt)

    def body(_, carry):
        u, ubin, v, vbin = carry
        # --- u update: row LSE over [Z + v | alpha + vbin] ---
        t = Z + v                                             # [N, M]
        m = jnp.max(t, axis=1, keepdims=True)                 # [N, 1]
        mm = jnp.maximum(m, alpha + vbin)
        s = jnp.sum(jnp.exp(t - mm), axis=1, keepdims=True) \
            + jnp.exp(alpha + vbin - mm)
        u = log_mu - (jnp.log(s) + mm)
        # --- bin-row u: LSE over [alpha + v | alpha + vbin] ---
        mv = jnp.maximum(jnp.max(v), vbin)
        sb = jnp.sum(jnp.exp(v - mv)) + jnp.exp(vbin - mv)
        ubin = lmub - (jnp.log(sb) + mv + alpha)
        # --- v update: col LSE over [Z + u ; alpha + ubin] ---
        t2 = Z + u                                            # [N, M]
        m2 = jnp.max(t2, axis=0, keepdims=True)               # [1, M]
        mm2 = jnp.maximum(m2, alpha + ubin)
        s2 = jnp.sum(jnp.exp(t2 - mm2), axis=0, keepdims=True) \
            + jnp.exp(alpha + ubin - mm2)
        v = log_nu - (jnp.log(s2) + mm2)
        # --- bin-col v ---
        mu = jnp.maximum(jnp.max(u), ubin)
        sb2 = jnp.sum(jnp.exp(u - mu)) + jnp.exp(ubin - mu)
        vbin = lnub - (jnp.log(sb2) + mu + alpha)
        return u, ubin, v, vbin

    u, ubin, v, vbin = jax.lax.fori_loop(0, iters, body,
                                         (u0, zero, v0, zero))
    out_ref[0] = Z + u + v - norm
    binrow_ref[0] = alpha + ubin + v - norm                   # [1, M]
    bincol_ref[0] = alpha + u + vbin - norm                   # [N, 1]
    corner_ref[0, 0, 0] = alpha + ubin + vbin - norm


def pallas_log_optimal_transport(scores, alpha, iters: int,
                                 row_mask: Optional[jnp.ndarray] = None,
                                 col_mask: Optional[jnp.ndarray] = None,
                                 interpret: bool = False) -> OTScores:
    """Drop-in for :func:`log_optimal_transport` (forward only)."""
    b, n, m = scores.shape
    dt = scores.dtype
    neg = _big_neg(dt)

    if row_mask is None:
        row_mask = jnp.ones((b, n), bool)
    if col_mask is None:
        col_mask = jnp.ones((b, m), bool)
    ns = jnp.sum(row_mask, axis=1).astype(dt)
    ms = jnp.sum(col_mask, axis=1).astype(dt)
    norm = -jnp.log(ns + ms)
    dense = jnp.where(row_mask[:, :, None] & col_mask[:, None, :], scores,
                      neg)
    log_mu = jnp.where(row_mask, norm[:, None], neg)[:, :, None]  # [B,N,1]
    log_nu = jnp.where(col_mask, norm[:, None], neg)[:, None, :]  # [B,1,M]
    a = jnp.broadcast_to(jnp.asarray(alpha, dt), (b,))
    scalars = jnp.stack(
        [a, jnp.log(ms) + norm, jnp.log(ns) + norm, norm],
        axis=1)[:, None, :]                                         # [B,1,4]

    grid = (b,)
    out_dense, bin_row, bin_col, corner = pl.pallas_call(
        functools.partial(_kernel, iters=iters),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, m), dt),
            jax.ShapeDtypeStruct((b, 1, m), dt),
            jax.ShapeDtypeStruct((b, n, 1), dt),
            jax.ShapeDtypeStruct((b, 1, 1), dt),
        ],
        interpret=interpret,
    )(scalars, dense, log_mu, log_nu)

    return OTScores(out_dense, bin_row[:, 0, :], bin_col[:, :, 0],
                    corner[:, 0, 0])
