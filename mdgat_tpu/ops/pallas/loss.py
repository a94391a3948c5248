"""Fused gap-loss Pallas kernel with custom VJP.

The XLA gap loss (``ops/losses.py:39-88``, reference
``models/mdgat.py:547-594``) makes ~4 separate passes over the dense
``[B, N, M]`` transport block per direction (column/row masking, the
positive-score gather, the relu-margin reduction) and its backward
materializes the dense cotangent plus indicator slabs in HBM — measured
~4 ms/step of glue at the reference train config (DESIGN.md "Known
headroom"). This kernel reads the dense block ONCE per direction pair and
keeps every indicator/margin temporary in VMEM; the backward reads it
once more and writes only the final cotangent.

Decomposition: the kernel emits the pre-log margin sums ``S0 [B, N]`` /
``S1 [B, M]`` (everything that touches the dense block); the
``2*log1p`` + masked anchor means stay as a scalar-sized XLA epilogue,
so the masked-mean numerics match ``ops/losses.py`` exactly. Vectors
ride in explicit orientations (``[B, N, 1]`` row-side / ``[B, 1, M]``
col-side) — no in-kernel transposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdgat_tpu.ops.pallas.attention import BIG_NEG, _blk


def _gap_blocking(b, n, m):
    # live slabs per element: dense + ~2 indicator/margin temporaries
    bb = 4
    while bb > 1 and 3 * bb * n * m * 4 > 13 * 1024 * 1024:
        bb //= 2
    while b % bb != 0:
        bb //= 2
    return bb


def _dir0(d, cm, binc, gt0, n, m):
    """Direction 0 shared forward recompute: anchors = rows.

    Returns (d0, is_pos0 [N,M], at_bin0 [N,1], pos0 [N,1])."""
    f32 = jnp.float32
    neg = jnp.asarray(BIG_NEG, f32)
    d0 = jnp.where(cm > 0.5, d, neg)
    iota_m = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    pos_idx = jnp.where(gt0 < 0, m, gt0)                     # [N, 1]
    is_pos = iota_m == pos_idx                               # [N, M]
    pos_main = jnp.sum(jnp.where(is_pos, d0, 0.0), axis=1,
                       keepdims=True)                        # [N, 1]
    at_bin = pos_idx == m
    pos = jnp.where(at_bin, binc, pos_main)
    return d0, is_pos, at_bin, pos


def _dir1(d, rm, binr, gt1, n, m):
    """Direction 1 shared forward recompute: anchors = cols."""
    f32 = jnp.float32
    neg = jnp.asarray(BIG_NEG, f32)
    d1 = jnp.where(rm > 0.5, d, neg)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    pos_idx = jnp.where(gt1 < 0, n, gt1)                     # [1, M]
    is_pos = iota_n == pos_idx
    pos_main = jnp.sum(jnp.where(is_pos, d1, 0.0), axis=0,
                       keepdims=True)                        # [1, M]
    at_bin = pos_idx == n
    pos = jnp.where(at_bin, binr, pos_main)
    return d1, is_pos, at_bin, pos


def _gap_fwd_kernel(dense_ref, binr_ref, binc_ref, gt0_ref, gt1_ref,
                    rm_ref, cm_ref, s0_ref, s1_ref, *,
                    block_b: int, gamma: float):
    f32 = jnp.float32
    g = jnp.asarray(gamma, f32)
    n = dense_ref.shape[1]
    m = dense_ref.shape[2]
    for e in range(block_b):
        d = dense_ref[e].astype(f32)                         # [N, M]
        cm = cm_ref[e].astype(f32)                           # [1, M]
        rm = rm_ref[e].astype(f32)                           # [N, 1]
        binr = binr_ref[e].astype(f32)                       # [1, M]
        binc = binc_ref[e].astype(f32)                       # [N, 1]
        gt0 = gt0_ref[e]                                     # [N, 1] i32
        gt1 = gt1_ref[e]                                     # [1, M] i32

        d0, is_pos0, at_bin0, pos0 = _dir0(d, cm, binc, gt0, n, m)
        contrib0 = jnp.maximum(d0 - pos0 + g, 0.0) \
            * (~is_pos0).astype(f32)
        bin_term0 = jnp.maximum(binc - pos0 + g, 0.0) \
            * (~at_bin0).astype(f32)                         # [N, 1]
        s0_ref[e] = jnp.sum(contrib0, axis=1, keepdims=True) + bin_term0

        d1, is_pos1, at_bin1, pos1 = _dir1(d, rm, binr, gt1, n, m)
        contrib1 = jnp.maximum(d1 - pos1 + g, 0.0) \
            * (~is_pos1).astype(f32)
        bin_term1 = jnp.maximum(binr - pos1 + g, 0.0) \
            * (~at_bin1).astype(f32)                         # [1, M]
        s1_ref[e] = jnp.sum(contrib1, axis=0, keepdims=True) + bin_term1


def _gap_bwd_kernel(dense_ref, binr_ref, binc_ref, gt0_ref, gt1_ref,
                    rm_ref, cm_ref, ds0_ref, ds1_ref,
                    dd_ref, dbinr_ref, dbinc_ref, *,
                    block_b: int, gamma: float):
    f32 = jnp.float32
    g = jnp.asarray(gamma, f32)
    n = dense_ref.shape[1]
    m = dense_ref.shape[2]
    for e in range(block_b):
        d = dense_ref[e].astype(f32)
        cm = cm_ref[e].astype(f32)
        rm = rm_ref[e].astype(f32)
        binr = binr_ref[e].astype(f32)
        binc = binc_ref[e].astype(f32)
        gt0 = gt0_ref[e]
        gt1 = gt1_ref[e]
        ds0 = ds0_ref[e].astype(f32)                         # [N, 1]
        ds1 = ds1_ref[e].astype(f32)                         # [1, M]

        # ---- direction 0 ----
        d0, is_pos0, at_bin0, pos0 = _dir0(d, cm, binc, gt0, n, m)
        i0 = ((d0 - pos0 + g) > 0.0) & (~is_pos0)            # [N, M]
        bi0 = ((binc - pos0 + g) > 0.0) & (~at_bin0)         # [N, 1]
        i0f = i0.astype(f32)
        dpos0 = -ds0 * (jnp.sum(i0f, axis=1, keepdims=True)
                        + bi0.astype(f32))                   # [N, 1]
        dd0 = (ds0 * i0f + is_pos0.astype(f32) * dpos0) * cm
        dbinc_e = (at_bin0.astype(f32) * dpos0
                   + ds0 * bi0.astype(f32))                  # [N, 1]

        # ---- direction 1 ----
        d1, is_pos1, at_bin1, pos1 = _dir1(d, rm, binr, gt1, n, m)
        i1 = ((d1 - pos1 + g) > 0.0) & (~is_pos1)
        bi1 = ((binr - pos1 + g) > 0.0) & (~at_bin1)         # [1, M]
        i1f = i1.astype(f32)
        dpos1 = -ds1 * (jnp.sum(i1f, axis=0, keepdims=True)
                        + bi1.astype(f32))                   # [1, M]
        dd1 = (ds1 * i1f + is_pos1.astype(f32) * dpos1) * rm
        dbinr_e = (at_bin1.astype(f32) * dpos1
                   + ds1 * bi1.astype(f32))                  # [1, M]

        dd_ref[e] = (dd0 + dd1).astype(dd_ref.dtype)
        dbinr_ref[e] = dbinr_e.astype(dbinr_ref.dtype)
        dbinc_ref[e] = dbinc_e.astype(dbinc_ref.dtype)


def _gap_calls_fwd(gamma, interpret, dense, bin_row, bin_col, gt0, gt1,
                   rm, cm):
    b, n, m = dense.shape
    f32 = jnp.float32
    bb = _gap_blocking(b, n, m)
    kern = functools.partial(_gap_fwd_kernel, block_b=bb, gamma=gamma)
    s0, s1 = pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, m)), _blk((bb, 1, m)), _blk((bb, n, 1)),
                  _blk((bb, n, 1)), _blk((bb, 1, m)),
                  _blk((bb, n, 1)), _blk((bb, 1, m))],
        out_specs=[_blk((bb, n, 1)), _blk((bb, 1, m))],
        out_shape=[jax.ShapeDtypeStruct((b, n, 1), f32),
                   jax.ShapeDtypeStruct((b, 1, m), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(dense, bin_row[:, None, :], bin_col[:, :, None],
      gt0[:, :, None], gt1[:, None, :],
      rm.astype(f32)[:, :, None], cm.astype(f32)[:, None, :])
    return s0[..., 0], s1[:, 0, :]                           # [B,N], [B,M]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_gap_margins(gamma, interpret, dense, bin_row, bin_col, gt0, gt1,
                      rm, cm):
    """Pre-log gap-loss margin sums ``(S0 [B,N], S1 [B,M])`` with a fused
    backward; the log1p + masked means are the caller's XLA epilogue."""
    return _gap_calls_fwd(gamma, interpret, dense, bin_row, bin_col,
                          gt0, gt1, rm, cm)


def _fgm_fwd(gamma, interpret, dense, bin_row, bin_col, gt0, gt1, rm, cm):
    s0, s1 = _gap_calls_fwd(gamma, interpret, dense, bin_row, bin_col,
                            gt0, gt1, rm, cm)
    return (s0, s1), (dense, bin_row, bin_col, gt0, gt1, rm, cm)


def _fgm_bwd(gamma, interpret, res, cts):
    dense, bin_row, bin_col, gt0, gt1, rm, cm = res
    ds0, ds1 = cts
    b, n, m = dense.shape
    f32 = jnp.float32
    bb = _gap_blocking(b, n, m)
    kern = functools.partial(_gap_bwd_kernel, block_b=bb, gamma=gamma)
    dd, dbinr, dbinc = pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, m)), _blk((bb, 1, m)), _blk((bb, n, 1)),
                  _blk((bb, n, 1)), _blk((bb, 1, m)),
                  _blk((bb, n, 1)), _blk((bb, 1, m)),
                  _blk((bb, n, 1)), _blk((bb, 1, m))],
        out_specs=[_blk((bb, n, m)), _blk((bb, 1, m)), _blk((bb, n, 1))],
        out_shape=[jax.ShapeDtypeStruct((b, n, m), dense.dtype),
                   jax.ShapeDtypeStruct((b, 1, m), bin_row.dtype),
                   jax.ShapeDtypeStruct((b, n, 1), bin_col.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(dense, bin_row[:, None, :], bin_col[:, :, None],
      gt0[:, :, None], gt1[:, None, :],
      rm.astype(f32)[:, :, None], cm.astype(f32)[:, None, :],
      ds0.astype(f32)[:, :, None], ds1.astype(f32)[:, None, :])
    zi = lambda a: np.zeros(np.shape(a), jax.dtypes.float0)
    return (dd, dbinr[:, 0, :], dbinc[:, :, 0],
            zi(gt0), zi(gt1), zi(rm), zi(cm))


fused_gap_margins.defvjp(_fgm_fwd, _fgm_bwd)


def pallas_gap_loss(ot, gt0, gt1, gamma: float,
                    row_mask=None, col_mask=None,
                    interpret: bool = False):
    """Drop-in for :func:`mdgat_tpu.ops.losses.gap_loss` (same [B] output
    and masked-mean epilogue numerics) with the dense-block work fused."""
    dense = ot.dense
    b, n, m = dense.shape
    dt = dense.dtype
    rm = row_mask if row_mask is not None else jnp.ones((b, n), bool)
    cm = col_mask if col_mask is not None else jnp.ones((b, m), bool)
    s0, s1 = fused_gap_margins(float(gamma), interpret, dense,
                               ot.bin_row, ot.bin_col,
                               gt0.astype(jnp.int32), gt1.astype(jnp.int32),
                               rm, cm)
    per_anchor0 = 2.0 * jnp.log1p(s0).astype(dt)
    per_anchor1 = 2.0 * jnp.log1p(s1).astype(dt)
    rmf = rm.astype(dt)
    cmf = cm.astype(dt)
    loss0 = jnp.sum(per_anchor0 * rmf, axis=1) \
        / jnp.maximum(jnp.sum(rmf, axis=1), 1)
    loss1 = jnp.sum(per_anchor1 * cmf, axis=1) \
        / jnp.maximum(jnp.sum(cmf, axis=1), 1)
    return (loss0 + loss1) / 2.0
