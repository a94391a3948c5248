"""Fused log-Sinkhorn optimal transport as a single Pallas TPU kernel.

The XLA version (``mdgat_tpu.ops.transport``) round-trips the dense [N,M]
coupling block through HBM on every half-iteration (row pass + col pass x
iters). This kernel pins the block in VMEM for the entire iteration loop —
one HBM read of the scores, one write of the results, with all 2*iters
logsumexp sweeps on-chip. At N=M=512 f32 the block is 1 MB, far under the
~16 MB VMEM budget, so the whole transport is compute-bound on the VPU.

Semantics identical to :func:`mdgat_tpu.ops.transport.log_optimal_transport`
(the dustbin-decomposed form of reference ``models/mdgat.py:279-308``),
including the zero-mass initialization of padded potentials.

Training path: :func:`pallas_log_optimal_transport_trainable` adds a
custom VJP whose backward kernel REPLAYS the forward iterations in VMEM
and walks the adjoint recursion in reverse — exact backprop through the
Sinkhorn iterations (the reference trains through them,
``models/mdgat.py:279-285`` under autograd), NOT a fixed-point/implicit
approximation. The XLA-scan backward carries the dense [N,M] gradient
accumulator through HBM on every one of the ``iters`` reverse steps
(~67 MB x 20 at the reference train config); here dZ stays VMEM-resident
and HBM sees one read of (scores, cotangents) and one write of dZ.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mdgat_tpu.ops.transport import OTScores, _big_neg

# Chip A/B gates (probe_gate_ab pokes these like the attention gates).
# _DECISION_AUX: emit the match-decision reductions from the kernel
# epilogue (callers fall back to the XLA dense-path decision when off).
# MEASURED LOSER 2026-08-19 (probe_gate_ab, 2x2 interleaved reps): fused
# epilogue 7.57/7.61 ms/step eval vs XLA decision 7.41/7.50 at ITERS=14,
# and 6.21 vs 6.10 at ITERS=5 — the extra epilogue reductions cost more
# in-kernel than XLA's fused max/argmax re-read of the [B,N,M] block
# costs in HBM traffic. Default False; kernel + parity test retained
# (re-probe only after a Mosaic toolchain bump).
_DECISION_AUX = False
# _MASK_DENSE: mask the score block in-VMEM from the marginals instead of
# shipping a pre-masked copy (off restores the XLA-side where()).
# Measured keeper, same session: 7.41 (on) vs 7.46 (off) with
# _DECISION_AUX=False — the in-VMEM mask also drops a [B,N,M] HBM copy
# from the eval graph, so it stays on.
_MASK_DENSE = True


def _kernel(scalars_ref, dense_ref, logmu_ref, lognu_ref,
            out_ref, binrow_ref, bincol_ref, corner_ref, *aux_refs,
            iters: int, block_e: int, mask_dense: bool = False,
            decision_aux: bool = False):
    """``block_e`` batch elements per program, all arrays 3-D [E, N, M]:
    stacking elements widens every VPU sweep (a single [256, 256] block
    under-fills the vector unit — measured 0.95 ms/step for the eval OT at
    batch 64 with E=1), while the per-element bin logsumexps become
    keepdims reductions over the trailing axes.

    ``mask_dense``: apply the validity masking (``_prep``'s
    ``where(mask, scores, neg)``) in-kernel from the row/col marginals
    (``log_mu/log_nu > neg/2`` iff valid) — the caller ships RAW scores
    and the XLA-side masked copy (one [B,N,M] HBM write + read) is
    elided. Bit-identical: the masked entries were ``neg`` before the
    ``+u+v-norm`` epilogue either way.

    ``decision_aux``: also emit the match-decision reductions over the
    transported block (row/col max + first-max argmax — torch.max tie
    semantics, ``models/mdgat.py:442-483``) while it is VMEM-resident,
    so ``match_decision`` never re-reads the [B,N,M] result from HBM."""
    Z = dense_ref[...]                        # [E, N, M]
    log_mu = logmu_ref[...]                   # [E, N, 1]
    log_nu = lognu_ref[...]                   # [E, 1, M]
    dt = Z.dtype
    sc = scalars_ref[...]                     # [E, 1, 4] (VMEM: Mosaic has
    # no SMEM-scalar -> [E,1,1] vector shape-cast; a lane slice does it)
    col = lambda i: sc[:, :, i:i + 1]         # [E, 1, 1]
    alpha, lmub, lnub, norm = col(0), col(1), col(2), col(3)
    neg = jnp.asarray(_big_neg(dt), dt)
    half_neg = neg * 0.5
    if mask_dense:
        Z = jnp.where((log_mu > half_neg) & (log_nu > half_neg), Z, neg)

    u0 = jnp.where(log_mu > half_neg, jnp.zeros_like(log_mu), neg)
    v0 = jnp.where(log_nu > half_neg, jnp.zeros_like(log_nu), neg)
    zero = jnp.zeros((block_e, 1, 1), dt)

    def body(_, carry):
        u, ubin, v, vbin = carry
        # --- u update: row LSE over [Z + v | alpha + vbin] ---
        t = Z + v                                             # [E, N, M]
        m = jnp.max(t, axis=2, keepdims=True)                 # [E, N, 1]
        mm = jnp.maximum(m, alpha + vbin)
        s = jnp.sum(jnp.exp(t - mm), axis=2, keepdims=True) \
            + jnp.exp(alpha + vbin - mm)
        u = log_mu - (jnp.log(s) + mm)
        # --- bin-row u: LSE over [alpha + v | alpha + vbin] ---
        # (single-axis reductions: Mosaic's multi-axis keepdims reduction
        # to [E,1,1] hits a layout-rank check crash; v is [E,1,M] and u is
        # [E,N,1] so one axis is enough)
        mv = jnp.maximum(jnp.max(v, axis=2, keepdims=True), vbin)
        sb = jnp.sum(jnp.exp(v - mv), axis=2, keepdims=True) \
            + jnp.exp(vbin - mv)
        ubin = lmub - (jnp.log(sb) + mv + alpha)
        # --- v update: col LSE over [Z + u ; alpha + ubin] ---
        t2 = Z + u                                            # [E, N, M]
        m2 = jnp.max(t2, axis=1, keepdims=True)               # [E, 1, M]
        mm2 = jnp.maximum(m2, alpha + ubin)
        s2 = jnp.sum(jnp.exp(t2 - mm2), axis=1, keepdims=True) \
            + jnp.exp(alpha + ubin - mm2)
        v = log_nu - (jnp.log(s2) + mm2)
        # --- bin-col v ---
        mu = jnp.maximum(jnp.max(u, axis=1, keepdims=True), ubin)
        sb2 = jnp.sum(jnp.exp(u - mu), axis=1, keepdims=True) \
            + jnp.exp(ubin - mu)
        vbin = lnub - (jnp.log(sb2) + mu + alpha)
        return u, ubin, v, vbin

    u, ubin, v, vbin = jax.lax.fori_loop(0, iters, body,
                                         (u0, zero, v0, zero))
    out = Z + u + v - norm
    out_ref[...] = out
    binrow_ref[...] = alpha + ubin + v - norm                 # [E, 1, M]
    bincol_ref[...] = alpha + u + vbin - norm                 # [E, N, 1]
    corner_ref[...] = alpha + ubin + vbin - norm              # [E, 1, 1]
    if decision_aux:
        max0_ref, idx0_ref, max1_ref, idx1_ref = aux_refs
        e, n, m = out.shape
        big_i = jnp.asarray(max(n, m), jnp.int32)
        max0 = jnp.max(out, axis=2, keepdims=True)            # [E, N, 1]
        ii2 = jax.lax.broadcasted_iota(jnp.int32, (e, n, m), 2)
        idx0_ref[...] = jnp.min(jnp.where(out == max0, ii2, big_i),
                                axis=2, keepdims=True)
        max0_ref[...] = max0
        max1 = jnp.max(out, axis=1, keepdims=True)            # [E, 1, M]
        ii1 = jax.lax.broadcasted_iota(jnp.int32, (e, n, m), 1)
        idx1_ref[...] = jnp.min(jnp.where(out == max1, ii1, big_i),
                                axis=1, keepdims=True)
        max1_ref[...] = max1


class OTDecisionAux(NamedTuple):
    """Match-decision reductions emitted by the fused kernel epilogue
    (``decision_aux=True``) while the transported block is VMEM-resident:
    row/col max and FIRST-max argmax of the dense block (torch.max tie
    semantics, identical to ``jnp.argmax``)."""
    max0: jnp.ndarray   # [B, N] best dense score per row
    idx0: jnp.ndarray   # [B, N] int32 argmax per row
    max1: jnp.ndarray   # [B, M] best dense score per col
    idx1: jnp.ndarray   # [B, M] int32 argmax per col


def _prep(scores, alpha, row_mask, col_mask, build_dense: bool = True):
    """Marginals + the scalar pack [B,1,4]; ``build_dense`` additionally
    materializes the XLA-side masked block (the kernels can instead mask
    in-VMEM from the marginals — ``mask_dense=True`` — skipping one
    [B,N,M] HBM write + read)."""
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
    if build_dense:
        dense = jnp.where(row_mask[:, :, None] & col_mask[:, None, :],
                          scores, neg)
    else:
        dense = scores
    log_mu = jnp.where(row_mask, norm[:, None], neg)[:, :, None]  # [B,N,1]
    log_nu = jnp.where(col_mask, norm[:, None], neg)[:, None, :]  # [B,1,M]
    a = jnp.broadcast_to(jnp.asarray(alpha, dt), (b,))
    scalars = jnp.stack(
        [a, jnp.log(ms) + norm, jnp.log(ns) + norm, norm],
        axis=1)[:, None, :]                                         # [B,1,4]
    return scalars, dense, log_mu, log_nu


def pallas_log_optimal_transport(scores, alpha, iters: int,
                                 row_mask: Optional[jnp.ndarray] = None,
                                 col_mask: Optional[jnp.ndarray] = None,
                                 interpret: Optional[bool] = None,
                                 decision_aux: bool = False):
    """Drop-in for :func:`log_optimal_transport` (forward only).

    ``decision_aux=True`` returns ``(OTScores, OTDecisionAux)`` — the
    match-decision reductions fused into the kernel epilogue (or
    ``(OTScores, None)`` when the ``_DECISION_AUX`` gate is off; callers
    fall back to the XLA dense-path decision)."""
    prepped = _prep(scores, alpha, row_mask, col_mask,
                    build_dense=not _MASK_DENSE)
    out = _fwd_from_prep(prepped, iters, interpret, mask_dense=_MASK_DENSE,
                         decision_aux=decision_aux and _DECISION_AUX)
    if decision_aux and not _DECISION_AUX:
        return out, None
    return out


def _fwd_from_prep(prepped, iters: int,
                   interpret: Optional[bool] = None,
                   mask_dense: bool = False, decision_aux: bool = False):
    """Forward kernel on pre-built (scalars, dense, log_mu, log_nu) — lets
    the custom-VJP forward share ONE _prep with its residuals."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # no Mosaic on CPU
    scalars, dense, log_mu, log_nu = prepped
    b, n, m = dense.shape
    dt = dense.dtype

    # elements per program: ~4 live [n, m]-sized f32 buffers (Z, out, two
    # iteration temporaries) per element. The decision_aux epilogue holds
    # ~3 more full slabs at once (a broadcasted int32 iota plus the
    # eq/where intermediates, per axis) while `out` is still live, so its
    # blocks must be sized against ~7 — otherwise re-enabling the
    # _DECISION_AUX gate at a large config (e.g. the N=1024 stretch,
    # where eb=1 already carries ~17 MB) would overflow the very budget
    # this heuristic exists to respect.
    slabs = 7 if decision_aux else 4
    eb = 8
    while eb > 1 and slabs * eb * n * m * jnp.dtype(dt).itemsize > 10 * 2 ** 20:
        eb //= 2
    while b % eb != 0:
        eb //= 2

    _blk3 = lambda shape: pl.BlockSpec(shape, lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)
    out_specs = [_blk3((eb, n, m)), _blk3((eb, 1, m)), _blk3((eb, n, 1)),
                 _blk3((eb, 1, 1))]
    out_shape = [
        jax.ShapeDtypeStruct((b, n, m), dt),
        jax.ShapeDtypeStruct((b, 1, m), dt),
        jax.ShapeDtypeStruct((b, n, 1), dt),
        jax.ShapeDtypeStruct((b, 1, 1), dt),
    ]
    if decision_aux:
        out_specs += [_blk3((eb, n, 1)), _blk3((eb, n, 1)),
                      _blk3((eb, 1, m)), _blk3((eb, 1, m))]
        out_shape += [
            jax.ShapeDtypeStruct((b, n, 1), dt),
            jax.ShapeDtypeStruct((b, n, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, m), dt),
            jax.ShapeDtypeStruct((b, 1, m), jnp.int32),
        ]

    grid = (b // eb,)
    outs = pl.pallas_call(
        functools.partial(_kernel, iters=iters, block_e=eb,
                          mask_dense=mask_dense, decision_aux=decision_aux),
        grid=grid,
        in_specs=[_blk3((eb, 1, 4)), _blk3((eb, n, m)), _blk3((eb, n, 1)),
                  _blk3((eb, 1, m))],
        out_specs=out_specs,
        out_shape=out_shape,
        # eb=1 at the N=1024 stretch config holds ~17 MB of [N,M] blocks —
        # over the default VMEM cap but fine on this chip (the backward
        # has run 21 MB programs; see probe_sinkhorn_eb/probe_sinkhorn_n1024)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(scalars, dense, log_mu, log_nu)

    out_dense, bin_row, bin_col, corner = outs[:4]
    ot = OTScores(out_dense, bin_row[:, 0, :], bin_col[:, :, 0],
                  corner[:, 0, 0])
    if decision_aux:
        max0, idx0, max1, idx1 = outs[4:]
        return ot, OTDecisionAux(max0[:, :, 0], idx0[:, :, 0],
                                 max1[:, 0, :], idx1[:, 0, :])
    return ot


def _bwd_kernel(scalars_ref, dense_ref, logmu_ref, lognu_ref,
                do_ref, dbr_ref, dbc_ref, dcorner_ref,
                dz_ref, dalpha_ref, vhist_ref, vbinhist_ref, *, iters: int,
                block_e: int, mask_dense: bool = False):
    """Replay the forward iterations, then walk the adjoint recursion.

    Exact reverse-mode differentiation of the unrolled Sinkhorn loop
    (what ``jax.grad`` of the XLA scan computes), with the dense block,
    the dZ accumulator, and the per-iteration potentials VMEM-resident.
    ``block_e`` elements per program, 3-D arrays [E, N, M] like the
    forward kernel (same Mosaic constraints: single-axis reductions,
    VMEM lane-sliced scalars).

    Memory discipline (a fully unrolled version blew the Mosaic stack —
    ~55 MB of live [N,M] temporaries): only the row-shaped ``v``/``vbin``
    history is stored (scratch, (iters+1) x [E,1,M]); ``u_t``/``ubin_t``
    are recomputed bit-exactly from ``v_{t-1}`` inside a ``fori_loop``
    body so the dense temporaries are reused across iterations, and dZ
    accumulates in the output ref instead of a loop carry. The softmax
    weights of the remaining logsumexps are reconstructed from the
    potentials (``c = log_nu - v_t``, ``cb = lnub - vbin_t``).
    """
    Z = dense_ref[...]                        # [E, N, M]
    log_mu = logmu_ref[...]                   # [E, N, 1]
    log_nu = lognu_ref[...]                   # [E, 1, M]
    dt = Z.dtype
    sc = scalars_ref[...]                     # [E, 1, 4]
    col = lambda i: sc[:, :, i:i + 1]         # [E, 1, 1]
    alpha, lmub, lnub = col(0), col(1), col(2)
    neg = jnp.asarray(_big_neg(dt), dt)
    half_neg = neg * 0.5
    if mask_dense:
        Z = jnp.where((log_mu > half_neg) & (log_nu > half_neg), Z, neg)
    zero = jnp.zeros((block_e, 1, 1), dt)

    # ---- forward replay, storing the v-side history (index 0 = init) ----
    u0 = jnp.where(log_mu > half_neg, jnp.zeros_like(log_mu), neg)
    v0 = jnp.where(log_nu > half_neg, jnp.zeros_like(log_nu), neg)
    vhist_ref[0] = v0
    vbinhist_ref[0] = zero

    def fwd_body(t, carry):
        u, ubin, v, vbin = carry
        t1 = Z + v
        mm1 = jnp.maximum(jnp.max(t1, axis=2, keepdims=True), alpha + vbin)
        s1 = jnp.sum(jnp.exp(t1 - mm1), axis=2, keepdims=True) \
            + jnp.exp(alpha + vbin - mm1)
        u = log_mu - (jnp.log(s1) + mm1)
        mv = jnp.maximum(jnp.max(v, axis=2, keepdims=True), vbin)
        sb = jnp.sum(jnp.exp(v - mv), axis=2, keepdims=True) \
            + jnp.exp(vbin - mv)
        ubin = lmub - (jnp.log(sb) + mv + alpha)
        t2 = Z + u
        mm2 = jnp.maximum(jnp.max(t2, axis=1, keepdims=True), alpha + ubin)
        s2 = jnp.sum(jnp.exp(t2 - mm2), axis=1, keepdims=True) \
            + jnp.exp(alpha + ubin - mm2)
        v = log_nu - (jnp.log(s2) + mm2)
        mu_ = jnp.maximum(jnp.max(u, axis=1, keepdims=True), ubin)
        sb2 = jnp.sum(jnp.exp(u - mu_), axis=1, keepdims=True) \
            + jnp.exp(ubin - mu_)
        vbin = lnub - (jnp.log(sb2) + mu_ + alpha)
        vhist_ref[pl.ds(t + 1, 1)] = v[None]
        vbinhist_ref[pl.ds(t + 1, 1)] = vbin[None]
        return u, ubin, v, vbin

    jax.lax.fori_loop(0, iters, fwd_body, (u0, zero, v0, zero))

    # ---- output-layer adjoints ----
    # O = Z + u_T + v_T - norm; Obr = a + ubin_T + v_T - norm;
    # Obc = a + u_T + vbin_T - norm; Oc = a + ubin_T + vbin_T - norm.
    dO = do_ref[...]                          # [E, N, M]
    dbr = dbr_ref[...]                        # [E, 1, M]
    dbc = dbc_ref[...]                        # [E, N, 1]
    dc = dcorner_ref[...]                     # [E, 1, 1]
    dz_ref[...] = dO
    sum_dbr = jnp.sum(dbr, axis=2, keepdims=True)               # [E, 1, 1]
    sum_dbc = jnp.sum(dbc, axis=1, keepdims=True)
    dalpha0 = sum_dbr + sum_dbc + dc
    dv0 = jnp.sum(dO, axis=1, keepdims=True) + dbr              # [E, 1, M]
    dvbin0 = sum_dbc + dc
    du_out = jnp.sum(dO, axis=2, keepdims=True) + dbc           # [E, N, 1]
    dubin_out = sum_dbr + dc

    # ---- adjoint recursion, t = iters .. 1 ----
    def bwd_body(i, carry):
        dv, dvbin, dalpha = carry
        t = iters - i
        v_t = vhist_ref[pl.ds(t, 1)][0]                         # [E, 1, M]
        vbin_t = vbinhist_ref[pl.ds(t, 1)][0]                   # [E, 1, 1]
        v_prev = vhist_ref[pl.ds(t - 1, 1)][0]
        vbin_prev = vbinhist_ref[pl.ds(t - 1, 1)][0]
        # recompute u_t/ubin_t from v_prev — bit-exact fwd half-step
        t1 = Z + v_prev
        mm1 = jnp.maximum(jnp.max(t1, axis=2, keepdims=True),
                          alpha + vbin_prev)
        s1 = jnp.sum(jnp.exp(t1 - mm1), axis=2, keepdims=True) \
            + jnp.exp(alpha + vbin_prev - mm1)
        r = jnp.log(s1) + mm1                                   # [E, N, 1]
        u_t = log_mu - r
        mv = jnp.maximum(jnp.max(v_prev, axis=2, keepdims=True), vbin_prev)
        sb = jnp.sum(jnp.exp(v_prev - mv), axis=2, keepdims=True) \
            + jnp.exp(vbin_prev - mv)
        rb = jnp.log(sb) + mv + alpha                           # [E, 1, 1]
        ubin_t = lmub - rb
        is_last = t == iters
        du = jnp.where(is_last, du_out, jnp.zeros_like(du_out))
        dubin = jnp.where(is_last, dubin_out, zero)
        # step 4: vbin_t = lnub - cb, cb = LSE_i([a+u_t, a+ubin_t])
        cb = lnub - vbin_t
        du = du + (-dvbin) * jnp.exp(alpha + u_t - cb)
        dubin = dubin + (-dvbin) * jnp.exp(alpha + ubin_t - cb)
        dalpha = dalpha + (-dvbin)
        # step 3: v_t = log_nu - c, c_j = LSE_i([Z+u_t ; a+ubin_t])
        c = log_nu - v_t                                        # [E, 1, M]
        contrib = jnp.exp(Z + u_t - c) * (-dv)                  # [E, N, M]
        dz_ref[...] = dz_ref[...] + contrib
        du = du + jnp.sum(contrib, axis=2, keepdims=True)
        pb = jnp.sum(jnp.exp(alpha + ubin_t - c) * (-dv),
                     axis=2, keepdims=True)
        dubin = dubin + pb
        dalpha = dalpha + pb
        # step 2: ubin_t = lmub - rb, rb = LSE_j([a+v_prev, a+vbin_prev])
        dv_prev = (-dubin) * jnp.exp(alpha + v_prev - rb)       # [E, 1, M]
        dvbin_prev = (-dubin) * jnp.exp(alpha + vbin_prev - rb)
        dalpha = dalpha + (-dubin)
        # step 1: u_t = log_mu - r, r_i = LSE_j([Z+v_prev | a+vbin_prev])
        contrib2 = (-du) * jnp.exp(Z + v_prev - r)              # [E, N, M]
        dz_ref[...] = dz_ref[...] + contrib2
        dv_prev = dv_prev + jnp.sum(contrib2, axis=1, keepdims=True)
        sb_t = jnp.sum((-du) * jnp.exp(alpha + vbin_prev - r),
                       axis=1, keepdims=True)
        dvbin_prev = dvbin_prev + sb_t
        dalpha = dalpha + sb_t
        return dv_prev, dvbin_prev, dalpha

    _, _, dalpha = jax.lax.fori_loop(0, iters, bwd_body,
                                     (dv0, dvbin0, dalpha0))
    dalpha_ref[...] = dalpha


# Backward element-blocking budget for the ~5 live [E,N,M] reverse-step
# buffers. 10 MB -> eb=2 at the reference N=M=512; probed raising it
# (tools/probe_sinkhorn_eb.py) before widening.
_BWD_EB_BUDGET = 10 * 2 ** 20


def _bwd_call(scalars, dense, log_mu, log_nu, g: OTScores,
              interpret: bool, iters: int, mask_dense: bool = False):
    b, n, m = dense.shape
    dt = dense.dtype
    # ~5 live [E, n, m]-sized f32 buffers per reverse step (Z, dO-in-dz,
    # dz, contrib, recompute temp)
    eb = 8
    while eb > 1 and 5 * eb * n * m * jnp.dtype(dt).itemsize > _BWD_EB_BUDGET:
        eb //= 2
    while b % eb != 0:
        eb //= 2
    spec_sc = pl.BlockSpec((eb, 1, 4), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_nm = pl.BlockSpec((eb, n, m), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_n1 = pl.BlockSpec((eb, n, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_1m = pl.BlockSpec((eb, 1, m), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_11 = pl.BlockSpec((eb, 1, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    dz, dalpha = pl.pallas_call(
        functools.partial(_bwd_kernel, iters=iters, block_e=eb,
                          mask_dense=mask_dense),
        grid=(b // eb,),
        in_specs=[spec_sc, spec_nm, spec_n1, spec_1m,
                  spec_nm, spec_1m, spec_n1, spec_11],
        out_specs=[spec_nm, spec_11],
        out_shape=[jax.ShapeDtypeStruct((b, n, m), dt),
                   jax.ShapeDtypeStruct((b, 1, 1), dt)],
        scratch_shapes=[pltpu.VMEM((iters + 1, eb, 1, m), dt),
                        pltpu.VMEM((iters + 1, eb, 1, 1), dt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(scalars, dense, log_mu, log_nu,
      g.dense.astype(dt), g.bin_row[:, None, :].astype(dt),
      g.bin_col[:, :, None].astype(dt),
      g.corner[:, None, None].astype(dt))
    return dz, dalpha[:, 0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _ot_trainable(iters: int, interpret: bool, scores, alpha,
                  row_mask, col_mask) -> OTScores:
    return pallas_log_optimal_transport(scores, alpha, iters,
                                        row_mask, col_mask, interpret)


def _ot_trainable_fwd(iters, interpret, scores, alpha, row_mask, col_mask):
    # raw scores + in-kernel masking: the residual IS the score tensor
    # (no separate masked [B,N,M] copy lives to the backward)
    prepped = _prep(scores, alpha, row_mask, col_mask,
                    build_dense=not _MASK_DENSE)
    out = _fwd_from_prep(prepped, iters, interpret, mask_dense=_MASK_DENSE)
    scalars, dense, log_mu, log_nu = prepped
    return out, (scalars, dense, log_mu, log_nu, row_mask, col_mask,
                 jnp.shape(alpha))


def _ot_trainable_bwd(iters, interpret, res, g):
    import numpy as np
    scalars, dense, log_mu, log_nu, row_mask, col_mask, a_shape = res
    dz, dalpha = _bwd_call(scalars, dense, log_mu, log_nu, g,
                           interpret, iters, mask_dense=_MASK_DENSE)
    valid = row_mask[:, :, None] & col_mask[:, None, :]
    dscores = jnp.where(valid, dz, 0).astype(dense.dtype)
    da = jnp.sum(dalpha).reshape(a_shape)
    f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
    return dscores, da, f0(row_mask), f0(col_mask)


_ot_trainable.defvjp(_ot_trainable_fwd, _ot_trainable_bwd)


# Trainable-path size gate: the backward keeps ~5 live [N,M] f32 buffers
# (Z, dO, dZ, contrib, recompute temp) plus the row-shaped potential
# history in VMEM per element. Measured on chip (tools/
# probe_sinkhorn_n1024.py, v5e): the eb=1 N=1024 program (~20 MB live)
# runs fine under the 56 MB vmem limit — fwd 5.78 ms vs 30.07 ms XLA
# scan (5.2x), fwd+grad 14.25 ms/call at B=64 while the XLA-scan
# autodiff OOMs HBM outright (20 GB of saved iterates at B=64). So the
# gate admits the stretch config and only shapes whose live set would
# genuinely overflow VMEM (N >~ 1200) fall back to the XLA scan.
_TRAIN_VMEM_BUDGET = 24 * 2 ** 20


def pallas_log_optimal_transport_trainable(
        scores, alpha, iters: int,
        row_mask: Optional[jnp.ndarray] = None,
        col_mask: Optional[jnp.ndarray] = None,
        interpret: Optional[bool] = None) -> OTScores:
    """Differentiable drop-in for ``log_optimal_transport`` (training path).

    Forward = the fused VMEM-resident kernel; backward = exact replayed
    backprop through the ``iters`` Sinkhorn iterations (see module
    docstring). Falls back to the XLA scan when the dense block would
    overflow the VMEM budget (e.g. the 1024-kpt stretch config).
    """
    b, n, m = scores.shape
    itemsize = jnp.dtype(scores.dtype).itemsize
    # backward scratch stores only the v-side history: (iters+1) steps of
    # [1, M] v plus the scalar vbin per element (u_t is recomputed)
    hist = (iters + 1) * (m + 1) * itemsize
    if 5 * n * m * itemsize + hist > _TRAIN_VMEM_BUDGET:
        from mdgat_tpu.ops.transport import log_optimal_transport
        return log_optimal_transport(scores, alpha, iters,
                                     row_mask=row_mask, col_mask=col_mask)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # no Mosaic on CPU
    if row_mask is None:
        row_mask = jnp.ones((b, n), bool)
    if col_mask is None:
        col_mask = jnp.ones((b, m), bool)
    return _ot_trainable(iters, interpret, scores,
                         jnp.asarray(alpha, scores.dtype),
                         row_mask, col_mask)
