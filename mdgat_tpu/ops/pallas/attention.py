"""Fused dynamic top-k attention as a Pallas TPU kernel.

One kernel per (batch, head): computes scores on the MXU, finds each query
row's k-th largest score by *value bisection* (``jax.lax.top_k`` has no
Mosaic lowering), applies the masked softmax, and multiplies by V — the
``[N, M]`` probability matrix never leaves VMEM. The XLA path materializes
prob in HBM between the softmax and the PV matmul; at L=18 layers that
dominates HBM traffic.

Bisection: maintain [lo, hi] with count(s >= lo) >= k > count(s >= hi);
after ~30 halvings lo converges to the k-th value within float precision.
Exact agreement with the threshold-mask XLA path except for scores tied
within the final bisection interval (measure-zero for continuous scores).

Forward-only (the training path keeps the differentiable XLA version).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -1e30
# Bisection halvings for the k-th-value threshold. lo converges to the
# true k-th value FROM BELOW, so the kept set always contains the true
# top-k; after 14 halvings the interval is range/16384 (~1e-3 for typical
# attention-score spreads) and spurious extra members are near-ties whose
# softmax weights match the k-th entry's anyway.
_BISECT_ITERS = 14
_BLOCK_B = 4  # batch elements per program (amortizes program overhead)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, t_ref, *, topk: int,
                 scale: float, num_heads: int, block_b: int,
                 has_mask: bool):
    out_dt = q_ref.dtype
    dt = jnp.float32                       # scores/softmax accumulate in f32
    neg = jnp.asarray(BIG_NEG, dt)
    n = q_ref.shape[2]
    m = k_ref.shape[2]

    # per-(batch, head) MXU matmuls (block-diagonal), then ALL VPU work
    # (bisection threshold + masked softmax) on the stacked
    # [block_b*H*N, M] score matrix — one wide vector pass instead of
    # block_b*num_heads sequential ones. f32 internals: Mosaic's bf16
    # matmul/scalar paths are unreliable on this toolchain; HBM traffic
    # stays bf16 either way.
    rows = []
    masks = []
    for b in range(block_b):
        kv_mask = mask_ref[b] > 0.5        # [1, M] bool (f32 input)
        for h in range(num_heads):
            q = q_ref[b, h].astype(dt)     # [N, D]
            k = k_ref[b, h].astype(dt)     # [M, D]
            rows.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale)
            if has_mask:
                masks.append(jnp.broadcast_to(kv_mask, (n, m)))
    s = jnp.concatenate(rows, axis=0)      # [B*H*N, M]
    if has_mask:
        valid = jnp.concatenate(masks, axis=0)
        s = jnp.where(valid, s, neg)

    if topk == 0 and not has_mask:
        # dense, no padding: plain softmax — skip every masking pass
        mx = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - mx)
        prob = e / jnp.sum(e, axis=1, keepdims=True)
        thr = jnp.full((s.shape[0], 1), neg, dt)
        for b in range(block_b):
            for h in range(num_heads):
                v = v_ref[b, h].astype(dt)
                r0 = (b * num_heads + h) * n
                o_ref[b, h] = jax.lax.dot_general(
                    prob[r0:r0 + n], v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(out_dt)
                t_ref[b, h] = thr[r0:r0 + n]
        return

    if topk > 0:
        big = jnp.asarray(-BIG_NEG, dt)
        if has_mask:
            lo = jnp.min(jnp.where(valid, s, big), axis=1, keepdims=True)
        else:
            lo = jnp.min(s, axis=1, keepdims=True)
        hi = jnp.max(s, axis=1, keepdims=True)

        def bisect(_, carry):
            lo, hi = carry
            mid = (lo + hi) * 0.5
            cnt = jnp.sum((s >= mid).astype(dt), axis=1, keepdims=True)
            take = cnt >= topk
            lo = jnp.where(take, mid, lo)
            hi = jnp.where(take, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bisect, (lo, hi),
                                   unroll=True)
        keep = s >= lo
        thr = lo                           # [B*H*N, 1]
    else:
        keep = valid & jnp.ones_like(s, bool)
        thr = jnp.full((s.shape[0], 1), neg, dt)
    del kv_mask

    s_m = jnp.where(keep, s, neg)
    mx = jnp.max(s_m, axis=1, keepdims=True)
    e = jnp.exp(s_m - mx) * keep.astype(dt)
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True),
                        jnp.asarray(1e-38, dt))
    prob = e / denom                       # [B*H*N, M]
    for b in range(block_b):
        for h in range(num_heads):
            v = v_ref[b, h].astype(dt)     # [M, D]
            r0 = (b * num_heads + h) * n
            o_ref[b, h] = jax.lax.dot_general(
                prob[r0:r0 + n], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_dt)
            t_ref[b, h] = thr[r0:r0 + n]   # [N, 1] per-row k-th value


def pallas_topk_attention(q, k, v, topk: Optional[int],
                          kv_mask: Optional[jnp.ndarray] = None,
                          interpret: bool = False,
                          return_threshold: bool = False):
    """Fused (top-k or dense) attention; q,k,v [B,H,N,D] -> [B,H,N,D].

    ``topk=None`` runs the dense masked softmax in the same fused kernel.
    ``return_threshold`` also returns the per-row k-th value [B,H,N,1]
    (f32) — the only residual the custom-VJP backward needs.
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    dt = q.dtype
    if kv_mask is None:
        maskf = jnp.ones((b, 1, m), jnp.float32)
    else:
        maskf = kv_mask.astype(jnp.float32)[:, None, :]
    scale = 1.0 / (d ** 0.5)

    # VMEM budget: ~3 score-matrix-sized f32 temporaries (s, keep-mask,
    # exp) are live at once; keep 3 * bb*hh*N*M * 4B within ~13 MB of the
    # 16 MB scoped-vmem limit. Shrink the per-program batch, then split
    # heads, for large N*M (the 1024-keypoint stretch config runs one
    # head per program).
    budget = 13 * 1024 * 1024
    bb, hh = _BLOCK_B, h
    while bb > 1 and 3 * bb * hh * n * m * 4 > budget:
        bb //= 2
    while hh > 1 and 3 * bb * hh * n * m * 4 > budget:
        hh //= 2
    while b % bb != 0:
        bb //= 2  # fall back to a divisor of the batch
    while h % hh != 0:
        hh //= 2
    kern = functools.partial(_attn_kernel, topk=int(topk or 0), scale=scale,
                             num_heads=hh, block_b=bb,
                             has_mask=kv_mask is not None)
    out, thr = pl.pallas_call(
        kern,
        grid=(b // bb, h // hh),
        in_specs=[
            pl.BlockSpec((bb, hh, n, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, hh, m, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, hh, m, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, hh, n, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, hh, n, 1), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, n, d), dt),
            jax.ShapeDtypeStruct((b, h, n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, maskf)
    if return_threshold:
        return out, thr
    return out


# ---------------------------------------------------------------------------
# differentiable wrapper: pallas forward + analytic XLA backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_topk_attention(q, k, v, topk, kv_mask):
    """Top-k attention with the Pallas forward and a sort-free backward.

    Forward: the fused kernel (scores stay in VMEM; returns the per-row
    k-th value as the only extra residual). Backward: recompute scores in
    XLA, mask with the saved threshold (the selection is constant w.r.t.
    the inputs, exactly like the reference's scatter backward), and apply
    the standard masked-softmax VJP — all MXU matmuls, no TopK sort in
    either pass. Makes the Pallas path usable in training.
    """
    out, _ = _fused_fwd_impl(q, k, v, topk, kv_mask)
    return out


def _fused_fwd_impl(q, k, v, topk, kv_mask):
    interp = jax.default_backend() == "cpu"  # no Mosaic on CPU
    return pallas_topk_attention(q, k, v, topk, kv_mask=kv_mask,
                                 return_threshold=True, interpret=interp)


def _fused_fwd(q, k, v, topk, kv_mask):
    out, thr = _fused_fwd_impl(q, k, v, topk, kv_mask)
    return out, (q, k, v, thr, kv_mask)


def _fused_bwd(topk, res, g):
    q, k, v, thr, kv_mask = res
    dt = jnp.float32
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=dt).astype(dt) * scale
    neg = jnp.asarray(BIG_NEG, dt)
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, neg)
    keep = s >= thr                       # thr = -1e30 for dense layers
    if kv_mask is not None:
        keep = keep & kv_mask[:, None, None, :]
    s_m = jnp.where(keep, s, neg)
    mx = jnp.max(s_m, axis=-1, keepdims=True)
    e = jnp.exp(s_m - mx) * keep.astype(dt)
    p = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True),
                        jnp.asarray(1e-38, dt))
    gf = g.astype(dt)
    vf = v.astype(dt)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf,
                    preferred_element_type=dt)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf,
                    preferred_element_type=dt)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(dt),
                    preferred_element_type=dt) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(dt),
                    preferred_element_type=dt) * scale
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None)


fused_topk_attention.defvjp(_fused_fwd, _fused_bwd)
