"""Fused dynamic top-k attention as a Pallas TPU kernel.

One kernel per (batch, head): computes scores on the MXU, finds each query
row's k-th largest score by *bisection* (``jax.lax.top_k`` has no Mosaic
lowering), applies the masked softmax, and multiplies by V — the ``[N, M]``
probability matrix never leaves VMEM. The XLA path materializes prob in
HBM between the softmax and the PV matmul; at L=18 layers that dominates
HBM traffic.

Bisection is EXACT: scores are mapped to order-preserving int32 keys
(IEEE-754 totally ordered under the sign-fix transform), and the k-th key
is found by integer binary search — 32 halvings pin the interval to
adjacent integers, so the threshold equals the k-th largest score *bit
exactly* and the kept set is the true top-k (all ties at the k-th value
kept, the same semantics as the XLA threshold path ``s >= top_k(s)[-1]``;
``models/mdgat.py:196-210`` keeps exactly k under ties — documented
divergence, measure-zero for continuous scores).

Forward is the Pallas kernel; training uses the custom-VJP wrapper below.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG_NEG = -1e30
# Integer binary search over the int32 key space: the interval [lo, hi]
# halves every step, so 32 steps guarantee hi - lo <= 1, i.e. lo IS the
# k-th largest key (exact selection regardless of score distribution).
_BISECT_ITERS_EXACT = 32
# Float value-bisection steps for the fast path (see fbisect below),
# expressed in binary-pass resolution: the threshold slack is
# range/2^ITERS and the k-ary loop runs ceil(ITERS/log2(n_mid+1)) slab
# traversals. Round-5 chip sweep (tools/measure_topk_agreement.py, 256
# pairs / 65536 match slots, + tools/probe_gate_ab.py interleaved):
#   ITERS   14   12   11    9    7    5    4     3
#   flips   54   58   66   52   69   72   76   115   (vs exact kernel)
#   eval    7.66 7.32 7.01 6.64 6.45 6.17 5.85  5.52  ms/step
# The bf16 score-computation noise floor (exact-kernel vs XLA top_k on
# the same inputs) is 129 flips; every ITERS >= 4 sits BELOW it with end
# metrics identical to 6 decimals, i.e. the selection slack is invisible
# under the bf16 scores. ITERS=3 is the measured cliff: 115 flips vs
# exact and 147 vs XLA — the first value above the noise floor. Default
# 4 (3 ternary traversals), the lowest setting still at the floor;
# do not lower to 3 without re-measuring agreement (2026-08-19).
_BISECT_ITERS_FAST = 4
# The ITERS=4 justification is SPECIFIC to bf16 pipelines: the sweep's
# "flips sit below the noise floor" argument needs score-computation
# noise to SUPPLY that floor, and bf16 rounding is much coarser than
# f32. An f32 pipeline (the CLI default: compute_dtype=float32,
# core/config.py) has its own, smaller floor — f32 reassociation: the
# exact int-key kernel vs XLA top_k on the SAME f32 scores differ on
# 52 of 65536 match slots (tools/measure_topk_agreement.py --dtype
# float32, 256 pairs, 2026-08-19). The f32 sweep against that floor:
#   ITERS    14   9    5    4
#   flips    48   47   46   59   (vs exact kernel, same scores)
# ITERS >= 5 sits below the 52-flip floor (precision/recall equal to 6
# decimals); 4 is the first value above it. f32 therefore ships 5 — one
# notch more resolution than bf16's 4, by the same measured-floor rule.
# Do not lower without re-running the f32 study.
_BISECT_ITERS_F32 = 5
# Any OTHER input dtype (float64 parity paths, float16) has had NO
# agreement study — the measured-floor rule cannot transfer (f64's
# reassociation noise is ~2^-52 rel, orders of magnitude below the
# range/2^5 slack, so ITERS=5 would NOT hide under it), and these paths
# are parity surfaces, not perf surfaces. They keep the original
# full-resolution traversal.
_BISECT_ITERS_PARITY = 14


def _fast_iters(io_dtype) -> int:
    """Fast-path bisection resolution for a kernel whose score inputs
    (q/k or x/source, BEFORE the in-kernel f32 upcast) have
    ``io_dtype``. Only bf16 and f32 have measured agreement floors
    (sweeps above); every other dtype gets the parity-grade resolution.
    Reads the module globals at trace time so the A/B probes'
    monkeypatching keeps working."""
    d = np.dtype(io_dtype)
    if d == np.dtype(jnp.bfloat16):
        return _BISECT_ITERS_FAST
    if d == np.dtype(np.float32):
        return max(_BISECT_ITERS_FAST, _BISECT_ITERS_F32)
    return max(_BISECT_ITERS_FAST, _BISECT_ITERS_F32, _BISECT_ITERS_PARITY)
# k-ary selection (pack several midpoint counts into one int32 traversal —
# see the selection branches in _stacked_prob). Module-level gate so a
# real-chip A/B (or a Mosaic toolchain regression on the packed int32
# ops) is a one-line flip, not a git-stash dance.
_KARY_SELECT = True
# Widest M (score-slab row length) that still uses k-ary selection; wider
# rows use plain binary bisection. Chip-measured crossover: at M=256 the
# k-ary packed-count selector wins ~2.5% end-to-end (round-3 probe), at
# M=1024 it LOSES ~14% (tools/probe_stretch.py round 4: binary 8.31 ms /
# 962 pairs/s vs ternary 9.65 / 829 at _LAYER_BUDGET=26MB) — on the big
# slabs the per-pass extra compare+mul-add chain costs more than the
# 14->9 traversal cut saves. M=512 is a WASH (probe_gate_ab --train,
# 2x2 reps: train 59.1 vs 58.6 ms best-of, ordering flips between reps;
# eval N=256 identical by construction) — 512 keeps the round-3
# k-ary-wins measurement intact and only the clearly-losing M=1024
# switches to binary.
_KARY_MAX_M = 512
# Count-accumulator dtype for the fast-path selection sweeps (chip A/B
# gate). The pre-k-ary binary bisection accumulated its compare counts
# in F32 — the form Mosaic fuses into one compare+reduce VPU pass; the
# k-ary rework moved counts to packed INT32 (3 x 10-bit fields), and the
# first post-relay chip numbers regressed ~11% with BOTH the k-ary and
# the restored-binary selectors slow (tools/probe_selection_ab.py), i.e.
# the regression tracks the int32 count switch, not the arity. True
# packs TWO counts into the f32 mantissa instead (exact while
# 2*ceil(log2(M+1)) <= 24): ternary selection, 9 fused passes for the
# binary path's 14-pass resolution, no integer ops in the sweep.
_PACK_F32 = True
# Midpoints per fast-path traversal on the _PACK_F32 path (chip A/B
# gate): 2 = ternary, one packed-f32 accumulator (9 passes for the
# binary path's 14-pass resolution); 4 = pentary, TWO accumulators built
# in the same traversal (7 passes) — a win iff Mosaic fuses both
# compare+mul-add+reduce chains into one slab read.
# CLOSED 2026-08-19: _SEL_WIDTH=4 measured -19% eval on chip (Mosaic
# runs the second accumulator chain as a second slab traversal, see
# docs/DESIGN.md "Round-4 A/B outcomes") — do not re-probe without a
# Mosaic toolchain bump.
_SEL_WIDTH = 2
# Run the fast-path bisection compare sweeps on a bf16 cast of the score
# slab (chip A/B gate): halves the bytes per traversal; the one-time
# cast adds ~1.5 passes. Counts, threshold, and the final keep compare
# all stay in bf16 space, so the kept set still contains the (bf16)
# top-k; added near-tie slack is bf16 resolution — the same order as
# the bf16 score-computation noise floor already measured at 99.9%
# match agreement. CLAUDE.md warns this toolchain's Mosaic bf16
# SCALAR/MATMUL paths are buggy; pure elementwise compares must be
# chip-validated (test + probe) before this defaults on.
# CLOSED 2026-08-19: this Mosaic toolchain REJECTS bf16 compares in the
# sweep at compile time (docs/DESIGN.md round-4 A/B outcomes) — the gate
# stays for its interpret-mode tests only; do not re-probe on chip
# without a toolchain bump.
_SWEEP_BF16 = False
# Softmax-epilogue variant (module gate, same A/B rationale as above —
# the first post-relay chip numbers REGRESSED ~11% vs the last measured
# pre-epilogue-change build, so each form must be chip-timed):
#   "deferred_where": e = exp(where(keep, s - mx, BIG_NEG)); callers
#       scale the post-matmul [N, Dh] output by 1/denom.
#   "deferred_mul":   e = exp(s - mx) * keep, same deferred scaling
#       (does the select lower worse than the multiply?).
#   "legacy_norm":    e = exp(s - mx) * keep, p = e/denom normalized
#       over the full [R, M] slab in-kernel, inv returned as ones — the
#       last chip-measured-fast epilogue (pre-0179cde/66fd0e8).
# All three are bit-compatible on kept rows up to one f32 rounding
# reassociation (unit-tested); lse/thr residuals identical.
_EPILOGUE = "deferred_where"
# bf16 unnormalized-weight slab (chip A/B gate): cast e to bf16 after
# the f32 exp (one rounding, on the result — the sweep/selection math
# stays f32, unlike _SWEEP_BF16). The [R, M] e slab is the largest
# epilogue temporary; bf16 halves the exp-write, denom-sum-read, and
# PV-matmul-read bytes, and the PV dot takes the bf16 operand NATIVELY
# (no extra cast pass — the round-3 probe_matmul_speed loss came from
# casting f32 operands first; f32 accumulation via
# preferred_element_type throughout). denom accumulates f32. Numerics:
# kept-row max still exponentiates to exactly 1 (bf16-exact), so
# denom >= 1 and the 1e-30 floor still only guards all-masked rows;
# weights gain bf16 rounding (rel ~2^-8), same order as the bf16
# score-noise floor the ITERS=4 agreement study measured. Fwd-only:
# the train bwd kernels recompute p in f32 from lse (the lse shifts by
# the bf16-rounded denom, so recomputed p is consistently normalized).
# Applies to the deferred epilogues only (legacy_norm's in-kernel
# e/denom divide would silently promote back to f32).
# CLOSED 2026-08-20: COMPILES on this toolchain (unlike _SWEEP_BF16 —
# the bf16 here is an elementwise cast + f32-acc reduce + mixed-operand
# matmul, no bf16 compares) but measures NEUTRAL, 2-rep interleaved
# (tools/probe_gate_ab.py _PROB_BF16 False True --train): eval
# 5.70/5.72 ms/step OFF vs 5.74/5.67 ON; train 51.3/51.7 vs 51.4/52.9
# — every delta inside the rep-to-rep band. Mosaic fuses the exp+sum
# chain into the selection slab traversal either way, so the bf16
# width only thins the PV-matmul operand read, which the MXU already
# hides. Stays OFF: no win to buy the extra weight-rounding surface.
# Do not re-probe without a Mosaic toolchain bump.
_PROB_BF16 = False
_BLOCK_B = 4  # batch elements per program (amortizes program overhead)
# Backward blocking budget: live [N, M] f32 temporaries per head iteration
# (s, p, dp, ds + slack) x block_b elements must fit. Swept on the real
# chip by tools/probe_mha_bwd_bb.py.
_BWD_BB_BUDGET = 13 * 1024 * 1024
_BWD_LIVE = 5
# VMEM score-slab budgets for the forward/eval kernel blocking (chip A/B
# gates: raising them admits wider _BLOCK_B slabs per program — the chip
# accepts programs well past 13 MB, the question is whether wider slabs
# measure faster). _FWD_BUDGET_FAST gates the fast-selection arms (live
# x3), _FWD_BUDGET_EXACT the exact arms (live x5).
_FWD_BUDGET_EXACT = 13 * 1024 * 1024
_FWD_BUDGET_FAST = 26 * 1024 * 1024
# whole-layer fused kernels keep more per-program state (weights + MLP
# temporaries); separate budget, same A/B rationale. Raised 13 -> 26 MB
# in round 4: identical blocking at N<=256 (bb=4 fits either way), but
# the N=1024 stretch eval goes nblk 256 -> 512 (half the query blocks,
# half the K/V/weight reloads) for 12.32 -> 9.51 ms/step (649 -> 841
# pairs/s, tools/probe_stretch.py 2x2 interleaved). 48 MB (nblk=1024,
# one program per element) measured slightly WORSE (9.75) — the single
# giant program loses grid-level pipelining.
_LAYER_BUDGET = 26 * 1024 * 1024
# TRAIN-mode whole-layer gate (fused_train_layer_fits). Round 3
# measured the fused layer ~5% SLOWER at the N=1024 stretch config
# (37.9 -> 39.8 ms/step, bb=1) and gated it to 13 MB; round 4 re-probed
# after the lse-residual backward + shape-gated selection landed
# (tools/probe_stretch.py --train-only, 2x2 interleaved reps) and the
# verdict INVERTED: fused 25.3/25.5 vs unfused 25.7/26.0 ms/step —
# consistently ~1.5% faster in both reps. 24 MB admits the stretch
# shape (5*N*M*4 = 20 MB); re-probe on kernel-set changes.
_TL_BUDGET = 24 * 1024 * 1024

_SIGN_FIX = np.int32(0x7FFFFFFF)  # numpy scalar: inlined as a literal


def _monotone_key(s):
    """f32 -> int32, order-preserving (x < y  <=>  key(x) < key(y)).

    Positive floats compare correctly as signed ints; negative floats
    compare in reverse magnitude order — XOR with 0x7FFFFFFF (keeping the
    sign bit) reverses them back while staying below every non-negative
    key."""
    bits = jax.lax.bitcast_convert_type(s, jnp.int32)
    return jnp.where(bits >= 0, bits, bits ^ _SIGN_FIX)


def _key_to_float(key):
    bits = jnp.where(key >= 0, key, key ^ _SIGN_FIX)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _stacked_prob(s, valid, *, topk: int, exact: bool, has_mask: bool,
                  fine_iters=None):
    """Stacked scores [R, M] (masked entries already BIG_NEG) -> the
    UNNORMALIZED top-k / dense masked softmax weights ``e`` [R, M] plus
    the per-row inverse denominator ``inv`` [R, 1] (probabilities are
    ``e * inv``), the per-row threshold [R, 1], and the per-row logsumexp
    [R, 1] (``mx + log(denom)`` — the second custom-VJP residual: the
    backward rebuilds the probabilities as ``where(keep, exp(s - lse),
    0)`` without re-running the max/sum/div sweeps over the score slab).

    Deliberately NOT normalized here: ``e / denom`` is a full [R, M] VPU
    pass, while callers matmul the weights against V anyway — scaling the
    [N, Dh] matmul result by ``inv`` instead moves the normalization to
    an M/Dh-times-smaller tensor (identical math up to one f32 rounding
    reassociation). ``e <= 1`` per entry, so ``e @ v`` is bounded by
    ``M * max|v|`` — no overflow risk.

    The shared VPU core of both attention kernels; see the selection-
    variant notes on the module docstring."""
    dt = s.dtype
    neg = jnp.asarray(BIG_NEG, dt)

    if topk == 0 and not has_mask:
        # dense unmasked rows have no keep set, so the deferred_where /
        # deferred_mul arms coincide (no select/multiply pass); only the
        # legacy_norm arm differs — honor it so the A/B probe measures
        # the whole forward.
        mx = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - mx)
        if _PROB_BF16 and _EPILOGUE != "legacy_norm":
            e = e.astype(jnp.bfloat16)   # see the _PROB_BF16 gate comment
        denom = jnp.sum(e, axis=1, keepdims=True, dtype=dt)
        thr = jnp.full((s.shape[0], 1), neg, dt)
        lse = mx + jnp.log(denom)
        if _EPILOGUE == "legacy_norm":
            return e / denom, jnp.ones((s.shape[0], 1), dt), thr, lse
        return e, 1.0 / denom, thr, lse

    if topk > 0 and exact:
        # EXACT k-th value by integer binary search on monotone keys.
        # lo starts at the min VALID key (so cnt(key >= lo) = n_valid >= k
        # holds; all-masked rows leave lo above every key, keeping nothing).
        ikey = _monotone_key(s)
        big = jnp.asarray(-BIG_NEG, dt)
        if has_mask:
            lo = _monotone_key(jnp.min(jnp.where(valid, s, big),
                                       axis=1, keepdims=True))
        else:
            lo = jnp.min(ikey, axis=1, keepdims=True)
        hi = jnp.max(ikey, axis=1, keepdims=True)

        one = np.int32(1)

        def ceil_avg(a, b):
            # overflow-safe ceiling average: keys straddle the full int32
            # range, so (a + b) and (b - a) both can overflow; the
            # shift-based floor average never does
            fa = (jax.lax.shift_right_arithmetic(a, one)
                  + jax.lax.shift_right_arithmetic(b, one) + (a & b & one))
            return fa + ((a ^ b) & one)

        # search for the largest key t with cnt(>= t) >= k — that key IS
        # the k-th largest score
        if _KARY_SELECT and s.shape[1] <= min(1023, _KARY_MAX_M):
            # quaternary with packed counts (see the fast path below for
            # the packing economics): nested ceil-averages quarter the
            # interval per single-traversal step, so 16 steps resolve the
            # full 2^32 key range exactly where binary needs 32.
            # Invariants fuzz-checked (5000 adversarial numpy trials incl.
            # INT_MIN/INT_MAX endpoints, all-equal and adjacent-key rows).
            base = np.int32(1 << 10)

            def bisect(_, carry):
                lo, hi = carry
                m2 = ceil_avg(lo, hi)
                m1 = ceil_avg(lo, jnp.maximum(m2 - one, lo))
                m3 = ceil_avg(m2, hi)
                packed = ((ikey >= m1).astype(jnp.int32)
                          + (ikey >= m2).astype(jnp.int32) * base
                          + (ikey >= m3).astype(jnp.int32) * (base * base))
                # dtype pinned: under x64 the default sum accumulator
                # promotes to int64
                cnt = jnp.sum(packed, axis=1, keepdims=True,
                              dtype=jnp.int32)
                # counts are nonnegative: unpack with logical shifts +
                # masks (plainer Mosaic lowering than signed div/mod)
                fmask = np.int32(base - 1)
                t1 = (cnt & fmask) >= topk
                t2 = (jax.lax.shift_right_logical(cnt, np.int32(10))
                      & fmask) >= topk
                t3 = jax.lax.shift_right_logical(cnt, np.int32(20)) >= topk
                nlo = jnp.where(t3, m3,
                                jnp.where(t2, m2, jnp.where(t1, m1, lo)))
                nhi = jnp.where(t3, hi, jnp.where(t2, m3 - one,
                                jnp.where(t1, m2 - one, m1 - one)))
                return nlo, nhi

            iters_exact = 16
        else:

            def bisect(_, carry):
                lo, hi = carry
                mid = ceil_avg(lo, hi)
                cnt = jnp.sum((ikey >= mid).astype(jnp.int32),
                              axis=1, keepdims=True, dtype=jnp.int32)
                take = cnt >= topk
                return (jnp.where(take, mid, lo),
                        jnp.where(take, hi, mid - one))

            iters_exact = _BISECT_ITERS_EXACT

        # unrolled: the TPU scalar-core loop overhead of a rolled/dynamic
        # loop costs more than the extra VPU passes (measured: rolled
        # 2.5k, early-exit while 2.5k, unrolled 3.5k pairs/s end-to-end)
        mx = _key_to_float(hi)             # pre-search row max (see below)
        lo, hi = jax.lax.fori_loop(0, iters_exact, bisect, (lo, hi),
                                   unroll=True)
        keep = ikey >= lo
        if has_mask:
            # airtight for all-masked rows (lo's init overflows the int32
            # midpoint arithmetic there; keep must still be empty)
            keep = keep & valid
        thr = _key_to_float(lo)            # [R, 1] exact k-th value
        # rebuild the float scores from the keys (pure bitcast): the float
        # copy is dead across the search loop
        s = _key_to_float(ikey)
    elif topk > 0:
        # FAST path: k-ary float value-bisection. lo only ever moves to a
        # candidate with cnt(>= cand) >= k, so it converges to the k-th
        # value from below and the kept set always contains the true
        # top-k; once the interval is range/2^14 the spurious extra
        # members are near-ties whose softmax weights match the k-th
        # entry's (agreement quantified in DESIGN.md / test_pallas).
        #
        # k-ary: each iteration counts SEVERAL midpoints in ONE traversal
        # of the score slab — the counts are <= M, so several
        # ceil(log2(M+1))-bit counts pack exactly into one accumulator
        # per row and a single fused compare+pack+reduce pass yields all
        # of them (the sweeps are VMEM-bandwidth-bound, so one traversal
        # with 3 compares costs ~one with 1). The DEFAULT scheme is the
        # ``_PACK_F32`` f32-mantissa packing (ternary, M <= 4095, 9
        # passes — see the gate comment at the top of the module); the
        # figures below describe the ``_PACK_F32=False`` int32 arm:
        # quaternary (3 midpoints) holds through M <= 1023 (3 x 10-bit
        # fields; worst-case sum 1023*(1 + 2^10 + 2^20) = 2^30 - 1,
        # exactly inside int32) and needs 7 passes for the binary path's
        # 14-pass resolution; ternary (M <= 32767, 11-15-bit fields)
        # needs 9; wider M falls back to binary.
        # NB: routing the count through the MXU as a ones-matvec was
        # measured SLOWER (9.66 vs 8.05 ms/step eval) — Mosaic already
        # fuses the compare+reduce into one VPU pass.
        big = jnp.asarray(-BIG_NEG, dt)
        if has_mask:
            lo = jnp.min(jnp.where(valid, s, big), axis=1, keepdims=True)
        else:
            lo = jnp.min(s, axis=1, keepdims=True)
        hi = jnp.max(s, axis=1, keepdims=True)

        m_sz = s.shape[1]
        bits = max(int(np.ceil(np.log2(m_sz + 1))), 1)
        kary_here = _KARY_SELECT and m_sz <= _KARY_MAX_M
        if _PACK_F32:
            # float packing: two bits-wide counts as c1 + c2 * 2^bits in
            # the f32 mantissa — exact while 2 * bits <= 24 (integers up
            # to 2^24 are exactly representable; worst case
            # M + M * 2^bits = 2^(2*bits) - 1). Ternary selection with
            # the compare+mul-add+reduce staying entirely in f32, the
            # form Mosaic fuses into one VPU pass. _SEL_WIDTH=4 packs
            # TWO such accumulators per traversal (pentary, 7 passes for
            # the 14-pass binary resolution) — a win iff Mosaic fuses
            # both compare+mul-add+reduce chains into one slab pass.
            n_mid = (_SEL_WIDTH if (kary_here and 2 * bits <= 24)
                     else 1)
        else:
            n_mid = (min(3, 31 // bits)
                     if (kary_here and bits <= 15) else 1)
        base = 1 << bits
        # iterations for >= the binary path's range/2^ITERS resolution
        # (callers pass fine_iters keyed on their IO dtype — each dtype
        # ships the lowest resolution below its own score-noise floor)
        if fine_iters is None:
            fine_iters = _BISECT_ITERS_FAST
        iters = int(np.ceil(fine_iters / np.log2(n_mid + 1)))
        # counts are pinned f32 on the packed-float path (NOT the score
        # dtype: the 2*bits <= 24 bound above is the f32 mantissa — a
        # bf16/f16 score dtype would silently corrupt packed counts)
        cdt = jnp.float32 if _PACK_F32 else jnp.int32
        # optional bf16 compare space for the sweeps: halves the bytes
        # each traversal reads. Counts, thresholds, and the FINAL keep
        # compare all stay in the same rounded space, so the invariant
        # (kept set contains the bf16-space top-k) is preserved; the
        # added slack is bf16 resolution at the k-th value — the same
        # order as the bf16 score-computation noise floor
        # (tools/measure_topk_agreement.py).
        if _SWEEP_BF16:
            sweep_s = s.astype(jnp.bfloat16)
            in_sweep = lambda x: x.astype(jnp.bfloat16)
        else:
            sweep_s = s
            in_sweep = lambda x: x

        def fbisect(_, carry):
            lo, hi = carry
            span = hi - lo
            mids = [lo + ((j + 1) / (n_mid + 1)) * span
                    for j in range(n_mid)]
            cmids = [in_sweep(mm_) for mm_ in mids]
            # ascending override: the LARGEST midpoint with count >= k
            # becomes lo (counts are monotone nonincreasing in j).
            # Nonnegative counts: int32 unpacks with logical shifts +
            # masks (plainer Mosaic lowering than signed div/mod); f32
            # unpacks with an exact power-of-2 divide + floor.
            fields = []
            if _PACK_F32:
                # one f32 accumulator per pair of midpoints
                for g in range(0, n_mid, 2):
                    p = (sweep_s >= cmids[g]).astype(cdt)
                    if g + 1 < n_mid:
                        p = p + ((sweep_s >= cmids[g + 1]).astype(cdt)
                                 * base)
                    cnt = jnp.sum(p, axis=1, keepdims=True, dtype=cdt)
                    if g + 1 < n_mid:
                        c2 = jnp.floor(cnt * (1.0 / base))
                        fields += [cnt - c2 * base, c2]
                    else:
                        fields += [cnt]
            else:
                packed = (sweep_s >= cmids[0]).astype(cdt)
                for j in range(1, n_mid):
                    packed = packed + ((sweep_s >= cmids[j]).astype(cdt)
                                       * (base ** j))
                cnt = jnp.sum(packed, axis=1, keepdims=True, dtype=cdt)
                for j in range(n_mid):
                    fields.append(jax.lax.shift_right_logical(
                        cnt, np.int32(j * bits)) & np.int32(base - 1))
            new_lo, new_hi = lo, mids[0]
            for j in range(n_mid):
                tj = fields[j] >= topk
                new_lo = jnp.where(tj, mids[j], new_lo)
                new_hi = jnp.where(tj,
                                   hi if j == n_mid - 1 else mids[j + 1],
                                   new_hi)
            return new_lo, new_hi

        mx = hi                            # pre-search row max (see below)
        lo, hi = jax.lax.fori_loop(0, iters, fbisect, (lo, hi),
                                   unroll=True)
        # the keep compare runs in the SAME space as the counts: a bf16
        # sweep's lo is only guaranteed to keep >= k entries under the
        # bf16 rounding used while counting
        keep = sweep_s >= in_sweep(lo)
        thr = lo
    else:
        keep = valid & jnp.ones_like(s, bool)
        thr = jnp.full((s.shape[0], 1), neg, dt)
        mx = jnp.max(s, axis=1, keepdims=True)  # masked entries already neg

    # the row max is always in the kept set (k >= 1 and ties keep it), so
    # the softmax max equals the PRE-search interval top — no
    # post-selection max pass over the slab (all variants below).
    if _EPILOGUE == "deferred_where":
        # exp(BIG_NEG) == 0 exactly, so the where() also zeroes dropped
        # entries (all-masked rows: mx is the sentinel and keep is empty,
        # every entry exponentiates BIG_NEG).
        e = jnp.exp(jnp.where(keep, s - mx, neg))
    else:
        # multiply form: s <= mx for every entry (mx IS the row max), so
        # exp(s - mx) <= 1 never overflows; dropped/masked entries zero
        # via the keep multiply (all-masked rows: s == mx == sentinel,
        # exp(0) * 0 == 0).
        e = jnp.exp(s - mx) * keep.astype(dt)
    if _PROB_BF16 and _EPILOGUE != "legacy_norm":
        # one rounding on the f32 exp result; denom accumulates f32 (see
        # the gate comment — the kept-row max is bf16-exactly 1, so the
        # denom >= 1 / floor-only-guards-all-masked invariants hold)
        e = e.astype(jnp.bfloat16)
    # any row with a kept entry has denom >= 1 (its max exponentiates to
    # exactly 1), so the floor only guards ALL-masked rows — and it must
    # be a NORMAL f32 (1e-38 is subnormal: TPU flush-to-zero turns it
    # into 0, making inv = inf and the zero attention output 0*inf = NaN)
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True, dtype=dt),
                        jnp.asarray(1e-30, dt))
    lse = mx + jnp.log(denom)
    if _EPILOGUE == "legacy_norm":
        # normalize over the full [R, M] slab in-kernel; inv is ones so
        # callers' post-matmul scaling is a no-op (identical plumbing).
        return e / denom, jnp.ones((s.shape[0], 1), dt), thr, lse
    return e, 1.0 / denom, thr, lse


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, t_ref, *, topk: int,
                 scale: float, num_heads: int, block_b: int,
                 has_mask: bool, exact: bool):
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
    valid = None
    if has_mask:
        valid = jnp.concatenate(masks, axis=0)
        s = jnp.where(valid, s, neg)
    del kv_mask

    e, inv, thr, _ = _stacked_prob(s, valid, topk=topk, exact=exact,
                                   has_mask=has_mask,
                                   fine_iters=_fast_iters(q_ref.dtype))
    for b in range(block_b):
        for h in range(num_heads):
            v = v_ref[b, h].astype(dt)     # [M, D]
            r0 = (b * num_heads + h) * n
            o_ref[b, h] = (jax.lax.dot_general(
                e[r0:r0 + n], v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
                * inv[r0:r0 + n]).astype(out_dt)
            t_ref[b, h] = thr[r0:r0 + n]   # [N, 1] per-row k-th value


def _dot(a, b, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _layer_kernel(x_ref, src_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                  wv_ref, bv_ref, wm_ref, bm_ref,
                  w1x_ref, w1m_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                  topk: int, num_heads: int, block_b: int,
                  has_mask: bool, exact: bool):
    """Whole AttentionalPropagation layer fused (EVAL only): q/k/v
    projections + top-k/dense attention + head-merge projection + MLP
    (BN pre-folded to affine) + residual add — one VMEM-resident kernel
    instead of the attention kernel plus ~9 XLA ops (3 projections +
    head splits, merge matmul, concat, conv1, BN, ReLU, conv2, add)
    whose HBM round trips cost ~30% of the eval forward (profiled; see
    DESIGN.md). Reference layer semantics: ``models/mdgat.py:213-257``.

    Weight prep outside (fused_layer_apply): per-head splits absorb the
    torch channel interleave (c = d*H + h), the 1/sqrt(Dh) score scale is
    folded into wq/bq, and eval BatchNorm into w1/b1. Concat-free
    epilogue: merge(o) = sum_h o_h @ wm[h], and MLP(cat(x, m)) =
    relu(x @ w1x + m @ w1m + b1) @ w2 + b2 — no relayouts, all MXU work.
    """
    out_dt = x_ref.dtype
    dt = jnp.float32
    neg = jnp.asarray(BIG_NEG, dt)
    n = x_ref.shape[1]
    m = src_ref.shape[1]

    xs = [x_ref[b].astype(dt) for b in range(block_b)]      # [N, D] each
    srcs = [src_ref[b].astype(dt) for b in range(block_b)]  # [M, D]
    rows, masks = [], []
    for b in range(block_b):
        kv_mask = mask_ref[b] > 0.5
        for h in range(num_heads):
            q = _dot(xs[b], wq_ref[h].astype(dt)) + bq_ref[h].astype(dt)
            k = _dot(srcs[b], wk_ref[h].astype(dt)) + bk_ref[h].astype(dt)
            rows.append(jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            if has_mask:
                masks.append(jnp.broadcast_to(kv_mask, (n, m)))
    s = jnp.concatenate(rows, axis=0)
    valid = None
    if has_mask:
        valid = jnp.concatenate(masks, axis=0)
        s = jnp.where(valid, s, neg)

    e, inv, _, _ = _stacked_prob(s, valid, topk=topk, exact=exact,
                                 has_mask=has_mask,
                                 fine_iters=_fast_iters(x_ref.dtype))

    w1x = w1x_ref[...].astype(dt)
    w1m = w1m_ref[...].astype(dt)
    w2 = w2_ref[...].astype(dt)
    b1 = b1_ref[...].astype(dt)
    b2 = b2_ref[...].astype(dt)
    bm = bm_ref[...].astype(dt)
    for b in range(block_b):
        merged = bm
        for h in range(num_heads):
            v = _dot(srcs[b], wv_ref[h].astype(dt)) + bv_ref[h].astype(dt)
            r0 = (b * num_heads + h) * n
            o_h = _dot(e[r0:r0 + n], v) * inv[r0:r0 + n]   # [N, Dh]
            merged = merged + _dot(o_h, wm_ref[h].astype(dt))
        u = _dot(xs[b], w1x) + _dot(merged, w1m) + b1
        u = jnp.maximum(u, 0.0)
        delta = _dot(u, w2) + b2
        o_ref[b] = (xs[b] + delta).astype(out_dt)


def pallas_topk_attention(q, k, v, topk: Optional[int],
                          kv_mask: Optional[jnp.ndarray] = None,
                          interpret: bool = False,
                          return_threshold: bool = False,
                          exact: bool = False):
    """Fused (top-k or dense) attention; q,k,v [B,H,N,D] -> [B,H,N,D].

    ``topk=None`` runs the dense masked softmax in the same fused kernel.
    ``return_threshold`` also returns the per-row k-th value [B,H,N,1]
    (f32) — the only residual the custom-VJP backward needs.
    ``exact=True`` selects the integer-key binary search (bit-exact top-k,
    ~1.6x slower end-to-end at the eval config); the default fast path is
    a 14-step value bisection whose kept set is a superset of the top-k
    with near-tie extras only (quantified in DESIGN.md).
    """
    b, h, n, d = q.shape
    m = k.shape[2]
    dt = q.dtype
    if kv_mask is None:
        maskf = jnp.ones((b, 1, m), jnp.float32)
    else:
        maskf = kv_mask.astype(jnp.float32)[:, None, :]
    scale = 1.0 / (d ** 0.5)

    # VMEM blocking: the fast path peaks at ~3 score-matrix-sized f32
    # temporaries (scores, keep-mask, exp); the exact path adds the int32
    # key matrix and a compare scratch (~5). Keep the live set within
    # ~13 MB (the kernel asks for a raised 56 MB cap — physical VMEM is
    # 128 MB on v5e — but smaller blocks pipeline better; measured).
    # Shrink the per-program batch, then split heads, for large N*M (the
    # 1024-keypoint stretch config runs one head per program).
    # fast path: a larger budget keeps 2 batch elements per program at the
    # N=512 train config (measured win); the exact path's extra live
    # buffers pipeline better with smaller blocks (measured: 3.5k at 13 MB
    # vs 3.1k at 45 MB for the eval config)
    if exact and topk:
        budget, live = _FWD_BUDGET_EXACT, 5
    else:
        budget, live = _FWD_BUDGET_FAST, 3
    bb, hh = _BLOCK_B, h
    while bb > 1 and live * bb * hh * n * m * 4 > budget:
        bb //= 2
    while hh > 1 and live * bb * hh * n * m * 4 > budget:
        hh //= 2
    while b % bb != 0:
        bb //= 2  # fall back to a divisor of the batch
    while h % hh != 0:
        hh //= 2
    kern = functools.partial(_attn_kernel, topk=int(topk or 0), scale=scale,
                             num_heads=hh, block_b=bb,
                             has_mask=kv_mask is not None, exact=exact)
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, maskf)
    if return_threshold:
        return out, thr
    return out


# ---------------------------------------------------------------------------
# (a standalone attention-only custom-VJP wrapper lived here in round 2;
#  superseded by fused_mha below, which folds the projections and the
#  head-merge into the same kernel pair and removes the [B,H,N,D]
#  activation relayouts around it)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# per-head weight splitting (shared by the fused layer/MHA kernels)
# ---------------------------------------------------------------------------

def _split_proj(p, num_heads: int, head_dim: int, fold_scale=None):
    """conv1x1 params -> per-head ([H, D, Dh], [H, 1, Dh]) in f32.

    The projection OUTPUT channel c = d*H + h (torch ``view(B, dim, heads,
    N)`` channel interleave, ``models/mdgat.py:227``): head h's kernel
    columns / bias entries stride by H. Folding the 1/sqrt(Dh) score scale
    into wq/bq saves a VPU pass in the kernel.
    """
    d = p["w"].shape[0]
    f32 = jnp.float32
    w = p["w"].astype(f32).reshape(d, head_dim, num_heads).transpose(2, 0, 1)
    b = p["b"].astype(f32).reshape(head_dim, num_heads).T[:, None, :]
    if fold_scale is not None:
        w, b = w * fold_scale, b * fold_scale
    return w, b


def _unsplit_proj_grad(dw, db, fold_scale=None):
    """Inverse of :func:`_split_proj` for gradients: [H,D,Dh]/[H,1,Dh] ->
    raw conv1x1 layout [D, D]/[D]."""
    if fold_scale is not None:
        dw, db = dw * fold_scale, db * fold_scale
    h, d, dh = dw.shape
    return (dw.transpose(1, 2, 0).reshape(d, dh * h),
            db[:, 0, :].T.reshape(dh * h))


def _split_merge(p, num_heads: int, head_dim: int):
    """Merge conv params -> ([H, Dh, D], [1, D]) in f32 (per-head split
    over the merge INPUT channels, same interleave)."""
    d = p["w"].shape[1]
    f32 = jnp.float32
    wm = p["w"].astype(f32).reshape(head_dim, num_heads, d).transpose(1, 0, 2)
    bm = p["b"].astype(f32)[None, :]
    return wm, bm


def _unsplit_merge_grad(dwm, dbm):
    h, dh, d = dwm.shape
    return dwm.transpose(1, 0, 2).reshape(dh * h, d), dbm[0]


def _blocked_proj(p, num_heads: int, head_dim: int, fold_scale=None):
    """conv1x1 params -> head-BLOCKED full matrices ([D, D], [1, D]) in
    f32: output column c' = h*Dh + d maps to the torch-interleaved
    original c = d*H + h, so head h occupies a CONTIGUOUS lane block —
    one [N,D]x[D,D] MXU matmul projects every head at once and heads
    slice out as ``q[:, h*Dh:(h+1)*Dh]`` (per-head matmuls serialized the
    kernel; measured in the round-2 fused-MHA notes)."""
    d = p["w"].shape[0]
    f32 = jnp.float32
    w = p["w"].astype(f32).reshape(d, head_dim, num_heads)
    w = w.transpose(0, 2, 1).reshape(d, num_heads * head_dim)
    b = p["b"].astype(f32).reshape(head_dim, num_heads).T.reshape(
        1, num_heads * head_dim)
    if fold_scale is not None:
        w, b = w * fold_scale, b * fold_scale
    return w, b


def _unblocked_proj_grad(dw, db, num_heads: int, head_dim: int,
                         fold_scale=None):
    """Inverse of :func:`_blocked_proj` for gradients -> raw [D,D]/[D]."""
    if fold_scale is not None:
        dw, db = dw * fold_scale, db * fold_scale
    d = dw.shape[0]
    dw = dw.reshape(d, num_heads, head_dim).transpose(0, 2, 1).reshape(d, d)
    db = db.reshape(num_heads, head_dim).T.reshape(d)
    return dw, db


def _blocked_merge(p, num_heads: int, head_dim: int):
    """Merge conv params with INPUT rows permuted to the head-blocked
    order (row r' = h*Dh + d <- original r = d*H + h): ``concat_h(o_h) @
    wm_blocked`` equals the reference merge of interleaved channels."""
    d = p["w"].shape[1]
    f32 = jnp.float32
    wm = p["w"].astype(f32).reshape(head_dim, num_heads, d)
    wm = wm.transpose(1, 0, 2).reshape(num_heads * head_dim, d)
    bm = p["b"].astype(f32)[None, :]
    return wm, bm


def _unblocked_merge_grad(dwm, dbm, num_heads: int, head_dim: int):
    d = dwm.shape[1]
    dwm = dwm.reshape(num_heads, head_dim, d).transpose(1, 0, 2).reshape(d, d)
    return dwm, dbm[0]


# ---------------------------------------------------------------------------
# whole-layer fused forward (eval)
# ---------------------------------------------------------------------------

def fused_layer_apply(layer_params, layer_state, x, source,
                      topk: Optional[int], num_heads: int,
                      kv_mask: Optional[jnp.ndarray] = None,
                      exact: bool = False, interpret: bool = False):
    """One AttentionalPropagation layer, fully fused (EVAL semantics:
    BatchNorm folded to its running-stats affine). Returns the updated
    descriptors ``x + MLP(cat(x, MHA(x, source)))``.

    ``layer_params``: {"attn": {q,k,v,merge}, "mlp": [...]} as produced by
    ``attentional_propagation_init``; ``layer_state``: {"mlp": [...]}.
    Falls back to ``None`` return if the shape doesn't fit the fused
    kernel's blocking (caller then uses the unfused path).
    """
    from mdgat_tpu.ops.mlp import BN_EPS

    b, n, d = x.shape
    m = source.shape[1]
    h = num_heads
    dh = d // h

    f32 = jnp.float32
    scale = 1.0 / (dh ** 0.5)

    wq, bq = _split_proj(layer_params["attn"]["q"], h, dh, fold_scale=scale)
    wk, bk = _split_proj(layer_params["attn"]["k"], h, dh)
    wv, bv = _split_proj(layer_params["attn"]["v"], h, dh)
    wm, bm = _split_merge(layer_params["attn"]["merge"], h, dh)

    # MLP layer 1 (+ BN running-stats affine folded in), layer 2
    l1, l2 = layer_params["mlp"][0], layer_params["mlp"][1]
    st1 = layer_state["mlp"][0]
    f = (l1["bn"]["scale"].astype(f32)
         / jnp.sqrt(st1["var"].astype(f32) + BN_EPS))
    w1 = l1["lin"]["w"].astype(f32) * f[None, :]               # [2D, 2D]
    b1 = ((l1["lin"]["b"].astype(f32) - st1["mean"].astype(f32)) * f
          + l1["bn"]["bias"].astype(f32))[None, :]
    w1x, w1m = w1[:d], w1[d:]
    w2 = l2["lin"]["w"].astype(f32)                            # [2D, D]
    b2 = l2["lin"]["b"].astype(f32)[None, :]

    if kv_mask is None:
        maskf = jnp.ones((b, 1, m), jnp.float32)
    else:
        maskf = jnp.broadcast_to(kv_mask.astype(jnp.float32)[:, None, :],
                                 (b, 1, m))

    # blocking: batch first, then the QUERY axis (every output row depends
    # only on its own attention row + row-wise MLP, so query blocking is
    # exact); k/v/source stay whole per program — the 1024-kpt stretch
    # config runs (bb=1, nblk=512) instead of falling back to the unfused
    # path. All heads stay in-program (the merge epilogue needs them).
    live = 5 if (exact and topk) else 3
    budget = _LAYER_BUDGET
    bb, nblk = _BLOCK_B, n
    while bb > 1 and live * bb * h * nblk * m * 4 > budget:
        bb //= 2
    while b % bb != 0:
        bb //= 2
    while nblk > 128 and nblk % 2 == 0 and live * bb * h * nblk * m * 4 > budget:
        nblk //= 2
    if n % nblk != 0:
        return None  # query axis not evenly blockable (callers unfuse)

    kern = functools.partial(_layer_kernel, topk=int(topk or 0),
                             num_heads=h, block_b=bb,
                             has_mask=kv_mask is not None, exact=exact)
    rep = lambda shape: pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b // bb, n // nblk),
        in_specs=[
            pl.BlockSpec((bb, nblk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, m), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            rep((h, d, dh)), rep((h, 1, dh)),
            rep((h, d, dh)), rep((h, 1, dh)),
            rep((h, d, dh)), rep((h, 1, dh)),
            rep((h, dh, d)), rep((1, d)),
            rep((d, 2 * d)), rep((d, 2 * d)), rep((1, 2 * d)),
            rep((2 * d, d)), rep((1, d)),
        ],
        out_specs=pl.BlockSpec((bb, nblk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(x, source, maskf, wq, bq, wk, bk, wv, bv, wm, bm,
      w1x, w1m, b1, w2, b2)
    return out


# ---------------------------------------------------------------------------
# fused MHA (projections + top-k attention + head-merge) with custom VJP —
# the TRAINING counterpart of the eval whole-layer kernel
# ---------------------------------------------------------------------------

def _mha_fwd_kernel(x_ref, src_ref, mask_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                    wv_ref, bv_ref, wm_ref, bm_ref, o_ref, t_ref, l_ref, *,
                    topk: int, num_heads: int, block_b: int,
                    has_mask: bool, exact: bool):
    """``merge(MHA(x, src))`` in one kernel: per-head q/k/v projections,
    top-k/dense attention (stacked-rows VPU path), and the head-merge
    projection — no ``[B, H, N, D]`` relayouts of activations anywhere
    (profiled ~28 ms/step of pure layout copies at the reference train
    config with the split-heads XLA path). Also emits the per-row k-th
    score and logsumexp (the custom-VJP residuals).
    Reference: ``models/mdgat.py:213-237``.
    """
    out_dt = x_ref.dtype
    dt = jnp.float32
    neg = jnp.asarray(BIG_NEG, dt)
    n = x_ref.shape[1]
    m = src_ref.shape[1]
    dh = wq_ref.shape[1] // num_heads

    # head-BLOCKED weights (see _blocked_proj): one [*,D]x[D,D] MXU matmul
    # projects all heads; heads slice out as contiguous lane blocks
    wq = wq_ref[...].astype(dt)
    wk = wk_ref[...].astype(dt)
    wv = wv_ref[...].astype(dt)
    wm = wm_ref[...].astype(dt)
    rows, masks = [], []
    for b in range(block_b):
        kv_mask = mask_ref[b] > 0.5
        q_full = _dot(x_ref[b].astype(dt), wq) + bq_ref[...].astype(dt)
        k_full = _dot(src_ref[b].astype(dt), wk) + bk_ref[...].astype(dt)
        for h in range(num_heads):
            rows.append(jax.lax.dot_general(
                q_full[:, h * dh:(h + 1) * dh],
                k_full[:, h * dh:(h + 1) * dh],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            if has_mask:
                masks.append(jnp.broadcast_to(kv_mask, (n, m)))
    s = jnp.concatenate(rows, axis=0)
    valid = None
    if has_mask:
        valid = jnp.concatenate(masks, axis=0)
        s = jnp.where(valid, s, neg)

    e, inv, thr, lse = _stacked_prob(s, valid, topk=topk, exact=exact,
                                     has_mask=has_mask,
                                     fine_iters=_fast_iters(x_ref.dtype))
    bm = bm_ref[...].astype(dt)
    for b in range(block_b):
        v_full = _dot(src_ref[b].astype(dt), wv) + bv_ref[...].astype(dt)
        os = []
        for h in range(num_heads):
            r0 = (b * num_heads + h) * n
            os.append(_dot(e[r0:r0 + n],
                           v_full[:, h * dh:(h + 1) * dh])
                      * inv[r0:r0 + n])                      # [N, Dh]
            t_ref[b, h] = thr[r0:r0 + n]
            l_ref[b, h] = lse[r0:r0 + n]
        o_full = jnp.concatenate(os, axis=1)                 # [N, D]
        o_ref[b] = (_dot(o_full, wm) + bm).astype(out_dt)


def _mha_bwd_kernel(x_ref, src_ref, mask_ref, thr_ref, lse_ref, g_ref,
                    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                    wm_ref, bm_ref,
                    dx_ref, dsrc_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                    dwv_ref, dbv_ref, dwm_ref, dbm_ref, *,
                    num_heads: int, block_b: int, has_mask: bool):
    """VJP of :func:`_mha_fwd_kernel` with the selection frozen at the
    forward's per-row threshold (reference scatter-backward semantics) and
    every [N, M] intermediate VMEM-resident. The probabilities rebuild
    from the saved per-row logsumexp (no max/sum/div re-sweeps). Weight
    gradients accumulate in their output refs across the sequential batch
    grid."""
    dt = jnp.float32
    n = x_ref.shape[1]
    m = src_ref.shape[1]
    dh = wq_ref.shape[1] // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dwm_ref[...] = jnp.zeros_like(dwm_ref)
        dbm_ref[...] = jnp.zeros_like(dbm_ref)

    wq = wq_ref[...].astype(dt)                              # [D, D] blocked
    wk = wk_ref[...].astype(dt)
    wv = wv_ref[...].astype(dt)
    wm = wm_ref[...].astype(dt)
    for b in range(block_b):
        x = x_ref[b].astype(dt)                              # [N, D]
        src = src_ref[b].astype(dt)                          # [M, D]
        g = g_ref[b].astype(dt)                              # [N, D]
        kv = (mask_ref[b] > 0.5) if has_mask else None
        thr_h = [thr_ref[b, h] for h in range(num_heads)]
        lse_h = [lse_ref[b, h] for h in range(num_heads)]
        dbm_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        (o_full, dx, dsrc, dwq_c, dbq_c, dwk_c, dbk_c, dwv_c, dbv_c,
         dwm_c) = _mha_bwd_block(
            x, src, kv, thr_h, lse_h, g, wq, wk, wv, wm,
            bq_ref[...].astype(dt), bk_ref[...].astype(dt),
            bv_ref[...].astype(dt), num_heads, dh, n, m, has_mask)
        dwm_ref[...] += dwm_c
        dwq_ref[...] += dwq_c
        dbq_ref[...] += dbq_c
        dwk_ref[...] += dwk_c
        dbk_ref[...] += dbk_c
        dwv_ref[...] += dwv_c
        dbv_ref[...] += dbv_c
        dx_ref[b] = dx.astype(dx_ref.dtype)
        dsrc_ref[b] = dsrc.astype(dsrc_ref.dtype)


def _mha_bwd_block(x, src, kv, thr_h, lse_h, g, wq, wk, wv, wm, bq, bk, bv,
                   num_heads, dh, n, m, has_mask):
    """Per-element MHA backward with the selection frozen at ``thr_h``
    (the forward's per-row, per-head k-th score) and the probabilities
    rebuilt from the forward's per-row logsumexp ``lse_h`` — one
    exp-of-select pass instead of the mask/max/exp/sum/divide re-sweep
    over the [N, M] score slab. Shared between the fused-MHA backward
    kernel and the whole-layer training backward.

    Returns ``(o_full, dx, dsrc, dwq, dbq, dwk, dbk, dwv, dbv, dwm)`` as
    VALUES; callers accumulate the weight contributions into their grid
    accumulator refs. ``o_full`` (the merged pre-projection attention
    output) is also the operand of the merge-weight gradient and, for the
    whole-layer kernel, of the in-kernel message recompute."""
    dt = jnp.float32
    neg = jnp.asarray(BIG_NEG, dt)
    q_full = _dot(x, wq) + bq                                # [N, D]
    k_full = _dot(src, wk) + bk                              # [M, D]
    v_full = _dot(src, wv) + bv
    do_full = jax.lax.dot_general(                           # g wm^T [N, D]
        g, wm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    os, dqs, dks, dvs = [], [], [], []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        q, k, v = q_full[:, sl], k_full[:, sl], v_full[:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        keep = s >= thr_h[h]
        if has_mask:
            keep = keep & jnp.broadcast_to(kv, (n, m))
        # exp(BIG_NEG) == 0 exactly; kept entries have s <= lse so the
        # exponent never overflows (denom >= the max kept term)
        p = jnp.exp(jnp.where(keep, s - lse_h[h], neg))
        do = do_full[:, sl]                                  # [N, Dh]
        os.append(_dot(p, v))                                # o_h [N, Dh]
        # attention backward (thresholds frozen)
        dvs.append(jax.lax.dot_general(                      # p^T do [M, Dh]
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dp = jax.lax.dot_general(                            # do v^T [N, M]
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        dqs.append(_dot(ds, k))                              # [N, Dh]
        dks.append(jax.lax.dot_general(                      # ds^T q [M, Dh]
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o_full = jnp.concatenate(os, axis=1)                     # [N, D]
    dq_full = jnp.concatenate(dqs, axis=1)
    dk_full = jnp.concatenate(dks, axis=1)
    dv_full = jnp.concatenate(dvs, axis=1)
    # merge weight grad + projection backward, all as full-D matmuls
    dwm = jax.lax.dot_general(                               # o^T g [D, D]
        o_full, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = jax.lax.dot_general(                                # dq wq^T [N, D]
        dq_full, wq, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dsrc = jax.lax.dot_general(
        dk_full, wk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dsrc = dsrc + jax.lax.dot_general(
        dv_full, wv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwq = jax.lax.dot_general(                               # x^T dq [D, D]
        x, dq_full, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq = jnp.sum(dq_full, axis=0, keepdims=True)
    dwk = jax.lax.dot_general(
        src, dk_full, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbk = jnp.sum(dk_full, axis=0, keepdims=True)
    dwv = jax.lax.dot_general(
        src, dv_full, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbv = jnp.sum(dv_full, axis=0, keepdims=True)
    return o_full, dx, dsrc, dwq, dbq, dwk, dbk, dwv, dbv, dwm


def _mha_blocking(b, h, n, m, exact, topk, backward=False):
    if backward:
        # live [n, m] f32 temporaries per (b, h) head iteration
        budget, live, h = _BWD_BB_BUDGET, _BWD_LIVE, 1
    elif exact and topk:
        budget, live = _FWD_BUDGET_EXACT, 5
    else:
        budget, live = _FWD_BUDGET_FAST, 3
    bb = _BLOCK_B
    while bb > 1 and live * bb * h * n * m * 4 > budget:
        bb //= 2
    while b % bb != 0:
        bb //= 2
    return bb


def _rep(shape):
    """Replicated (grid-constant) VMEM block."""
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _blk(shape):
    """Leading-dim-blocked VMEM block."""
    return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                        memory_space=pltpu.VMEM)


def _mha_weights(attn_params, num_heads, dh, scale):
    wq, bq = _blocked_proj(attn_params["q"], num_heads, dh, fold_scale=scale)
    wk, bk = _blocked_proj(attn_params["k"], num_heads, dh)
    wv, bv = _blocked_proj(attn_params["v"], num_heads, dh)
    wm, bm = _blocked_merge(attn_params["merge"], num_heads, dh)
    return wq, bq, wk, bk, wv, bv, wm, bm


def _mha_fwd_call(attn_params, x, source, kv_mask, topk, num_heads, exact,
                  interpret):
    b, n, d = x.shape
    m = source.shape[1]
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    weights = _mha_weights(attn_params, num_heads, dh, scale)
    if kv_mask is None:
        maskf = jnp.ones((b, 1, m), jnp.float32)
    else:
        maskf = jnp.broadcast_to(kv_mask.astype(jnp.float32)[:, None, :],
                                 (b, 1, m))
    bb = _mha_blocking(b, num_heads, n, m, exact, topk)
    kern = functools.partial(_mha_fwd_kernel, topk=int(topk or 0),
                             num_heads=num_heads, block_b=bb,
                             has_mask=kv_mask is not None, exact=exact)
    out, thr, lse = pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, d)), _blk((bb, m, d)), _blk((bb, 1, m)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d))],
        out_specs=[_blk((bb, n, d)), _blk((bb, num_heads, n, 1)),
                   _blk((bb, num_heads, n, 1))],
        out_shape=[jax.ShapeDtypeStruct((b, n, d), x.dtype),
                   jax.ShapeDtypeStruct((b, num_heads, n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((b, num_heads, n, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(x, source, maskf, *weights)
    return out, thr, lse


def _mha_bwd_call(attn_params, x, source, kv_mask, thr, lse, g, num_heads,
                  interpret):
    b, n, d = x.shape
    m = source.shape[1]
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    weights = _mha_weights(attn_params, num_heads, dh, scale)
    if kv_mask is None:
        maskf = jnp.ones((b, 1, m), jnp.float32)
    else:
        maskf = jnp.broadcast_to(kv_mask.astype(jnp.float32)[:, None, :],
                                 (b, 1, m))
    bb = _mha_blocking(b, num_heads, n, m, False, topk=0, backward=True)
    kern = functools.partial(_mha_bwd_kernel, num_heads=num_heads,
                             block_b=bb, has_mask=kv_mask is not None)
    f32 = jnp.float32
    outs = pl.pallas_call(
        kern,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, d)), _blk((bb, m, d)), _blk((bb, 1, m)),
                  _blk((bb, num_heads, n, 1)), _blk((bb, num_heads, n, 1)),
                  _blk((bb, n, d)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d))],
        out_specs=[_blk((bb, n, d)), _blk((bb, m, d)),
                   _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                   _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d))],
        out_shape=[jax.ShapeDtypeStruct((b, n, d), x.dtype),
                   jax.ShapeDtypeStruct((b, m, d), source.dtype),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(x, source, maskf, thr, lse, g, *weights)
    dx, dsrc, dwq, dbq, dwk, dbk, dwv, dbv, dwm, dbm = outs
    pd = lambda ref: attn_params[ref]["w"].dtype
    dwq_r, dbq_r = _unblocked_proj_grad(dwq, dbq, num_heads, dh,
                                        fold_scale=scale)
    dwk_r, dbk_r = _unblocked_proj_grad(dwk, dbk, num_heads, dh)
    dwv_r, dbv_r = _unblocked_proj_grad(dwv, dbv, num_heads, dh)
    dwm_r, dbm_r = _unblocked_merge_grad(dwm, dbm, num_heads, dh)
    dparams = {
        "q": {"w": dwq_r.astype(pd("q")), "b": dbq_r.astype(pd("q"))},
        "k": {"w": dwk_r.astype(pd("k")), "b": dbk_r.astype(pd("k"))},
        "v": {"w": dwv_r.astype(pd("v")), "b": dbv_r.astype(pd("v"))},
        "merge": {"w": dwm_r.astype(pd("merge")),
                  "b": dbm_r.astype(pd("merge"))},
    }
    return dparams, dx, dsrc


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_mha(topk, num_heads, exact, attn_params, x, source, kv_mask):
    """``merge(MultiHeadedAttention(x, source))`` with projections, top-k
    attention and the head-merge in ONE Pallas kernel each way — no
    ``split_heads``/``merge_heads`` activation relayouts (those layout
    copies measured ~28 ms/step of the reference-config train step).
    Backward freezes the selection at the forward's per-row threshold
    (reference scatter-VJP semantics, ``models/mdgat.py:196-210``) and
    accumulates the weight gradients across the batch grid in-kernel.
    """
    out, _, _ = _mha_fwd_call(attn_params, x, source, kv_mask, topk,
                              num_heads, exact,
                              jax.default_backend() == "cpu")
    return out


def _fused_mha_fwd(topk, num_heads, exact, attn_params, x, source, kv_mask):
    out, thr, lse = _mha_fwd_call(attn_params, x, source, kv_mask, topk,
                                  num_heads, exact,
                                  jax.default_backend() == "cpu")
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "attn_out")
    thr = checkpoint_name(thr, "attn_thr")
    lse = checkpoint_name(lse, "attn_lse")
    return out, (attn_params, x, source, kv_mask, thr, lse)


def _fused_mha_bwd(topk, num_heads, exact, res, g):
    attn_params, x, source, kv_mask, thr, lse = res
    dparams, dx, dsrc = _mha_bwd_call(
        attn_params, x, source, kv_mask, thr, lse, g, num_heads,
        jax.default_backend() == "cpu")
    # boolean mask cotangent: explicit float0 zeros (the Sinkhorn VJP's
    # convention) rather than None, which relies on lenient custom_vjp
    # handling across JAX versions
    dmask = (None if kv_mask is None else
             np.zeros(np.shape(kv_mask), jax.dtypes.float0))
    return dparams, dx, dsrc, dmask


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


# ---------------------------------------------------------------------------
# whole-layer fused TRAINING path: fused-MHA + MLP + batch-stat BatchNorm +
# residual with a custom VJP — the training counterpart of _layer_kernel
# ---------------------------------------------------------------------------
#
# Train-mode BatchNorm needs per-channel statistics over the whole [B, N]
# extent, which no single per-batch-block program can see. The TPU grid is
# SEQUENTIAL, so the stats ride the same mechanism as the weight-gradient
# accumulators: kernel TL-F1 (fused MHA + first MLP matmul) accumulates
# masked per-channel sum/sum-of-squares across programs; a scalar-sized XLA
# epilogue turns them into mean/var and the BN affine; kernel TL-F2 applies
# normalize+ReLU+second matmul+residual. Backward mirrors it: TL-B1
# accumulates the two BN reduction vectors (sum g-hat, sum g-hat*h-hat) plus
# the cheap weight grads, TL-B2 recomputes the attention (shared
# _mha_bwd_block) and chains the MLP/BN backward with the global reduction
# constants folded in. The [N, M] probability matrices and every MLP
# intermediate stay VMEM-resident; h1 (the pre-BN activation) is the only
# new HBM tensor (written once forward, read by TL-F2/B1/B2).
#
# Variance is single-pass (E[x^2] - E[x]^2 in f32 accumulators) — a
# documented numerical divergence from the XLA path's two-pass jnp.var;
# in float32 the difference is ~1e-6 relative on BN outputs (tested).
# Reference layer semantics: models/mdgat.py:239-257 under training
# (net.train(), train.py:222).


def _tl_fwd1_kernel(x_ref, src_ref, kvmask_ref, vmask_ref,
                    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                    wm_ref, bm_ref, w1x_ref, w1m_ref, b1_ref,
                    h1_ref, t_ref, l_ref, ssum_ref, ssq_ref, *,
                    topk: int, num_heads: int, block_b: int,
                    has_mask: bool, has_vmask: bool, exact: bool):
    """Fused MHA (as ``_mha_fwd_kernel``) + message merge + the first MLP
    matmul ``h1 = x @ w1x + message @ w1m + b1`` + masked per-channel
    sum/sumsq accumulation across the sequential batch grid. Also emits
    the per-row threshold and logsumexp (the attention-rebuild residuals
    consumed by ``_tl_bwd2_kernel``)."""
    out_dt = h1_ref.dtype
    dt = jnp.float32
    neg = jnp.asarray(BIG_NEG, dt)
    n = x_ref.shape[1]
    m = src_ref.shape[1]
    dh = wq_ref.shape[1] // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        ssum_ref[...] = jnp.zeros_like(ssum_ref)
        ssq_ref[...] = jnp.zeros_like(ssq_ref)

    wq = wq_ref[...].astype(dt)
    wk = wk_ref[...].astype(dt)
    wv = wv_ref[...].astype(dt)
    wm = wm_ref[...].astype(dt)
    w1x = w1x_ref[...].astype(dt)
    w1m = w1m_ref[...].astype(dt)
    b1 = b1_ref[...].astype(dt)
    bm = bm_ref[...].astype(dt)
    rows, masks = [], []
    for b in range(block_b):
        kv_mask = kvmask_ref[b] > 0.5
        q_full = _dot(x_ref[b].astype(dt), wq) + bq_ref[...].astype(dt)
        k_full = _dot(src_ref[b].astype(dt), wk) + bk_ref[...].astype(dt)
        for h in range(num_heads):
            rows.append(jax.lax.dot_general(
                q_full[:, h * dh:(h + 1) * dh],
                k_full[:, h * dh:(h + 1) * dh],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            if has_mask:
                masks.append(jnp.broadcast_to(kv_mask, (n, m)))
    s = jnp.concatenate(rows, axis=0)
    valid = None
    if has_mask:
        valid = jnp.concatenate(masks, axis=0)
        s = jnp.where(valid, s, neg)

    e, inv, thr, lse = _stacked_prob(s, valid, topk=topk, exact=exact,
                                     has_mask=has_mask,
                                     fine_iters=_fast_iters(x_ref.dtype))
    ssum_acc = jnp.zeros((1, w1x.shape[1]), dt)
    ssq_acc = jnp.zeros((1, w1x.shape[1]), dt)
    for b in range(block_b):
        v_full = _dot(src_ref[b].astype(dt), wv) + bv_ref[...].astype(dt)
        os = []
        for h in range(num_heads):
            r0 = (b * num_heads + h) * n
            os.append(_dot(e[r0:r0 + n],
                           v_full[:, h * dh:(h + 1) * dh])
                      * inv[r0:r0 + n])                      # [N, Dh]
            t_ref[b, h] = thr[r0:r0 + n]
            l_ref[b, h] = lse[r0:r0 + n]
        o_full = jnp.concatenate(os, axis=1)                 # [N, D]
        msg = _dot(o_full, wm) + bm                          # [N, D]
        h1 = _dot(x_ref[b].astype(dt), w1x) + _dot(msg, w1m) + b1
        h1_ref[b] = h1.astype(out_dt)
        if has_vmask:
            mcol = (vmask_ref[b] > 0.5).astype(dt)           # [N, 1]
            h1m = h1 * mcol
            ssum_acc = ssum_acc + jnp.sum(h1m, axis=0, keepdims=True)
            ssq_acc = ssq_acc + jnp.sum(h1m * h1, axis=0, keepdims=True)
        else:
            ssum_acc = ssum_acc + jnp.sum(h1, axis=0, keepdims=True)
            ssq_acc = ssq_acc + jnp.sum(h1 * h1, axis=0, keepdims=True)
    ssum_ref[...] += ssum_acc
    ssq_ref[...] += ssq_acc


def _tl_fwd2_kernel(x_ref, h1_ref, a_ref, c_ref, w2_ref, b2_ref, y_ref, *,
                    block_b: int):
    """BN affine (batch-stat mean/var folded into ``a``/``c`` by the XLA
    epilogue) + ReLU + second MLP matmul + residual add."""
    dt = jnp.float32
    a = a_ref[...].astype(dt)
    c = c_ref[...].astype(dt)
    w2 = w2_ref[...].astype(dt)
    b2 = b2_ref[...].astype(dt)
    for b in range(block_b):
        u = jnp.maximum(h1_ref[b].astype(dt) * a + c, 0.0)
        y = x_ref[b].astype(dt) + _dot(u, w2) + b2
        y_ref[b] = y.astype(y_ref.dtype)


def _tl_bwd1_kernel(g_ref, h1_ref, w2_ref, vec_ref,
                    sg_ref, sgh_ref, dw2_ref, db2_ref, dsc_ref, dbi_ref, *,
                    block_b: int):
    """BN-backward reduction pass: accumulates the two global vectors
    ``Sg = sum(g-hat)`` / ``Sgh = sum(g-hat * h-hat)`` plus the row-local
    weight grads (dw2, db2, dscale, dbias) across the grid.

    The sums run over ALL rows (padded included): every row — padded or
    not — is normalized with the shared batch mean/var, so every row's
    cotangent feeds dL/dmean and dL/dvar. The validity mask enters the
    BN backward only through the per-row correction factor m_i/cnt
    (applied in ``_tl_bwd2_kernel``): padded rows influence the stats'
    cotangent but receive no centering correction themselves.
    ``vec_ref`` rows: 0=mean, 1=inv, 2=scale, 3=bias."""
    dt = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sg_ref[...] = jnp.zeros_like(sg_ref)
        sgh_ref[...] = jnp.zeros_like(sgh_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)

    mean = vec_ref[0:1]
    inv = vec_ref[1:2]
    scale = vec_ref[2:3]
    bias = vec_ref[3:4]
    w2 = w2_ref[...].astype(dt)
    for b in range(block_b):
        g = g_ref[b].astype(dt)                              # [N, D]
        h1 = h1_ref[b].astype(dt)                            # [N, 2D]
        hhat = (h1 - mean) * inv
        bn = hhat * scale + bias
        relu_m = (bn > 0.0).astype(dt)
        u = bn * relu_m                                      # forward relu out
        dh2 = jax.lax.dot_general(                           # g w2^T [N, 2D]
            g, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbn = dh2 * relu_m
        G = dbn * scale                                      # d hhat
        dw2_ref[...] += jax.lax.dot_general(                 # u^T g [2D, D]
            u, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
        dsc_ref[...] += jnp.sum(dbn * hhat, axis=0, keepdims=True)
        dbi_ref[...] += jnp.sum(dbn, axis=0, keepdims=True)
        sg_ref[...] += jnp.sum(G, axis=0, keepdims=True)
        sgh_ref[...] += jnp.sum(G * hhat, axis=0, keepdims=True)


def _tl_bwd2_kernel(x_ref, src_ref, kvmask_ref, vmask_ref, thr_ref, lse_ref,
                    g_ref, h1_ref,
                    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                    wm_ref, bm_ref, w1x_ref, w1m_ref, w2_ref, vec_ref,
                    dx_ref, dsrc_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                    dwv_ref, dbv_ref, dwm_ref, dbm_ref,
                    dw1x_ref, dw1m_ref, db1_ref, *,
                    num_heads: int, block_b: int, has_mask: bool,
                    has_vmask: bool):
    """Main whole-layer backward: recompute hhat/ReLU, fold the global BN
    reduction constants (``vec_ref`` rows 4=Sg/cnt, 5=Sgh/cnt) into dh1,
    chain into the MLP-1 backward and the shared frozen-selection MHA
    backward (``_mha_bwd_block``), and emit dx (residual + MLP + attention
    paths) / dsrc plus all accumulated weight grads."""
    dt = jnp.float32
    n = x_ref.shape[1]
    m = src_ref.shape[1]
    dh = wq_ref.shape[1] // num_heads

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dbk_ref[...] = jnp.zeros_like(dbk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dbv_ref[...] = jnp.zeros_like(dbv_ref)
        dwm_ref[...] = jnp.zeros_like(dwm_ref)
        dbm_ref[...] = jnp.zeros_like(dbm_ref)
        dw1x_ref[...] = jnp.zeros_like(dw1x_ref)
        dw1m_ref[...] = jnp.zeros_like(dw1m_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    mean = vec_ref[0:1]
    inv = vec_ref[1:2]
    scale = vec_ref[2:3]
    bias = vec_ref[3:4]
    c1 = vec_ref[4:5]                                        # Sg / cnt
    c2 = vec_ref[5:6]                                        # Sgh / cnt
    wq = wq_ref[...].astype(dt)
    wk = wk_ref[...].astype(dt)
    wv = wv_ref[...].astype(dt)
    wm = wm_ref[...].astype(dt)
    w1x = w1x_ref[...].astype(dt)
    w1m = w1m_ref[...].astype(dt)
    w2 = w2_ref[...].astype(dt)
    for b in range(block_b):
        x = x_ref[b].astype(dt)                              # [N, D]
        src = src_ref[b].astype(dt)                          # [M, D]
        g = g_ref[b].astype(dt)                              # [N, D]
        h1 = h1_ref[b].astype(dt)                            # [N, 2D]
        kv = (kvmask_ref[b] > 0.5) if has_mask else None
        thr_h = [thr_ref[b, h] for h in range(num_heads)]
        lse_h = [lse_ref[b, h] for h in range(num_heads)]

        hhat = (h1 - mean) * inv
        bn = hhat * scale + bias
        relu_m = (bn > 0.0).astype(dt)
        dh2 = jax.lax.dot_general(                           # g w2^T [N, 2D]
            g, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        G = dh2 * relu_m * scale                             # d hhat
        corr = c1 + hhat * c2
        if has_vmask:
            # mask pre-transposed to [N, 1] on host (no in-kernel
            # sublane<->lane relayout)
            corr = corr * (vmask_ref[b] > 0.5).astype(dt)
        dh1 = inv * (G - corr)                               # [N, 2D]
        dmsg = jax.lax.dot_general(                          # dh1 w1m^T [N,D]
            dh1, w1m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_mlp = jax.lax.dot_general(
            dh1, w1x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1x_ref[...] += jax.lax.dot_general(                # x^T dh1
            x, dh1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
        dbm_ref[...] += jnp.sum(dmsg, axis=0, keepdims=True)

        (o_full, dx_attn, dsrc, dwq_c, dbq_c, dwk_c, dbk_c, dwv_c, dbv_c,
         dwm_c) = _mha_bwd_block(
            x, src, kv, thr_h, lse_h, dmsg, wq, wk, wv, wm,
            bq_ref[...].astype(dt), bk_ref[...].astype(dt),
            bv_ref[...].astype(dt), num_heads, dh, n, m, has_mask)
        msg = _dot(o_full, wm) + bm_ref[...].astype(dt)      # [N, D]
        dw1m_ref[...] += jax.lax.dot_general(                # msg^T dh1
            msg, dh1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwm_ref[...] += dwm_c
        dwq_ref[...] += dwq_c
        dbq_ref[...] += dbq_c
        dwk_ref[...] += dwk_c
        dbk_ref[...] += dbk_c
        dwv_ref[...] += dwv_c
        dbv_ref[...] += dbv_c
        dx_ref[b] = (g + dx_mlp + dx_attn).astype(dx_ref.dtype)
        dsrc_ref[b] = dsrc.astype(dsrc_ref.dtype)


def _tl_mlp_weights(layer_params):
    """MLP weights in raw f32: (w1x, w1m, b1, w2, b2, bn_scale, bn_bias)."""
    f32 = jnp.float32
    l1, l2 = layer_params["mlp"][0], layer_params["mlp"][1]
    w1 = l1["lin"]["w"].astype(f32)                          # [2D, 2D]
    d = w1.shape[0] // 2
    b1 = l1["lin"]["b"].astype(f32)[None, :]
    w2 = l2["lin"]["w"].astype(f32)                          # [2D, D]
    b2 = l2["lin"]["b"].astype(f32)[None, :]
    return (w1[:d], w1[d:], b1, w2, b2,
            l1["bn"]["scale"].astype(f32), l1["bn"]["bias"].astype(f32))


def _vmaskf(mask, b, n):
    """kv-side mask as [B, 1, M] (lane-broadcast in-kernel)."""
    if mask is None:
        return jnp.ones((b, 1, n), jnp.float32)
    return jnp.broadcast_to(mask.astype(jnp.float32)[:, None, :], (b, 1, n))


def _vmaskf_col(mask, b, n):
    """x-row validity mask as [B, N, 1] — column orientation so kernels
    never transpose a vector across the sublane/lane split."""
    if mask is None:
        return jnp.ones((b, n, 1), jnp.float32)
    return mask.astype(jnp.float32)[:, :, None]


def _tl_fwd_calls(lp, x, source, kv_mask, vmask, topk, num_heads, exact,
                  interpret, axis_name=None):
    from mdgat_tpu.ops.mlp import BN_EPS

    b, n, d = x.shape
    m = source.shape[1]
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    f32 = jnp.float32
    weights = _mha_weights(lp["attn"], num_heads, dh, scale)
    w1x, w1m, b1, w2, b2, bn_scale, bn_bias = _tl_mlp_weights(lp)
    kvm = _vmaskf(kv_mask, b, m)
    vmf = _vmaskf_col(vmask, b, n)

    bb = _mha_blocking(b, num_heads, n, m, exact, topk)
    kern1 = functools.partial(
        _tl_fwd1_kernel, topk=int(topk or 0), num_heads=num_heads,
        block_b=bb, has_mask=kv_mask is not None,
        has_vmask=vmask is not None, exact=exact)
    h1, thr, lse, ssum, ssq = pl.pallas_call(
        kern1,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, d)), _blk((bb, m, d)), _blk((bb, 1, m)),
                  _blk((bb, n, 1)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                  _rep((d, 2 * d)), _rep((d, 2 * d)), _rep((1, 2 * d))],
        out_specs=[_blk((bb, n, 2 * d)), _blk((bb, num_heads, n, 1)),
                   _blk((bb, num_heads, n, 1)),
                   _rep((1, 2 * d)), _rep((1, 2 * d))],
        out_shape=[jax.ShapeDtypeStruct((b, n, 2 * d), x.dtype),
                   jax.ShapeDtypeStruct((b, num_heads, n, 1), f32),
                   jax.ShapeDtypeStruct((b, num_heads, n, 1), f32),
                   jax.ShapeDtypeStruct((1, 2 * d), f32),
                   jax.ShapeDtypeStruct((1, 2 * d), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(x, source, kvm, vmf, *weights, w1x, w1m, b1)

    # scalar-sized XLA epilogue: masked single-pass mean/var + BN affine
    # (psum'd across replicas under shard_map: GLOBAL batch statistics)
    if vmask is None:
        cnt = jnp.asarray(b * n, f32)
    else:
        cnt = jnp.sum(vmask.astype(f32))
    if axis_name is not None:
        cnt, ssum, ssq = jax.lax.psum((cnt, ssum, ssq), axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    mean = ssum[0] / cnt
    var = jnp.maximum(ssq[0] / cnt - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + jnp.asarray(BN_EPS, f32))
    a = (bn_scale * inv)[None, :]
    c = (bn_bias - mean * bn_scale * inv)[None, :]

    kern2 = functools.partial(_tl_fwd2_kernel, block_b=bb)
    y = pl.pallas_call(
        kern2,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, d)), _blk((bb, n, 2 * d)),
                  _rep((1, 2 * d)), _rep((1, 2 * d)),
                  _rep((2 * d, d)), _rep((1, d))],
        out_specs=_blk((bb, n, d)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(x, h1, a, c, w2, b2)
    return y, mean, var, cnt, thr, lse, h1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_train_layer(topk, num_heads, exact, interpret, axis_name,
                      lp, x, source, kv_mask, vmask):
    """Whole AttentionalPropagation layer under TRAINING semantics
    (batch-stat BatchNorm) as two Pallas kernels each way; returns
    ``(y, batch_mean, batch_var)`` — the mean/var feed the running-stat
    update outside (non-differentiable observation, as in torch)."""
    y, mean, var, _, _, _, _ = _tl_fwd_calls(
        lp, x, source, kv_mask, vmask, topk, num_heads, exact, interpret,
        axis_name)
    return y, mean, var


def _ftl_fwd(topk, num_heads, exact, interpret, axis_name, lp, x, source,
             kv_mask, vmask):
    y, mean, var, cnt, thr, lse, h1 = _tl_fwd_calls(
        lp, x, source, kv_mask, vmask, topk, num_heads, exact, interpret,
        axis_name)
    from jax.ad_checkpoint import checkpoint_name
    thr = checkpoint_name(thr, "attn_thr")
    lse = checkpoint_name(lse, "attn_lse")
    h1 = checkpoint_name(h1, "layer_h1")
    mean = checkpoint_name(mean, "layer_bn_mean")
    var = checkpoint_name(var, "layer_bn_var")
    res = (lp, x, source, kv_mask, vmask, thr, lse, h1, mean, var, cnt)
    return (y, mean, var), res


def _ftl_bwd(topk, num_heads, exact, interpret, axis_name, res, cts):
    from mdgat_tpu.ops.mlp import BN_EPS

    g, _g_mean, _g_var = cts                  # mean/var: zero cotangents
    lp, x, source, kv_mask, vmask, thr, lse, h1, mean, var, cnt = res
    b, n, d = x.shape
    m = source.shape[1]
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)
    f32 = jnp.float32
    weights = _mha_weights(lp["attn"], num_heads, dh, scale)
    w1x, w1m, b1, w2, b2, bn_scale, bn_bias = _tl_mlp_weights(lp)
    kvm = _vmaskf(kv_mask, b, m)
    vmf = _vmaskf_col(vmask, b, n)
    inv = jax.lax.rsqrt(var + jnp.asarray(BN_EPS, f32))
    vec4 = jnp.stack([mean, inv, bn_scale, bn_bias])         # [4, 2D]
    g = g.astype(x.dtype)

    bb = _mha_blocking(b, num_heads, n, m, False, topk=0, backward=True)
    kern1 = functools.partial(_tl_bwd1_kernel, block_b=bb)
    sg, sgh, dw2, db2, dsc, dbi = pl.pallas_call(
        kern1,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, d)), _blk((bb, n, 2 * d)),
                  _rep((2 * d, d)), _rep((4, 2 * d))],
        out_specs=[_rep((1, 2 * d)), _rep((1, 2 * d)), _rep((2 * d, d)),
                   _rep((1, d)), _rep((1, 2 * d)), _rep((1, 2 * d))],
        out_shape=[jax.ShapeDtypeStruct((1, 2 * d), f32),
                   jax.ShapeDtypeStruct((1, 2 * d), f32),
                   jax.ShapeDtypeStruct((2 * d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, 2 * d), f32),
                   jax.ShapeDtypeStruct((1, 2 * d), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(g, h1, w2, vec4)

    if axis_name is not None:
        # the BN-backward reduction vectors span ALL replicas' rows (every
        # row is normalized with the global mean/var); cnt in residuals is
        # already global
        sg, sgh = jax.lax.psum((sg, sgh), axis_name)
    vec6 = jnp.concatenate([vec4, sg / cnt, sgh / cnt])      # [6, 2D]
    kern2 = functools.partial(_tl_bwd2_kernel, num_heads=num_heads,
                              block_b=bb, has_mask=kv_mask is not None,
                              has_vmask=vmask is not None)
    outs = pl.pallas_call(
        kern2,
        grid=(b // bb,),
        in_specs=[_blk((bb, n, d)), _blk((bb, m, d)), _blk((bb, 1, m)),
                  _blk((bb, n, 1)), _blk((bb, num_heads, n, 1)),
                  _blk((bb, num_heads, n, 1)),
                  _blk((bb, n, d)), _blk((bb, n, 2 * d)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                  _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                  _rep((d, 2 * d)), _rep((d, 2 * d)), _rep((2 * d, d)),
                  _rep((6, 2 * d))],
        out_specs=[_blk((bb, n, d)), _blk((bb, m, d)),
                   _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                   _rep((d, d)), _rep((1, d)), _rep((d, d)), _rep((1, d)),
                   _rep((d, 2 * d)), _rep((d, 2 * d)), _rep((1, 2 * d))],
        out_shape=[jax.ShapeDtypeStruct((b, n, d), x.dtype),
                   jax.ShapeDtypeStruct((b, m, d), source.dtype),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, 2 * d), f32),
                   jax.ShapeDtypeStruct((d, 2 * d), f32),
                   jax.ShapeDtypeStruct((1, 2 * d), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=56 * 1024 * 1024),
        interpret=interpret,
    )(x, source, kvm, vmf, thr, lse, g, h1, *weights, w1x, w1m, w2, vec6)
    (dx, dsrc, dwq, dbq, dwk, dbk, dwv, dbv, dwm, dbm,
     dw1x, dw1m, db1) = outs

    pd = lambda ref: lp["attn"][ref]["w"].dtype
    dwq_r, dbq_r = _unblocked_proj_grad(dwq, dbq, num_heads, dh,
                                        fold_scale=scale)
    dwk_r, dbk_r = _unblocked_proj_grad(dwk, dbk, num_heads, dh)
    dwv_r, dbv_r = _unblocked_proj_grad(dwv, dbv, num_heads, dh)
    dwm_r, dbm_r = _unblocked_merge_grad(dwm, dbm, num_heads, dh)
    l1p = lp["mlp"][0]["lin"]["w"].dtype
    l2p = lp["mlp"][1]["lin"]["w"].dtype
    bnp = lp["mlp"][0]["bn"]["scale"].dtype
    dlp = {
        "attn": {
            "q": {"w": dwq_r.astype(pd("q")), "b": dbq_r.astype(pd("q"))},
            "k": {"w": dwk_r.astype(pd("k")), "b": dbk_r.astype(pd("k"))},
            "v": {"w": dwv_r.astype(pd("v")), "b": dbv_r.astype(pd("v"))},
            "merge": {"w": dwm_r.astype(pd("merge")),
                      "b": dbm_r.astype(pd("merge"))},
        },
        "mlp": [
            {"lin": {"w": jnp.concatenate([dw1x, dw1m]).astype(l1p),
                     "b": db1[0].astype(l1p)},
             "bn": {"scale": dsc[0].astype(bnp),
                    "bias": dbi[0].astype(bnp)}},
            {"lin": {"w": dw2.astype(l2p), "b": db2[0].astype(l2p)}},
        ],
    }
    dkv = (None if kv_mask is None else
           np.zeros(np.shape(kv_mask), jax.dtypes.float0))
    dvm = (None if vmask is None else
           np.zeros(np.shape(vmask), jax.dtypes.float0))
    return dlp, dx, dsrc, dkv, dvm


fused_train_layer.defvjp(_ftl_fwd, _ftl_bwd)


def fused_train_layer_fits(num_heads: int, d: int, n: int, m: int) -> bool:
    """Whether the train-mode fused layer kernel applies to these shapes.

    Size gate (measured, v5e): at the reference config (N=M=512,
    backward bb=2) the fused layer wins ~2% end-to-end (62.1 -> 60.8
    ms/step); at the 1024-kpt stretch config (bb=1) round 3 measured it
    ~5% SLOWER but the round-4 re-probe (post lse-residual backward +
    shape-gated selection) has it ~1.5% FASTER (25.3 vs 25.7 ms/step,
    both interleaved reps) — see the _TL_BUDGET gate comment.
    Callers that apply the kernel to several tensors (gnn layer: both
    clouds) must check every shape pair BEFORE committing to the fused
    path — ``fused_train_layer_apply`` returns None exactly when this
    predicate is False."""
    return d % num_heads == 0 and 5 * n * m * 4 <= _TL_BUDGET


def fused_train_layer_apply(layer_params, layer_state, x, source,
                            topk: Optional[int], num_heads: int,
                            valid_mask=None, kv_mask=None,
                            exact: bool = False, interpret: bool = False,
                            axis_name=None):
    """Training-mode fused layer entry: runs the custom-VJP kernel pair
    and performs the running-stat update (the ``mlp_apply`` train-mode
    formula, ``ops/mlp.py:100-119``). Returns ``(y, new_layer_state)`` or
    ``None`` when the shape doesn't block evenly (callers unfuse)."""
    from mdgat_tpu.ops.mlp import BN_MOMENTUM

    b, n, d = x.shape
    m = source.shape[1]
    if not fused_train_layer_fits(num_heads, d, n, m):
        return None
    y, mean, var = fused_train_layer(topk, num_heads, exact, interpret,
                                     axis_name, layer_params, x, source,
                                     kv_mask, valid_mask)
    st1 = layer_state["mlp"][0]
    if valid_mask is None:
        cnt = jnp.asarray(float(b * n), jnp.float32)
    else:
        cnt = jnp.sum(valid_mask.astype(jnp.float32))
    if axis_name is not None:
        cnt = jax.lax.psum(cnt, axis_name)
    cnt = jnp.maximum(cnt, 1.0)
    unbiased = var * (cnt / jnp.maximum(cnt - 1.0, 1.0))
    mom = BN_MOMENTUM
    new_st1 = {
        "mean": ((1 - mom) * st1["mean"]
                 + mom * mean.astype(st1["mean"].dtype)),
        "var": ((1 - mom) * st1["var"]
                + mom * unbiased.astype(st1["var"].dtype)),
    }
    return y, {"mlp": [new_st1, layer_state["mlp"][1]]}
