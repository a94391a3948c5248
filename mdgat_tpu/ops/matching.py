"""Match decision rules — converting OT scores into match indices.

Two rules, selected by ``loss_method`` exactly as in the reference forward
(``models/mdgat.py:442-483``):

* ``'superglue'``: argmax over the dense block only, thresholded on
  ``exp(score) > match_threshold`` (the SuperGlue paper rule, N3).
* gap/triplet (default): argmax *including the dustbin*; a keypoint is
  unmatched iff its argmax is the dustbin (N4). No threshold.

Operates on the decomposed :class:`~mdgat_tpu.ops.transport.OTScores`, so
the dustbin comparison is a vector compare instead of an argmax over a
(M+1)-wide matrix. Padded keypoints (masks False) always yield -1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from mdgat_tpu.ops.transport import OTScores, _big_neg


class MatchResult(NamedTuple):
    matches0: jnp.ndarray          # [B, N] int32, -1 = unmatched
    matches1: jnp.ndarray          # [B, M] int32
    matching_scores0: jnp.ndarray  # [B, N]
    matching_scores1: jnp.ndarray  # [B, M]


def _take(x, idx):
    return jnp.take_along_axis(x, idx, axis=1)


def match_decision(ot: OTScores, loss_method: str, match_threshold: float,
                   mutual_check: bool,
                   row_mask: Optional[jnp.ndarray] = None,
                   col_mask: Optional[jnp.ndarray] = None,
                   aux=None) -> MatchResult:
    """``aux`` (an ``ops.pallas.OTDecisionAux``) supplies the row/col
    max/argmax reductions pre-computed by the fused Sinkhorn kernel
    epilogue, skipping every [B,N,M] pass here. Outputs are identical to
    the dense path: the kernel's block is masked before transport, so
    masked entries sit below every valid score in its reductions, and
    every masked-row/col discrepancy (sentinel -1e30 vs sentinel+u+v) is
    erased by the final ``rm``/``cm`` forcing and ``exp(-1e30) = 0``
    (pinned by tests/test_pallas.py aux-parity)."""
    dense, bin_row, bin_col = ot.dense, ot.bin_row, ot.bin_col
    b, n, m = dense.shape
    dt = dense.dtype
    neg = _big_neg(dt)
    if row_mask is not None or col_mask is not None:
        rm = row_mask if row_mask is not None else jnp.ones((b, n), bool)
        cm = col_mask if col_mask is not None else jnp.ones((b, m), bool)
        if aux is None:
            dense = jnp.where(rm[:, :, None] & cm[:, None, :], dense, neg)
        bin_col = jnp.where(rm, bin_col, neg)
        bin_row = jnp.where(cm, bin_row, neg)
    else:
        rm = jnp.ones((b, n), bool)
        cm = jnp.ones((b, m), bool)

    if aux is not None:
        max0v, idx0 = aux.max0.astype(dt), aux.idx0
        max1v, idx1 = aux.max1.astype(dt), aux.idx1
    else:
        max0v = jnp.max(dense, axis=2)      # best dense score per row
        idx0 = jnp.argmax(dense, axis=2).astype(jnp.int32)
        max1v = jnp.max(dense, axis=1)      # best dense score per col
        idx1 = jnp.argmax(dense, axis=1).astype(jnp.int32)
    arange_n = jnp.arange(n, dtype=jnp.int32)[None, :]
    arange_m = jnp.arange(m, dtype=jnp.int32)[None, :]
    zero = jnp.asarray(0, dt)

    if loss_method == "superglue":
        # N3: dense-only argmax + exp threshold (models/mdgat.py:442-458)
        if mutual_check:
            mutual0 = arange_n == _take(idx1, idx0)
            mutual1 = arange_m == _take(idx0, idx1)
            mscores0 = jnp.where(mutual0, jnp.exp(max0v), zero)
            mscores1 = jnp.where(mutual1, _take(mscores0, idx1), zero)
            valid0 = mutual0 & (mscores0 > match_threshold)
            valid1 = mutual1 & _take(valid0, idx1)
        else:
            valid0 = jnp.exp(max0v) > match_threshold
            valid1 = jnp.exp(max1v) > match_threshold
            mscores0 = jnp.where(valid0, jnp.exp(max0v), zero)
            mscores1 = jnp.where(valid1, jnp.exp(max1v), zero)
    else:
        # N4: dustbin-aware argmax (models/mdgat.py:459-483).
        # argmax over [dense | bin] picks the dense entry on ties (torch.max
        # returns the first maximal index), hence >=.
        valid0 = max0v >= bin_col
        valid1 = max1v >= bin_row
        full_max0 = jnp.maximum(max0v, bin_col)
        full_max1 = jnp.maximum(max1v, bin_row)
        if mutual_check:
            mutual0 = valid0 & (arange_n == _take(idx1, idx0))
            mutual1 = valid1 & (arange_m == _take(idx0, idx1))
            mscores0 = jnp.where(mutual0, jnp.exp(full_max0), zero)
            mscores1 = jnp.where(mutual1, jnp.exp(full_max1), zero)
        else:
            mscores0 = jnp.where(valid0, jnp.exp(full_max0), zero)
            mscores1 = jnp.where(valid1, jnp.exp(full_max1), zero)
        # reference quirk: if no valid match in the whole batch, zero scores
        any_valid = jnp.any(valid0)
        mscores0 = jnp.where(any_valid, mscores0, zero)
        mscores1 = jnp.where(any_valid, mscores1, zero)

    valid0 = valid0 & rm
    valid1 = valid1 & cm
    neg1 = jnp.asarray(-1, jnp.int32)
    matches0 = jnp.where(valid0, idx0, neg1)
    matches1 = jnp.where(valid1, idx1, neg1)
    mscores0 = jnp.where(rm, mscores0, zero)
    mscores1 = jnp.where(cm, mscores1, zero)
    return MatchResult(matches0, matches1, mscores0, mscores1)
