"""Matching losses: gap loss (paper contribution), triplet, SuperGlue NLL.

Reference: ``models/mdgat.py:486-594``. All three are reimplemented as pure
functions of (decomposed OT scores, ground-truth matches, validity masks) —
the reference mutates ``gt_matches`` in-place (-1 -> m / n,
``models/mdgat.py:519-520,554-555``) which its own ``test.py`` has to undo
(``test.py:236-238``); here the remap is internal.

Numerics note: the reference computes ``-log(exp(score))`` round-trips
(``models/mdgat.py:541-542,569-570``) which are the identity on the log-
domain scores (modulo exp-underflow for scores < log(tiny), where the
clamp-to-0 outcome coincides anyway); we use the scores directly.

All losses return a per-example vector [B] (the reference's gap loss
already did; the train loop means over it, ``train.py:245``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mdgat_tpu.ops.transport import OTScores, _big_neg


def _masks(b, n, m, row_mask, col_mask):
    rm = row_mask if row_mask is not None else jnp.ones((b, n), bool)
    cm = col_mask if col_mask is not None else jnp.ones((b, m), bool)
    return rm, cm


def _mean_over(x, mask):
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1)


def gap_loss(ot: OTScores, gt0, gt1, gamma: float,
             row_mask=None, col_mask=None):
    """Gap loss (``models/mdgat.py:547-594``), the training default.

    For each anchor with GT index p (dustbin if unmatched), accumulates
    ``relu(s_neg - s_pos + gamma)`` over *all* other candidates (including
    the dustbin), then ``2*log(sum + 1)``, averaged over anchors, in both
    matching directions, averaged. Returns [B].
    """
    dense, bin_row, bin_col = ot.dense, ot.bin_row, ot.bin_col
    b, n, m = dense.shape
    dt = dense.dtype
    rm, cm = _masks(b, n, m, row_mask, col_mask)
    neg = _big_neg(dt)
    g = jnp.asarray(gamma, dt)

    # The dustbin column/row stays DECOMPOSED (no [B, N, M+1] concat: the
    # concat materialized a 513-wide mis-tiled copy of the slab; the
    # dustbin candidate is a separate [B, N] term). Same math as the
    # reference's concatenated slab (``models/mdgat.py:557-594``).

    # ---- direction 0: anchors = rows, candidates = cols + dustbin col ----
    dense0 = jnp.where(cm[:, None, :], dense, neg)
    pos_idx0 = jnp.where(gt0 < 0, m, gt0).astype(jnp.int32)        # [B,N]
    cand = jnp.arange(m, dtype=jnp.int32)[None, None, :]
    is_pos0 = cand == pos_idx0[:, :, None]                         # [B,N,M]
    pos_main0 = jnp.sum(jnp.where(is_pos0, dense0, 0), axis=2)     # [B,N]
    at_bin0 = pos_idx0 == m
    pos0 = jnp.where(at_bin0, bin_col, pos_main0)[:, :, None]
    contrib0 = jax.nn.relu(dense0 - pos0 + g) * (~is_pos0).astype(dt)
    bin_term0 = jax.nn.relu(bin_col - pos0[:, :, 0] + g) \
        * (~at_bin0).astype(dt)                                    # [B,N]
    per_anchor0 = 2.0 * jnp.log1p(jnp.sum(contrib0, axis=2) + bin_term0)
    loss0 = _mean_over(per_anchor0, rm)

    # ---- direction 1: anchors = cols, candidates = rows + dustbin row ----
    dense1 = jnp.where(rm[:, :, None], dense, neg)
    pos_idx1 = jnp.where(gt1 < 0, n, gt1).astype(jnp.int32)        # [B,M]
    cand1 = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    is_pos1 = cand1 == pos_idx1[:, None, :]                        # [B,N,M]
    pos_main1 = jnp.sum(jnp.where(is_pos1, dense1, 0), axis=1)     # [B,M]
    at_bin1 = pos_idx1 == n
    pos1 = jnp.where(at_bin1, bin_row, pos_main1)[:, None, :]
    contrib1 = jax.nn.relu(dense1 - pos1 + g) * (~is_pos1).astype(dt)
    bin_term1 = jax.nn.relu(bin_row - pos1[:, 0, :] + g) \
        * (~at_bin1).astype(dt)                                    # [B,M]
    per_anchor1 = 2.0 * jnp.log1p(jnp.sum(contrib1, axis=1) + bin_term1)
    loss1 = _mean_over(per_anchor1, cm)

    return (loss0 + loss1) / 2.0


def triplet_loss(ot: OTScores, gt0, gt1, gamma: float,
                 row_mask=None, col_mask=None):
    """Hard-negative triplet loss (``models/mdgat.py:512-546``).

    The hard negative per anchor is the best-scoring candidate, or the
    second-best when the best IS the ground truth. Returns [B] (the
    reference returns the scalar mean over all 2N anchors; identical after
    the caller's batch mean for fixed N).
    """
    dense, bin_row, bin_col = ot.dense, ot.bin_row, ot.bin_col
    b, n, m = dense.shape
    dt = dense.dtype
    rm, cm = _masks(b, n, m, row_mask, col_mask)
    neg = _big_neg(dt)
    g = jnp.asarray(gamma, dt)

    def one_direction(slab, pos_idx, anchor_mask):
        # slab: [B, A, C]; pos_idx: [B, A]
        top2_v, top2_i = jax.lax.top_k(slab, 2)
        best_is_gt = top2_i[..., 0] == pos_idx
        neg_score = jnp.where(best_is_gt, top2_v[..., 1], top2_v[..., 0])
        pos_score = jnp.take_along_axis(slab, pos_idx[:, :, None],
                                        axis=2)[..., 0]
        per_anchor = jax.nn.relu(neg_score - pos_score + g)
        return jnp.sum(per_anchor * anchor_mask.astype(dt), axis=1), \
            jnp.sum(anchor_mask.astype(dt), axis=1)

    slab0 = jnp.concatenate([
        jnp.where(cm[:, None, :], dense, neg), bin_col[:, :, None]], axis=2)
    pos_idx0 = jnp.where(gt0 < 0, m, gt0).astype(jnp.int32)
    s0, c0 = one_direction(slab0, pos_idx0, rm)

    slab1t = jnp.concatenate([
        jnp.where(rm[:, :, None], dense, neg), bin_row[:, None, :]],
        axis=1).transpose(0, 2, 1)                                  # [B,M,N+1]
    pos_idx1 = jnp.where(gt1 < 0, n, gt1).astype(jnp.int32)
    s1, c1 = one_direction(slab1t, pos_idx1, cm)

    return (s0 + s1) / jnp.maximum(c0 + c1, 1)


def superglue_nll_loss(ot: OTScores, gt0, gt1,
                       row_mask=None, col_mask=None):
    """SuperGlue negative log-likelihood (``models/mdgat.py:487-511``).

    ``loss_tp`` gathers every row's GT-column score (unmatched rows hit the
    dustbin column via the reference's -1 index wraparound); ``loss_tn``
    adds the dustbin-row score of every unmatched column. Normalized by
    (#unmatched cols + M) per example. Returns [B].
    """
    dense, bin_row, bin_col = ot.dense, ot.bin_row, ot.bin_col
    b, n, m = dense.shape
    dt = dense.dtype
    rm, cm = _masks(b, n, m, row_mask, col_mask)

    slab0 = jnp.concatenate([dense, bin_col[:, :, None]], axis=2)
    pos_idx0 = jnp.where(gt0 < 0, m, gt0).astype(jnp.int32)
    tp = jnp.take_along_axis(slab0, pos_idx0[:, :, None], axis=2)[..., 0]
    loss_tp = jnp.sum(tp * rm.astype(dt), axis=1)                  # [B]

    unmatched = (gt1 < 0) & cm
    loss_tn = jnp.sum(bin_row * unmatched.astype(dt), axis=1)      # [B]
    xx = jnp.sum(unmatched, axis=1).astype(dt)
    m_true = jnp.sum(cm, axis=1).astype(dt)
    return (-loss_tp - loss_tn) / (xx + m_true)
