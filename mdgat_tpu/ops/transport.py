"""Log-domain Sinkhorn optimal transport with dustbins — TPU-native.

Reference: ``models/mdgat.py:279-308``. The reference concatenates the
learned dustbin score onto the score matrix to form an ``(N+1, M+1)``
coupling and iterates log-Sinkhorn on it. ``N+1 = 513`` tiles terribly on
TPU (lane dim wants multiples of 128), so this implementation keeps the
coupling *decomposed*: a dense ``[N, M]`` block plus bin row/column vectors
and a corner scalar. All row/column logsumexps become well-tiled reductions
over the dense block plus a scalar merge with the bin entry. The math is
identical to the reference's concatenated form.

The decomposition also makes fixed-shape padding exact: padded rows/columns
carry ``-inf``-like scores and zero marginal mass, so they drop out of every
logsumexp — the transport on the valid sub-block equals the unpadded result
(needed because reference ``test.py`` runs variable keypoint counts,
``test.py:98-100``, which TPUs cannot).

Iteration (per batch element), matching ``log_sinkhorn_iterations``:
    u = log_mu - LSE_cols(Z + v)
    v = log_nu - LSE_rows(Z + u)
returning ``Z + u + v - norm`` with ``norm = -log(N_valid + M_valid)``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class OTScores(NamedTuple):
    """Decomposed (N+1)x(M+1) transport scores."""
    dense: jnp.ndarray    # [B, N, M]
    bin_row: jnp.ndarray  # [B, M]  (dustbin row: scores[:, -1, :-1])
    bin_col: jnp.ndarray  # [B, N]  (dustbin col: scores[:, :-1, -1])
    corner: jnp.ndarray   # [B]     (scores[:, -1, -1])


def _big_neg(dtype):
    """Large-negative sentinel standing in for -inf.

    -1e30 is exactly representable in float32 and float64, exp()s to 0,
    and sums of several stay finite — avoiding the NaN traps of true -inf
    in logsumexp chains (and a JAX canonicalization quirk where Python
    floats beyond float32 range become -inf even under x64).
    """
    return jnp.asarray(-1e30, dtype)


def _lse(x, axis):
    """Logsumexp safe for rows filled with the big-negative sentinel."""
    m = jnp.max(x, axis=axis, keepdims=True)
    out = jnp.log(jnp.sum(jnp.exp(x - m), axis=axis)) + jnp.squeeze(m, axis)
    return out


def log_sinkhorn(dense, alpha, log_mu, log_mu_bin, log_nu, log_nu_bin,
                 iters: int):
    """Decomposed log-Sinkhorn. All args batched ([B, ...]).

    dense: [B,N,M] masked scores; alpha: scalar or [B]; log_mu: [B,N];
    log_mu_bin/log_nu_bin: [B]; log_nu: [B,M].
    Returns (u, u_bin, v, v_bin).
    """
    b, n, m = dense.shape
    dt = dense.dtype
    alpha = jnp.broadcast_to(jnp.asarray(alpha, dt), (b,))

    def body(carry, _):
        u, u_bin, v, v_bin = carry
        # u update: rows of [Z | bin_col] + v
        row_main = _lse(dense + v[:, None, :], axis=2)             # [B,N]
        row_bin = alpha[:, None] + v_bin[:, None]                  # [B,N] bcast
        row_lse = jnp.logaddexp(row_main, jnp.broadcast_to(row_bin, (b, n)))
        u = log_mu - row_lse
        # bin-row u: LSE over (alpha + v_j, alpha + v_bin)
        ubr_main = _lse(alpha[:, None] + v, axis=1)                # [B]
        u_bin = log_mu_bin - jnp.logaddexp(ubr_main, alpha + v_bin)
        # v update: cols of [Z ; bin_row] + u
        col_main = _lse(dense + u[:, :, None], axis=1)             # [B,M]
        col_bin = alpha[:, None] + u_bin[:, None]
        col_lse = jnp.logaddexp(col_main, jnp.broadcast_to(col_bin, (b, m)))
        v = log_nu - col_lse
        vbr_main = _lse(alpha[:, None] + u, axis=1)
        v_bin = log_nu_bin - jnp.logaddexp(vbr_main, alpha + u_bin)
        return (u, u_bin, v, v_bin), None

    # Padded rows/cols must carry zero mass from iteration 0: the bin-row/
    # bin-col logsumexps see `alpha + v_j` for every column, so a padded
    # column with v=0 would contribute spuriously on the first iteration.
    # Initializing the padded potentials at the -inf sentinel (derived from
    # the -inf marginals) makes every iteration exactly equal the unpadded
    # recurrence; valid entries start at 0 like the reference.
    neg = _big_neg(dt)
    u0 = jnp.where(log_mu > 0.5 * neg, 0.0, neg).astype(dt)
    v0 = jnp.where(log_nu > 0.5 * neg, 0.0, neg).astype(dt)
    init = (u0, jnp.zeros((b,), dt), v0, jnp.zeros((b,), dt))
    (u, u_bin, v, v_bin), _ = jax.lax.scan(body, init, None, length=iters)
    return u, u_bin, v, v_bin


def log_optimal_transport(scores, alpha, iters: int,
                          row_mask: Optional[jnp.ndarray] = None,
                          col_mask: Optional[jnp.ndarray] = None) -> OTScores:
    """Differentiable OT in log-space (``models/mdgat.py:288-308``).

    scores: [B, N, M]; alpha: learned dustbin scalar; masks [B,N]/[B,M] mark
    valid (non-padded) keypoints. Marginals use the *valid* counts, exactly
    reproducing the reference's ``log_mu``/``log_nu`` built from true m, n.
    """
    b, n, m = scores.shape
    dt = scores.dtype
    neg = _big_neg(dt)

    if row_mask is None:
        row_mask = jnp.ones((b, n), bool)
    if col_mask is None:
        col_mask = jnp.ones((b, m), bool)

    ns = jnp.sum(row_mask, axis=1).astype(dt)                      # true N
    ms = jnp.sum(col_mask, axis=1).astype(dt)                      # true M
    norm = -jnp.log(ns + ms)                                       # [B]

    dense = jnp.where(row_mask[:, :, None] & col_mask[:, None, :], scores, neg)
    log_mu = jnp.where(row_mask, norm[:, None], neg)               # [B,N]
    log_nu = jnp.where(col_mask, norm[:, None], neg)               # [B,M]
    log_mu_bin = jnp.log(ms) + norm                                # [B]
    log_nu_bin = jnp.log(ns) + norm

    u, u_bin, v, v_bin = log_sinkhorn(
        dense, alpha, log_mu, log_mu_bin, log_nu, log_nu_bin, iters)

    a = jnp.broadcast_to(jnp.asarray(alpha, dt), (b,))
    out_dense = dense + u[:, :, None] + v[:, None, :] - norm[:, None, None]
    out_bin_row = a[:, None] + u_bin[:, None] + v - norm[:, None]
    out_bin_col = a[:, None] + u + v_bin[:, None] - norm[:, None]
    out_corner = a + u_bin + v_bin - norm
    return OTScores(out_dense, out_bin_row, out_bin_col, out_corner)


def assemble_full_scores(ot: OTScores) -> jnp.ndarray:
    """Materialize the reference's [B, N+1, M+1] score matrix."""
    top = jnp.concatenate([ot.dense, ot.bin_col[:, :, None]], axis=2)
    bottom = jnp.concatenate([ot.bin_row, ot.corner[:, None]], axis=1)
    return jnp.concatenate([top, bottom[:, None, :]], axis=1)
