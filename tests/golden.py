"""Independent NumPy golden implementations of the reference semantics.

These are straight-line NumPy ports of the *math* (not the code) described
in SURVEY.md §2.2/§2.3, used to pin down the JAX ops. Everything is float64.
"""

import numpy as np


def np_attention(q, k, v):
    """Dense attention; q,k,v [B,H,N,D]. Returns (out, prob)."""
    d = q.shape[-1]
    s = np.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(d)
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bhnm,bhmd->bhnd", p, v), p


def np_topk_attention(q, k, v, kk):
    """Reference dynamic_attention semantics: softmax over exactly the
    top-k scores per row, scattered into a dense prob matrix."""
    d = q.shape[-1]
    s = np.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(d)
    B, H, N, M = s.shape
    prob = np.zeros_like(s)
    for b in range(B):
        for h in range(H):
            for n in range(N):
                row = s[b, h, n]
                idx = np.argsort(-row, kind="stable")[:kk]
                e = np.exp(row[idx] - row[idx].max())
                prob[b, h, n, idx] = e / e.sum()
    return np.einsum("bhnm,bhmd->bhnd", prob, v), prob


def np_log_optimal_transport(scores, alpha, iters):
    """Reference log_optimal_transport (models/mdgat.py:279-308 math)."""
    b, m, n = scores.shape
    ms, ns = float(m), float(n)
    couplings = np.zeros((b, m + 1, n + 1))
    couplings[:, :m, :n] = scores
    couplings[:, :m, n] = alpha
    couplings[:, m, :n] = alpha
    couplings[:, m, n] = alpha
    norm = -np.log(ms + ns)
    log_mu = np.concatenate([np.full(m, norm), [np.log(ns) + norm]])
    log_nu = np.concatenate([np.full(n, norm), [np.log(ms) + norm]])
    log_mu = np.broadcast_to(log_mu, (b, m + 1)).copy()
    log_nu = np.broadcast_to(log_nu, (b, n + 1)).copy()
    u = np.zeros_like(log_mu)
    v = np.zeros_like(log_nu)

    def lse(x, axis):
        mx = x.max(axis=axis, keepdims=True)
        return (np.log(np.exp(x - mx).sum(axis=axis)) + mx.squeeze(axis))

    for _ in range(iters):
        u = log_mu - lse(couplings + v[:, None, :], axis=2)
        v = log_nu - lse(couplings + u[:, :, None], axis=1)
    return couplings + u[:, :, None] + v[:, None, :] - norm


def np_gap_loss(scores_full, gt0, gt1, gamma):
    """Gap loss from the full [B,N+1,M+1] scores; returns [B]."""
    b, np1, mp1 = scores_full.shape
    n, m = np1 - 1, mp1 - 1
    gt0 = gt0.copy()
    gt1 = gt1.copy()
    gt0[gt0 == -1] = m
    gt1[gt1 == -1] = n
    out = np.zeros(b)
    for bi in range(b):
        slab = scores_full[bi, :n, :]                 # [n, m+1]
        acc = np.zeros(n)
        for i in range(n):
            pos = slab[i, gt0[bi, i]]
            negs = np.delete(slab[i], gt0[bi, i])
            acc[i] = 2 * np.log(np.clip(negs - pos + gamma, 0, None).sum() + 1)
        l0 = acc.mean()
        slab = scores_full[bi, :, :m]                 # [n+1, m]
        acc = np.zeros(m)
        for j in range(m):
            pos = slab[gt1[bi, j], j]
            negs = np.delete(slab[:, j], gt1[bi, j])
            acc[j] = 2 * np.log(np.clip(negs - pos + gamma, 0, None).sum() + 1)
        l1 = acc.mean()
        out[bi] = (l0 + l1) / 2
    return out


def np_triplet_loss(scores_full, gt0, gt1, gamma):
    """Triplet loss; returns [B] per-example means over the 2N anchors."""
    b, np1, mp1 = scores_full.shape
    n, m = np1 - 1, mp1 - 1
    gt0 = gt0.copy()
    gt1 = gt1.copy()
    gt0[gt0 == -1] = m
    gt1[gt1 == -1] = n
    out = np.zeros(b)
    for bi in range(b):
        vals = []
        slab = scores_full[bi, :n, :]
        for i in range(n):
            order = np.argsort(-slab[i], kind="stable")
            neg = slab[i, order[1]] if order[0] == gt0[bi, i] else slab[i, order[0]]
            pos = slab[i, gt0[bi, i]]
            vals.append(max(neg - pos + gamma, 0.0))
        slab = scores_full[bi, :, :m]
        for j in range(m):
            col = slab[:, j]
            order = np.argsort(-col, kind="stable")
            neg = col[order[1]] if order[0] == gt1[bi, j] else col[order[0]]
            pos = col[gt1[bi, j], ]
            vals.append(max(neg - pos + gamma, 0.0))
        out[bi] = np.mean(vals)
    return out


def np_superglue_nll(scores_full, gt0, gt1):
    b, np1, mp1 = scores_full.shape
    n, m = np1 - 1, mp1 - 1
    out = np.zeros(b)
    for bi in range(b):
        tp = sum(scores_full[bi, i, gt0[bi, i]] for i in range(n))
        unm = [j for j in range(m) if gt1[bi, j] == -1]
        tn = sum(scores_full[bi, n, j] for j in unm)
        out[bi] = (-tp - tn) / (len(unm) + m)
    return out


def np_gt_correspondences(kp0w, kp1w, tau, mutual=False):
    """load_data.py:257-285 semantics."""
    from scipy.spatial.distance import cdist
    dists = cdist(kp0w, kp1w)
    min1 = np.argmin(dists, axis=0)
    min2 = np.argmin(dists, axis=1)
    min1v = np.min(dists, axis=1)
    min1f = min2[min1v < tau]
    rep = len(min1f)
    match1 = -1 * np.ones(len(kp0w), dtype=np.int16)
    match2 = -1 * np.ones(len(kp1w), dtype=np.int16)
    if mutual:
        xx = np.where(min2[min1] == np.arange(min1.shape[0]))[0]
        matches = np.intersect1d(min1f, xx)
        match1[min1[matches]] = matches
        match2[matches] = min1[matches]
    else:
        match1[min1v < tau] = min1f
        min2v = np.min(dists, axis=0)
        min2f = min1[min2v < tau]
        match2[min2v < tau] = min2f
    return match1, match2, rep


def np_kabsch(P, Q):
    """solve_icp (utils/utils_test.py:73-110): fit T with T@P ~= Q."""
    up = P.mean(axis=0)
    uq = Q.mean(axis=0)
    U, s, V = np.linalg.svd((Q - uq).T @ (P - up))
    R = U @ V
    t = uq - R @ up
    T = np.zeros((4, 4))
    T[:3, :3] = R
    T[:3, 3] = t
    T[3, 3] = 1.0
    return T
