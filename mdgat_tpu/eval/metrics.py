"""Evaluation metric protocols of the reference test scripts.

Two protocols, reproduced quantity-for-quantity:

* ``test.py`` (matching + pose eval, reference ``test.py:182-342``):
  per-pair precision/accuracy/recall/repeatability, fp/tp rates, SVD pose
  fit with inlier count, fail/ban bookkeeping.
* ``test_registration_metric.py`` (FCGF/D3Feat-style registration recall,
  reference ``test_registration_metric.py:184-286``): vectorized TP/FP/
  TN/FN, RTE/RRE with thresholded accumulation (RTE<2m, RRE<5 deg),
  RR, F1 of run averages.

All functions take host numpy arrays for one pair (the reference
post-processes per pair on host too) and return plain dicts.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from mdgat_tpu.ops.geometry import (
    inlier_count, kabsch, registration_errors, transform_points,
)


class AverageMeter:
    """Running mean/variance accumulator (``utils/utils_test.py:6-25``).

    ``record=True`` additionally keeps the (val, n) update history so a
    multi-host run can merge by REPLAYING the per-process histories in
    process order — bit-identical to the single-process sequential sum
    (adding per-process partial sums would reassociate the f64 additions
    and can differ in the last ulp)."""

    def __init__(self, record: bool = False):
        self.record = record
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0
        self.history = []

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val ** 2 * n
        self.var = self.sq_sum / self.count - self.avg ** 2
        if self.record:
            self.history.append((float(val), float(n)))

    def history_vector(self) -> np.ndarray:
        """Flat f64 [val0, n0, val1, n1, ...] (requires ``record=True``
        to be non-trivially populated)."""
        return np.asarray(self.history, np.float64).reshape(-1)

    @classmethod
    def from_histories(cls, vecs) -> "AverageMeter":
        """Replay history vectors in the given order — the exact update
        sequence a single process would have applied."""
        m = cls()
        for vec in vecs:
            for val, n in np.asarray(vec, np.float64).reshape(-1, 2):
                m.update(float(val), int(n))
        return m


def pack_meter_records(head, meters: Dict[str, "AverageMeter"],
                       keys) -> np.ndarray:
    """Self-describing flat f64 encoding of ``head`` scalars plus the
    update histories of ``meters[k] for k in keys``:
    ``[len(head), head..., len(h_k0), h_k0..., len(h_k1), ...]``.
    The layout is consumed only by :func:`merge_meter_records`, so meter
    state growth cannot silently misalign a hand-rolled slice."""
    parts = [np.array([float(len(head))], np.float64),
             np.asarray(head, np.float64)]
    for k in keys:
        h = meters[k].history_vector()
        parts += [np.array([float(h.size)], np.float64), h]
    return np.concatenate(parts)


def merge_meter_records(vecs, keys):
    """Inverse of :func:`pack_meter_records` over per-process vectors (in
    process order): returns (summed head array, merged meters dict)."""
    heads = []
    hists = {k: [] for k in keys}
    for vec in vecs:
        vec = np.asarray(vec, np.float64)
        nh = int(vec[0])
        heads.append(vec[1:1 + nh])
        off = 1 + nh
        for k in keys:
            sz = int(vec[off])
            off += 1
            hists[k].append(vec[off:off + sz])
            off += sz
    head = np.sum(np.stack(heads), axis=0)
    meters = {k: AverageMeter.from_histories(hists[k]) for k in keys}
    return head, meters


def matching_metrics(matches: np.ndarray, gt_matches: np.ndarray,
                     valid_mask: Optional[np.ndarray] = None,
                     protocol: str = "registration") -> Dict:
    """Classification metrics for one pair.

    ``matches``/``gt_matches``: [N] int, -1 = unmatched. The reference's
    two eval scripts use *different* FP/TP-rate definitions; ``protocol``
    selects which one fills ``fm``/``fp_rate``/``tp_rate``:

    * ``"registration"`` (``test_registration_metric.py:238-248``):
      ``fp = valid & (matches != gt)``, ``fp_rate = FP/(FP+TN)``,
      ``tp_rate = TP/(TP+FN)``.
    * ``"test"`` (``test.py:277-291``): ``fp = valid & (gt == -1)``,
      ``fp_rate = FP / #(gt == -1)`` (nan when no gt-unmatched points, as
      the reference's unguarded numpy division), ``tp_rate =
      #(valid & gt > -1) / #(gt > -1)``, plus ``tp_rate2 =
      TP / #(gt > -1)``.

    Common quantities (precision/recall/accuracy/repeatability/banned)
    are identical between the scripts and always present.
    """
    if valid_mask is not None:
        matches = matches[valid_mask]
        gt_matches = gt_matches[valid_mask]
    valid = matches > -1
    valid_gt = gt_matches > -1
    tp = valid & (matches == gt_matches)
    fp = valid & (matches != gt_matches)
    tn = (~valid) & (~valid_gt)
    fn = (~valid) & valid_gt
    n = len(matches)
    n_tp, n_fp, n_tn, n_fn = map(int, (tp.sum(), fp.sum(), tn.sum(),
                                       fn.sum()))
    n_valid, n_gt = int(valid.sum()), int(valid_gt.sum())
    out = {
        "n": n,
        "n_valid": n_valid,
        "n_gt": n_gt,
        "repeatability": n_gt / n if n else 0.0,
        "precision": n_tp / n_valid if n_valid > 0 else 0.0,
        # test.py:283 gates recall on #valid > 0; an un-gated 0-GT pair is
        # 0/0 = nan in the reference's numpy division
        "recall": ((n_tp / n_gt if n_gt else float("nan"))
                   if n_valid > 0 else 0.0),
        "accuracy": (n_tp + n_tn) / n if n else 0.0,
        "matching_score": n_tp / n if n else 0.0,
        "tm": n_tp,
        "banned": n_gt < n * 0.1,        # test.py:247-251
    }
    if protocol == "test":
        # test.py:279-291 — FP counts valid predictions where GT says
        # "unmatched"; rates are normalized by GT-side counts.
        n_fp_t = int((valid & ~valid_gt).sum())
        n_no_gt = n - n_gt
        out["fm"] = n_fp_t
        out["fp_rate"] = n_fp_t / n_no_gt if n_no_gt else float("nan")
        out["tp_rate"] = (int((valid & valid_gt).sum()) / n_gt
                          if n_gt else float("nan"))
        out["tp_rate2"] = n_tp / n_gt if n_gt else float("nan")
    else:
        # 0/0 -> nan, as the reference's unguarded numpy divisions
        # (test_registration_metric.py:247-248)
        out["fm"] = n_fp
        out["fp_rate"] = (n_fp / (n_fp + n_tn) if (n_fp + n_tn) > 0
                          else float("nan"))
        out["tp_rate"] = (n_tp / (n_tp + n_fn) if (n_tp + n_fn) > 0
                          else float("nan"))
    return out


def np_kabsch(P: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """Host-side one-step SVD fit T: P -> Q (``solve_icp``,
    ``utils/utils_test.py:73-110``; no det-reflection fix, like the
    reference). Kept in numpy: a 3x3 SVD per pair is host-trivial and a
    device round trip would dominate eval latency."""
    up, uq = P.mean(axis=0), Q.mean(axis=0)
    U, _, Vh = np.linalg.svd((Q - uq).T @ (P - up))
    R = U @ Vh
    t = uq - R @ up
    T = np.zeros((4, 4))
    T[:3, :3] = R
    T[:3, 3] = t
    T[3, 3] = 1.0
    return T


def pose_metrics(mkpts0: np.ndarray, mkpts1: np.ndarray, T_gt: np.ndarray,
                 inlier_radius: float = 1.0,
                 clamp_arccos: bool = False) -> Dict:
    """SVD pose fit + errors (``calculate_error``,
    ``utils/utils_test.py:41-71``). mkpts are the matched keypoint
    coordinates; T = fit(mkpts1 -> mkpts0)."""
    T = np_kabsch(np.asarray(mkpts1, np.float64),
                  np.asarray(mkpts0, np.float64))
    moved = mkpts1 @ T[:3, :3].T + T[:3, 3]
    d = np.linalg.norm(moved - mkpts0, axis=-1)
    inlier = int((d < inlier_radius).sum())
    T_err = np.linalg.inv(T) @ np.asarray(T_gt)
    rte = float(np.linalg.norm(T_err[:3, 3]))
    f_theta = (T_err[0, 0] + T_err[1, 1] + T_err[2, 2] - 1.0) / 2
    if clamp_arccos:
        f_theta = min(max(f_theta, -1.0), 1.0)
    rre = float(np.arccos(f_theta))
    return {
        "T": T,
        "inlier": inlier,
        "inlier_ratio": inlier / len(mkpts0) if len(mkpts0) else 0.0,
        "trans_error": rte,
        "rot_error": rre,
    }


def _batched_pose_fit(matches, kpts0, kpts1, valid, T_gt):
    """One batched f64 Kabsch fit over padded [B, N] matches.

    ``valid`` [B, N] selects the matched rows; the fit equals the
    per-pair :func:`np_kabsch` on compacted arrays up to f64 summation
    reassociation (weighted einsum vs compacted ``np.mean``/matmul).
    Returns (T [B,4,4], inlier [B], rte [B], rre [B]); pairs with zero
    matches get rte/rre = nan (the empty-match divergence documented in
    README — the reference would crash there)."""
    w = valid.astype(np.float64)
    n_valid = w.sum(1)
    nv = np.maximum(n_valid, 1.0)
    g1 = np.take_along_axis(
        kpts1, np.clip(matches, 0, kpts1.shape[1] - 1)[:, :, None],
        axis=1)                                     # [B, N, 3]
    up = (g1 * w[:, :, None]).sum(1) / nv[:, None]  # P centroid
    uq = (kpts0 * w[:, :, None]).sum(1) / nv[:, None]
    H = np.einsum("bn,bni,bnj->bij", w, kpts0 - uq[:, None],
                  g1 - up[:, None])                 # (Q-uq)(P-up)^T
    U, _, Vh = np.linalg.svd(H)
    R = U @ Vh                                      # no det fix, like ref
    t = uq - np.einsum("bij,bj->bi", R, up)
    moved = np.einsum("bij,bnj->bni", R, g1) + t[:, None]
    d = np.linalg.norm(moved - kpts0, axis=-1)
    inlier = ((d < 1.0) & valid).sum(1)
    b = matches.shape[0]
    T = np.zeros((b, 4, 4))
    T[:, :3, :3] = R
    T[:, :3, 3] = t
    T[:, 3, 3] = 1.0
    T_err = np.linalg.inv(T) @ np.asarray(T_gt, np.float64)
    rte = np.linalg.norm(T_err[:, :3, 3], axis=-1)
    f_theta = (T_err[:, 0, 0] + T_err[:, 1, 1] + T_err[:, 2, 2] - 1.0) / 2
    with np.errstate(invalid="ignore"):
        rre = np.arccos(f_theta)                    # unclamped, like ref
    # <= 3 matches: the 3x3 covariance is rank-deficient, so the SVD null
    # direction is ambiguous and f64 reassociation noise can flip the
    # (reflection-unfixed) R between the batched and per-pair paths —
    # recompute those rare pairs exactly like the per-pair np_kabsch.
    # >= 4 matches the fit is generically full-rank and the two paths
    # agree to print precision (fuzz-tested).
    for i in np.nonzero((n_valid > 0) & (n_valid <= 3))[0]:
        sel = valid[i]
        pm = pose_metrics(kpts0[i][sel], g1[i][sel], np.asarray(T_gt[i]))
        T[i] = pm["T"]
        inlier[i] = pm["inlier"]
        rte[i] = pm["trans_error"]
        rre[i] = pm["rot_error"]
    empty = n_valid == 0
    rte = np.where(empty, np.nan, rte)
    rre = np.where(empty, np.nan, rre)
    return T, inlier, rte, rre


def registration_batch_metrics(matches, gt0, kpts0, kpts1, mask0, mask1,
                               T_gt=None, calculate_pose: bool = True):
    """Vectorized per-batch metrics for the registration-recall protocol
    (``test_registration_metric.py:238-256``): classification counts as
    integer [B]-reductions (protocol="registration" definitions) plus the
    shared batched pose fit. Returns [(mm, rte, rre)] in batch order;
    rte/rre are None when ``calculate_pose`` is off."""
    matches = np.asarray(matches)
    gt0 = np.asarray(gt0)
    mask0 = np.asarray(mask0, bool)
    mask1 = np.asarray(mask1, bool)
    kpts0 = np.asarray(kpts0, np.float64)
    kpts1 = np.asarray(kpts1, np.float64)
    b = matches.shape[0]

    valid = (matches > -1) & mask0
    valid_gt = (gt0 > -1) & mask0
    tp = valid & (matches == gt0)
    fp = valid & (matches != gt0)
    tn = (~valid) & (~valid_gt) & mask0
    fn = (~valid) & valid_gt
    n = mask0.sum(1)
    n_tp, n_fp, n_tn, n_fn = tp.sum(1), fp.sum(1), tn.sum(1), fn.sum(1)
    n_valid, n_gt = valid.sum(1), valid_gt.sum(1)

    rte = rre = [None] * b
    if calculate_pose:
        _, _, rte, rre = _batched_pose_fit(matches, kpts0, kpts1, valid,
                                           T_gt)

    out = []
    for i in range(b):
        nv_i, ng_i = int(n_valid[i]), int(n_gt[i])
        mm = {
            "n": int(n[i]),
            "n_valid": nv_i,
            "n_gt": ng_i,
            "repeatability": ng_i / n[i] if n[i] else 0.0,
            "precision": n_tp[i] / nv_i if nv_i > 0 else 0.0,
            "recall": ((n_tp[i] / ng_i if ng_i else float("nan"))
                       if nv_i > 0 else 0.0),
            "accuracy": (n_tp[i] + n_tn[i]) / n[i] if n[i] else 0.0,
            "matching_score": n_tp[i] / n[i] if n[i] else 0.0,
            "tm": int(n_tp[i]),
            "banned": ng_i < n[i] * 0.1,
            "fm": int(n_fp[i]),
            "fp_rate": (n_fp[i] / (n_fp[i] + n_tn[i])
                        if (n_fp[i] + n_tn[i]) > 0 else float("nan")),
            "tp_rate": (n_tp[i] / (n_tp[i] + n_fn[i])
                        if (n_tp[i] + n_fn[i]) > 0 else float("nan")),
        }
        out.append((mm,
                    float(rte[i]) if calculate_pose else None,
                    float(rre[i]) if calculate_pose else None))
    return out


class TestEvalAccumulator:
    """The reference ``test.py`` per-pair accumulation protocol
    (``test.py:241-342``), factored out of the entry point so a unit test
    can drive it against a straight-line NumPy port of the reference.

    Reference-exact semantics:

    * repeatability is appended BEFORE the ban check (``test.py:241-251``)
      so banned pairs count toward the mean;
    * banned pairs increment both ``baned_data`` and ``fail``;
    * pairs with < 4 matches increment ``fail`` and append nothing else;
    * in pose mode the remaining metric arrays are appended only when the
      pose fit succeeds (RTE <= 2 m, RRE <= 5, non-nan); in non-pose mode
      they are never appended (so the aggregate line prints nan), exactly
      like the reference (``test.py:300-319``);
    * the final fail/ban rates divide by ``n_pairs - 1`` (the reference
      divides by the last enumerate index, ``test.py:339-342``).
    """

    KEYS = ("precision", "accuracy", "recall", "trans_error", "rot_error",
            "repeatability", "inlier", "inlier_ratio", "fp_rate",
            "tp_rate", "tp_rate2", "tm", "fm")

    def __init__(self):
        self.arrays: Dict[str, list] = {k: [] for k in self.KEYS}
        self.fail = 0
        self.baned_data = 0
        self.n_pairs = 0

    def update_pair(self, matches: np.ndarray, gt0: np.ndarray,
                    kpts0: np.ndarray, kpts1: np.ndarray,
                    T_gt: Optional[np.ndarray] = None,
                    calculate_pose: bool = True):
        """Process one pair; returns (status, mm, pm) where status is one
        of 'banned' | 'too_few' | 'pose_fail' | 'ok' | 'ok_nopose'."""
        self.n_pairs += 1
        mm = matching_metrics(matches, gt0, protocol="test")
        self.arrays["repeatability"].append(mm["repeatability"])
        if mm["banned"]:
            self.baned_data += 1
            self.fail += 1
            return "banned", mm, None
        valid = matches > -1
        mkpts0 = kpts0[valid]
        mkpts1 = kpts1[matches[valid]]
        if len(mkpts0) < 4:                       # test.py:272-274
            self.fail += 1
            return "too_few", mm, None
        if not calculate_pose:
            return "ok_nopose", mm, None
        pm = pose_metrics(mkpts0, mkpts1, T_gt)
        if (pm["trans_error"] > 2 or pm["rot_error"] > 5
                or np.isnan(pm["trans_error"]) or np.isnan(pm["rot_error"])):
            self.fail += 1                        # test.py:296-298
            return "pose_fail", mm, pm
        a = self.arrays
        a["trans_error"].append(pm["trans_error"])
        a["rot_error"].append(pm["rot_error"])
        a["inlier"].append(pm["inlier"])
        a["inlier_ratio"].append(pm["inlier_ratio"])
        a["precision"].append(mm["precision"])
        a["accuracy"].append(mm["accuracy"])
        a["recall"].append(mm["recall"])
        a["fp_rate"].append(mm["fp_rate"])
        a["tp_rate"].append(mm["tp_rate"])
        a["tp_rate2"].append(mm["tp_rate2"])
        a["tm"].append(mm["tm"])
        a["fm"].append(mm["fm"])
        return "ok", mm, pm

    def update_batch(self, matches, gt0, kpts0, kpts1, mask0, mask1,
                     T_gt=None, calculate_pose: bool = True):
        """Vectorized :meth:`update_pair` over a PADDED batch.

        Inputs are the padded [B, N] / [B, N, 3] arrays straight from the
        eval pipeline (``mask0/1`` are the validity masks) — no per-pair
        boolean compaction on the host. The classification counts are
        integer reductions (bit-exact vs the per-pair path); the pose fits
        run as ONE batched f64 3x3 SVD (``np.linalg.svd`` on [B,3,3]),
        whose centroid/covariance summation order differs from the
        per-pair compacted-array path by at most f64 reassociation noise
        (asserted < 1e-9 relative and 3-decimal-print-identical in
        ``tests/test_metrics.py``).

        Returns the per-pair [(status, mm, pm)] list in batch order with
        the exact :meth:`update_pair` accumulation semantics.
        """
        matches = np.asarray(matches)
        gt0 = np.asarray(gt0)
        mask0 = np.asarray(mask0, bool)
        mask1 = np.asarray(mask1, bool)
        kpts0 = np.asarray(kpts0, np.float64)
        kpts1 = np.asarray(kpts1, np.float64)
        b, n_pad = matches.shape

        # ---- classification counts (integer, order-free => bit-exact) --
        valid = (matches > -1) & mask0
        valid_gt = (gt0 > -1) & mask0
        tp = valid & (matches == gt0)
        tn = (~valid) & (~valid_gt) & mask0
        n = mask0.sum(1)
        n_tp = tp.sum(1)
        n_tn = tn.sum(1)
        n_valid = valid.sum(1)
        n_gt = valid_gt.sum(1)
        n_fp_t = (valid & ~valid_gt).sum(1)
        n_vg = (valid & valid_gt).sum(1)
        n_no_gt = n - n_gt

        # ---- batched pose fit (only consumed by unbanned pairs) --------
        pms = [None] * b
        if calculate_pose:
            T, inlier, rte, rre = _batched_pose_fit(
                matches, kpts0, kpts1, valid, T_gt)
            for i in range(b):
                pms[i] = {
                    "T": T[i],
                    "inlier": int(inlier[i]),
                    "inlier_ratio": (inlier[i] / n_valid[i]
                                     if n_valid[i] else 0.0),
                    "trans_error": float(rte[i]),
                    "rot_error": float(rre[i]),
                }

        # ---- sequential protocol (identical to update_pair) ------------
        results = []
        for i in range(b):
            self.n_pairs += 1
            nv_i, ng_i = int(n_valid[i]), int(n_gt[i])
            mm = {
                "n": int(n[i]),
                "n_valid": nv_i,
                "n_gt": ng_i,
                "repeatability": ng_i / n[i] if n[i] else 0.0,
                "precision": n_tp[i] / nv_i if nv_i > 0 else 0.0,
                "recall": ((n_tp[i] / ng_i if ng_i else float("nan"))
                           if nv_i > 0 else 0.0),
                "accuracy": (n_tp[i] + n_tn[i]) / n[i] if n[i] else 0.0,
                "matching_score": n_tp[i] / n[i] if n[i] else 0.0,
                "tm": int(n_tp[i]),
                "banned": ng_i < n[i] * 0.1,
                "fm": int(n_fp_t[i]),
                "fp_rate": (n_fp_t[i] / n_no_gt[i] if n_no_gt[i]
                            else float("nan")),
                "tp_rate": n_vg[i] / ng_i if ng_i else float("nan"),
                "tp_rate2": n_tp[i] / ng_i if ng_i else float("nan"),
            }
            self.arrays["repeatability"].append(mm["repeatability"])
            if mm["banned"]:
                self.baned_data += 1
                self.fail += 1
                results.append(("banned", mm, None))
                continue
            if nv_i < 4:                          # test.py:272-274
                self.fail += 1
                results.append(("too_few", mm, None))
                continue
            if not calculate_pose:
                results.append(("ok_nopose", mm, None))
                continue
            pm = pms[i]
            if (pm["trans_error"] > 2 or pm["rot_error"] > 5
                    or np.isnan(pm["trans_error"])
                    or np.isnan(pm["rot_error"])):
                self.fail += 1                    # test.py:296-298
                results.append(("pose_fail", mm, pm))
                continue
            a = self.arrays
            a["trans_error"].append(pm["trans_error"])
            a["rot_error"].append(pm["rot_error"])
            a["inlier"].append(pm["inlier"])
            a["inlier_ratio"].append(pm["inlier_ratio"])
            a["precision"].append(mm["precision"])
            a["accuracy"].append(mm["accuracy"])
            a["recall"].append(mm["recall"])
            a["fp_rate"].append(mm["fp_rate"])
            a["tp_rate"].append(mm["tp_rate"])
            a["tp_rate2"].append(mm["tp_rate2"])
            a["tm"].append(mm["tm"])
            a["fm"].append(mm["fm"])
            results.append(("ok", mm, pm))
        return results

    def summary(self) -> Dict:
        mean = {k: (float(np.mean(v)) if v else float("nan"))
                for k, v in self.arrays.items()}
        denom = max(self.n_pairs - 1, 1)
        mean["fail_rate"] = self.fail / denom
        mean["baned_rate"] = self.baned_data / denom
        return mean

    # -- multi-host merging: each process accumulates its contiguous pair
    #    slice, then the per-process states concatenate (the summary means
    #    are order-free; fail/ban/n_pairs counters are additive, so the
    #    merged summary equals a single-process pass over all pairs) --

    def state_vector(self) -> np.ndarray:
        """Flat f64 encoding: [fail, baned, n_pairs, 13 array lengths,
        arrays concatenated in KEYS order] (all counts exact in f64)."""
        head = [float(self.fail), float(self.baned_data),
                float(self.n_pairs)]
        head += [float(len(self.arrays[k])) for k in self.KEYS]
        body = [np.asarray(self.arrays[k], np.float64) for k in self.KEYS]
        return np.concatenate([np.array(head, np.float64)] + body)

    @classmethod
    def from_state_vectors(cls, vecs) -> "TestEvalAccumulator":
        acc = cls()
        nk = len(cls.KEYS)
        for vec in vecs:
            vec = np.asarray(vec, np.float64)
            acc.fail += int(vec[0])
            acc.baned_data += int(vec[1])
            acc.n_pairs += int(vec[2])
            lens = vec[3:3 + nk].astype(np.int64)
            off = 3 + nk
            for k, ln in zip(cls.KEYS, lens):
                acc.arrays[k].extend(vec[off:off + ln].tolist())
                off += ln
        return acc


def registration_summary(meters: Dict[str, AverageMeter]) -> Dict:
    """Final line of ``test_registration_metric.py:282-286``: F1 is
    computed from the *run-averaged* precision and recall."""
    p = meters["inlier_ratio"].avg
    r = meters["recall"].avg
    f1 = 2 * p * r / (p + r) if (p + r) > 0 else 0.0
    return {
        "repeatability": meters["rep"].avg,
        "inlier": meters["inlier"].avg,
        "RR": meters["RR"].avg,
        "precision": p,
        "recall": r,
        "F1": f1,
        "fp_rate": meters["fp_rate"].avg,
        "tp_rate": meters["tp_rate"].avg,
        "RTE": meters["rte"].avg,
        "RRE": meters["rre"].avg,
    }
