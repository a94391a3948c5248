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
    """Running mean/variance accumulator (``utils/utils_test.py:6-25``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val ** 2 * n
        self.var = self.sq_sum / self.count - self.avg ** 2


def matching_metrics(matches: np.ndarray, gt_matches: np.ndarray,
                     valid_mask: Optional[np.ndarray] = None) -> Dict:
    """Classification metrics for one pair.

    ``matches``/``gt_matches``: [N] int, -1 = unmatched. Uses the
    vectorized definitions of ``test_registration_metric.py:238-248``
    (identical values to the Python-loop versions in ``test.py:277-290``).
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
    return {
        "n": n,
        "n_valid": n_valid,
        "n_gt": n_gt,
        "repeatability": n_gt / n if n else 0.0,
        "precision": n_tp / n_valid if n_valid > 0 else 0.0,
        "recall": n_tp / n_gt if n_valid > 0 else 0.0,   # test.py:283 gate
        "accuracy": (n_tp + n_tn) / n if n else 0.0,
        "matching_score": n_tp / n if n else 0.0,
        "fp_rate": n_fp / (n_fp + n_tn) if (n_fp + n_tn) > 0 else 0.0,
        "tp_rate": n_tp / (n_tp + n_fn) if (n_tp + n_fn) > 0 else 0.0,
        # test.py:289 variant: predicted-valid over GT-valid
        "tp_rate_pred": (int((valid & valid_gt).sum()) / n_gt
                         if n_gt > 0 else 0.0),
        "tm": n_tp, "fm": n_fp,
        "banned": n_gt < n * 0.1,        # test.py:247-251
    }


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
