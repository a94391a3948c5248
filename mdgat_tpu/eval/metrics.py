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
