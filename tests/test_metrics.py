"""Eval-metric protocol parity vs straight-line NumPy ports of the
reference eval scripts.

Oracles in this file are written directly from:
* ``/root/reference/test.py:241-342`` (per-pair loop protocol), and
* ``/root/reference/test_registration_metric.py:230-286`` (vectorized
  definitions + AverageMeter protocol),
* ``/root/reference/utils/utils_test.py:27-110`` (solve_icp /
  calculate_error pose math),
kept deliberately loop-style/naive so they are independent of the
library implementations they check.
"""

import numpy as np
import pytest

from mdgat_tpu.eval import (AverageMeter, TestEvalAccumulator,
                            matching_metrics, pose_metrics,
                            registration_summary)


# ---------------------------------------------------------------------------
# oracles: straight ports of the reference protocols
# ---------------------------------------------------------------------------

def _ref_solve_icp(P, Q):
    """utils/utils_test.py:73-110 (no det-reflection fix)."""
    up, uq = P.mean(axis=0), Q.mean(axis=0)
    U, s, V = np.linalg.svd(np.dot((Q - uq).T, (P - up)),
                            full_matrices=True, compute_uv=True)
    R = np.dot(U, V)
    t = uq - np.dot(R, up)
    T = np.zeros((4, 4))
    T[0:3, 0:3] = R
    T[0:3, 3] = t
    T[3, 3] = 1.0
    return T


def _ref_calculate_error(mkpts0, mkpts1, T_gt):
    """utils/utils_test.py:41-71 (unclamped arccos, inlier radius 1)."""
    T = _ref_solve_icp(np.asarray(mkpts1, np.float64),
                       np.asarray(mkpts0, np.float64))
    mkpts1w = (T[:3, :3] @ np.asarray(mkpts1, np.float64).T).T + T[:3, 3]
    inlier = int((np.linalg.norm(mkpts1w - mkpts0, axis=1) < 1).sum())
    inlier_ratio = inlier / len(mkpts0)
    T_error = np.linalg.inv(T) @ np.asarray(T_gt, np.float64)
    trans_error = np.linalg.norm(T_error[:3, 3])
    f_theta = (T_error[0, 0] + T_error[1, 1] + T_error[2, 2] - 1) * 0.5
    rot_error = np.arccos(f_theta)
    return T, inlier, inlier_ratio, trans_error, rot_error


def _ref_testpy_pair(matches, matches_gt):
    """test.py:277-291 loop-style classification quantities."""
    n = len(matches)
    valid = matches > -1
    valid_gt = matches_gt > -1
    true_positive = [(matches[i] == matches_gt[i]) and valid[i]
                     for i in range(n)]
    true_negativate = [(matches[i] == matches_gt[i]) and not valid[i]
                       for i in range(n)]
    false_positive = [valid[i] and (matches_gt[i] == -1) for i in range(n)]
    precision = (np.sum(true_positive) / np.sum(valid)
                 if np.sum(valid) > 0 else 0)
    recall = (np.sum(true_positive) / np.sum(valid_gt)
              if np.sum(valid) > 0 else 0)
    tm = np.sum(true_positive)
    fm = np.sum(false_positive)
    accuracy = (np.sum(true_positive) + np.sum(true_negativate)) / n
    with np.errstate(divide="ignore", invalid="ignore"):
        fp_rate = np.float64(np.sum(false_positive)) / np.sum(matches_gt == -1)
        tp_rate = np.float64(np.sum(
            [valid[i] and (matches_gt[i] > -1) for i in range(n)]
        )) / np.sum(matches_gt > -1)
        tp_rate2 = np.float64(np.sum(true_positive)) / np.sum(matches_gt > -1)
    return dict(precision=float(precision), recall=float(recall),
                tm=int(tm), fm=int(fm), accuracy=float(accuracy),
                fp_rate=float(fp_rate), tp_rate=float(tp_rate),
                tp_rate2=float(tp_rate2))


def _ref_regmetric_pair(matches, matches_gt):
    """test_registration_metric.py:238-248 vectorized quantities."""
    valid = matches > -1
    valid_gt = matches_gt > -1
    true_positive = (matches > -1) * (matches == matches_gt)
    false_positive = (matches > -1) * ((matches == matches_gt) == False)  # noqa: E712
    true_negativate = (matches == -1) * (matches_gt == -1)
    false_negativate = (matches == -1) * (matches_gt > -1)
    precision = (np.sum(true_positive) / np.sum(valid)
                 if np.sum(valid) > 0 else 0)
    recall = (np.sum(true_positive) / np.sum(valid_gt)
              if np.sum(valid) > 0 else 0)
    fp_rate = np.sum(false_positive) / (np.sum(false_positive)
                                        + np.sum(true_negativate))
    tp_rate = np.sum(true_positive) / (np.sum(true_positive)
                                       + np.sum(false_negativate))
    return dict(precision=float(precision), recall=float(recall),
                inlier=int(np.sum(true_positive)), fp_rate=float(fp_rate),
                tp_rate=float(tp_rate),
                repeatability=float(np.sum(valid_gt) / len(valid_gt)))


def _random_pair(rng, n=40, p_valid=0.6, p_gt=0.7):
    """Random (matches, gt) with -1 sentinels."""
    matches = np.where(rng.random(n) < p_valid, rng.integers(0, n, n), -1)
    gt = np.where(rng.random(n) < p_gt, rng.integers(0, n, n), -1)
    # make some agree so TP is nonzero
    agree = rng.random(n) < 0.4
    matches = np.where(agree & (gt > -1), gt, matches)
    return matches.astype(np.int64), gt.astype(np.int64)


def _rigid(rng, scale=0.5):
    theta = rng.normal(0, scale)
    c, s = np.cos(theta), np.sin(theta)
    T = np.eye(4)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    T[:3, 3] = rng.normal(0, scale, 3)
    return T


# ---------------------------------------------------------------------------
# per-pair quantity parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(8))
def test_testpy_protocol_quantities(seed):
    rng = np.random.default_rng(seed)
    matches, gt = _random_pair(rng)
    ref = _ref_testpy_pair(matches, gt)
    mm = matching_metrics(matches, gt, protocol="test")
    for k, v in ref.items():
        assert mm[k] == pytest.approx(v, nan_ok=True), k


def test_testpy_protocol_all_gt_valid_gives_nan_fp_rate():
    # all GT matched: reference divides by #(gt == -1) == 0 -> nan
    gt = np.arange(10)
    matches = np.where(np.arange(10) % 2 == 0, gt, -1)
    ref = _ref_testpy_pair(matches, gt)
    mm = matching_metrics(matches, gt, protocol="test")
    assert np.isnan(ref["fp_rate"]) and np.isnan(mm["fp_rate"])
    assert mm["tp_rate"] == pytest.approx(ref["tp_rate"])


def test_testpy_fp_is_gt_unmatched_not_wrong():
    # a valid-but-wrong match with valid GT: FP for the registration
    # protocol, NOT an FP for test.py's definition
    matches = np.array([1, -1, -1, -1, -1, -1, -1, -1, -1, -1])
    gt = np.array([2, 3, 4, 5, 6, 7, 8, 9, 0, 1])
    assert matching_metrics(matches, gt, protocol="test")["fm"] == 0
    assert matching_metrics(matches, gt)["fm"] == 1
    ref = _ref_testpy_pair(matches, gt)
    assert ref["fm"] == 0


@pytest.mark.parametrize("seed", range(8))
def test_regmetric_protocol_quantities(seed):
    rng = np.random.default_rng(seed + 100)
    matches, gt = _random_pair(rng)
    ref = _ref_regmetric_pair(matches, gt)
    mm = matching_metrics(matches, gt)
    assert mm["precision"] == pytest.approx(ref["precision"])
    assert mm["recall"] == pytest.approx(ref["recall"])
    assert mm["tm"] == ref["inlier"]
    assert mm["fp_rate"] == pytest.approx(ref["fp_rate"], nan_ok=True)
    assert mm["tp_rate"] == pytest.approx(ref["tp_rate"], nan_ok=True)
    assert mm["repeatability"] == pytest.approx(ref["repeatability"])


# ---------------------------------------------------------------------------
# full test.py accumulation protocol vs a straight port of the loop
# ---------------------------------------------------------------------------

def _make_eval_cases(rng, n_pairs=24, n=40):
    """Synthetic per-pair data covering banned / too-few / pose-fail / ok."""
    cases = []
    for i in range(n_pairs):
        kind = i % 4
        kpts0 = rng.normal(0, 10, (n, 3))
        T_gt = _rigid(rng)
        # kpts1[j] corresponds to kpts0[perm^{-1}(j)]
        perm = rng.permutation(n)
        kpts1 = np.empty_like(kpts0)
        kpts1[perm] = (kpts0 - T_gt[:3, 3]) @ T_gt[:3, :3]  # inverse map
        gt = perm.copy()
        matches = perm.copy()
        if kind == 0:        # banned: almost no GT
            gt = np.full(n, -1)
            gt[:2] = perm[:2]
            matches[rng.random(n) < 0.5] = -1
        elif kind == 1:      # too few matches
            matches = np.full(n, -1)
            matches[:3] = perm[:3]
        elif kind == 2:      # pose fail: shuffled matches -> bad fit
            matches = rng.permutation(n)
        else:                # ok: correct matches, slight dropout
            matches[rng.random(n) < 0.2] = -1
        cases.append((matches.astype(np.int64), gt.astype(np.int64),
                      kpts0, kpts1, T_gt))
    return cases


def _ref_testpy_loop(cases, calculate_pose=True):
    """Straight port of the reference test.py accumulate loop
    (test.py:241-342), batch_size 1 (i == pair index)."""
    arrays = {k: [] for k in
              ("precision", "accuracy", "recall", "trans_error", "rot_error",
               "repeatability", "inlier", "inlier_ratio", "fp_rate",
               "tp_rate", "tp_rate2", "tm", "fm")}
    fail = baned_data = 0
    i = -1
    for matches, matches_gt, kpts0, kpts1, T_gt in cases:
        i += 1
        valid = matches > -1
        mkpts0 = kpts0[valid]
        mkpts1 = kpts1[matches[valid]]
        valid_gt = matches_gt > -1
        repeatibilty = np.sum(valid_gt) / len(valid_gt)
        arrays["repeatability"].append(repeatibilty)      # before ban check
        if valid_gt.sum() < len(matches_gt) * 0.1:
            baned_data += 1
            fail += 1
            continue
        if len(mkpts0) < 4:
            fail += 1
            continue
        q = _ref_testpy_pair(matches, matches_gt)
        if calculate_pose:
            T, inlier, inlier_ratio, trans_error, rot_error = \
                _ref_calculate_error(mkpts0, mkpts1, T_gt)
            if (trans_error > 2 or rot_error > 5
                    or np.isnan(trans_error) or np.isnan(rot_error)):
                fail += 1
                continue
            arrays["precision"].append(q["precision"])
            arrays["accuracy"].append(q["accuracy"])
            arrays["recall"].append(q["recall"])
            arrays["trans_error"].append(trans_error)
            arrays["rot_error"].append(rot_error)
            arrays["inlier"].append(inlier)
            arrays["inlier_ratio"].append(inlier_ratio)
            arrays["fp_rate"].append(q["fp_rate"])
            arrays["tp_rate"].append(q["tp_rate"])
            arrays["tp_rate2"].append(q["tp_rate2"])
            arrays["tm"].append(q["tm"])
            arrays["fm"].append(q["fm"])
        # non-pose mode: reference only prints, never appends
    out = {k: (float(np.mean(v)) if v else float("nan"))
           for k, v in arrays.items()}
    out["fail_rate"] = fail / max(i, 1)
    out["baned_rate"] = baned_data / max(i, 1)
    return out


@pytest.mark.parametrize("calculate_pose", [True, False])
def test_testpy_accumulator_matches_reference_loop(calculate_pose):
    rng = np.random.default_rng(7)
    cases = _make_eval_cases(rng)
    ref = _ref_testpy_loop(cases, calculate_pose)
    acc = TestEvalAccumulator()
    statuses = []
    for matches, gt, kpts0, kpts1, T_gt in cases:
        s, _, _ = acc.update_pair(matches, gt, kpts0, kpts1, T_gt,
                                  calculate_pose=calculate_pose)
        statuses.append(s)
    # the synthetic cases must exercise every branch
    assert {"banned", "too_few"} <= set(statuses)
    if calculate_pose:
        assert {"pose_fail", "ok"} <= set(statuses)
    got = acc.summary()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-12, nan_ok=True), k


def test_banned_pairs_count_in_mean_repeatability():
    """test.py:241-251 — repeatability of banned pairs enters the mean."""
    n = 20
    kpts = np.zeros((n, 3))
    acc = TestEvalAccumulator()
    gt_banned = np.full(n, -1)
    s, _, _ = acc.update_pair(np.full(n, -1), gt_banned, kpts, kpts,
                              np.eye(4))
    assert s == "banned"
    gt_full = np.arange(n)
    acc.update_pair(np.full(n, -1), gt_full, kpts, kpts, np.eye(4))
    assert acc.summary()["repeatability"] == pytest.approx(0.5)
    assert acc.baned_data == 1 and acc.fail == 2  # both failed overall


# ---------------------------------------------------------------------------
# registration script: pose fit without a minimum-match guard
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n_matches", [1, 2, 5])
def test_regmetric_pose_fit_low_match_parity(n_matches):
    """The reference fits the pose regardless of match count
    (test_registration_metric.py:254-256); our pose_metrics must produce
    the same rte/rre for 1-2 matches as the straight solve_icp port."""
    rng = np.random.default_rng(3)
    T_gt = _rigid(rng)
    mkpts0 = rng.normal(0, 5, (n_matches, 3))
    mkpts1 = (mkpts0 - T_gt[:3, 3]) @ T_gt[:3, :3]
    _, _, _, rte_ref, rre_ref = _ref_calculate_error(mkpts0, mkpts1, T_gt)
    pm = pose_metrics(mkpts0, mkpts1, T_gt)
    assert pm["trans_error"] == pytest.approx(rte_ref, abs=1e-9, nan_ok=True)
    assert pm["rot_error"] == pytest.approx(rre_ref, abs=1e-9, nan_ok=True)


def test_batched_pose_fit_survives_per_pair_svd_failure(monkeypatch):
    """A pair whose SVD diverges in BOTH the batched call and the
    per-pair redo must record a failed fit (nan errors, 0 inliers,
    identity T) instead of raising out of the batch — and must not
    disturb the other rows' fits."""
    import mdgat_tpu.eval.metrics as M

    rng = np.random.default_rng(11)
    b, n = 2, 8
    kpts0 = rng.normal(0, 5, (b, n, 3))
    T_gt = np.stack([_rigid(rng) for _ in range(b)])
    kpts1 = np.stack([(kpts0[i] - T_gt[i, :3, 3]) @ T_gt[i, :3, :3]
                      for i in range(b)])
    matches = np.tile(np.arange(n), (b, 1))
    valid = np.ones((b, n), bool)
    valid[1, 3:] = False          # row 1: 3 matches -> forced redo path

    T0, inl0, rte0, rre0 = M._batched_pose_fit(
        matches, kpts0, kpts1, valid, T_gt)
    assert np.isfinite(rte0).all() and np.isfinite(rre0).all()

    def raising_pose_metrics(*a, **k):
        raise np.linalg.LinAlgError("SVD did not converge")

    monkeypatch.setattr(M, "pose_metrics", raising_pose_metrics)
    T, inl, rte, rre = M._batched_pose_fit(
        matches, kpts0, kpts1, valid, T_gt)
    # row 0 never enters the redo loop: identical to the unpatched run
    np.testing.assert_allclose(T[0], T0[0])
    assert inl[0] == inl0[0] and rte[0] == rte0[0] and rre[0] == rre0[0]
    # row 1's recompute "diverged": recorded as a failed fit, not a raise
    np.testing.assert_array_equal(T[1], np.eye(4))
    assert inl[1] == 0
    assert np.isnan(rte[1]) and np.isnan(rre[1])


def test_batched_pose_fit_survives_batched_svd_failure(monkeypatch):
    """np.linalg.svd raising on the BATCHED [B,3,3] call (the scenario
    the except branch exists for) must not crash the batched inv(T):
    failed rows keep an orthogonal R = I until the redo loop replaces
    them via the per-pair path. Covers both redo outcomes: the per-pair
    recompute succeeding (row recovers the true fit) and diverging too
    (row records a failed fit). Pre-fix, U = Vh = 0 made T singular and
    np.linalg.inv raised out of the batch before the redo loop ran."""
    import mdgat_tpu.eval.metrics as M

    rng = np.random.default_rng(12)
    b, n = 2, 8
    kpts0 = rng.normal(0, 5, (b, n, 3))
    T_gt = np.stack([_rigid(rng) for _ in range(b)])
    kpts1 = np.stack([(kpts0[i] - T_gt[i, :3, 3]) @ T_gt[i, :3, :3]
                      for i in range(b)])
    kpts1 += rng.normal(0, 1e-3, kpts1.shape)   # imperfect fit: f_theta < 1
    matches = np.tile(np.arange(n), (b, 1))
    valid = np.ones((b, n), bool)   # full-rank rows: redo only via svd_fail

    T0, inl0, rte0, rre0 = M._batched_pose_fit(
        matches, kpts0, kpts1, valid, T_gt)
    assert np.isfinite(rte0).all() and np.isfinite(rre0).all()

    real_svd = np.linalg.svd

    def make_stub(fail_2d_calls):
        calls = {"n2d": 0}

        def stub(a, *args, **kwargs):
            if np.ndim(a) == 3:     # the batched call: always diverge
                raise np.linalg.LinAlgError("SVD did not converge")
            calls["n2d"] += 1
            if calls["n2d"] in fail_2d_calls:
                raise np.linalg.LinAlgError("SVD did not converge")
            return real_svd(a, *args, **kwargs)

        return stub

    # 2D call order inside _batched_pose_fit: per-row loop i=0 (#1),
    # i=1 (#2), then pose_metrics' Kabsch for each redone row.

    # A) per-row retry fails for row 1, per-pair recompute succeeds:
    #    row 1 recovers the true fit (per-pair path ~= batched formula).
    monkeypatch.setattr(np.linalg, "svd", make_stub({2}))
    T, inl, rte, rre = M._batched_pose_fit(
        matches, kpts0, kpts1, valid, T_gt)
    np.testing.assert_allclose(T, T0, rtol=1e-6, atol=1e-9)
    np.testing.assert_array_equal(inl, inl0)
    np.testing.assert_allclose(rte, rte0, rtol=1e-6, atol=1e-9)

    # B) the recompute diverges too: failed fit recorded, batch survives,
    #    row 0 untouched.
    monkeypatch.setattr(np.linalg, "svd", make_stub({2, 3}))
    T, inl, rte, rre = M._batched_pose_fit(
        matches, kpts0, kpts1, valid, T_gt)
    np.testing.assert_allclose(T[0], T0[0], rtol=1e-6, atol=1e-9)
    assert inl[0] == inl0[0]
    np.testing.assert_array_equal(T[1], np.eye(4))
    assert inl[1] == 0
    assert np.isnan(rte[1]) and np.isnan(rre[1])


def _ref_regmetric_loop(cases):
    """Straight port of test_registration_metric.py:230-286."""
    meters = {k: AverageMeter() for k in
              ("rep", "rre", "rte", "inlier", "inlier_ratio", "recall",
               "tp_rate", "fp_rate", "RR")}
    baned_data = 0
    for matches, matches_gt, kpts0, kpts1, T_gt in cases:
        valid_gt = matches_gt > -1
        if valid_gt.sum() < len(matches_gt) * 0.1:
            baned_data += 1
            continue
        q = _ref_regmetric_pair(matches, matches_gt)
        meters["rep"].update(q["repeatability"])
        meters["fp_rate"].update(q["fp_rate"])
        meters["tp_rate"].update(q["tp_rate"])
        meters["recall"].update(q["recall"])
        meters["inlier_ratio"].update(q["precision"])
        meters["inlier"].update(q["inlier"])
        valid = matches > -1
        mkpts0, mkpts1 = kpts0[valid], kpts1[matches[valid]]
        if len(mkpts0) == 0:
            rte, rre = float("nan"), float("nan")
        else:
            T = _ref_solve_icp(mkpts1, mkpts0)
            T_error = np.linalg.inv(T) @ T_gt
            rte = np.linalg.norm(T_error[:3, 3])
            rre = np.arccos((T_error[0, 0] + T_error[1, 1]
                             + T_error[2, 2] - 1) / 2)
        if rte < 2:
            meters["rte"].update(rte)
        if not np.isnan(rre) and rre < np.pi / 180 * 5:
            meters["rre"].update(rre)
        meters["RR"].update(
            1 if (rte < 2 and not np.isnan(rre) and rre < np.pi / 180 * 5)
            else 0)
    return registration_summary(meters), baned_data


def test_regmetric_zero_denominator_rates_are_nan():
    """Every point TP or FN -> the reference's FP/(FP+TN) division is 0/0
    = nan (test_registration_metric.py:247-248); same for TP/(TP+FN)."""
    gt = np.arange(6)
    mm = matching_metrics(gt.copy(), gt)          # all TP
    assert np.isnan(mm["fp_rate"]) and mm["tp_rate"] == 1.0
    mm = matching_metrics(np.full(6, -1), gt)     # all FN
    assert np.isnan(mm["fp_rate"]) and mm["tp_rate"] == 0.0


def test_regmetric_summary_f1_of_averages():
    rng = np.random.default_rng(11)
    cases = _make_eval_cases(rng, n_pairs=16)
    ref, _ = _ref_regmetric_loop(cases)
    # F1 must be computed from run-averaged precision/recall, not per-pair
    p, r = ref["precision"], ref["recall"]
    assert ref["F1"] == pytest.approx(2 * p * r / (p + r))
    assert 0 < ref["RR"] < 1  # mix of success and failure cases


def test_accumulator_state_merge_equals_single_pass():
    """Multi-host eval merging: two accumulators over contiguous halves
    of the pair stream, merged via state vectors, must reproduce the
    single-accumulator summary exactly (parallel/multihost.py protocol —
    means are over the concatenated per-pair records, counters add)."""
    rng = np.random.default_rng(11)
    cases = _make_eval_cases(rng)
    full = TestEvalAccumulator()
    for c in cases:
        full.update_pair(*c)

    halves = [TestEvalAccumulator(), TestEvalAccumulator()]
    mid = len(cases) // 2
    for c in cases[:mid]:
        halves[0].update_pair(*c)
    for c in cases[mid:]:
        halves[1].update_pair(*c)
    merged = TestEvalAccumulator.from_state_vectors(
        [h.state_vector() for h in halves])

    assert merged.n_pairs == full.n_pairs
    assert merged.fail == full.fail
    assert merged.baned_data == full.baned_data
    got, want = merged.summary(), full.summary()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=0, abs=0,
                                       nan_ok=True), k


def test_average_meter_history_merge_bit_identical():
    """Replaying recorded per-process histories in process order is the
    EXACT update sequence of one sequential meter — sums bit-identical
    (partial-sum addition would reassociate f64 adds); nan poisoning
    propagates identically."""
    from mdgat_tpu.eval import merge_meter_records, pack_meter_records

    rng = np.random.default_rng(3)
    a_vals = rng.normal(size=7).tolist()
    b_vals = rng.normal(size=4).tolist() + [float("nan")]
    one = AverageMeter()
    for v in a_vals + b_vals:
        one.update(v)
    ma, mb = AverageMeter(record=True), AverageMeter(record=True)
    for v in a_vals:
        ma.update(v)
    for v in b_vals:
        mb.update(v)
    merged = AverageMeter.from_histories(
        [ma.history_vector(), mb.history_vector()])
    assert merged.count == one.count
    assert (merged.sum == one.sum or
            (np.isnan(merged.sum) and np.isnan(one.sum)))
    assert np.isnan(merged.avg) and np.isnan(one.avg)

    # the self-describing pack/merge round trip (no hand-rolled offsets)
    keys = ("a", "b")
    head, meters = merge_meter_records(
        [pack_meter_records([2, 5], {"a": ma, "b": mb}, keys),
         pack_meter_records([1, 3], {"a": AverageMeter(record=True),
                                     "b": mb}, keys)], keys)
    assert head.tolist() == [3.0, 8.0]
    assert meters["a"].count == ma.count          # second process empty
    assert meters["b"].count == 2 * mb.count
    empty = AverageMeter.from_histories([AverageMeter().history_vector()])
    assert empty.count == 0 and empty.avg == 0.0


def _random_padded_batch(rng, b=16, n=48):
    """Padded batch with prefix masks, engineered to hit every status."""
    mask0 = np.zeros((b, n), bool)
    mask1 = np.zeros((b, n), bool)
    kpts0 = rng.normal(size=(b, n, 3)) * 10
    kpts1 = rng.normal(size=(b, n, 3)) * 10
    matches = np.full((b, n), -1, np.int64)
    gt = np.full((b, n), -1, np.int64)
    T_gt = np.tile(np.eye(4), (b, 1, 1))
    for i in range(b):
        n0 = int(rng.integers(8, n + 1))
        n1 = int(rng.integers(8, n + 1))
        mask0[i, :n0] = True
        mask1[i, :n1] = True
        kind = i % 4
        if kind == 0:                     # banned: almost no GT
            gt[i, :1] = 0
            matches[i, :n0] = rng.integers(-1, n1, n0)
        elif kind == 1:                   # too few matches
            gt[i, :n0] = rng.integers(-1, n1, n0)
            matches[i, :3] = rng.integers(0, n1, 3)
        else:                             # ok-ish: many planted matches
            m = rng.integers(0, n1, n0)
            gt[i, :n0] = np.where(rng.uniform(size=n0) < 0.8, m, -1)
            matches[i, :n0] = np.where(rng.uniform(size=n0) < 0.85,
                                       gt[i, :n0],
                                       rng.integers(-1, n1, n0))
            if kind == 2:                 # good pose: kpts1 = kpts0 copy
                kpts1[i, :n1] = kpts0[i, :n1]
                good = gt[i, :n0] > -1
                kpts1[i][gt[i, :n0][good]] = kpts0[i, :n0][good]
        # padded region must be ignored regardless of content
        matches[i, n0:] = rng.integers(-1, n, n - n0)
        gt[i, n0:] = rng.integers(-1, n, n - n0)
    return matches, gt, kpts0, kpts1, mask0, mask1, T_gt


@pytest.mark.parametrize("calculate_pose", [True, False])
def test_update_batch_matches_update_pair(calculate_pose):
    """The vectorized batch path == the per-pair path: identical statuses,
    bit-identical classification metrics, pose values to f64
    reassociation noise, identical accumulated state and summary."""
    rng = np.random.default_rng(41)
    matches, gt, kpts0, kpts1, mask0, mask1, T_gt = \
        _random_padded_batch(rng)
    b = matches.shape[0]

    acc_ref = TestEvalAccumulator()
    refs = []
    for i in range(b):
        m = matches[i][mask0[i]]
        g = gt[i][mask0[i]]
        k0 = kpts0[i][mask0[i]]
        k1 = kpts1[i][mask1[i]]
        refs.append(acc_ref.update_pair(m, g, k0, k1, T_gt[i],
                                        calculate_pose=calculate_pose))

    acc_bat = TestEvalAccumulator()
    got = acc_bat.update_batch(matches, gt, kpts0, kpts1, mask0, mask1,
                               T_gt, calculate_pose=calculate_pose)

    statuses = [s for s, _, _ in refs]
    assert {"banned", "too_few"} <= set(statuses)
    if calculate_pose:
        assert "ok" in statuses
    assert [s for s, _, _ in got] == statuses
    for (_, mm_r, pm_r), (_, mm_g, pm_g) in zip(refs, got):
        for k in mm_r:
            assert mm_g[k] == pytest.approx(mm_r[k], rel=0, abs=0,
                                            nan_ok=True), k
        if pm_r is not None:
            for k in ("trans_error", "rot_error", "inlier_ratio"):
                assert pm_g[k] == pytest.approx(pm_r[k], rel=1e-9,
                                                nan_ok=True), k
            assert pm_g["inlier"] == pm_r["inlier"]
    assert acc_bat.fail == acc_ref.fail
    assert acc_bat.baned_data == acc_ref.baned_data
    assert acc_bat.n_pairs == acc_ref.n_pairs
    s_ref, s_bat = acc_ref.summary(), acc_bat.summary()
    for k in s_ref:
        assert s_bat[k] == pytest.approx(s_ref[k], rel=1e-9, nan_ok=True), k


def test_update_batch_printed_lines_identical():
    """Fuzz: the %.3f-formatted per-pair print values are IDENTICAL
    between the batched and per-pair paths over many random batches (the
    f64 reassociation noise never reaches the 3rd decimal)."""
    rng = np.random.default_rng(43)
    fmt = ("{inlier} {inlier_ratio:.3f} {trans_error:.3f} "
           "{rot_error:.3f}")
    for trial in range(12):
        matches, gt, kpts0, kpts1, mask0, mask1, T_gt = \
            _random_padded_batch(rng, b=16, n=40)
        a_ref, a_bat = TestEvalAccumulator(), TestEvalAccumulator()
        got = a_bat.update_batch(matches, gt, kpts0, kpts1, mask0, mask1,
                                 T_gt)
        for i in range(16):
            s_r, mm_r, pm_r = a_ref.update_pair(
                matches[i][mask0[i]], gt[i][mask0[i]],
                kpts0[i][mask0[i]], kpts1[i][mask1[i]], T_gt[i])
            s_g, mm_g, pm_g = got[i]
            assert s_g == s_r
            if pm_r is not None and not np.isnan(pm_r["rot_error"]):
                assert fmt.format(**pm_g) == fmt.format(**pm_r), (trial, i)


def test_registration_batch_metrics_matches_per_pair():
    """registration_batch_metrics == per-pair matching_metrics
    (registration protocol) + pose_metrics on compacted arrays, incl. the
    empty-match nan divergence."""
    from mdgat_tpu.eval import (matching_metrics, pose_metrics,
                                registration_batch_metrics)

    rng = np.random.default_rng(47)
    matches, gt, kpts0, kpts1, mask0, mask1, T_gt = \
        _random_padded_batch(rng)
    # plant an empty-match pair
    matches[1][:] = -1
    b = matches.shape[0]

    got = registration_batch_metrics(matches, gt, kpts0, kpts1,
                                     mask0, mask1, T_gt)
    saw_empty = False
    for i in range(b):
        m = matches[i][mask0[i]]
        g = gt[i][mask0[i]]
        k0 = kpts0[i][mask0[i]]
        k1 = kpts1[i][mask1[i]]
        mm_r = matching_metrics(m, g)           # registration protocol
        mm_g, rte, rre = got[i]
        for k in mm_r:
            assert mm_g[k] == pytest.approx(mm_r[k], rel=0, abs=0,
                                            nan_ok=True), (i, k)
        valid = m > -1
        if valid.sum() == 0 or mm_r["banned"]:
            # banned pairs are skipped by the per-pair protocol before the
            # fit (test_registration_metric.py:230-234), so the batched
            # path no longer fits them (nan) — same for empty-match pairs
            assert np.isnan(rte) and np.isnan(rre)
            saw_empty = saw_empty or valid.sum() == 0
            continue
        pm = pose_metrics(k0[valid], k1[m[valid]], T_gt[i])
        assert rte == pytest.approx(pm["trans_error"], rel=1e-9,
                                    nan_ok=True)
        assert rre == pytest.approx(pm["rot_error"], rel=1e-9, nan_ok=True)
    assert saw_empty
