"""Headless tests for the match-visualization geometry assembly
(``eval/visualize.py``; reference ``utils/utils_test.py:149-296``).

The Open3D rendering tail can't run on this headless host, but the panel
layout — line endpoints, per-line colors, sphere placement — is pure
numpy and is what encodes the reference's three-panel scheme."""

import numpy as np
import pytest

from mdgat_tpu.eval.visualize import assemble_match_panels


def _fixture():
    kpts0 = np.arange(12, dtype=np.float64).reshape(4, 3)
    kpts1 = np.arange(15, dtype=np.float64).reshape(5, 3) + 100.0
    matches = np.array([2, -1, 4, 0])
    gt0 = np.array([2, -1, -1, 0])
    valid = matches > -1
    mkpts0 = kpts0[valid]
    mkpts1 = kpts1[matches[valid]]
    gt_valid = gt0 > -1
    mk0_gt = kpts0[gt_valid]
    mk1_gt = kpts1[gt0[gt_valid]]
    tp = valid & (matches == gt0)
    fp = valid & (gt0 == -1)                    # test.py:280 definition
    mconf = np.array([0.0, 0.5, 1.0])
    return dict(kpts0=kpts0, kpts1=kpts1, matches=matches, gt0=gt0,
                mkpts0=mkpts0, mkpts1=mkpts1, mk0_gt=mk0_gt, mk1_gt=mk1_gt,
                tp=tp, fp=fp, mconf=mconf)


def _panels(f, offset=50.0, pc0=(), pc1=()):
    return assemble_match_panels(
        pc0, f["kpts0"], f["kpts1"], f["mkpts0"], f["mkpts1"],
        f["mk0_gt"], f["mk1_gt"], f["matches"], f["mconf"],
        f["tp"], f["fp"], offset=offset, pc1=pc1)


def test_panel_counts_and_colors():
    f = _fixture()
    p1, p2, p3 = _panels(f)

    # every panel shows all keypoints as spheres
    for p in (p1, p2, p3):
        assert p["spheres0"].shape == (4, 3)
        assert p["spheres1"].shape == (5, 3)
        assert p["cloud"] is None

    # panel 1: one line per predicted match, confidence-shaded blue->red
    assert p1["segments"].shape == (3, 2, 3)
    np.testing.assert_allclose(
        p1["colors"], [[0.0, 0.2, 1.0], [0.5, 0.2, 0.5], [1.0, 0.2, 0.0]])

    # panel 2: one line per GT match, all green
    assert p2["segments"].shape == (2, 2, 3)
    np.testing.assert_array_equal(p2["colors"],
                                  [[0, 1, 0], [0, 1, 0]])

    # panel 3: every valid prediction; TP green, non-TP red
    assert p3["segments"].shape == (3, 2, 3)
    np.testing.assert_array_equal(
        p3["colors"], [[0, 1, 0], [1, 0, 0], [0, 1, 0]])


def test_panel_offsets_and_endpoints():
    f = _fixture()
    off = 50.0
    p1, p2, p3 = _panels(f, offset=off)

    # cloud 1 sits offset/2 above cloud 0; panels stack at 2*offset
    np.testing.assert_allclose(p1["spheres0"], f["kpts0"])
    np.testing.assert_allclose(p1["spheres1"],
                               f["kpts1"] + [0.0, off / 2, 0.0])
    np.testing.assert_allclose(p2["spheres0"],
                               f["kpts0"] + [0.0, 2 * off, 0.0])
    np.testing.assert_allclose(p3["spheres1"],
                               f["kpts1"] + [0.0, 4 * off + off / 2, 0.0])

    # line endpoints connect the matched pair across the two clouds
    np.testing.assert_allclose(p1["segments"][:, 0], f["mkpts0"])
    np.testing.assert_allclose(p1["segments"][:, 1],
                               f["mkpts1"] + [0.0, off / 2, 0.0])
    valid = f["matches"] > -1
    np.testing.assert_allclose(
        p3["segments"][:, 1],
        f["kpts1"][f["matches"][valid]] + [0.0, 4 * off + off / 2, 0.0])


def test_no_matches_edge():
    """Zero predicted/GT matches: empty segment arrays, no crash (the
    reference hits this on undertrained models)."""
    f = _fixture()
    f["matches"] = np.full(4, -1)
    f["mkpts0"] = np.zeros((0, 3))
    f["mkpts1"] = np.zeros((0, 3))
    f["mk0_gt"] = np.zeros((0, 3))
    f["mk1_gt"] = np.zeros((0, 3))
    f["tp"] = np.zeros(4, bool)
    f["fp"] = np.zeros(4, bool)
    f["mconf"] = np.zeros((0,))
    p1, p2, p3 = _panels(f)
    for p in (p1, p2, p3):
        assert p["segments"].shape == (0, 2, 3)
        assert p["colors"].shape == (0, 3)


def test_background_cloud_offsets():
    f = _fixture()
    pc0 = np.concatenate([np.zeros((7, 3)), np.ones((7, 1))], axis=1)
    p1, p2, _ = _panels(f, pc0=pc0)
    assert p1["cloud"].shape == (7, 3)
    np.testing.assert_allclose(p2["cloud"][:, 1], 100.0)  # + 2*offset


def test_both_clouds_with_ground_cut():
    """Both raw scans render per panel: cloud1 sits offset/2 above cloud0
    like the keypoints, and both get the reference's z > -5 ground cut
    (``utils/utils_test.py:151-152``; clouds forwarded per
    ``test.py:322``)."""
    f = _fixture()
    pc0 = np.zeros((7, 3))
    pc0[:3, 2] = -10.0                        # cut by the ground filter
    pc1 = np.full((5, 3), 2.0)
    p1, p2, _ = _panels(f, pc0=pc0, pc1=pc1)
    assert p1["cloud0"].shape == (4, 3)       # 3 of 7 ground-cut
    assert p1["cloud1"].shape == (5, 3)
    np.testing.assert_allclose(p1["cloud1"][:, 1], 2.0 + 25.0)  # +off/2
    np.testing.assert_allclose(p2["cloud1"][:, 1], 2.0 + 100.0 + 25.0)
    # back-compat alias
    np.testing.assert_allclose(p1["cloud"], p1["cloud0"])
    # keypoints-only callers still get no clouds
    pk, _, _ = _panels(f)
    assert pk["cloud0"] is None and pk["cloud1"] is None


def test_open3d_smoke():
    """Offscreen smoke when open3d is importable (optional dep)."""
    o3d = pytest.importorskip("open3d")
    del o3d  # presence is the test precondition
    from mdgat_tpu.eval.visualize import _cylinder_lines, _require_o3d
    f = _fixture()
    panels = _panels(f)
    meshes = _cylinder_lines(_require_o3d(), panels[0]["segments"],
                             panels[0]["colors"], radius=0.2)
    assert len(meshes) == panels[0]["segments"].shape[0]
