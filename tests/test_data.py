"""Data pipeline tests: synthetic KITTI layout through the real reader."""

import numpy as np
import jax.numpy as jnp
import pytest

from mdgat_tpu.core.config import train_defaults
from mdgat_tpu.core.config import test_defaults as eval_defaults
from mdgat_tpu.data import (
    SparseDataset, prepare_batch_fn, write_synthetic_kitti,
    make_synthetic_pair,
)
from mdgat_tpu.data.pipeline import duplicate_pad

import golden


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    kp_dir = write_synthetic_kitti(str(root),
                                   seqs=(0, 2, 3, 4, 5, 6, 7, 9, 10),
                                   frames_per_seq=5, pairs_per_seq=4,
                                   n_points=150, seed=1)
    return str(root), kp_dir


def _cfg(root, kp_dir, **kw):
    return train_defaults(train_path=root, keypoints_path=kp_dir,
                          txt_path=f"{root}/preprocess-random-full",
                          max_keypoints=128, **kw)


def test_dataset_reads_synthetic_layout(kitti_root):
    root, kp_dir = kitti_root
    ds = SparseDataset(_cfg(root, kp_dir), "train")
    assert len(ds) == 4 * 7  # pairs_per_seq for the 7 train seqs
    pair = ds.get_pair(0)
    assert pair["keypoints0"].shape == (128, 3)
    assert pair["descriptors0"].shape == (128, 33)
    assert pair["mask0"].all()  # ensure_kpts_num -> all slots valid
    assert pair["T_gt"].shape == (4, 4)


def test_prepare_batch_generates_gt_matches(kitti_root):
    root, kp_dir = kitti_root
    cfg = _cfg(root, kp_dir, compute_dtype="float64", param_dtype="float64")
    ds = SparseDataset(cfg, "train")
    batch = next(ds.batches(batch_size=2))
    prep = prepare_batch_fn(cfg.threshold, cfg.mutual_check,
                            compute_dtype="float64", gt_dtype="float64")
    out = prep(batch)
    gt0 = np.asarray(out["gt_matches0"])
    # planted overlaps must be recovered: a healthy fraction matched
    assert (gt0 >= 0).mean() > 0.3
    # parity with the reference-exact numpy path, per pair
    for b in range(2):
        ref0, ref1, rep = golden.np_gt_correspondences(
            batch["kpts0_world"][b], batch["kpts1_world"][b], cfg.threshold)
        np.testing.assert_array_equal(gt0[b], ref0)
        np.testing.assert_array_equal(np.asarray(out["gt_matches1"][b]), ref1)
        assert int(out["rep"][b]) == rep


def test_f32_transfer_world_kpts_match_f64_cast(kitti_root):
    """Non-f64 modes still compute world kpts in f64 on host and ship f32
    — bit-identical to the f64-ship + device-side f32 cast, so the GT
    generator sees the same values either way (0.5 m boundary pairs must
    not shift; on-device f32 pose matmuls were measured to move them by
    up to ~0.1 m at KITTI world scale)."""
    root, kp_dir = kitti_root
    cfg64 = _cfg(root, kp_dir, compute_dtype="float64",
                 param_dtype="float64")
    cfg32 = _cfg(root, kp_dir)
    b64 = next(SparseDataset(cfg64, "train").batches(batch_size=2))
    b32 = next(SparseDataset(cfg32, "train").batches(batch_size=2))
    assert b32["kpts0_world"].dtype == np.float32
    np.testing.assert_array_equal(
        b64["kpts0_world"].astype(np.float32), b32["kpts0_world"])
    out64 = prepare_batch_fn(cfg64.threshold, False, "float64",
                             "float32")(b64)
    out32 = prepare_batch_fn(cfg32.threshold, False, "float32",
                             "float32")(b32)
    np.testing.assert_array_equal(np.asarray(out64["gt_matches0"]),
                                  np.asarray(out32["gt_matches0"]))


def test_prepare_batch_normalizes_descriptors(kitti_root):
    # float64 mode ships lossless host arrays (the parity path)
    root, kp_dir = kitti_root
    cfg = _cfg(root, kp_dir, compute_dtype="float64",
               param_dtype="float64")
    ds = SparseDataset(cfg, "train")
    batch = next(ds.batches(batch_size=2))
    assert batch["descriptors0"].dtype == np.float64
    out = prepare_batch_fn(cfg.threshold, False, "float64", "float64")(batch)
    norms = np.linalg.norm(np.asarray(out["descriptors0"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-9)


def test_prepare_batch_float16_descriptor_transfer(kitti_root):
    # opt-in float16 descriptor shipping (tunnel-bandwidth bound):
    # normalization still runs in float32 and stays ~f16-exact
    root, kp_dir = kitti_root
    cfg = _cfg(root, kp_dir)
    ds = SparseDataset(cfg, "train")
    ds.desc_dtype = np.float16
    batch = next(ds.batches(batch_size=2))
    assert batch["descriptors0"].dtype == np.float16
    out = prepare_batch_fn(cfg.threshold, False, "float32", "float32")(batch)
    norms = np.linalg.norm(np.asarray(out["descriptors0"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_prepare_batch_bfloat16_descriptor_transfer(kitti_root):
    # --ship_bf16 (eval CLIs): bf16 descriptor shipping for slow links.
    # prepare upcasts to f32 before normalization; outputs stay close to
    # the f32-shipped pipeline (bf16 has ~3 decimal digits)
    import ml_dtypes
    root, kp_dir = kitti_root
    cfg = _cfg(root, kp_dir)
    ds = SparseDataset(cfg, "train")
    batch32 = next(ds.batches(batch_size=2))
    ds2 = SparseDataset(cfg, "train")
    ds2.desc_dtype = ml_dtypes.bfloat16
    batch = next(ds2.batches(batch_size=2))
    assert batch["descriptors0"].dtype == ml_dtypes.bfloat16
    prep = prepare_batch_fn(cfg.threshold, False, "float32", "float32")
    out = prep(batch)
    d0 = np.asarray(out["descriptors0"])
    assert d0.dtype == np.float32
    norms = np.linalg.norm(d0, axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    ref = np.asarray(prep(batch32)["descriptors0"])
    np.testing.assert_allclose(d0, ref, atol=2e-2)


def test_variable_n_padding_with_masks(kitti_root):
    root, kp_dir = kitti_root
    cfg = _cfg(root, kp_dir, ensure_kpts_num=False)
    ds = SparseDataset(cfg, "test")
    pair = ds.get_pair(0)
    n_valid = int(pair["mask0"].sum())
    assert n_valid == 150                    # raw count, no filter/truncation
    assert pair["keypoints0"].shape[0] == 256  # next 128-multiple
    assert not pair["mask0"][n_valid:].any()


def test_duplicate_pad_reference_semantics():
    kp = np.arange(15).reshape(5, 3).astype(float)
    sc = np.arange(5).astype(float)
    de = np.arange(10).reshape(5, 2).astype(float)
    kp2, sc2, de2 = duplicate_pad(kp, sc, de, 12)
    assert kp2.shape == (12, 3) and sc2.shape == (12,) and de2.shape == (12, 2)
    # loop semantics: first pass prepends rows 0..4 twice (5->10), second
    # prepends rows 0..1 (10->12): final = [kp[:2], kp, kp]
    np.testing.assert_array_equal(kp2, np.vstack([kp[:2], kp, kp]))


@pytest.mark.parametrize("ensure", [True, False])
def test_native_batches_match_python_batches(kitti_root, ensure):
    root, kp_dir = kitti_root
    cfg = _cfg(root, kp_dir, memory_is_enough=False, ensure_kpts_num=ensure)
    ds = SparseDataset(cfg, "test")
    b_native = next(ds.batches(batch_size=2, use_native=True))
    b_python = next(ds.batches(batch_size=2, use_native=False))
    for k in ("keypoints0", "scores1", "descriptors0", "mask0", "T_gt"):
        np.testing.assert_array_equal(b_native[k], b_python[k], err_msg=k)


def test_pointnet_cloud_path(tmp_path):
    root = str(tmp_path)
    kp_dir = write_synthetic_kitti(root, seqs=(10,), frames_per_seq=3,
                                   pairs_per_seq=2, n_points=64, seed=2,
                                   cloud_points=256)
    cfg = eval_defaults(train_path=root, keypoints_path=kp_dir,
                        txt_path=f"{root}/preprocess-random-full",
                        descriptor="pointnet", max_keypoints=64,
                        ensure_kpts_num=True, memory_is_enough=True)
    ds = SparseDataset(cfg, "test")
    pair = ds.get_pair(0)
    assert pair["cloud0"].shape == (256, 8)
    batch = next(ds.batches(batch_size=2))
    prep = prepare_batch_fn(cfg.threshold, False, "float64", "float64")
    out = prep(batch)
    assert out["cloud0"].shape == (2, 256, 8)


def test_synthetic_pair_has_overlap():
    rng = np.random.default_rng(0)
    p = make_synthetic_pair(rng, n_points=100, overlap=0.6)
    # T_gt maps kp1 into kp0 frame: transported shared points must have
    # close neighbors in kp0
    kp1h = p["kp1"] @ p["T_gt"][:3, :3].T + p["T_gt"][:3, 3]
    d = np.linalg.norm(kp1h[:, None] - p["kp0"][None], axis=-1)
    assert (d.min(axis=1) < 0.5).sum() >= 50


def test_variable_n_fallback_loads_each_pair_once(kitti_root, monkeypatch):
    """The variable-N Python fallback sizes the bucket from raw row
    counts (file sizes / cached lengths) BEFORE loading — each frame is
    read exactly once per batch (was twice before round 3)."""
    root, kp_dir = kitti_root
    cfg = _cfg(root, kp_dir, ensure_kpts_num=False)
    ds = SparseDataset(cfg, "test")
    calls = []
    orig = SparseDataset._load_frame

    def counting(self, s, idx):
        calls.append((s, idx))
        return orig(self, s, idx)

    monkeypatch.setattr(SparseDataset, "_load_frame", counting)
    next(ds.batches(batch_size=2, use_native=False))
    assert len(calls) == 4  # 2 pairs x 2 frames, no second pass


def test_empty_frame_parity_native_vs_python(tmp_path):
    """A frame whose keypoints ALL fail the score filter must flow through
    both loader paths identically: zero-filled slots, all-false masks, no
    crash (VERDICT r2 #4; reference boundary: load_data.py:191-211)."""
    root = str(tmp_path)
    kp_dir = write_synthetic_kitti(root, seqs=(10,), frames_per_seq=3,
                                   pairs_per_seq=2, n_points=60, seed=3)
    import glob
    import os
    for victim in sorted(glob.glob(os.path.join(kp_dir, "10", "*.bin"))):
        rows = np.fromfile(victim, dtype=np.float32).reshape(-1, 37)
        rows[:, 3] = 1.0  # every score below score_min=10 -> frame empties
        rows.tofile(victim)

    cfg = train_defaults(train_path=root, keypoints_path=kp_dir,
                         txt_path=f"{root}/preprocess-random-full",
                         max_keypoints=64, memory_is_enough=False,
                         ensure_kpts_num=True)
    ds = SparseDataset(cfg, "test")
    batches_n = list(ds.batches(batch_size=2, use_native=True,
                                drop_last=False))
    batches_p = list(ds.batches(batch_size=2, use_native=False,
                                drop_last=False))
    saw_empty = False
    for bn, bp in zip(batches_n, batches_p):
        for k in ("keypoints0", "keypoints1", "scores0", "descriptors1",
                  "mask0", "mask1"):
            np.testing.assert_array_equal(bn[k], bp[k], err_msg=k)
        for side in ("0", "1"):
            for b in range(bn[f"mask{side}"].shape[0]):
                m = bn[f"mask{side}"][b]
                if not m.any():
                    saw_empty = True
                    assert not bn[f"keypoints{side}"][b].any()
    assert saw_empty  # the planted frame actually exercised the edge


# ---------------------------------------------------------------------------
# train-loop batch prefetcher (data/prefetch.py)

def _batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert sorted(x) == sorted(y)
        for k in x:
            if isinstance(x[k], list):
                assert x[k] == y[k]
            else:
                np.testing.assert_array_equal(x[k], y[k])


def test_prefetcher_order_parity(kitti_root):
    from mdgat_tpu.data import BatchPrefetcher

    root, kp_dir = kitti_root
    ds = SparseDataset(_cfg(root, kp_dir), "train")
    direct = list(ds.batches(4, shuffle=True, seed=7))
    pre = list(BatchPrefetcher(
        lambda: ds.batches(4, shuffle=True, seed=7), depth=2))
    _batches_equal(direct, pre)


def test_prefetcher_reiterable(kitti_root):
    from mdgat_tpu.data import BatchPrefetcher

    root, kp_dir = kitti_root
    ds = SparseDataset(_cfg(root, kp_dir), "train")
    pf = BatchPrefetcher(lambda: ds.batches(4, shuffle=True, seed=3),
                         depth=1)
    _batches_equal(list(pf), list(pf))


def test_prefetcher_propagates_producer_exception():
    from mdgat_tpu.data import BatchPrefetcher

    def boom():
        yield {"i": np.array(0)}
        yield {"i": np.array(1)}
        raise IOError("disk died at pair 2")

    seen = []
    with pytest.raises(IOError, match="disk died"):
        for item in BatchPrefetcher(boom, depth=2):
            seen.append(int(item["i"]))
    assert seen == [0, 1]  # everything before the failure was delivered


def test_prefetcher_abandoned_iterator_stops_producer():
    import threading
    import time

    from mdgat_tpu.data import BatchPrefetcher

    produced = []

    def slow():
        for i in range(100):
            produced.append(i)
            yield i

    start = threading.active_count()
    it = iter(BatchPrefetcher(slow, depth=1))
    assert next(it) == 0
    it.close()  # abandon mid-stream: generator finally sets the stop flag
    deadline = time.time() + 5.0
    while threading.active_count() > start and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= start
    assert len(produced) < 100  # producer stopped early, didn't drain


def test_prefetch_batches_depth_zero_is_serial():
    from mdgat_tpu.data import prefetch_batches

    calls = []

    def make():
        calls.append(1)
        return iter([1, 2, 3])

    it = prefetch_batches(make, depth=0)
    assert list(it) == [1, 2, 3]
    assert list(it) == [1, 2, 3]  # re-iterable like the threaded wrapper
    assert len(calls) == 2


def test_prefetcher_rejects_bad_depth():
    from mdgat_tpu.data import BatchPrefetcher

    with pytest.raises(ValueError):
        BatchPrefetcher(lambda: iter([]), depth=0)
