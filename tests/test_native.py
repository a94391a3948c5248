"""Native loader tests: parity with the Python path on synthetic bins."""

import os

import numpy as np
import pytest

from mdgat_tpu.data.kitti import read_keypoint_bin
from mdgat_tpu.data.pipeline import duplicate_pad
from mdgat_tpu.data.synthetic import make_synthetic_pair, pair_to_bin_rows
from mdgat_tpu.native import NativeLoader, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ toolchain unavailable")


@pytest.fixture(scope="module")
def bin_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("bins")
    rng = np.random.default_rng(0)
    paths = []
    for i, n in enumerate([50, 200, 300]):
        p = make_synthetic_pair(rng, n_points=n)
        # plant some low scores to exercise the filter
        p["score0"][::7] = 3.0
        rows = pair_to_bin_rows(p["kp0"], p["score0"], p["desc0"])
        path = str(d / f"{i:06d}.bin")
        rows.tofile(path)
        paths.append(path)
    return paths


def _python_path(path, max_kpts, ensure, score_min):
    kp, score, desc = read_keypoint_bin(path)
    if ensure:
        keep = score > score_min
        kp, score, desc = kp[keep], score[keep], desc[keep]
        if max_kpts < len(kp):
            kp, score, desc = kp[:max_kpts], score[:max_kpts], desc[:max_kpts]
        else:
            kp, score, desc = duplicate_pad(kp, score, desc, max_kpts)
        return kp, score, desc, max_kpts
    n = min(len(kp), max_kpts)
    out = [np.zeros((max_kpts, 3), np.float32),
           np.zeros((max_kpts,), np.float32),
           np.zeros((max_kpts, 33), np.float32)]
    out[0][:n], out[1][:n], out[2][:n] = kp[:n], score[:n], desc[:n]
    return out[0], out[1], out[2], n


@pytest.mark.parametrize("ensure", [True, False])
@pytest.mark.parametrize("max_kpts", [128, 256])
def test_native_matches_python(bin_files, ensure, max_kpts):
    loader = NativeLoader(max_kpts, ensure, 10.0, n_threads=3)
    kp, score, desc, counts = loader.load(bin_files)
    for i, path in enumerate(bin_files):
        rkp, rsc, rde, rn = _python_path(path, max_kpts, ensure, 10.0)
        assert counts[i] == rn
        np.testing.assert_array_equal(kp[i], rkp.astype(np.float32))
        np.testing.assert_array_equal(score[i], rsc.astype(np.float32))
        np.testing.assert_array_equal(desc[i], rde.astype(np.float32))


def test_native_error_on_missing_file(bin_files):
    loader = NativeLoader(64, True)
    with pytest.raises(IOError):
        loader.load([bin_files[0], "/nonexistent/xx.bin"])


def test_native_all_filtered_frame_zero_fills(tmp_path):
    """Every row below the score filter -> zero-fill + count 0 (the
    Python path's empty-frame contract, ``pipeline.py:57-72``), NOT an
    error; -1/IOError stays reserved for genuine read failures."""
    rng = np.random.default_rng(1)
    p = make_synthetic_pair(rng, n_points=40)
    p["score0"][:] = 1.0  # all below score_min=10
    rows = pair_to_bin_rows(p["kp0"], p["score0"], p["desc0"])
    path = str(tmp_path / "000000.bin")
    rows.tofile(path)
    loader = NativeLoader(64, True, 10.0)
    kp, score, desc, counts = loader.load([path])
    assert counts[0] == 0
    assert not kp.any() and not score.any() and not desc.any()


def test_rebuild_from_source(tmp_path, monkeypatch):
    """The lazy g++ build must recreate the .so from loader.cc (the build
    artifact is intentionally not in git). Builds into a tmp path with
    the module state patched so the real .so and loader singleton are
    untouched — a failed rebuild can't leave the suite .so-less or make
    test ordering matter."""
    import mdgat_tpu.native.loader as L
    monkeypatch.setattr(L, "_LIB", str(tmp_path / "libmdgat_loader.so"))
    monkeypatch.setattr(L, "_lib", None)
    monkeypatch.setattr(L, "_build_failed", False)
    lib = L._get_lib()
    assert lib is not None
    assert os.path.exists(L._LIB)
