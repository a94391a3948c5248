"""High-level ``mdgat_tpu.api.Matcher`` tests: checkpoint loading,
bucket padding/trimming parity with the raw model, and the register()
pose-fit glue."""

import numpy as np
import jax
import pytest

from mdgat_tpu.api import Matcher
from mdgat_tpu.core.checkpoint import save_checkpoint
from mdgat_tpu.data.synthetic import make_synthetic_pair
from mdgat_tpu.models import MDGAT
from mdgat_tpu.train import create_train_state

from test_model import tiny_cfg

TINY = dict(L=2, k=(8, None, 4, None), descriptor_dim=32,
            keypoint_encoder=(16, 32), descriptor_encoder=(16,),
            sinkhorn_iterations=8, compute_dtype="float64",
            param_dtype="float64")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, _ = create_train_state(model, jax.random.PRNGKey(2), 1e-4)
    path = str(tmp_path_factory.mktemp("ck") / "m.npz")
    save_checkpoint(path, jax.device_get(state.params),
                    jax.device_get(state.bn_state), epoch=1, lr=1e-4,
                    loss=0.5)
    return path, cfg, model, state


def _pair(n=50, seed=0):
    rng = np.random.default_rng(seed)
    p = make_synthetic_pair(rng, n_points=n, overlap=0.9, jitter=0.01,
                            desc_noise=0.01)
    return p


def test_match_equals_raw_model(tiny_ckpt):
    """Matcher.match == the raw jitted eval step on the same manually
    padded batch, trimmed to the true lengths."""
    path, cfg, model, state = tiny_ckpt
    m = Matcher(path, **TINY)
    p = _pair(50)
    out = m.match(p["kp0"], p["desc0"], p["kp1"], p["desc1"],
                  p["score0"], p["score1"])
    assert out["matches0"].shape == (50,)
    assert out["matches1"].shape == (50,)
    assert out["matching_scores0"].dtype == np.float32

    # raw reference computation: zero-pad to the 128 bucket + masks
    k0 = np.zeros((128, 3)); k0[:50] = p["kp0"]
    k1 = np.zeros((128, 3)); k1[:50] = p["kp1"]
    d0 = np.zeros((128, 33)); d1 = np.zeros((128, 33))
    d0[:50] = p["desc0"] / np.linalg.norm(p["desc0"], axis=1,
                                          keepdims=True)
    d1[:50] = p["desc1"] / np.linalg.norm(p["desc1"], axis=1,
                                          keepdims=True)
    s0 = np.zeros(128); s0[:50] = p["score0"]
    s1 = np.zeros(128); s1[:50] = p["score1"]
    msk = np.arange(128) < 50
    batch = {"keypoints0": k0[None], "keypoints1": k1[None],
             "descriptors0": d0[None], "descriptors1": d1[None],
             "scores0": s0[None], "scores1": s1[None],
             "mask0": msk[None], "mask1": msk[None]}
    raw, _ = model.apply(state.params, state.bn_state, batch, train=False)
    np.testing.assert_array_equal(out["matches0"],
                                  np.asarray(raw["matches0"])[0, :50])
    np.testing.assert_allclose(
        out["matching_scores0"],
        np.asarray(raw["matching_scores0"], np.float32)[0, :50])


def test_match_normalize_and_default_scores(tiny_ckpt):
    path, *_ = tiny_ckpt
    m = Matcher(path, **TINY)
    p = _pair(40, seed=3)
    a = m.match(p["kp0"], p["desc0"], p["kp1"], p["desc1"])  # scores=None
    b = m.match(p["kp0"], p["desc0"], p["kp1"], p["desc1"],
                normalize=False)
    assert a["matches0"].shape == b["matches0"].shape == (40,)
    # normalization must change the raw transport scores (desc magnitudes
    # differ) — compare the score vectors, not the argmax decisions
    assert not np.allclose(a["matching_scores0"], b["matching_scores0"])


def test_register_pose_fit(tiny_ckpt, monkeypatch):
    """register() recovers the planted rigid transform exactly when the
    matcher returns the true correspondences (the pose-fit glue is what
    is under test; match quality is the model tests' job)."""
    path, *_ = tiny_ckpt
    m = Matcher(path, **TINY)
    p = _pair(60, seed=5)
    # ground-truth correspondences from the planted transform (points are
    # independently permuted in the generator): kp1 moved into cloud 0's
    # frame, then nearest-neighbor under a tight gate
    moved = p["kp1"] @ p["T_gt"][:3, :3].T + p["T_gt"][:3, 3]
    d = np.linalg.norm(p["kp0"][:, None] - moved[None, :], axis=-1)
    matches0 = np.where(d.min(axis=1) < 0.5,
                        d.argmin(axis=1), -1).astype(np.int32)
    n_true = int((matches0 >= 0).sum())
    assert n_true >= 40  # overlap 0.9 of 60
    perfect = {
        "matches0": matches0,
        "matches1": np.full(60, -1, np.int32),
        "matching_scores0": np.ones(60, np.float32),
        "matching_scores1": np.zeros(60, np.float32),
    }
    monkeypatch.setattr(Matcher, "match",
                        lambda self, *a, **kw: dict(perfect))
    out = m.register(p["kp0"], p["desc0"], p["kp1"], p["desc1"])
    assert out["T"] is not None and out["n_matches"] == n_true
    # T maps cloud-1 into cloud-0's frame; the planted transform does too
    err = out["T"] @ np.linalg.inv(p["T_gt"])
    assert np.linalg.norm(err[:3, 3]) < 0.1
    assert abs(np.trace(err[:3, :3]) - 3) < 1e-2
    assert out["inliers"] >= n_true - 2


def test_register_too_few_matches(tiny_ckpt, monkeypatch):
    path, *_ = tiny_ckpt
    m = Matcher(path, **TINY)
    p = _pair(30, seed=7)
    empty = {
        "matches0": np.full(30, -1, np.int32),
        "matches1": np.full(30, -1, np.int32),
        "matching_scores0": np.zeros(30, np.float32),
        "matching_scores1": np.zeros(30, np.float32),
    }
    monkeypatch.setattr(Matcher, "match",
                        lambda self, *a, **kw: dict(empty))
    out = m.register(p["kp0"], p["desc0"], p["kp1"], p["desc1"])
    assert out["T"] is None and out["inliers"] == 0


def test_requires_checkpoint_or_params():
    with pytest.raises(ValueError, match="BOTH params and bn_state"):
        Matcher()
    with pytest.raises(ValueError, match="BOTH params and bn_state"):
        Matcher(params={})  # bn_state missing


def test_match_batch_equals_per_pair(tiny_ckpt):
    """match_batch over mixed-size pairs == per-pair match() results
    bit-exactly (the padded==unpadded mask contract extends to the
    shared batch bucket), including pairs that land in different
    128-buckets before re-padding."""
    path, *_ = tiny_ckpt
    m = Matcher(path, **TINY)
    pa, pb, pc = _pair(40, seed=1), _pair(150, seed=2), _pair(90, seed=3)
    pairs = [dict(kp0=p["kp0"], desc0=p["desc0"],
                  kp1=p["kp1"], desc1=p["desc1"],
                  score0=p["score0"], score1=p["score1"])
             for p in (pa, pb, pc)]
    batched = m.match_batch(pairs)
    assert m.match_batch([]) == []
    # any iterable is accepted, including (empty) generators
    assert m.match_batch(p for p in []) == []
    gen = m.match_batch(iter(pairs[:1]))
    assert len(gen) == 1
    assert len(batched) == 3
    for p, got in zip(pairs, batched):
        one = m.match(p["kp0"], p["desc0"], p["kp1"], p["desc1"],
                      p["score0"], p["score1"])
        for k in one:
            np.testing.assert_array_equal(got[k], one[k], err_msg=k)
            assert got[k].base is None, f"{k} is a view into the batch"


def test_match_batch_on_device_mesh(tiny_ckpt):
    """Matcher(data_parallel=4, seq_parallel=2, shard_map=True) serves
    batches through the eval CLIs' mesh runtime: results element-wise
    identical to the single-device Matcher, including a pair count NOT
    divisible by the data axis (exercises the duplicate-row fill) and
    mixed per-side buckets."""
    path, *_ = tiny_ckpt
    rng = np.random.default_rng(31)

    def mk(n):
        return dict(
            kp0=rng.normal(size=(n, 3)) * 10,
            desc0=rng.normal(size=(n, 33)),
            score0=rng.uniform(10, 30, (n,)),
            kp1=rng.normal(size=(n + 40, 3)) * 10,
            desc1=rng.normal(size=(n + 40, 33)),
            score1=rng.uniform(10, 30, (n + 40,)),
        )

    pairs = [mk(50), mk(130), mk(64)]  # 3 % 4 != 0 -> one fill row
    single = Matcher(path, **TINY)
    meshed = Matcher(path, **TINY, data_parallel=4, seq_parallel=2,
                     shard_map=True)
    assert meshed._shard_inputs is not None, "mesh runtime not engaged"
    ref = single.match_batch(pairs)
    got = meshed.match_batch(pairs)
    assert len(got) == len(ref) == 3
    for r, g in zip(ref, got):
        for k in r:
            np.testing.assert_allclose(g[k], r[k], rtol=1e-9, atol=1e-12,
                                       err_msg=k)


def test_register_batch_equals_per_pair(tiny_ckpt):
    """register_batch == per-pair register() exactly (same matches via
    the batched dispatch, same host SVD glue), incl. T/None and inlier
    counts."""
    path, *_ = tiny_ckpt
    m = Matcher(path, **TINY)
    ps = [_pair(40, seed=11), _pair(90, seed=12)]
    pairs = [dict(kp0=p["kp0"], desc0=p["desc0"], kp1=p["kp1"],
                  desc1=p["desc1"], score0=p["score0"], score1=p["score1"])
             for p in ps]
    batched = m.register_batch(pairs)
    assert len(batched) == 2
    for p, got in zip(pairs, batched):
        one = m.register(**p)
        assert got["n_matches"] == one["n_matches"]
        assert got["inliers"] == one["inliers"]
        if one["T"] is None:
            assert got["T"] is None
        else:
            np.testing.assert_array_equal(got["T"], one["T"])
        for k in ("matches0", "matches1", "matching_scores0",
                  "matching_scores1"):
            np.testing.assert_array_equal(got[k], one[k], err_msg=k)
