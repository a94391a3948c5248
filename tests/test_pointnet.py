"""PointNet op tests vs straightforward numpy goldens + encoder smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgat_tpu.ops.pointnet import (
    ball_query, farthest_point_sample, gather_zero_sentinel,
    set_kpts_msg_apply,
)
from mdgat_tpu.models.pointnet_encoder import (
    pointnet_encoder_init, pointnet_encoder_apply,
)

RNG = np.random.default_rng(3)


def np_ball_query(xyz, centers, radius, nsample):
    """Reference semantics (pointnet_util.py:101-121) in plain numpy."""
    b, n, _ = xyz.shape
    s = centers.shape[1]
    out = np.zeros((b, s, nsample), np.int32)
    for bi in range(b):
        for si in range(s):
            d2 = ((xyz[bi] - centers[bi, si]) ** 2).sum(-1)
            keys = np.where(d2 <= radius ** 2, np.arange(n), n)
            keys = np.sort(keys)[:nsample]
            first = keys[0]
            keys = np.where(keys == n, first, keys)
            out[bi, si] = keys
    return out


def test_ball_query_matches_reference_semantics():
    xyz = RNG.normal(size=(2, 60, 3)) * 3
    centers = RNG.normal(size=(2, 7, 3)) * 3
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(centers),
                                2.0, 8))
    ref = np_ball_query(xyz, centers, 2.0, 8)
    np.testing.assert_array_equal(got, ref)


def test_ball_query_empty_ball_keeps_sentinel():
    xyz = np.zeros((1, 10, 3))
    centers = np.full((1, 1, 3), 100.0)     # far away: empty ball
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(centers),
                                1.0, 4))
    assert (got == 10).all()                # N sentinel survives backfill


def test_gather_zero_sentinel():
    pts = RNG.normal(size=(1, 5, 4))
    idx = np.array([[[0, 4, 5, 5]]], np.int32)   # 5 == N -> zeros
    g = np.asarray(gather_zero_sentinel(jnp.asarray(pts), jnp.asarray(idx)))
    np.testing.assert_allclose(g[0, 0, 0], pts[0, 0])
    np.testing.assert_allclose(g[0, 0, 1], pts[0, 4])
    assert (g[0, 0, 2:] == 0).all()


def test_fps_deterministic_and_spread():
    xyz = RNG.normal(size=(2, 100, 3)) * 10
    idx = np.asarray(farthest_point_sample(jnp.asarray(xyz), 16))
    # distinct samples
    assert all(len(set(row.tolist())) == 16 for row in idx)
    # numpy golden with same start
    for b in range(2):
        dist = np.full(100, 1e10)
        far = 0
        sel = []
        for i in range(16):
            sel.append(far)
            d = ((xyz[b] - xyz[b, far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
        np.testing.assert_array_equal(idx[b], sel)


def test_set_abstraction_msg_and_feature_propagation():
    from mdgat_tpu.ops.pointnet import (set_abstraction_msg_apply,
                                        feature_propagation_apply)
    from mdgat_tpu.ops.mlp import mlp_init, mlp_state_init
    key = jax.random.PRNGKey(0)
    xyz = jnp.asarray(RNG.normal(size=(2, 64, 3)) * 3)
    feats = jnp.asarray(RNG.normal(size=(2, 64, 6)))
    ps, ss = [], []
    for i, mlp in enumerate([(16, 24), (16, 32)]):
        ch = [6 + 3] + list(mlp)
        ps.append(mlp_init(jax.random.fold_in(key, i), ch,
                           dtype=jnp.float64, bn_on_last=True))
        ss.append(mlp_state_init(ch, dtype=jnp.float64, bn_on_last=True))
    centers, out, _ = set_abstraction_msg_apply(
        ps, ss, xyz, feats, 16, [1.0, 2.0], [8, 16], train=True)
    assert centers.shape == (2, 16, 3)
    assert out.shape == (2, 16, 24 + 32)
    assert np.isfinite(np.asarray(out)).all()

    fp_ch = [6 + 56, 32]
    fp_p = mlp_init(key, fp_ch, dtype=jnp.float64, bn_on_last=True)
    fp_s = mlp_state_init(fp_ch, dtype=jnp.float64, bn_on_last=True)
    up, _ = feature_propagation_apply(fp_p, fp_s, xyz, centers, feats, out,
                                      train=True)
    assert up.shape == (2, 64, 32)
    assert np.isfinite(np.asarray(up)).all()


@pytest.mark.parametrize("msg", [False, True])
def test_pointnet_encoder_forward(msg):
    key = jax.random.PRNGKey(0)
    params, state = pointnet_encoder_init(key, 32, (16, 32), msg=msg,
                                          dtype=jnp.float64)
    cloud = jnp.asarray(RNG.normal(size=(2, 200, 8)) * 5)
    kpts = jnp.asarray(RNG.normal(size=(2, 24, 3)) * 5)
    scores = jnp.asarray(RNG.uniform(10, 20, (2, 24)))
    out, new_state = pointnet_encoder_apply(params, state, cloud, kpts,
                                            scores, msg=msg, train=True)
    assert out.shape == (2, 24, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_mdgat_pointnet_descriptor_path():
    from mdgat_tpu.models import MDGAT
    from test_model import tiny_cfg, tiny_batch
    cfg = tiny_cfg(descriptor="pointnet")
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    batch = tiny_batch(cfg, b=2, n=24, m=24)
    batch["cloud0"] = jnp.asarray(RNG.normal(size=(2, 128, 8)) * 5)
    batch["cloud1"] = jnp.asarray(RNG.normal(size=(2, 128, 8)) * 5)
    out, _ = model.apply(params, state, batch, train=True)
    assert np.isfinite(np.asarray(out["loss"])).all()


@pytest.mark.parametrize("train_step", [1, 2, 3])
def test_staged_training(train_step):
    """3-step staged training for pointnet mode (models/mdgat.py:398-420)."""
    from mdgat_tpu.models import MDGAT
    from test_model import tiny_cfg, tiny_batch
    cfg = tiny_cfg(descriptor="pointnet", train_step=train_step)
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    batch = tiny_batch(cfg, b=1, n=24, m=24)
    batch["cloud0"] = jnp.asarray(RNG.normal(size=(1, 128, 8)) * 5)
    batch["cloud1"] = jnp.asarray(RNG.normal(size=(1, 128, 8)) * 5)

    def loss_fn(p):
        out, _ = model.apply(p, state, batch, train=True)
        return jnp.mean(out["loss"])

    grads = jax.grad(loss_fn)(params)
    penc_norm = float(jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads["penc"])))
    gnn_norm = float(jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads["gnn"])))
    if train_step == 1:       # encoder only: gnn gets no gradient
        assert penc_norm > 0 and gnn_norm == 0
    elif train_step == 2:     # gnn only: encoder detached
        assert penc_norm == 0 and gnn_norm > 0
    else:                     # joint
        assert penc_norm > 0 and gnn_norm > 0
