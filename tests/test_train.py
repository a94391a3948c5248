"""Training tests: loss decrease, BN state updates, sharded data-parallel
and sequence-parallel execution over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from mdgat_tpu.models import MDGAT
from mdgat_tpu.train import create_train_state, make_train_step, make_eval_step
from mdgat_tpu.parallel import make_mesh, shard_batch, replicate

from test_model import tiny_cfg, tiny_batch


def real_gt_batch(cfg, b=4, n=24, seed=0):
    """Batch whose gt_matches come from actual geometry (learnable)."""
    from mdgat_tpu.data.synthetic import make_synthetic_pair
    from mdgat_tpu.ops.geometry import gt_correspondences
    rng = np.random.default_rng(seed)
    pairs = [make_synthetic_pair(rng, n_points=n, overlap=0.8, jitter=0.02,
                                 desc_noise=0.02) for _ in range(b)]
    kp0 = np.stack([p["kp0"] for p in pairs])
    kp1 = np.stack([p["kp1"] for p in pairs])
    # world frame for view 1 = T_gt applied
    kp1w = np.stack([p["kp1"] @ p["T_gt"][:3, :3].T + p["T_gt"][:3, 3]
                     for p in pairs])
    gt = gt_correspondences(jnp.asarray(kp0), jnp.asarray(kp1w), 0.5)
    de0 = np.stack([p["desc0"] for p in pairs])
    de1 = np.stack([p["desc1"] for p in pairs])
    de0 /= np.linalg.norm(de0, axis=-1, keepdims=True)
    de1 /= np.linalg.norm(de1, axis=-1, keepdims=True)
    return {
        "keypoints0": jnp.asarray(kp0), "keypoints1": jnp.asarray(kp1),
        "scores0": jnp.asarray(np.stack([p["score0"] for p in pairs])),
        "scores1": jnp.asarray(np.stack([p["score1"] for p in pairs])),
        "descriptors0": jnp.asarray(de0), "descriptors1": jnp.asarray(de1),
        "gt_matches0": gt.matches0, "gt_matches1": gt.matches1,
    }


def test_loss_decreases():
    cfg = tiny_cfg(loss_method="gap_loss")
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), 1e-3)
    step = make_train_step(model, tx, donate=False)
    batch = real_gt_batch(cfg)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()


def test_bn_state_updates_in_train_mode():
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), 1e-4)
    step = make_train_step(model, tx, donate=False)
    before = np.asarray(state.bn_state["denc"]["mlp"][0]["mean"])
    new_state, _ = step(state, real_gt_batch(cfg))
    after = np.asarray(new_state.bn_state["denc"]["mlp"][0]["mean"])
    assert not np.allclose(before, after)


def test_data_parallel_matches_single_device():
    """Sharded step == unsharded step (the DataParallel-equivalence check)."""
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(1), 1e-4)
    step = make_train_step(model, tx, donate=False)
    batch = real_gt_batch(cfg, b=8)

    state_ref, m_ref = step(state, batch)

    mesh = make_mesh(data=8, seq=1)
    sharded = shard_batch(batch, mesh)
    state_rep = replicate(state, mesh)
    state_dp, m_dp = step(state_rep, sharded)
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_ref["loss"]),
                               rtol=1e-9)
    a = np.asarray(state_ref.params["bin_score"])
    b = np.asarray(state_dp.params["bin_score"])
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_sequence_parallel_compiles_and_matches():
    """2x4 (data x seq) mesh: keypoint axis sharded; same numbers."""
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(2), 1e-4)
    step = make_train_step(model, tx, donate=False)
    batch = real_gt_batch(cfg, b=2, n=24)
    # pad keypoint axis to a multiple of 4 for even sharding
    state_ref, m_ref = step(state, batch)

    mesh = make_mesh(data=2, seq=4)
    sharded = shard_batch(batch, mesh, shard_seq=True)
    state_rep = replicate(state, mesh)
    state_sp, m_sp = step(state_rep, sharded)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-8)


def test_eval_step_runs():
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 1e-4)
    ev = make_eval_step(model)
    out = ev(state.params, state.bn_state, real_gt_batch(cfg))
    assert "matches0" in out and "loss" in out
