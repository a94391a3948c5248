"""Model-level tests: init, forward, loss, padding invariance, variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgat_tpu.core.config import Config, train_defaults
from mdgat_tpu.models import MDGAT, SuperGlue, build_model
from mdgat_tpu.data.synthetic import make_synthetic_pair


def tiny_cfg(**kw):
    base = dict(L=2, k=(8, None, 4, None), descriptor_dim=32,
                keypoint_encoder=(16, 32), descriptor_encoder=(16,),
                sinkhorn_iterations=8, compute_dtype="float64",
                param_dtype="float64", batch_size=2, max_keypoints=24)
    base.update(kw)
    return train_defaults(**base)


def tiny_batch(cfg, b=2, n=24, m=24, seed=0, masks=False):
    rng = np.random.default_rng(seed)
    pairs = [make_synthetic_pair(rng, n_points=n, overlap=0.7)
             for _ in range(b)]
    batch = {
        "keypoints0": jnp.asarray(np.stack([p["kp0"] for p in pairs])),
        "keypoints1": jnp.asarray(np.stack([p["kp1"] for p in pairs])),
        "scores0": jnp.asarray(np.stack([p["score0"] for p in pairs])),
        "scores1": jnp.asarray(np.stack([p["score1"] for p in pairs])),
        "descriptors0": jnp.asarray(np.stack([p["desc0"] for p in pairs])),
        "descriptors1": jnp.asarray(np.stack([p["desc1"] for p in pairs])),
    }
    d0 = batch["descriptors0"]
    d1 = batch["descriptors1"]
    batch["descriptors0"] = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
    batch["descriptors1"] = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
    gt0 = rng.integers(-1, m, size=(b, n)).astype(np.int32)
    gt1 = rng.integers(-1, n, size=(b, m)).astype(np.int32)
    batch["gt_matches0"] = jnp.asarray(gt0)
    batch["gt_matches1"] = jnp.asarray(gt1)
    if masks:
        batch["mask0"] = jnp.ones((b, n), bool)
        batch["mask1"] = jnp.ones((b, m), bool)
    return batch


def clouds_near_keypoints(kpts0, kpts1, rng, n_points=160, sigma=0.8):
    """Raw clouds [B, Np, 8] clustered around the keypoints so the
    radius-grouping paths see real neighbors (plus some empty balls)."""
    clouds = []
    for kp in (np.asarray(kpts0), np.asarray(kpts1)):
        b, n, _ = kp.shape
        pick = rng.integers(0, n, size=(b, n_points))
        xyz = np.take_along_axis(kp, pick[..., None], axis=1) \
            + rng.normal(scale=sigma, size=(b, n_points, 3))
        extra = rng.normal(size=(b, n_points, 5))
        clouds.append(jnp.asarray(np.concatenate([xyz, extra], axis=-1)))
    return clouds


@pytest.mark.parametrize("descriptor", ["FPFH", "FPFH_gloabal", "FPFH_only"])
def test_forward_shapes_and_finite_loss(descriptor):
    cfg = tiny_cfg(descriptor=descriptor)
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = tiny_batch(cfg)
    out, new_state = jax.jit(
        lambda p, s, b: model.apply(p, s, b, train=True))(params, state, batch)
    assert out["matches0"].shape == (2, 24)
    assert out["matches1"].shape == (2, 24)
    assert out["loss"].shape == (2,)
    assert np.isfinite(np.asarray(out["loss"])).all()
    # matches are either -1 or valid indices
    m0 = np.asarray(out["matches0"])
    assert ((m0 >= -1) & (m0 < 24)).all()


@pytest.mark.parametrize("loss_method", ["gap_loss", "triplet_loss",
                                         "superglue"])
def test_loss_methods(loss_method):
    cfg = tiny_cfg(loss_method=loss_method)
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(1))
    batch = tiny_batch(cfg)
    out, _ = model.apply(params, state, batch, train=False)
    assert np.isfinite(np.asarray(out["loss"])).all()


def test_superglue_baseline_runs_full_attention():
    cfg = tiny_cfg(net="superglue")
    model = build_model(cfg)
    assert isinstance(model, SuperGlue)
    assert model.config.layer_k_schedule(24) == [None] * 4
    params, state = model.init(jax.random.PRNGKey(2))
    out, _ = model.apply(params, state, tiny_batch(cfg), train=False)
    assert np.isfinite(np.asarray(out["loss"])).all()


@pytest.mark.parametrize("descriptor", ["FPFH", "FPFH_gloabal", "FPFH_only",
                                        "pointnet", "pointnetmsg"])
def test_superglue_forward_every_descriptor(descriptor):
    """Every --net superglue --descriptor combination has its intended
    module (reference superglue.py:345-376): the pointnet modes use
    SuperGlue's own kenc-less encoder (radius-1 SSG, raw sa2 output) and
    also construct the unused kenc/pointnetDescriptorEncoder pair."""
    cfg = tiny_cfg(descriptor=descriptor, net="superglue", k=None)
    model = build_model(cfg)
    assert isinstance(model, SuperGlue)
    params, state = model.init(jax.random.PRNGKey(4))
    batch = tiny_batch(cfg, b=2, n=16, m=16, seed=8)
    if descriptor in ("pointnet", "pointnetmsg"):
        rng = np.random.default_rng(9)
        batch["cloud0"], batch["cloud1"] = clouds_near_keypoints(
            batch["keypoints0"], batch["keypoints1"], rng)
        # SuperGlue's pointnet encoder has no kenc/mlp stage...
        assert "mlp" not in params["penc"] and "kenc" not in params["penc"]
        # ...but the companions exist at the top level (checkpoint parity)
        assert "kenc" in params and "denc" in params
    out, _ = model.apply(params, state, batch, train=True)
    assert out["matches0"].shape == (2, 16)
    assert np.isfinite(np.asarray(out["loss"])).all()


def test_raw_net_disables_topk():
    cfg = tiny_cfg(net="raw")
    assert cfg.layer_k_schedule(24) == [None] * 4


def test_padding_invariance_eval():
    """Padded forward (masks) == unpadded forward on the valid block."""
    cfg = tiny_cfg(loss_method="gap_loss")
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(3))
    batch = tiny_batch(cfg, b=1, n=24, m=24)
    out_ref, _ = model.apply(params, state, batch, train=False)

    # pad keypoint axis 24 -> 32 with junk + masks
    def pad(x, tgt, fill=0.0):
        pw = [(0, 0), (0, tgt - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pw, constant_values=fill)

    pb = {
        "keypoints0": pad(batch["keypoints0"], 32, 7.0),
        "keypoints1": pad(batch["keypoints1"], 32, 7.0),
        "scores0": pad(batch["scores0"], 32, 1.0),
        "scores1": pad(batch["scores1"], 32, 1.0),
        "descriptors0": pad(batch["descriptors0"], 32, 0.5),
        "descriptors1": pad(batch["descriptors1"], 32, 0.5),
        "gt_matches0": pad(batch["gt_matches0"], 32, -1),
        "gt_matches1": pad(batch["gt_matches1"], 32, -1),
        "mask0": jnp.arange(32)[None, :] < 24,
        "mask1": jnp.arange(32)[None, :] < 24,
    }
    out_pad, _ = model.apply(params, state, pb, train=False)
    np.testing.assert_array_equal(np.asarray(out_pad["matches0"])[:, :24],
                                  np.asarray(out_ref["matches0"]))
    np.testing.assert_allclose(
        np.asarray(out_pad["matching_scores0"])[:, :24],
        np.asarray(out_ref["matching_scores0"]), rtol=1e-6)
    assert (np.asarray(out_pad["matches0"])[:, 24:] == -1).all()
    np.testing.assert_allclose(np.asarray(out_pad["loss"]),
                               np.asarray(out_ref["loss"]), rtol=1e-6)


def test_gnn_scan_equals_unrolled():
    """Layer-pair scan segmentation must be numerically identical."""
    from mdgat_tpu.models.gnn import gnn_apply, gnn_init
    key = jax.random.PRNGKey(7)
    params, states = gnn_init(key, 32, 8, 4, jnp.float64)
    names = ["self", "cross"] * 4
    ks = [None, None, None, None, 8, None, 4, None]
    rng = np.random.default_rng(0)
    d0 = jnp.asarray(rng.normal(size=(2, 24, 32)))
    d1 = jnp.asarray(rng.normal(size=(2, 24, 32)))
    a0, a1, sa = gnn_apply(params, states, d0, d1, names, ks,
                           train=True, scan_pairs=False)
    b0, b1, sb = gnn_apply(params, states, d0, d1, names, ks,
                           train=True, scan_pairs=True)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(b0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), rtol=1e-12)
    fa = jax.tree.leaves(sa)
    fb = jax.tree.leaves(sb)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-12)


def test_pallas_loss_gate_independent_of_use_pallas(monkeypatch):
    """``--pallas_loss`` must run the fused gap-loss kernel even with the
    Sinkhorn/attention kernels off (the kernel consumes the transport
    block either way, ``models/mdgat.py``) — and match the XLA loss."""
    import mdgat_tpu.ops.pallas.loss as ploss
    calls = []
    real = ploss.pallas_gap_loss

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(ploss, "pallas_gap_loss", spy)
    cfg_x = tiny_cfg(compute_dtype="float32", param_dtype="float32")
    cfg_p = cfg_x.replace(use_pallas=False, pallas_attention=False,
                          pallas_loss=True, pallas_interpret=True)
    model_x, model_p = MDGAT(cfg_x), MDGAT(cfg_p)
    params, state = model_x.init(jax.random.PRNGKey(4))
    batch = tiny_batch(cfg_x)
    out_x, _ = model_x.apply(params, state, batch, train=True)
    assert not calls
    out_p, _ = model_p.apply(params, state, batch, train=True)
    assert calls, "fused gap-loss kernel was not invoked"
    np.testing.assert_allclose(np.asarray(out_p["loss"]),
                               np.asarray(out_x["loss"]),
                               rtol=2e-5, atol=1e-6)


def test_full_model_pallas_interpret_matches_xla():
    """End-to-end TPU code path (fused MHA custom VJP + trainable Pallas
    Sinkhorn) on the CPU interpreter vs the pure-XLA path: train-mode
    loss and parameter gradients, plus eval matches. ``pallas_exact_topk``
    removes fast-bisection near-tie divergence; f32 everywhere (the
    kernels compute f32 internals by design)."""
    cfg_x = tiny_cfg(compute_dtype="float32", param_dtype="float32")
    cfg_p = tiny_cfg(compute_dtype="float32", param_dtype="float32",
                     pallas_interpret=True, pallas_exact_topk=True)
    model_x, model_p = MDGAT(cfg_x), MDGAT(cfg_p)
    params, state = model_x.init(jax.random.PRNGKey(2))
    batch = tiny_batch(cfg_x)

    def loss(model, p):
        out, _ = model.apply(p, state, batch, train=True)
        return jnp.mean(out["loss"])

    lx, gx = jax.value_and_grad(lambda p: loss(model_x, p))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(model_p, p))(params)
    np.testing.assert_allclose(float(lp), float(lx), rtol=3e-4)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)

    out_x, _ = model_x.apply(params, state, batch, train=False)
    out_p, _ = model_p.apply(params, state, batch, train=False)
    assert (np.asarray(out_p["matches0"])
            == np.asarray(out_x["matches0"])).mean() > 0.95


def test_gnn_remat_gradient_equivalence():
    """remat (with the selective save_only_these_names policy) must give
    the same loss AND gradients as the unrematerialized path, for both
    the scanned and unrolled layer stacks."""
    from mdgat_tpu.models.gnn import gnn_apply, gnn_init
    key = jax.random.PRNGKey(9)
    params, states = gnn_init(key, 32, 4, 4, jnp.float64)
    names = ["self", "cross"] * 2
    ks = [None, None, 6, None]
    rng = np.random.default_rng(3)
    d0 = jnp.asarray(rng.normal(size=(2, 16, 32)))
    d1 = jnp.asarray(rng.normal(size=(2, 16, 32)))
    w = jnp.asarray(rng.normal(size=(2, 16, 32)))

    def loss(p, remat, scan):
        a0, a1, _ = gnn_apply(p, states, d0, d1, names, ks, train=True,
                              scan_pairs=scan, remat=remat)
        return jnp.sum(a0 * w) + jnp.sum(a1 * w)

    for scan in (False, True):
        l_ref, g_ref = jax.value_and_grad(loss)(params, False, scan)
        l_rm, g_rm = jax.value_and_grad(loss)(params, True, scan)
        np.testing.assert_allclose(float(l_rm), float(l_ref), rtol=1e-12)
        for a, b in zip(jax.tree.leaves(g_rm), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)


def test_gradients_flow():
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(4))
    batch = tiny_batch(cfg)

    def loss_fn(p):
        out, _ = model.apply(p, state, batch, train=True)
        return jnp.mean(out["loss"])

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # bin_score is learnable and must receive gradient
    assert abs(float(grads["bin_score"])) > 0
