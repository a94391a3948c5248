"""Checkpoint tests: torch .pth conversion parity + native save/load."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from mdgat_tpu.core.checkpoint import (
    convert_pth_state_dict, load_pth_checkpoint, save_checkpoint,
    load_checkpoint, tree_to_flat, flat_to_tree,
)
from mdgat_tpu.models import MDGAT
from mdgat_tpu.ops.transport import assemble_full_scores

import torch_ref
from test_model import tiny_cfg, tiny_batch


@pytest.mark.parametrize("descriptor", ["FPFH", "FPFH_only"])
@pytest.mark.parametrize("train_mode", [False, True])
def test_pth_conversion_forward_parity(descriptor, train_mode):
    """Converted torch weights produce torch-identical OT scores."""
    cfg = tiny_cfg(descriptor=descriptor)
    sd = torch_ref.make_state_dict(cfg, seed=5)
    params, state = convert_pth_state_dict(sd, cfg)
    model = MDGAT(cfg)
    batch = tiny_batch(cfg, b=2, n=16, m=16, seed=6)

    ref = torch_ref.t_forward_scores(sd, cfg, batch, train=train_mode)
    out, _ = model.apply(params, state, batch, train=train_mode,
                         return_full_scores=True)
    got = np.asarray(out["scores"])
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-9)


from test_model import clouds_near_keypoints


@pytest.mark.parametrize("descriptor", ["pointnet", "pointnetmsg"])
@pytest.mark.parametrize("net", ["mdgat", "superglue"])
@pytest.mark.parametrize("train_mode", [False, True])
def test_pth_conversion_pointnet_parity(descriptor, net, train_mode):
    """Converted PointnetEncoder[Msg] weights (models/mdgat.py:53-143,
    pointnet_util.py:180-346; superglue.py:108-153 for the kenc-less
    SuperGlue variant) produce torch-identical OT scores."""
    cfg = tiny_cfg(descriptor=descriptor, net=net,
                   k=None if net == "superglue" else (8, None, 4, None))
    sd = torch_ref.make_state_dict(cfg, seed=11)
    params, state = convert_pth_state_dict(sd, cfg)
    from mdgat_tpu.models import build_model
    model = build_model(cfg)
    batch = tiny_batch(cfg, b=2, n=16, m=16, seed=12)
    rng = np.random.default_rng(13)
    batch["cloud0"], batch["cloud1"] = clouds_near_keypoints(
        batch["keypoints0"], batch["keypoints1"], rng)

    ref = torch_ref.t_forward_scores(sd, cfg, batch, train=train_mode)
    out, _ = model.apply(params, state, batch, train=train_mode,
                         return_full_scores=True)
    got = np.asarray(out["scores"])
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-9)


def test_pointnet_descriptor_encoder_parity():
    """pointnetDescriptorEncoder (superglue.py:206-219): converted weights
    + our apply == a straight torch port (global-aware MLP)."""
    import torch.nn.functional as TF
    from mdgat_tpu.models.encoders import pointnet_descriptor_encoder_apply
    cfg = tiny_cfg(descriptor="pointnet", net="superglue", k=None)
    fd = cfg.descriptor_dim
    sd = torch_ref.make_state_dict(cfg, seed=21, module_prefix=False)
    params, state = convert_pth_state_dict(sd, cfg)
    rng = np.random.default_rng(22)
    desc = rng.normal(size=(2, 16, fd))

    # torch port of the reference forward
    d = torch.tensor(desc).permute(0, 2, 1)             # [B, D, N]
    glob = d.max(dim=2)[0].view(2, fd, 1).repeat(1, 1, 16)
    ref = torch_ref.t_mlp(sd, "denc.encoder", [fd * 2, fd * 2, fd],
                          torch.cat([d, glob], 1), False)
    got, _ = pointnet_descriptor_encoder_apply(
        params["denc"], state["denc"], jnp.asarray(desc))
    np.testing.assert_allclose(np.asarray(got),
                               ref.permute(0, 2, 1).numpy(),
                               rtol=1e-10, atol=1e-12)


def test_pth_conversion_with_full_default_architecture():
    """Conversion handles the real (L=9, dim=128) architecture keys."""
    from mdgat_tpu.core.config import train_defaults
    cfg = train_defaults(compute_dtype="float64", param_dtype="float64")
    sd = torch_ref.make_state_dict(cfg, seed=1)
    params, state = convert_pth_state_dict(sd, cfg)
    assert len(params["gnn"]) == 18
    assert params["kenc"]["mlp"][0]["lin"]["w"].shape == (4, 32)
    assert params["gnn"][0]["attn"]["q"]["w"].shape == (128, 128)
    assert params["bin_score"].shape == ()


def test_load_pth_checkpoint_file(tmp_path):
    cfg = tiny_cfg()
    sd = torch_ref.make_state_dict(cfg, seed=2)
    ckpt = {"net": sd, "optimizer": {}, "epoch": 12,
            "lr_schedule": 1e-4, "loss": torch.tensor(0.5)}
    path = str(tmp_path / "model_epoch_12.pth")
    torch.save(ckpt, path)
    params, state, meta = load_pth_checkpoint(path, cfg)
    assert meta["epoch"] == 12
    assert meta["loss"] == 0.5
    assert params["bin_score"].shape == ()


def test_native_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params, state, epoch=3, lr=1e-4, loss=0.25)
    loaded = load_checkpoint(path)
    assert loaded["meta"]["epoch"] == 3
    assert loaded["meta"]["loss"] == 0.25

    flat_a = tree_to_flat(params)
    flat_b = tree_to_flat(loaded["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])

    # loaded tree works as params
    batch = tiny_batch(cfg)
    out, _ = model.apply(jax.tree.map(jnp.asarray, loaded["params"]),
                         jax.tree.map(jnp.asarray, loaded["bn_state"]),
                         batch, train=False)
    assert np.isfinite(np.asarray(out["loss"])).all()


def test_optimizer_state_checkpoint_roundtrip(tmp_path):
    """Adam moments survive the save/load roundtrip (the reference saves
    ``optimizer.state_dict()`` every epoch, train.py:288-294) and the
    restored state continues training identically to the original."""
    from mdgat_tpu.core.checkpoint import restore_opt_state
    from mdgat_tpu.train import TrainState, create_train_state, \
        make_train_step
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(3), 1e-3)
    batch = tiny_batch(cfg, b=2, n=16, m=16, seed=9)
    step = make_train_step(model, tx, donate=False)
    state, _ = step(state, batch)          # non-trivial mu/nu/count

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, jax.device_get(state.params),
                    jax.device_get(state.bn_state),
                    opt_state=jax.device_get(state.opt_state),
                    epoch=1, lr=3e-4, loss=0.5)
    ck = load_checkpoint(path)
    assert ck["meta"]["lr_schedule"] == 3e-4
    assert "opt_state" in ck

    restored = restore_opt_state(ck["opt_state"], tx.init(state.params))
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restored state is step-for-step identical
    s_orig, _ = step(state, batch)
    s_rest, _ = step(TrainState(state.params, state.bn_state, restored,
                                state.step), batch)
    for a, b in zip(jax.tree_util.tree_leaves(s_orig.params),
                    jax.tree_util.tree_leaves(s_rest.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_uses_checkpointed_lr(tmp_path):
    """Reference resume builds Adam at the checkpoint's ``lr_schedule``,
    not the CLI lr, and resets best_loss to 1 (train.py:159-164,202-204)."""
    import train as train_entry
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, jax.device_get(params), jax.device_get(state),
                    epoch=4, lr=7e-5, loss=0.9)
    cfg = cfg.replace(resume=True, resume_model=path, learning_rate=1e-4)
    p2, s2, meta, lr, best_loss = train_entry.resolve_resume(cfg)
    assert lr == 7e-5 and best_loss == 1.0 and meta["epoch"] == 4
    flat_a, flat_b = tree_to_flat(params), tree_to_flat(p2)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]))


def test_flat_tree_roundtrip_with_lists():
    tree = {"a": [{"x": np.ones(2)}, {"x": np.zeros(3)}],
            "b": {"c": np.arange(4)}}
    flat = tree_to_flat(tree)
    back = flat_to_tree(flat)
    assert isinstance(back["a"], list) and len(back["a"]) == 2
    np.testing.assert_array_equal(back["a"][1]["x"], np.zeros(3))
    np.testing.assert_array_equal(back["b"]["c"], np.arange(4))


# ---------------------------------------------------------------------------
# reverse direction: native pytrees -> reference .pth
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("descriptor,net", [
    ("FPFH", "mdgat"), ("FPFH_only", "mdgat"), ("FPFH_gloabal", "mdgat"),
    ("pointnet", "mdgat"), ("pointnet", "superglue"),
    ("pointnetmsg", "mdgat"),
])
def test_pth_export_inverts_conversion(descriptor, net):
    """export_pth_state_dict is the exact inverse of convert_pth_state_dict:
    same key set as the reference state_dict (module.-prefixed, incl.
    num_batches_tracked) and bit-identical f32 values (f32 -> f64 convert
    -> f32 export is lossless)."""
    from mdgat_tpu.core.checkpoint import export_pth_state_dict
    cfg = tiny_cfg(descriptor=descriptor, net=net,
                   k=None if net == "superglue" else (8, None, 4, None))
    sd = torch_ref.make_state_dict(cfg, seed=7)
    params, state = convert_pth_state_dict(sd, cfg)
    out = export_pth_state_dict(params, state, cfg)
    ref = {k: np.asarray(v) for k, v in sd.items()}
    assert set(out) == set(ref)
    for k, v in ref.items():
        assert out[k].shape == v.shape, k
        if k.endswith("num_batches_tracked"):
            continue  # we don't track it; exported as 0 by contract
        assert out[k].dtype == np.float32, k
        np.testing.assert_array_equal(out[k], v.astype(np.float32),
                                      err_msg=k)


def test_pth_export_file_roundtrip(tmp_path):
    """save_pth_checkpoint -> load_pth_checkpoint restores the exact
    pytrees and the reference's resume-visible meta fields
    (net/lr_schedule/loss + epoch, train.py:160-163,288-294)."""
    from mdgat_tpu.core.checkpoint import save_pth_checkpoint
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(3))
    path = str(tmp_path / "export.pth")
    save_pth_checkpoint(path, jax.device_get(params), jax.device_get(state),
                        cfg, epoch=5, lr=3e-5, loss=0.42)
    p2, s2, meta = load_pth_checkpoint(path, cfg)
    assert meta == {"epoch": 5, "lr_schedule": 3e-5, "loss": 0.42}
    fa, fb = tree_to_flat(params), tree_to_flat(p2)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(
            np.asarray(fa[k], np.float32), np.asarray(fb[k], np.float32),
            err_msg=k)
    sa, sb = tree_to_flat(state), tree_to_flat(s2)
    assert set(sa) == set(sb)
    for k in sa:
        if sa[k] is None or (np.asarray(sa[k]).dtype.kind == "U"):
            continue
        np.testing.assert_array_equal(
            np.asarray(sa[k], np.float32), np.asarray(sb[k], np.float32),
            err_msg=k)


def test_pth_export_feeds_torch_oracle():
    """The exported state dict drives the independent torch oracle to the
    same OT scores as our model with the original params — proving the
    exported file is semantically a reference checkpoint, not just
    key-compatible."""
    from mdgat_tpu.core.checkpoint import export_pth_state_dict
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(9))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          export_pth_state_dict(jax.device_get(params),
                                jax.device_get(state), cfg,
                                dtype=np.float64).items()}
    batch = tiny_batch(cfg, b=2, n=16, m=16, seed=10)
    ref = torch_ref.t_forward_scores(sd, cfg, batch, train=False)
    out, _ = model.apply(params, state, batch, train=False,
                         return_full_scores=True)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref,
                               rtol=1e-5, atol=1e-6)


def test_pth_export_rejects_unknown_descriptor():
    """A misspelled descriptor must raise, not silently write a .pth
    missing every encoder weight (the repo uses the reference's sic
    spelling 'FPFH_gloabal' — 'FPFH_global' is the natural typo)."""
    from mdgat_tpu.core.checkpoint import export_pth_state_dict
    cfg = tiny_cfg().replace(descriptor="FPFH_global")
    with pytest.raises(ValueError, match="unknown descriptor"):
        export_pth_state_dict({}, {}, cfg)


def test_pth_export_optimizer_param_group_counts_trainables(tmp_path):
    """The exported Adam param_group indexes only trainable params —
    BN running stats/counters are buffers, and a consumer doing the
    standard optimizer.load_state_dict would reject an oversized group."""
    from mdgat_tpu.core.checkpoint import save_pth_checkpoint
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(4))
    path = str(tmp_path / "opt.pth")
    save_pth_checkpoint(path, jax.device_get(params), jax.device_get(state),
                        cfg, lr=1e-4)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    n_trainable = sum(1 for k in raw["net"] if not k.endswith(
        ("running_mean", "running_var", "num_batches_tracked")))
    assert n_trainable < len(raw["net"])  # BN buffers exist and are excluded
    group = raw["optimizer"]["param_groups"][0]
    assert group["params"] == list(range(n_trainable))
    assert group["lr"] == 1e-4
