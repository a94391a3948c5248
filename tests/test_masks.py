"""Mask-threading tests for losses and matching beyond gap loss."""

import numpy as np
import jax.numpy as jnp
import pytest

from mdgat_tpu.ops import (
    log_optimal_transport, triplet_loss, superglue_nll_loss, match_decision,
)

RNG = np.random.default_rng(21)


def _setup(b=2, n=5, m=6, pn=9, pm=11, iters=8):
    scores = RNG.normal(size=(b, n, m))
    ot_ref = log_optimal_transport(jnp.asarray(scores), 1.0, iters)
    pad = np.zeros((b, pn, pm))
    pad[:, :n, :m] = scores
    rm = np.zeros((b, pn), bool); rm[:, :n] = True
    cm = np.zeros((b, pm), bool); cm[:, :m] = True
    ot_pad = log_optimal_transport(jnp.asarray(pad), 1.0, iters,
                                   row_mask=jnp.asarray(rm),
                                   col_mask=jnp.asarray(cm))
    gt0 = RNG.integers(-1, m, size=(b, n)).astype(np.int32)
    gt1 = RNG.integers(-1, n, size=(b, m)).astype(np.int32)
    gt0p = np.full((b, pn), -1, np.int32); gt0p[:, :n] = gt0
    gt1p = np.full((b, pm), -1, np.int32); gt1p[:, :m] = gt1
    return ot_ref, ot_pad, gt0, gt1, gt0p, gt1p, rm, cm


def test_triplet_loss_padded_equals_unpadded():
    ot, otp, gt0, gt1, gt0p, gt1p, rm, cm = _setup()
    ref = triplet_loss(ot, jnp.asarray(gt0), jnp.asarray(gt1), 0.5)
    got = triplet_loss(otp, jnp.asarray(gt0p), jnp.asarray(gt1p), 0.5,
                       row_mask=jnp.asarray(rm), col_mask=jnp.asarray(cm))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_superglue_nll_padded_equals_unpadded():
    ot, otp, gt0, gt1, gt0p, gt1p, rm, cm = _setup()
    ref = superglue_nll_loss(ot, jnp.asarray(gt0), jnp.asarray(gt1))
    got = superglue_nll_loss(otp, jnp.asarray(gt0p), jnp.asarray(gt1p),
                             row_mask=jnp.asarray(rm),
                             col_mask=jnp.asarray(cm))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("rule,mutual", [("gap_loss", False),
                                         ("gap_loss", True),
                                         ("superglue", False),
                                         ("superglue", True)])
def test_match_decision_padded_equals_unpadded(rule, mutual):
    ot, otp, *_, rm, cm = _setup()
    ref = match_decision(ot, rule, 0.2, mutual)
    got = match_decision(otp, rule, 0.2, mutual,
                         row_mask=jnp.asarray(rm), col_mask=jnp.asarray(cm))
    n, m = ref.matches0.shape[1], ref.matches1.shape[1]
    np.testing.assert_array_equal(np.asarray(got.matches0)[:, :n],
                                  np.asarray(ref.matches0))
    np.testing.assert_array_equal(np.asarray(got.matches1)[:, :m],
                                  np.asarray(ref.matches1))
    np.testing.assert_allclose(np.asarray(got.matching_scores0)[:, :n],
                               np.asarray(ref.matching_scores0), rtol=1e-9)
    assert (np.asarray(got.matches0)[:, n:] == -1).all()
    assert (np.asarray(got.matching_scores1)[:, m:] == 0).all()


def test_bfloat16_forward_smoke():
    """bf16 compute with f32 OT runs and yields sane matches on CPU."""
    import jax
    from mdgat_tpu.models import MDGAT
    from test_model import tiny_cfg, tiny_batch
    cfg = tiny_cfg(compute_dtype="bfloat16", param_dtype="float32")
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    batch = tiny_batch(cfg)
    out, _ = model.apply(params, state, batch, train=False)
    assert np.isfinite(np.asarray(out["loss"], np.float32)).all()
    m0 = np.asarray(out["matches0"])
    assert ((m0 >= -1) & (m0 < 24)).all()
