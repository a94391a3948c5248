"""Pallas kernel parity tests (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgat_tpu.ops.transport import log_optimal_transport, assemble_full_scores
from mdgat_tpu.ops.attention import full_attention, topk_attention
from mdgat_tpu.ops.pallas import (
    pallas_log_optimal_transport, pallas_topk_attention,
)

RNG = np.random.default_rng(11)


def test_pallas_sinkhorn_matches_xla():
    scores = jnp.asarray(RNG.normal(size=(3, 16, 24)), jnp.float32)
    ref = log_optimal_transport(scores, 1.0, iters=12)
    got = pallas_log_optimal_transport(scores, 1.0, iters=12, interpret=True)
    np.testing.assert_allclose(np.asarray(got.dense), np.asarray(ref.dense),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.bin_row),
                               np.asarray(ref.bin_row), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.bin_col),
                               np.asarray(ref.bin_col), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.corner),
                               np.asarray(ref.corner), rtol=2e-5, atol=1e-5)


def test_pallas_sinkhorn_masked():
    scores = np.full((2, 16, 24), 7.0, np.float32)
    scores[:, :10, :12] = RNG.normal(size=(2, 10, 12))
    rm = np.zeros((2, 16), bool); rm[:, :10] = True
    cm = np.zeros((2, 24), bool); cm[:, :12] = True
    ref = log_optimal_transport(jnp.asarray(scores[:, :10, :12]), 0.5, 10)
    got = pallas_log_optimal_transport(jnp.asarray(scores), 0.5, 10,
                                       row_mask=jnp.asarray(rm),
                                       col_mask=jnp.asarray(cm),
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got.dense)[:, :10, :12],
                               np.asarray(ref.dense), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.corner),
                               np.asarray(ref.corner), rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("topk", [None, 6])
def test_pallas_attention_matches_xla(topk):
    q = jnp.asarray(RNG.normal(size=(2, 2, 16, 8)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(2, 2, 24, 8)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(2, 2, 24, 8)), jnp.float32)
    if topk is None:
        ref = full_attention(q, k, v)
    else:
        ref = topk_attention(q, k, v, topk)
    got = pallas_topk_attention(q, k, v, topk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("topk", [None, 6])
def test_fused_attention_gradient_parity(topk):
    """custom-VJP backward == autodiff through the XLA masked softmax."""
    from mdgat_tpu.ops.pallas.attention import fused_topk_attention
    q = jnp.asarray(RNG.normal(size=(1, 2, 8, 8)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(1, 2, 12, 8)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(1, 2, 12, 8)), jnp.float32)
    g = jnp.asarray(RNG.normal(size=(1, 2, 8, 8)), jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_topk_attention(q, k, v, topk, None) * g)

    def loss_xla(q, k, v):
        if topk is None:
            o = full_attention(q, k, v)
        else:
            o = topk_attention(q, k, v, topk)
        return jnp.sum(o * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_attention_masked():
    q = jnp.asarray(RNG.normal(size=(1, 2, 8, 8)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(1, 2, 24, 8)), jnp.float32)
    v = jnp.asarray(RNG.normal(size=(1, 2, 24, 8)), jnp.float32)
    mask = jnp.asarray(np.arange(24)[None, :] < 17)
    ref = topk_attention(q, k, v, 5, kv_mask=mask)
    got = pallas_topk_attention(q, k, v, 5, kv_mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
