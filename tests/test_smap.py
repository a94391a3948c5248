"""Explicit shard_map execution tests (``parallel/smap.py``) on the
virtual 8-device CPU mesh.

The point of the shard_map path is that the Pallas kernels run PER-SHARD
(plain jit all-gathers pallas_call operands — no partitioning rule), with
gradient pmeans and cross-replica BatchNorm psums making the per-shard
computation bit-for-the-same-math as the global-batch one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mdgat_tpu.models import MDGAT
from mdgat_tpu.parallel import (make_mesh, make_shard_map_eval_step,
                                make_shard_map_train_step, replicate,
                                shard_batch)
from mdgat_tpu.train import create_train_state, make_eval_step, \
    make_train_step

from test_model import tiny_cfg
from test_train import real_gt_batch


def _masked(batch, seed=5):
    rng = np.random.default_rng(seed)
    b, n = batch["keypoints0"].shape[:2]
    m0 = np.arange(n)[None, :] < rng.integers(n // 2, n + 1, b)[:, None]
    m1 = np.arange(n)[None, :] < rng.integers(n // 2, n + 1, b)[:, None]
    return {**batch, "mask0": jnp.asarray(m0), "mask1": jnp.asarray(m1)}


@pytest.mark.parametrize("masked", [False, True])
def test_shard_map_train_matches_single_device(masked):
    """shard_map train step (per-shard grads + pmean, psum'd BN stats) ==
    the unsharded step on the same global batch."""
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(1), 1e-4)
    batch = real_gt_batch(cfg, b=8)
    if masked:
        batch = _masked(batch)

    step_ref = make_train_step(model, tx, donate=False)
    state_ref, m_ref = step_ref(state, batch)

    mesh = make_mesh(data=8, seq=1)
    step_sm = make_shard_map_train_step(model, tx, mesh, donate=False)
    state_sm, m_sm = step_sm(replicate(state, mesh),
                             shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m_sm["loss"]), float(m_ref["loss"]),
                               rtol=1e-9)
    np.testing.assert_allclose(float(m_sm["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-8)
    for a, b in zip(jax.tree.leaves(state_sm.params),
                    jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
    # BN running stats: psum'd batch stats must equal global-batch stats
    for a, b in zip(jax.tree.leaves(state_sm.bn_state),
                    jax.tree.leaves(state_ref.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("mesh_shape", [(4, 2)])
def test_shard_map_seq_train_matches_single_device(mesh_shape):
    """Context-parallel shard_map train step (keypoints sharded over
    ``seq``: local-query GNN with per-layer gathered K/V, replicated
    OT/loss tail with the 1/s cotangent scale + psum-over-seq grad
    reduction) == the unsharded step on the same global batch. Parity is
    the proof the gathers/reductions are right — a missing collective
    under check_vma=False would show up as wrong numbers."""
    data, seq = mesh_shape
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(6), 1e-4)
    batch = _masked(real_gt_batch(cfg, b=8, seed=11))

    step_ref = make_train_step(model, tx, donate=False)
    state_ref, m_ref = step_ref(state, batch)

    mesh = make_mesh(data=data, seq=seq)
    step_sm = make_shard_map_train_step(model, tx, mesh, donate=False)
    state_sm, m_sm = step_sm(replicate(state, mesh),
                             shard_batch(batch, mesh, shard_seq=True))
    np.testing.assert_allclose(float(m_sm["loss"]), float(m_ref["loss"]),
                               rtol=1e-9)
    np.testing.assert_allclose(float(m_sm["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-8)
    for a, b in zip(jax.tree.leaves(state_sm.params),
                    jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
    for a, b in zip(jax.tree.leaves(state_sm.bn_state),
                    jax.tree.leaves(state_ref.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)


def test_shard_map_seq_pallas_interpret_matches_single_device():
    """The full Pallas path under context-parallel shard_map: the fused
    train-layer kernels run on RECTANGULAR shapes (local queries x
    gathered keys) with BN stats psum'd over (data, seq)."""
    cfg = tiny_cfg(pallas_interpret=True, use_pallas=True,
                   pallas_attention=True)
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(8), 1e-4)
    batch = _masked(real_gt_batch(cfg, b=8, seed=15))

    step_ref = make_train_step(model, tx, donate=False)
    state_ref, m_ref = step_ref(state, batch)

    mesh = make_mesh(data=4, seq=2)
    step_sm = make_shard_map_train_step(model, tx, mesh, donate=False)
    state_sm, m_sm = step_sm(replicate(state, mesh),
                             shard_batch(batch, mesh, shard_seq=True))
    np.testing.assert_allclose(float(m_sm["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_sm["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state_sm.bn_state),
                    jax.tree.leaves(state_ref.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # params after ONE Adam step: bound by the step size (see the data-
    # axis interpret test above)
    for a, b in zip(jax.tree.leaves(state_sm.params),
                    jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.1e-4)


def test_shard_map_seq_eval_matches_single_device():
    """Eval under the (2 data x 4 seq) mesh: the tail runs on gathered
    descriptors, so matches/scores are full-N per data shard and must
    equal the single-device outputs exactly (global indices)."""
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(9))
    batch = _masked(real_gt_batch(cfg, b=8, seed=17))

    out_ref = make_eval_step(model)(params, bn_state, batch)

    mesh = make_mesh(data=2, seq=4)
    step_sm = make_shard_map_eval_step(model, mesh)
    out_sm = step_sm(replicate(params, mesh), replicate(bn_state, mesh),
                     shard_batch(batch, mesh, shard_seq=True))
    np.testing.assert_array_equal(np.asarray(out_sm["matches0"]),
                                  np.asarray(out_ref["matches0"]))
    np.testing.assert_array_equal(np.asarray(out_sm["matches1"]),
                                  np.asarray(out_ref["matches1"]))
    np.testing.assert_allclose(np.asarray(out_sm["loss"]),
                               np.asarray(out_ref["loss"]), rtol=1e-9)


def test_shard_map_eval_matches_single_device():
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(3))
    batch = _masked(real_gt_batch(cfg, b=8, seed=2))

    out_ref = make_eval_step(model)(params, bn_state, batch)

    mesh = make_mesh(data=8, seq=1)
    step_sm = make_shard_map_eval_step(model, mesh)
    out_sm = step_sm(replicate(params, mesh), replicate(bn_state, mesh),
                     shard_batch(batch, mesh))
    np.testing.assert_array_equal(np.asarray(out_sm["matches0"]),
                                  np.asarray(out_ref["matches0"]))
    np.testing.assert_allclose(np.asarray(out_sm["loss"]),
                               np.asarray(out_ref["loss"]), rtol=1e-9)


def test_shard_map_pallas_interpret_matches_single_device():
    """The full Pallas path (fused train layer + trainable Sinkhorn, CPU
    interpreter) under shard_map == the same path single-device: the
    kernels run per-shard, the BN psums reconstruct global statistics."""
    cfg = tiny_cfg(pallas_interpret=True, use_pallas=True,
                   pallas_attention=True)
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(4), 1e-4)
    batch = _masked(real_gt_batch(cfg, b=8, seed=7))

    step_ref = make_train_step(model, tx, donate=False)
    state_ref, m_ref = step_ref(state, batch)

    mesh = make_mesh(data=8, seq=1)
    step_sm = make_shard_map_train_step(model, tx, mesh, donate=False)
    state_sm, m_sm = step_sm(replicate(state, mesh),
                             shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m_sm["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_sm["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-4)
    # BN running stats are the direct psum-correctness check (no Adam in
    # the way): psum'd per-shard stats must equal global-batch stats.
    for a, b in zip(jax.tree.leaves(state_sm.bn_state),
                    jax.tree.leaves(state_ref.bn_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    # Params after ONE Adam step: update ≈ lr·g/(|g|+ε), so f32 kernel
    # noise on near-zero grads legitimately moves params by O(lr)=1e-4;
    # bound by the step size, not the noise floor.
    for a, b in zip(jax.tree.leaves(state_sm.params),
                    jax.tree.leaves(state_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2.1e-4)


def test_shard_map_eval_has_no_collectives():
    """Proof the kernels run per-shard: the compiled shard_map eval step
    contains NO all-gather/all-reduce (plain jit showed 4 all-gathers for
    one sharded pallas_call). Eval-mode BN uses running stats, so zero
    collectives is the correct count."""
    cfg = tiny_cfg(pallas_interpret=True, use_pallas=True,
                   pallas_attention=True)
    model = MDGAT(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(5))
    batch = real_gt_batch(cfg, b=8, seed=9)

    mesh = make_mesh(data=8, seq=1)
    step_sm = make_shard_map_eval_step(model, mesh)
    hlo = step_sm.lower(replicate(params, mesh),
                        replicate(bn_state, mesh),
                        shard_batch(batch, mesh)).compile().as_text()
    assert hlo.count("all-gather") == 0, hlo.count("all-gather")
    assert hlo.count("all-reduce") == 0, hlo.count("all-reduce")


def test_make_eval_runtime_selects_and_matches():
    """The eval-CLI runtime helper: picks the shard_map step + shard hook
    on a multi-device data axis (outputs identical to the plain step),
    and falls back to the plain step on non-divisible batch sizes."""
    from mdgat_tpu.parallel import make_eval_runtime

    cfg = tiny_cfg().replace(data_parallel=8)
    model = MDGAT(cfg)
    params, bn_state = model.init(jax.random.PRNGKey(11))
    batch = _masked(real_gt_batch(cfg, b=8, seed=13))

    step, p, s, shard_inputs = make_eval_runtime(model, cfg, params,
                                                 bn_state, batch_size=8)
    assert shard_inputs is not None
    out_sm = step(p, s, shard_inputs(batch))

    out_ref = make_eval_step(model)(params, bn_state, batch)
    np.testing.assert_array_equal(np.asarray(out_sm["matches0"]),
                                  np.asarray(out_ref["matches0"]))
    np.testing.assert_allclose(np.asarray(out_sm["loss"]),
                               np.asarray(out_ref["loss"]), rtol=1e-9)

    # batch 6 over 8 devices: plain step, no shard hook
    _, _, _, fb = make_eval_runtime(model, cfg, params, bn_state,
                                    batch_size=6)
    assert fb is None
    # explicit off: plain step even when divisible
    _, _, _, off = make_eval_runtime(model, cfg.replace(shard_map=False),
                                     params, bn_state, batch_size=8)
    assert off is None

    # context-parallel eval: (4 data x 2 seq) mesh, keypoints sharded —
    # outputs must still match the plain step exactly (global indices)
    cfg_seq = cfg.replace(data_parallel=4, seq_parallel=2)
    step2, p2, s2, hook2 = make_eval_runtime(model, cfg_seq, params,
                                             bn_state, batch_size=8)
    assert hook2 is not None
    out_seq = step2(p2, s2, hook2(batch))
    np.testing.assert_array_equal(np.asarray(out_seq["matches0"]),
                                  np.asarray(out_ref["matches0"]))
    np.testing.assert_allclose(np.asarray(out_seq["loss"]),
                               np.asarray(out_ref["loss"]), rtol=1e-9)
    # keypoint grain (max_keypoints=24, ensure mode) not divisible by a
    # 5-way seq axis: graceful fallback to the plain step
    _, _, _, fb2 = make_eval_runtime(
        model, cfg.replace(data_parallel=1, seq_parallel=5), params,
        bn_state, batch_size=8)
    assert fb2 is None


def test_bn_axis_is_thread_local():
    """Concurrent traces must not cross-contaminate the BN axis.

    ``_BN_AXIS`` is a ContextVar: two threads tracing simultaneously —
    one inside ``bn_cross_replica("data")``, one outside — must each
    observe their own axis. The module-global list this replaced would
    leak "data" into the second thread (VERDICT r3 weak #4)."""
    import threading

    from mdgat_tpu.ops.mlp import bn_cross_replica, bn_axis_name

    barrier = threading.Barrier(2)
    seen = {}

    def inside():
        with bn_cross_replica("data"):
            barrier.wait()           # both threads now mid-"trace"
            seen["inside"] = bn_axis_name()
            barrier.wait()

    def outside():
        barrier.wait()
        seen["outside"] = bn_axis_name()
        barrier.wait()

    ts = [threading.Thread(target=inside), threading.Thread(target=outside)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert seen == {"inside": "data", "outside": None}


def test_bn_axis_nests_and_restores():
    from mdgat_tpu.ops.mlp import bn_cross_replica, bn_axis_name

    assert bn_axis_name() is None
    with bn_cross_replica("a"):
        assert bn_axis_name() == "a"
        with bn_cross_replica(None):
            assert bn_axis_name() is None
        assert bn_axis_name() == "a"
    assert bn_axis_name() is None
