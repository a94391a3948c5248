"""Multi-host execution tests (``parallel/multihost.py``).

Unit tests cover the per-process row math and the single-process
equivalence of ``globalize_batch`` with ``shard_batch``; the integration
test spawns a REAL 2-process jax.distributed runtime (4 virtual CPU
devices each, Gloo collectives) and asserts the shard_map train step over
the 8-device global mesh — each process feeding only its own batch rows —
reproduces the single-process 8-device result. The reference has no
multi-node path at all (single-process DataParallel only, reference
``train.py:190-196``); this is the TPU-pod extension.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from mdgat_tpu.data import SparseDataset, write_synthetic_kitti
from mdgat_tpu.core.config import train_defaults
from mdgat_tpu.parallel import make_mesh, replicate, shard_batch
from mdgat_tpu.parallel.multihost import (globalize_batch,
                                          process_batch_rows)

from test_model import tiny_cfg
from test_train import real_gt_batch

HERE = os.path.dirname(os.path.abspath(__file__))


def test_process_batch_rows_single_process():
    """One process owns every batch row, in one contiguous block."""
    mesh = make_mesh(data=8, seq=1)
    assert process_batch_rows(mesh, 16) == slice(0, 16)
    mesh2 = make_mesh(data=4, seq=2)
    assert process_batch_rows(mesh2, 8, shard_seq=True) == slice(0, 8)


def test_globalize_batch_matches_shard_batch():
    """Single-process globalize_batch == shard_batch: same values, same
    shardings (multi-process only changes who supplies which rows)."""
    cfg = tiny_cfg()
    batch = {k: np.asarray(v) for k, v in real_gt_batch(cfg, b=8).items()}
    mesh = make_mesh(data=8, seq=1)
    a = shard_batch(batch, mesh)
    b = globalize_batch(batch, mesh, 8)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim), k


def test_batches_rows_slice(tmp_path):
    """``batches(rows=...)`` yields exactly the sliced rows of the global
    batch — same order, same padding bucket — for both fixed-size and
    variable-N datasets."""
    root = str(tmp_path)
    kp_dir = write_synthetic_kitti(root, seqs=(0, 2, 3, 4, 5, 6, 7),
                                   frames_per_seq=5, pairs_per_seq=2,
                                   n_points=120, seed=3)
    for ensure in (True, False):
        cfg = train_defaults(train_path=root, keypoints_path=kp_dir,
                             txt_path=f"{root}/preprocess-random-full",
                             max_keypoints=96, ensure_kpts_num=ensure,
                             memory_is_enough=False)
        ds = SparseDataset(cfg, "train")
        full = list(ds.batches(4, shuffle=True, seed=7))
        part = list(ds.batches(4, shuffle=True, seed=7, rows=slice(1, 3)))
        assert len(full) == len(part)
        for f, p in zip(full, part):
            for k in f:
                if k == "sequence":
                    assert p[k] == f[k][1:3]
                else:
                    np.testing.assert_array_equal(np.asarray(p[k]),
                                                  np.asarray(f[k])[1:3])


def test_batches_rows_requires_drop_last(tmp_path):
    """A short final batch cannot satisfy equal per-process shares."""
    root = str(tmp_path)
    kp_dir = write_synthetic_kitti(root, seqs=(0, 2, 3, 4, 5, 6, 7),
                                   frames_per_seq=4, pairs_per_seq=2,
                                   n_points=80, seed=4)
    cfg = train_defaults(train_path=root, keypoints_path=kp_dir,
                         txt_path=f"{root}/preprocess-random-full",
                         max_keypoints=64)
    ds = SparseDataset(cfg, "train")
    with pytest.raises(ValueError, match="drop_last"):
        next(ds.batches(4, drop_last=False, rows=slice(0, 2)))


def test_eval_pair_range_whole_batch_cap():
    """max_pairs rounds up to whole batches (single-process loops break
    only after finishing a batch) and clamps to the dataset size."""
    from mdgat_tpu.parallel.multihost import eval_pair_range
    assert eval_pair_range(10, 6, 4) == (0, 8)
    assert eval_pair_range(10, 8, 4) == (0, 8)
    assert eval_pair_range(10, 0, 4) == (0, 10)
    assert eval_pair_range(7, 6, 4) == (0, 7)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("seq", [1, 2])
def test_two_process_train_matches_single(tmp_path, seq):
    """2-process x 4-device distributed train steps == the single-process
    8-device shard_map steps (per-process batch rows, Gloo collectives).
    ``seq=2`` composes multi-host with context parallelism: the global
    mesh is (4 data x 2 seq) and each process's devices form whole
    (data-row x full-seq) blocks."""
    from mdgat_tpu.models import MDGAT
    from mdgat_tpu.parallel import make_shard_map_train_step
    from mdgat_tpu.train import create_train_state

    steps = 2
    # single-process reference on this session's 8-device mesh
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    state, tx = create_train_state(model, jax.random.PRNGKey(1), 1e-4)
    mesh = make_mesh(data=8 // seq, seq=seq)
    state = replicate(state, mesh)
    step = make_shard_map_train_step(model, tx, mesh, donate=False)
    metrics = None
    for i in range(steps):
        batch = real_gt_batch(cfg, b=8, seed=10 + i)
        state, metrics = step(state, shard_batch(batch, mesh,
                                                 shard_seq=seq > 1))
    ref_loss = float(np.asarray(metrics["loss"]))
    ref_gn = float(np.asarray(metrics["grad_norm"]))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "mh_worker.py"),
         str(pid), "2", str(port), str(steps), str(seq)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MH_RESULT")]
        assert line, out[-4000:]
        kv = dict(t.split("=") for t in line[0].split()[1:])
        # Gloo cross-process reduction order may differ from the
        # single-process all-reduce; f64 leaves ~1e-12 of slack
        np.testing.assert_allclose(float(kv["loss"]), ref_loss, rtol=1e-9)
        np.testing.assert_allclose(float(kv["grad_norm"]), ref_gn,
                                   rtol=1e-9)


@pytest.mark.parametrize("script", ["test.py", "test_registration_metric.py"])
def test_two_process_eval_cli_matches_single(tmp_path, script):
    """Multi-host EVAL at the shipped CLI surface: 2 jax.distributed
    processes (4 local virtual CPU devices each) each evaluate their
    contiguous half of the pair list on a LOCAL mesh, the per-pair metric
    records merge (eval_pair_range + allgather_host_vector), and process
    0 prints the bit-identical aggregate lines of a single-process run.
    The reference eval is strictly single-process (test.py:131-298)."""
    root = str(tmp_path)
    kp_dir = write_synthetic_kitti(root, seqs=(10,), frames_per_seq=6,
                                   pairs_per_seq=10, n_points=120, seed=5)
    repo = os.path.dirname(HERE)
    base = [sys.executable, os.path.join(repo, script),
            "--platform", "cpu", "--train_path", root,
            "--keypoints_path", kp_dir,
            "--txt_path", f"{root}/preprocess-random-full",
            "--max_keypoints", "64", "--batch_size", "4",
            # deliberately NOT a multiple of batch_size: the single-
            # process loops only check the cap after a whole batch (8
            # pairs evaluated); eval_pair_range must round the global
            # prefix up the same way or the aggregates diverge
            "--max_pairs", "6"]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def agg_lines(out):
        keys = ("average repeatibility", "baned_data", "repeatibility,")
        return [ln for ln in out.splitlines()
                if ln.startswith(keys) or " || " in ln]

    single = subprocess.run(base, env=env, capture_output=True, text=True,
                            timeout=900, cwd=repo)
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-3000:]
    want = agg_lines(single.stdout)
    assert want, single.stdout[-3000:]

    port = _free_port()
    procs = [subprocess.Popen(
        base + ["--coordinator_address", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=repo) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out[-4000:]}"
    assert agg_lines(outs[0]) == want, (
        f"merged aggregate differs:\n{agg_lines(outs[0])}\nvs\n{want}")
    assert not agg_lines(outs[1]), "non-primary process printed aggregates"
