"""CLI compatibility tests: flag parsing, presets, run-name scheme."""

import os
import numpy as np
import jax
import jax.numpy as jnp

from mdgat_tpu.cli import build_parser, config_from_args
from mdgat_tpu.core.config import train_defaults


def test_train_preset_defaults_match_reference():
    args = build_parser("train").parse_args([])
    cfg = config_from_args(args, "train")
    # train.py:16-123 defaults
    assert cfg.sinkhorn_iterations == 20
    assert cfg.learning_rate == 1e-4
    assert cfg.batch_size == 64
    assert cfg.max_keypoints == 512
    assert cfg.ensure_kpts_num is True
    assert cfg.loss_method == "gap_loss"
    assert cfg.memory_is_enough is True
    assert cfg.k == (128, None, 128, None, 64, None, 64, None)
    assert cfg.L == 9
    assert cfg.descriptor == "FPFH"
    assert cfg.threshold == 0.5
    assert cfg.triplet_loss_gamma == 0.5


def test_test_preset_defaults_match_reference():
    args = build_parser("test").parse_args([])
    cfg = config_from_args(args, "test")
    # test.py:18-126 divergent defaults
    assert cfg.batch_size == 1
    assert cfg.max_keypoints == 256
    assert cfg.ensure_kpts_num is False
    assert cfg.loss_method == "triplet_loss"
    assert cfg.memory_is_enough is False


def test_k_flag_accepts_reference_syntax():
    args = build_parser("train").parse_args(
        ["--k", "[128, None, 128, None, 64, None, 64, None]"])
    assert args.k == (128, None, 128, None, 64, None, 64, None)
    args = build_parser("train").parse_args(["--k", "None"])
    assert args.k is None


def test_scan_gnn_pairs_flag():
    args = build_parser("train").parse_args(["--scan_gnn_pairs", "false"])
    cfg = config_from_args(args, "train")
    assert cfg.scan_gnn_pairs is False
    assert config_from_args(
        build_parser("train").parse_args([]), "train").scan_gnn_pairs is True


def test_raw_net_forces_full_attention():
    args = build_parser("train").parse_args(["--net", "raw"])
    cfg = config_from_args(args, "train")
    assert cfg.k is None and cfg.L == 9          # train.py:130-132


def test_run_name_scheme():
    cfg = train_defaults()
    name = cfg.model_name()
    # train.py:134-136 format (nomutualcheck- prefix when mutual_check off)
    assert name == ("nomutualcheck-mdgat-k[128, None, 128, None, 64, None, "
                    "64, None]-batch64-gap_loss-FPFH-USIP")
    path = cfg.run_dir("./logs")
    assert path.startswith("./logs/kitti/mdgat9-k[128, None, 128, None, 64, "
                           "None, 64, None]-gap_loss-FPFH/")
    cfg2 = cfg.replace(mutual_check=True)
    assert not cfg2.model_name().startswith("nomutualcheck-")
    cfg3 = cfg.replace(descriptor="pointnet")
    assert "/train_step3/" in cfg3.run_dir("./checkpoint")


def test_checkpoint_resume_continuity(tmp_path):
    """Save -> load -> identical eval outputs (deterministic resume)."""
    from mdgat_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from mdgat_tpu.models import MDGAT
    from test_model import tiny_cfg, tiny_batch
    cfg = tiny_cfg()
    model = MDGAT(cfg)
    params, state = model.init(jax.random.PRNGKey(5))
    batch = tiny_batch(cfg)
    out_ref, _ = model.apply(params, state, batch, train=False)

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, jax.device_get(params), jax.device_get(state),
                    epoch=7, lr=1e-4, loss=0.5)
    ck = load_checkpoint(path)
    p2 = jax.tree.map(jnp.asarray, ck["params"])
    s2 = jax.tree.map(jnp.asarray, ck["bn_state"])
    out2, _ = model.apply(p2, s2, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out_ref["matches0"]),
                                  np.asarray(out2["matches0"]))
    np.testing.assert_allclose(np.asarray(out_ref["loss"]),
                               np.asarray(out2["loss"]), rtol=0)


def test_pallas_interpret_flag():
    """--pallas_interpret reaches Config (the documented full-Pallas
    integration path on CPU is reachable from the CLI, VERDICT r2 #7)."""
    args = build_parser("test").parse_args(["--pallas_interpret", "true"])
    cfg = config_from_args(args, "test")
    assert cfg.pallas_interpret is True
    assert config_from_args(
        build_parser("test").parse_args([]), "test").pallas_interpret is False


def test_shard_map_flag_and_resolution():
    """--shard_map auto/true/false -> Config.shard_map None/True/False,
    and resolve_shard_map picks the explicit path exactly when the Pallas
    kernels would otherwise be replicated (multi-device mesh — data and/or
    seq axis — with kernels on)."""
    mk = lambda *argv: config_from_args(
        build_parser("train").parse_args(list(argv)), "train")
    assert mk().shard_map is None                       # default = auto
    assert mk("--shard_map", "true").shard_map is True
    assert mk("--shard_map", "false").shard_map is False

    auto = mk()
    assert auto.resolve_shard_map(8) is True            # kernels default on
    assert auto.resolve_shard_map(1) is False           # single device
    # seq (context) parallelism also runs under shard_map now — the
    # kernels are per-shard with gathered K/V (parallel/smap.py)
    assert auto.replace(seq_parallel=2).resolve_shard_map(8) is True
    assert auto.replace(seq_parallel=2).resolve_shard_map(1) is True
    # pallas_train_layer alone runs no kernel (it needs pallas_attention,
    # models/mdgat.py:183) — it must NOT trigger the auto gate
    no_kernels = auto.replace(use_pallas=False, pallas_attention=False)
    assert no_kernels.pallas_train_layer is True
    assert no_kernels.resolve_shard_map(8) is False     # propagation is fine
    assert no_kernels.replace(seq_parallel=2).resolve_shard_map(8) is False
    # pallas_loss runs independently of the Sinkhorn kernel -> gate on
    assert no_kernels.replace(pallas_loss=True).resolve_shard_map(8) is True
    # explicit settings win over the auto rule
    assert no_kernels.replace(shard_map=True).resolve_shard_map(8) is True
    assert auto.replace(shard_map=False).resolve_shard_map(8) is False
    assert auto.replace(shard_map=True).resolve_shard_map(1) is False


def test_bench_relay_outage_reports_json():
    """bench.py with an unreachable TPU relay must emit a well-formed
    single-line JSON result carrying an ``error`` field (never hang in
    axon backend init — the driver records this line as the round's
    bench artifact; see bench.py::wait_for_relay)."""
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "bench.py"],
        env=dict(os.environ, BENCH_RELAY_PORT="1",  # nothing listens
                 BENCH_RELAY_WAIT_S="0"),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["value"] == 0.0
    assert out["vs_baseline"] is None
    assert "relay" in out["error"]
    assert out["unit"] == "pairs/s"
