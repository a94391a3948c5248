"""Shared CLI: the reference's public flags + TPU-native extras.

Flag names and per-entry-point defaults match the reference argparse
blocks (``train.py:16-123``, ``test.py:18-126``), including divergent
defaults between train and test (batch size, max_keypoints,
ensure_kpts_num, loss_method, memory_is_enough). Type quirks of the
reference (e.g. ``--learning_rate type=int``, ``train.py:25``) are fixed
to their obvious intent; ``--k`` accepts the reference's Python-list
syntax (``[128, None, 128, None, 64, None, 64, None]``).
"""

from __future__ import annotations

import argparse
import ast
from typing import Optional

from mdgat_tpu.core.config import Config, test_defaults, train_defaults


def _parse_k(s: str):
    if s in ("None", "none", ""):
        return None
    val = ast.literal_eval(s)
    if val is None:
        return None
    return tuple(val)


def _parse_bool(s: str) -> bool:
    return str(s).lower() in ("1", "true", "yes", "y")


def build_parser(preset: str) -> argparse.ArgumentParser:
    d = train_defaults() if preset == "train" else test_defaults()
    p = argparse.ArgumentParser(
        description="Point cloud matching ({} preset)".format(preset),
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)

    p.add_argument("--sinkhorn_iterations", type=int,
                   default=d.sinkhorn_iterations)
    p.add_argument("--learning_rate", type=float, default=d.learning_rate)
    p.add_argument("--epoch", type=int, default=d.epoch)
    p.add_argument("--memory_is_enough", type=_parse_bool,
                   default=d.memory_is_enough)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--local_rank", type=int, nargs="*", default=[0],
                   help="accepted for CLI compatibility; device placement "
                        "is managed by the JAX mesh")
    p.add_argument("--resume", type=_parse_bool, default=False)
    p.add_argument("--net", type=str, default=d.net,
                   choices=["mdgat", "superglue", "raw"])
    p.add_argument("--loss_method", type=str, default=d.loss_method,
                   choices=["superglue", "triplet_loss", "gap_loss"])
    p.add_argument("--mutual_check", type=_parse_bool, default=d.mutual_check)
    p.add_argument("--k", type=_parse_k,
                   default=d.k)
    p.add_argument("--l", type=int, default=d.L)
    p.add_argument("--descriptor", type=str, default=d.descriptor,
                   choices=["FPFH", "FPFH_gloabal", "FPFH_only",
                            "pointnet", "pointnetmsg"])
    p.add_argument("--keypoints", type=str, default=d.keypoints)
    p.add_argument("--ensure_kpts_num", type=_parse_bool,
                   default=d.ensure_kpts_num)
    p.add_argument("--max_keypoints", type=int, default=d.max_keypoints)
    p.add_argument("--dataset", type=str, default=d.dataset)
    p.add_argument("--resume_model", type=str, default=d.resume_model)
    p.add_argument("--train_path", type=str, default=d.train_path)
    p.add_argument("--keypoints_path", type=str, default=d.keypoints_path)
    p.add_argument("--txt_path", type=str, default=d.txt_path)
    p.add_argument("--model_out_path", type=str, default=d.model_out_path)
    p.add_argument("--match_threshold", type=float, default=d.match_threshold)
    p.add_argument("--threshold", type=float, default=d.threshold)
    p.add_argument("--triplet_loss_gamma", type=float,
                   default=d.triplet_loss_gamma)
    p.add_argument("--train_step", type=int, default=d.train_step)

    # eval-only flags of the reference test scripts
    if preset == "test":
        p.add_argument("--visualize", type=_parse_bool, default=False)
        p.add_argument("--vis_line_width", type=float, default=0.2)
        p.add_argument("--calculate_pose", type=_parse_bool, default=True)
        p.add_argument("--ship_bf16", type=_parse_bool, default=False,
                       help="ship descriptors to the device as bfloat16 "
                            "(halves the dominant eval upload, ~7.9 -> "
                            "~4.7 MB/batch at the 384-kpt bucket — for "
                            "slow host links; documented divergence: the "
                            "reference computes from f32 descriptors, "
                            "bf16 rounding can flip near-tie matches)")

    # --- TPU-native extras (no reference equivalent) ---
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16", "float64"])
    p.add_argument("--data_parallel", type=int, default=0,
                   help="0 = use all devices on the data mesh axis")
    p.add_argument("--seq_parallel", type=int, default=1)
    p.add_argument("--use_pallas", type=_parse_bool, default=True)
    p.add_argument("--pallas_attention", type=_parse_bool, default=True)
    p.add_argument("--scan_gnn_pairs", type=_parse_bool, default=True,
                   help="lax.scan over equal-signature GNN layer pairs "
                        "(fast compiles); false unrolls the stack — "
                        "~10% faster train step on TPU, slower compile")
    p.add_argument("--pallas_exact_topk", type=_parse_bool, default=False,
                   help="bit-exact top-k selection in the fused kernel")
    p.add_argument("--pallas_train_layer", type=_parse_bool, default=True,
                   help="train: fuse the whole GNN layer (MHA + MLP + "
                        "batch-stat BN + residual) into one Pallas "
                        "custom-VJP kernel pair")
    p.add_argument("--pallas_loss", type=_parse_bool, default=False,
                   help="fused gap-loss kernel (custom VJP); measured "
                        "neutral vs the XLA loss on v5e, off by default")
    p.add_argument("--pallas_interpret", type=_parse_bool, default=False,
                   help="run the Pallas kernels on the CPU interpreter "
                        "(full-Pallas integration path without a TPU)")
    p.add_argument("--shard_map", type=str, default="auto",
                   choices=["auto", "true", "false"],
                   help="explicit shard_map execution over the data mesh "
                        "axis (per-shard Pallas kernels, pmean'd grads, "
                        "psum'd BN stats); auto = on when data>1 with the "
                        "Pallas kernels enabled and no seq sharding")
    p.add_argument("--synthetic", type=_parse_bool, default=False,
                   help="generate a synthetic KITTI-format dataset under "
                        "--train_path if keypoints are absent (demo mode)")
    p.add_argument("--platform", type=str, default="",
                   choices=["", "cpu", "tpu", "axon"],
                   help="force the JAX platform ('' = as configured). "
                        "Needed because JAX_PLATFORMS in the environment "
                        "can be overridden by site config before main() "
                        "runs; this applies jax.config.update before any "
                        "backend is initialized")
    p.add_argument("--prefetch", type=int, default=2,
                   help="train-loop batch prefetch depth: a producer "
                        "thread runs disk IO + batch assembly this many "
                        "batches ahead (DataLoader(num_workers) "
                        "equivalent, reference train.py:166-171); "
                        "0 = serial")
    p.add_argument("--coordinator_address", type=str, default="",
                   help="multi-host: jax.distributed coordinator "
                        "('host:port'); with --num_processes/--process_id "
                        "joins a multi-process runtime (one process per "
                        "TPU host). Empty = single-process unless "
                        "JAX_COORDINATOR_ADDRESS is set in the env")
    p.add_argument("--num_processes", type=int, default=0)
    p.add_argument("--process_id", type=int, default=-1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug_nans", type=_parse_bool, default=False,
                   help="enable jax_debug_nans (NaN provenance; slow)")
    p.add_argument("--trace_dir", type=str, default="",
                   help="write a jax.profiler device trace here")
    p.add_argument("--steps_per_epoch", type=int, default=0,
                   help="0 = full epoch; >0 truncates (smoke runs)")
    p.add_argument("--max_pairs", type=int, default=0,
                   help="eval: 0 = all pairs, >0 truncates")
    return p


def config_from_args(args, preset: str) -> Config:
    base = train_defaults() if preset == "train" else test_defaults()
    cfg = base.replace(
        sinkhorn_iterations=args.sinkhorn_iterations,
        learning_rate=args.learning_rate,
        epoch=args.epoch,
        memory_is_enough=args.memory_is_enough,
        batch_size=args.batch_size,
        resume=args.resume,
        net=args.net,
        loss_method=args.loss_method,
        mutual_check=args.mutual_check,
        k=args.k,
        L=args.l,
        descriptor=args.descriptor,
        keypoints=args.keypoints,
        ensure_kpts_num=args.ensure_kpts_num,
        max_keypoints=args.max_keypoints,
        dataset=args.dataset,
        resume_model=args.resume_model,
        train_path=args.train_path,
        keypoints_path=args.keypoints_path,
        txt_path=args.txt_path,
        model_out_path=args.model_out_path,
        match_threshold=args.match_threshold,
        threshold=args.threshold,
        triplet_loss_gamma=args.triplet_loss_gamma,
        train_step=args.train_step,
        compute_dtype=args.compute_dtype,
        param_dtype=("float64" if args.compute_dtype == "float64"
                     else "float32"),
        data_parallel=args.data_parallel,
        seq_parallel=args.seq_parallel,
        use_pallas=args.use_pallas,
        pallas_attention=args.pallas_attention,
        pallas_exact_topk=args.pallas_exact_topk,
        pallas_train_layer=args.pallas_train_layer,
        pallas_loss=args.pallas_loss,
        pallas_interpret=args.pallas_interpret,
        shard_map=(None if args.shard_map == "auto"
                   else args.shard_map == "true"),
        scan_gnn_pairs=args.scan_gnn_pairs,
        prefetch=args.prefetch,
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
        seed=args.seed,
    )
    if cfg.net == "raw":
        cfg = cfg.replace(k=None, L=9)  # train.py:130-132
    return cfg


def setup_jax(cfg: Config, args=None):
    import jax
    if args is not None and getattr(args, "platform", ""):
        # must precede any backend initialization (the axon site hook
        # force-sets jax_platforms, so the env var alone cannot select CPU)
        from mdgat_tpu.core.platform import force_platform
        force_platform(args.platform)
    from mdgat_tpu.parallel.multihost import initialize_distributed
    if initialize_distributed(cfg.coordinator_address, cfg.num_processes,
                              cfg.process_id):
        # one process per TPU host; must precede the first device use
        print(f"multi-host: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.local_devices())} local / "
              f"{len(jax.devices())} global devices")
    if cfg.compute_dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import os
    from mdgat_tpu.core.platform import backend_is_cpu
    if backend_is_cpu():
        # CPU AOT cache entries are ISA-specific — key the dir by host
        from mdgat_tpu.core.platform import machine_keyed_cache_dir
        cache = machine_keyed_cache_dir()
    else:
        cache = ("/root/.jax_cache" if os.access("/root", os.W_OK)
                 else "/tmp/.jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    if args is not None and getattr(args, "debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    if args is not None and getattr(args, "trace_dir", ""):
        jax.profiler.start_trace(args.trace_dir)
        import atexit
        atexit.register(jax.profiler.stop_trace)


def maybe_generate_synthetic(cfg: Config, args) -> Config:
    """Demo mode: materialize a synthetic KITTI-layout dataset when the
    real keypoint features are absent."""
    import os
    if os.path.isdir(cfg.keypoints_path):
        return cfg
    if not args.synthetic:
        raise SystemExit(
            f"keypoints_path not found: {cfg.keypoints_path}\n"
            "Download the USIP/FPFH keypoint features (see reference "
            "README) or pass --synthetic true for a generated dataset.")
    from mdgat_tpu.data.synthetic import write_synthetic_kitti
    root = cfg.train_path
    n_points = max(300, cfg.max_keypoints)

    def _write():
        print(f"[synthetic] generating KITTI-format dataset under {root}")
        return write_synthetic_kitti(
            root, seqs=(0, 2, 3, 4, 5, 6, 7, 9, 10), frames_per_seq=12,
            pairs_per_seq=24, n_points=n_points,
            seed=cfg.seed,
            # learned-descriptor modes read raw clouds (D10)
            cloud_points=(4 * n_points
                          if cfg.descriptor in ("pointnet", "pointnetmsg")
                          else 0))

    import jax
    if jax.process_count() > 1:
        # multi-host: process 0 writes first (a shared filesystem must not
        # see concurrent writers), everyone barriers, and a process whose
        # HOST-LOCAL path is still missing afterwards writes its own copy
        # (deterministic: same seed -> identical bytes)
        from jax.experimental import multihost_utils
        out_dir = os.path.join(root, "keypoints", "synthetic")
        if jax.process_index() == 0:
            kp_dir = _write()
        multihost_utils.sync_global_devices("synthetic-dataset")
        # shared filesystem: process 0's finished write is visible now;
        # host-local filesystem: write this host's own copy
        kp_dir = out_dir if os.path.isdir(out_dir) else _write()
    else:
        kp_dir = _write()
    return cfg.replace(keypoints_path=kp_dir,
                       txt_path=os.path.join(root, "preprocess-random-full"))


def apply_ship_bf16(dataset, args) -> None:
    """Opt-in ``--ship_bf16``: ship descriptors over the wire as bfloat16
    to halve the dominant host->device upload; ``prepare_batch_fn``
    upcasts to f32 on device before normalization (documented divergence,
    README "Reference divergences"; flip study in
    tools/measure_ship_bf16.py). Shared by both eval CLIs so the shipping
    dtype policy lives in exactly one place."""
    if getattr(args, "ship_bf16", False):
        import ml_dtypes
        dataset.desc_dtype = ml_dtypes.bfloat16
