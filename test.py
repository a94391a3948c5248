#!/usr/bin/env python3
"""Matching + pose evaluation entry point (reference ``test.py``).

Per pair: forward pass, match metrics (precision/accuracy/recall/
repeatability/fp/tp rates), SVD pose fit with inlier count and
translation/rotation errors, fail (<4 matches or pose error over 2m/5deg)
and ban (<10% GT coverage) bookkeeping; prints per-pair lines and the
aggregate means exactly as the reference protocol defines.

TPU-native: pairs are padded to a static bucket with validity masks and
evaluated in batches (``--batch_size``; the reference forced 1) through a
single jitted forward; metric post-processing stays on host numpy.
"""

import time

import numpy as np

from mdgat_tpu.cli import (apply_ship_bf16, build_parser, config_from_args,
                           maybe_generate_synthetic, setup_jax)


def main():
    args = build_parser("test").parse_args()
    cfg = config_from_args(args, "test")
    setup_jax(cfg, args)

    import jax
    import jax.numpy as jnp
    from mdgat_tpu.core.checkpoint import load_checkpoint, load_pth_checkpoint
    from mdgat_tpu.data import SparseDataset, prepare_batch_fn
    from mdgat_tpu.eval import TestEvalAccumulator
    from mdgat_tpu.eval.runner import EvalPipeline
    from mdgat_tpu.models import build_model
    from mdgat_tpu.parallel import make_eval_runtime

    cfg = maybe_generate_synthetic(cfg, args)
    model = build_model(cfg)

    import os
    if not os.path.exists(cfg.resume_model):
        print(f"[warn] checkpoint not found ({cfg.resume_model}); using "
              "random init — metrics will be near-chance")
        params, bn_state = model.init(jax.random.PRNGKey(cfg.seed))
    elif cfg.resume_model.endswith(".pth"):
        params, bn_state, _ = load_pth_checkpoint(
            cfg.resume_model, cfg, dtype=np.dtype(cfg.param_dtype))
        print(f"Resume from {cfg.resume_model}")
    elif cfg.resume_model.endswith(".npz"):
        ck = load_checkpoint(cfg.resume_model)
        params = jax.tree.map(jnp.asarray, ck["params"])
        bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])
        print(f"Resume from {cfg.resume_model}")
    else:
        print("[warn] no checkpoint given (--resume_model); using random "
              "init — metrics will be near-chance")
        params, bn_state = model.init(jax.random.PRNGKey(cfg.seed))

    test_set = SparseDataset(cfg, "test")
    apply_ship_bf16(test_set, args)
    prepare = prepare_batch_fn(cfg.threshold, cfg.mutual_check,
                               cfg.compute_dtype,
                               "float64" if cfg.compute_dtype == "float64"
                               else "float32")
    # multi-device data axis -> shard_map per-shard-kernel eval
    # (parallel/smap.py); single device -> plain jitted step
    eval_step, params, bn_state, shard_inputs = make_eval_runtime(
        model, cfg, params, bn_state, cfg.batch_size)

    acc = TestEvalAccumulator()
    t0 = time.time()

    # multi-host: each process evaluates its contiguous pair block on its
    # local devices; per-pair records merge before the aggregate print
    # (parallel/multihost.py — the reference is single-process only)
    multihost = jax.process_count() > 1
    pair_range = None
    if multihost:
        from mdgat_tpu.parallel.multihost import eval_pair_range
        pair_range = eval_pair_range(len(test_set), args.max_pairs or 0,
                                     cfg.batch_size)

    # three-stage pipeline: producer-thread IO/batching, async device
    # dispatch, one-batch-delayed readback (see eval/runner.py). Only the
    # small outputs ride the tunnel; keypoints/masks are already
    # host-resident in `batch`.
    fetch = (("matches0", "matching_scores0") if args.visualize
             else ("matches0",))
    pipeline = EvalPipeline(test_set, prepare, eval_step, params, bn_state,
                            cfg.batch_size, fetch=fetch,
                            shard_inputs=shard_inputs,
                            pair_range=pair_range)
    t_first = None  # wall time of the first completed batch: on the axon
    n_batches = 0   # tunnel the process's FIRST device op pays a large
    for batch, out in pipeline:   # remote cold-start (~170 s measured
        gt_host = out             # 2026-08-19); report it separately so
        if t_first is None:       # the steady-state rate is visible
            t_first = time.time()
        n_batches += 1

        # batched host post-processing: classification counts as integer
        # [B]-reductions and ONE [B,3,3] SVD pose solve (bit-compatible
        # with the per-pair path — tests/test_metrics.py), then the
        # sequential per-pair print protocol below
        results = acc.update_batch(
            out["matches0"], gt_host["gt_matches0"],
            batch["keypoints0"], batch["keypoints1"],
            batch["mask0"], batch["mask1"], batch["T_gt"],
            calculate_pose=args.calculate_pose)

        for b, (status, mm, pm) in enumerate(results):
            idx = batch["idx0"][b]
            if status == "banned":
                continue
            if status in ("too_few", "pose_fail"):
                print("registration fail")
                continue
            if status == "ok":
                print(
                    "idx{}, inlier {}, rep {:.3f}, inlier_ratio {:.3f}, "
                    "precision {:.3f}, accuracy {:.3f}, recall {:.3f}, "
                    "fp_rate {:.3f}, tp_rate {:.3f}, trans_error {:.3f}, "
                    "rot_error {:.3f}".format(
                        idx, pm["inlier"], mm["repeatability"],
                        pm["inlier_ratio"], mm["precision"], mm["accuracy"],
                        mm["recall"], mm["fp_rate"], mm["tp_rate"],
                        pm["trans_error"], pm["rot_error"]))
            else:  # ok_nopose — reference prints but never appends
                print("idx{}, precision {:.3f}, accuracy {:.3f}, recall "
                      "{:.3f}, true match {}, false match {}, fp_rate "
                      "{:.3f}, tp_rate {:.3f}".format(
                          idx, mm["precision"], mm["accuracy"], mm["recall"],
                          mm["tm"], mm["fm"], mm["fp_rate"],
                          mm["tp_rate"]))

            if args.visualize:
                from mdgat_tpu.eval.visualize import plot_match
                mask = np.asarray(batch["mask0"][b])
                mask1 = np.asarray(batch["mask1"][b])
                kpts0 = np.asarray(batch["keypoints0"][b])[mask]
                kpts1 = np.asarray(batch["keypoints1"][b])[mask1]
                matches = np.asarray(out["matches0"][b])[mask]
                conf = np.asarray(out["matching_scores0"][b])[mask]
                gt0 = np.asarray(gt_host["gt_matches0"][b])[mask]
                valid = matches > -1
                mkpts0 = kpts0[valid]
                mkpts1 = kpts1[matches[valid]]
                tp_mask = (matches > -1) & (matches == gt0)
                fp_mask = (matches > -1) & (gt0 == -1)   # test.py:280
                gt_valid = gt0 > -1
                # pointnet-mode batches carry the raw scans; draw the
                # panels over them like the reference (test.py:322)
                pc0 = (np.asarray(batch["cloud0"][b])
                       if "cloud0" in batch else [])
                pc1 = (np.asarray(batch["cloud1"][b])
                       if "cloud1" in batch else [])
                plot_match(pc0, pc1, kpts0, kpts1, mkpts0, mkpts1,
                           kpts0[gt_valid], kpts1[gt0[gt_valid]],
                           matches, conf[valid], tp_mask, fp_mask,
                           line_radius=args.vis_line_width)

        # multi-host: the cap is already baked into pair_range (it applies
        # to the GLOBAL prefix, then splits across processes)
        if not multihost and args.max_pairs and acc.n_pairs >= args.max_pairs:
            break

    dt = time.time() - t0
    if multihost:
        from mdgat_tpu.parallel.multihost import (allgather_host_vector,
                                                  is_primary)
        states = allgather_host_vector(acc.state_vector())
        if not is_primary():
            return
        acc = TestEvalAccumulator.from_state_vectors(states)
    mean = acc.summary()
    print(
        "average repeatibility: {:.3f}, inlier_mean {:.3f}, "
        "inlier_ratio_mean {:.3f}, fail {:.6f}, precision_mean {:.3f}, "
        "accuracy_mean {:.3f}, recall_mean {:.3f}, true match {:.3f}, "
        "false match {:.3f}, fp_rate_mean {:.3f}, tp_rate_mean {:.3f}, "
        "tp_rate_mean2 {:.3f}, trans_error_mean {:.3f}, rot_error_mean "
        "{:.3f}".format(
            mean["repeatability"], mean["inlier"], mean["inlier_ratio"],
            mean["fail_rate"], mean["precision"], mean["accuracy"],
            mean["recall"], mean["tm"], mean["fm"], mean["fp_rate"],
            mean["tp_rate"], mean["tp_rate2"], mean["trans_error"],
            mean["rot_error"]))
    print("baned_data {}".format(mean["baned_rate"]))
    print(f"[timing] {acc.n_pairs} pairs in {dt:.2f}s = "
          f"{acc.n_pairs / dt:.1f} pairs/s")
    if t_first is not None and n_batches > 1:
        steady = dt - (t_first - t0)
        per_batch = steady / (n_batches - 1)
        print(f"[timing] first batch {t_first - t0:.2f}s (compile + "
              f"tunnel cold-start), then {n_batches - 1} batches in "
              f"{steady:.2f}s = {per_batch:.3f} s/batch "
              f"({(acc.n_pairs / n_batches) / per_batch:.0f} pairs/s "
              f"steady-state)")


if __name__ == "__main__":
    main()
