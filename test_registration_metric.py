#!/usr/bin/env python3
"""Registration-recall evaluation (reference ``test_registration_metric.py``).

FCGF/D3Feat-style protocol: AverageMeters over repeatability / inlier /
precision (inlier ratio) / recall / fp,tp rates; SVD pose fit; RTE
accumulated when < 2 m, RRE when < 5 deg; registration recall = fraction
of pairs passing both; final F1 computed from the run-averaged precision
and recall.
"""

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
    from mdgat_tpu.eval import (AverageMeter, registration_batch_metrics,
                                registration_summary)
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
    elif cfg.resume_model.endswith(".npz"):
        ck = load_checkpoint(cfg.resume_model)
        params = jax.tree.map(jnp.asarray, ck["params"])
        bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])
    else:
        print("[warn] no checkpoint; random init")
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

    # multi-host: each process evaluates its contiguous pair block on its
    # local devices; meter update histories merge (replayed in process
    # order — bit-identical to a single sequential pass) before the
    # aggregate print (parallel/multihost.py — the reference is
    # single-process only)
    multihost = jax.process_count() > 1
    pair_range = None
    if multihost:
        from mdgat_tpu.parallel.multihost import eval_pair_range
        pair_range = eval_pair_range(len(test_set), args.max_pairs or 0,
                                     cfg.batch_size)

    METER_KEYS = ("rep", "rre", "rte", "inlier", "inlier_ratio", "recall",
                  "tp_rate", "fp_rate", "RR")
    meters = {k: AverageMeter(record=multihost) for k in METER_KEYS}
    baned_data = 0
    n_pairs = 0
    import time
    t0 = time.time()

    pipeline = EvalPipeline(test_set, prepare, eval_step, params, bn_state,
                            cfg.batch_size, fetch=("matches0",),
                            shard_inputs=shard_inputs,
                            pair_range=pair_range)
    t_first = None  # first-completed-batch wall time (splits the axon
    n_batches = 0   # tunnel's per-process cold-start out of the rate)
    for batch, out in pipeline:
        gt_host = out
        if t_first is None:
            t_first = time.time()
        n_batches += 1

        # batched host post-processing (integer count reductions + one
        # [B,3,3] SVD solve — bit-compatible with the per-pair path,
        # tests/test_metrics.py); the sequential meter/print protocol of
        # the reference stays below. Empty match sets give nan rte/rre
        # (the reference crashes there; README divergence).
        results = registration_batch_metrics(
            out["matches0"], gt_host["gt_matches0"],
            batch["keypoints0"], batch["keypoints1"],
            batch["mask0"], batch["mask1"], batch["T_gt"],
            calculate_pose=args.calculate_pose)

        for b, (mm, rte, rre) in enumerate(results):
            n_pairs += 1
            idx = batch["idx0"][b]

            if mm["banned"]:
                baned_data += 1
                continue
            meters["rep"].update(mm["repeatability"])
            meters["fp_rate"].update(mm["fp_rate"])
            meters["tp_rate"].update(mm["tp_rate"])
            meters["recall"].update(mm["recall"])
            meters["inlier_ratio"].update(mm["precision"])
            meters["inlier"].update(mm["tm"])

            if args.calculate_pose:
                if rte < 2:
                    meters["rte"].update(rte)
                if not np.isnan(rre) and rre < np.pi / 180 * 5:
                    meters["rre"].update(rre)
                if rte < 2 and not np.isnan(rre) and rre < np.pi / 180 * 5:
                    meters["RR"].update(1)
                    print(
                        "idx{}, rep {:.3f}, inlier {}, precision(inlier "
                        "ratio) {:.3f}, recall {:.3f}, fp_rate {:.3f}, "
                        "tp_rate {:.3f}, RTE {:.3f}, RRE {:.3f}".format(
                            idx, mm["repeatability"], mm["tm"],
                            mm["precision"], mm["recall"], mm["fp_rate"],
                            mm["tp_rate"], rte, rre))
                else:
                    meters["RR"].update(0)
                    print(f"idx{idx}, rep {mm['repeatability']:.3f}, "
                          "registration fail")
            else:
                print("idx{}, rep {:.3f}, inlier {}, precision(inlier "
                      "ratio) {:.3f}, recall {:.3f}, fp_rate {:.3f}, "
                      "tp_rate {:.3f}".format(
                          idx, mm["repeatability"], mm["tm"],
                          mm["precision"], mm["recall"], mm["fp_rate"],
                          mm["tp_rate"]))

        # multi-host: the cap is already baked into pair_range (it applies
        # to the GLOBAL prefix, then splits across processes)
        if not multihost and args.max_pairs and n_pairs >= args.max_pairs:
            break

    if multihost:
        from mdgat_tpu.eval import merge_meter_records, pack_meter_records
        from mdgat_tpu.parallel.multihost import (allgather_host_vector,
                                                  is_primary)
        local = pack_meter_records([baned_data, n_pairs], meters,
                                   METER_KEYS)
        states = allgather_host_vector(local)
        if not is_primary():
            return
        head, meters = merge_meter_records(states, METER_KEYS)
        baned_data, n_pairs = int(head[0]), int(head[1])

    s = registration_summary(meters)
    print("repeatibility, inlier, RR || precision(inlier ratio), recall, "
          "F1 || fp_rate, tp_rate || RTE, RRE")
    print("{:.3f} {:.1f} {:.3f} || {:.3f} {:.3f}  {:.3f} || {:.3f}  "
          "{:.3f} || {:.3f} {:.3f}".format(
              s["repeatability"], s["inlier"], s["RR"], s["precision"],
              s["recall"], s["F1"], s["fp_rate"], s["tp_rate"],
              s["RTE"], s["RRE"]))
    print("baned_data {}".format(baned_data / max(n_pairs, 1)))
    dt = time.time() - t0
    print(f"[timing] {n_pairs} pairs in {dt:.2f}s = "
          f"{n_pairs / dt:.1f} pairs/s")
    if t_first is not None and n_batches > 1:
        steady = dt - (t_first - t0)
        per_batch = steady / (n_batches - 1)
        print(f"[timing] first batch {t_first - t0:.2f}s (compile + "
              f"tunnel cold-start), then {n_batches - 1} batches in "
              f"{steady:.2f}s = {per_batch:.3f} s/batch "
              f"({(n_pairs / n_batches) / per_batch:.0f} pairs/s "
              f"steady-state)")


if __name__ == "__main__":
    main()
