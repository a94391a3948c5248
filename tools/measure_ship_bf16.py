#!/usr/bin/env python3
"""Match-flip measurement for ``--ship_bf16`` (bf16 descriptor shipping).

Runs the eval pipeline twice over the IDENTICAL test set — descriptors
shipped float32 (the parity default) vs bfloat16 (upcast to f32 on
device before normalization, ``data/pipeline.py:345-350``) — and counts
per-slot match disagreements on valid (unpadded) rows. This is the
measured half of the README "Reference divergences" entry for
``--ship_bf16``: the reference (``test.py:131-132``) computes from f32
descriptors, so bf16 wire rounding can flip near-tie assignments; the
steady-state s/batch halves come from the eval CLI's own ``[timing]``
split line run both ways.

Usage mirrors test.py (same flags); run on the real chip, e.g.::

    python tools/measure_ship_bf16.py --train_path /tmp/kd_wire/ \
        --keypoints_path /tmp/kd_wire/keypoints/synthetic \
        --txt_path /tmp/kd_wire/preprocess-random-full \
        --resume_model <ckpt.npz> --max_keypoints 512 --batch_size 64

Prints one JSON line: valid slots, matched slots, flip count/rate, and
the flip breakdown (match<->unmatch vs retargeted).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdgat_tpu.cli import (build_parser, config_from_args,  # noqa: E402
                           maybe_generate_synthetic, setup_jax)


def main():
    args = build_parser("test").parse_args()
    cfg = config_from_args(args, "test")
    setup_jax(cfg, args)

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from mdgat_tpu.core.checkpoint import load_checkpoint, load_pth_checkpoint
    from mdgat_tpu.data import SparseDataset, prepare_batch_fn
    from mdgat_tpu.eval.runner import EvalPipeline
    from mdgat_tpu.models import build_model
    from mdgat_tpu.parallel import make_eval_runtime

    cfg = maybe_generate_synthetic(cfg, args)
    model = build_model(cfg)
    if cfg.resume_model.endswith(".pth"):
        params, bn_state, _ = load_pth_checkpoint(
            cfg.resume_model, cfg, dtype=np.dtype(cfg.param_dtype))
    else:
        ck = load_checkpoint(cfg.resume_model)
        params = jax.tree.map(jnp.asarray, ck["params"])
        bn_state = jax.tree.map(jnp.asarray, ck["bn_state"])

    test_set = SparseDataset(cfg, "test")
    prepare = prepare_batch_fn(cfg.threshold, cfg.mutual_check,
                               cfg.compute_dtype,
                               "float64" if cfg.compute_dtype == "float64"
                               else "float32")
    eval_step, params, bn_state, shard_inputs = make_eval_runtime(
        model, cfg, params, bn_state, cfg.batch_size)
    pair_range = (0, args.max_pairs) if args.max_pairs else None

    def collect(desc_dtype):
        """[(matches0 [B,N], mask0 [B,N])] per batch, dataset order."""
        test_set.desc_dtype = desc_dtype
        pipe = EvalPipeline(test_set, prepare, eval_step, params, bn_state,
                            cfg.batch_size, fetch=("matches0",),
                            shard_inputs=shard_inputs, pair_range=pair_range)
        return [(np.asarray(out["matches0"]), np.asarray(batch["mask0"]))
                for batch, out in pipe]

    f32 = collect(np.float32)
    b16 = collect(ml_dtypes.bfloat16)
    assert len(f32) == len(b16), "pass batch counts diverged"

    valid = matched = flips = to_unmatch = from_unmatch = retarget = 0
    for (m32, k32), (m16, k16) in zip(f32, b16):
        assert m32.shape == m16.shape and (k32 == k16).all(), \
            "the two passes saw different batches"
        v = k32
        d = (m32 != m16) & v
        valid += int(v.sum())
        matched += int(((m32 >= 0) & v).sum())
        flips += int(d.sum())
        to_unmatch += int((d & (m16 < 0)).sum())
        from_unmatch += int((d & (m32 < 0)).sum())
        retarget += int((d & (m32 >= 0) & (m16 >= 0)).sum())

    print(json.dumps({
        "pairs": sum(m.shape[0] for m, _ in f32),  # pipe trims pad rows
        "valid_slots": valid,
        "matched_slots_f32": matched,
        "flips": flips,
        "flip_rate_vs_valid": round(flips / max(valid, 1), 6),
        "flips_match_to_unmatch": to_unmatch,
        "flips_unmatch_to_match": from_unmatch,
        "flips_retargeted": retarget,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
