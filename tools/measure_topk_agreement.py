#!/usr/bin/env python3
"""Measure fast-vs-exact top-k attention agreement on real TPU.

Runs the flagship eval forward (bf16 + Pallas, N=256) on synthetic pairs
three ways — fast value-bisection kernel, exact integer-key kernel, and
the XLA top_k threshold path — and reports match-decision agreement plus
the end-metric deltas (precision/recall over synthetic GT).

Usage: python tools/measure_topk_agreement.py [n_batches]
           [--dtype float32|bfloat16] [--iters V ...]
``--iters`` adds one fast arm per bisection-resolution value (sweep arms
pin BOTH _BISECT_ITERS_FAST and _BISECT_ITERS_F32 to V so the dtype
keying in ``_fast_iters`` cannot override the sweep; the plain "fast"
arm runs the shipped per-dtype default). ``--dtype`` selects the
pipeline compute dtype — bfloat16 is the flagship/bench path, float32
the CLI default. Results are pinned in docs/DESIGN.md; rerun after
kernel changes.
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main(n_batches: int = 4, iters_values=(), dtype: str = "bfloat16"):
    import jax
    import jax.numpy as jnp
    from mdgat_tpu.core.config import train_defaults
    from mdgat_tpu.models import MDGAT
    from mdgat_tpu.eval import matching_metrics
    from mdgat_tpu.ops.pallas import attention as A
    from __graft_entry__ import _flagship

    variants = {
        "fast": dict(pallas_attention=True, pallas_exact_topk=False),
        "exact": dict(pallas_attention=True, pallas_exact_topk=True),
        "xla": dict(pallas_attention=False),
    }
    default_fast = A._BISECT_ITERS_FAST
    default_f32 = A._BISECT_ITERS_F32
    default_iters = A._fast_iters(
        jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    fast_iters = {"fast": None}  # None = shipped per-dtype default
    for v in iters_values:
        if v != default_iters:
            name = f"fast@{v}"
            variants[name] = dict(pallas_attention=True,
                                  pallas_exact_topk=False)
            fast_iters[name] = v
    matches = {k: [] for k in variants}
    metrics = {k: {"precision": [], "recall": []} for k in variants}

    for i in range(n_batches):
        _, params, state, batch = _flagship(
            compute_dtype=dtype, param_dtype="float32",
            n=256, batch=64, seed=100 + i)
        for name, overrides in variants.items():
            v = fast_iters.get(name)
            # sweep arms pin BOTH constants so _fast_iters returns v for
            # either dtype; the "fast"/exact/xla arms run shipped values
            A._BISECT_ITERS_FAST = default_fast if v is None else v
            A._BISECT_ITERS_F32 = default_f32 if v is None else v
            cfg = train_defaults(compute_dtype=dtype,
                                 param_dtype="float32",
                                 max_keypoints=256, batch_size=64,
                                 **overrides)
            model = MDGAT(cfg)
            out, _ = jax.jit(
                lambda p, s, b, m=model: m.apply(p, s, b, train=False)
            )(params, state, batch)
            m0 = np.asarray(out["matches0"])
            matches[name].append(m0)
            gt0 = np.asarray(batch["gt_matches0"])
            for b in range(m0.shape[0]):
                mm = matching_metrics(m0[b], gt0[b])
                metrics[name]["precision"].append(mm["precision"])
                metrics[name]["recall"].append(mm["recall"])

    ref = np.concatenate([m.ravel() for m in matches["xla"]])
    n = ref.size
    print(f"pairs: {n_batches * 64}, match slots: {n}")
    for name in variants:
        mv = np.concatenate([m.ravel() for m in matches[name]])
        agree = float((mv == ref).mean())
        p = float(np.mean(metrics[name]["precision"]))
        r = float(np.mean(metrics[name]["recall"]))
        print(f"{name:6s}: agreement-vs-xla {agree:.6f} "
              f"({int((mv != ref).sum())} / {n} differ), "
              f"precision {p:.6f}, recall {r:.6f}")
    # fast vs exact shares the in-kernel score computation, so this
    # isolates the selection approximation itself
    me = np.concatenate([m.ravel() for m in matches["exact"]])
    for name in variants:
        if not name.startswith("fast"):
            continue
        mf = np.concatenate([m.ravel() for m in matches[name]])
        print(f"{name}-vs-exact (same scores, iters="
              f"{fast_iters[name] or default_iters}): agreement "
              f"{float((mf == me).mean()):.6f} "
              f"({int((mf != me).sum())} / {n} differ)")


if __name__ == "__main__":
    args = sys.argv[1:]
    it_vals = []
    dtype = "bfloat16"
    if "--dtype" in args:
        k = args.index("--dtype")
        dtype = args[k + 1]
        args = args[:k] + args[k + 2:]
    if "--iters" in args:
        k = args.index("--iters")
        it_vals = [int(v) for v in args[k + 1:]]
        args = args[:k]
    main(int(args[0]) if args else 4, it_vals, dtype)
