#!/usr/bin/env python3
"""A/B/C probe: the three ``_EPILOGUE`` softmax-epilogue variants
(deferred_where / deferred_mul / legacy_norm), interleaved in one
process (same tunnel conditions).

Motivation: the first post-relay ``bench.py`` run measured an ~11% eval
regression vs the last pre-epilogue-change chip numbers while the
(unchanged) Sinkhorn kernel got FASTER — so the epilogue rework
(deferred normalization 0179cde + where-based exp 66fd0e8), not tunnel
drift, is the prime suspect; the selection A/B already exonerated the
k-ary selector (it measures ~2.5% faster than binary).

Times the eval forward at the bench config (batch 64, N 256) per arm;
the module gate retraces fresh jit closures per arm, no git state.
Timing per the axon recipe (enqueue K, one readback, subtract RTT).
Run the train config afterwards via bench.py with the winning default.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_ENQ = 30
ARMS = ("deferred_where", "deferred_mul", "legacy_norm")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_bench_cache")
    import __graft_entry__ as g
    import mdgat_tpu.ops.pallas.attention as A

    tiny = jax.jit(lambda v: v + 1)
    _ = np.asarray(tiny(jax.numpy.ones(())))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(tiny(jax.numpy.ones(())))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    log(f"rtt {rtt * 1e3:.1f} ms")

    results = {}
    for rep in range(2):            # interleave arms to cancel drift
        for mode in ARMS:
            A._EPILOGUE = mode

            model, params, state, data = g._flagship(
                compute_dtype="bfloat16", batch=64, n=256)

            def forward(p, s, b):
                out, _ = model.apply(p, s, b, train=False)
                return out["matches0"], out["loss"]

            jfn = jax.jit(forward)
            _ = np.asarray(jfn(params, state, data)[1].astype("float32"))
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(K_ENQ):
                    out = jfn(params, state, data)
                _ = np.asarray(out[1].astype("float32"))
                best = min(best, time.time() - t0 - rtt)
            ev = best / K_ENQ
            log(f"[rep{rep}] eval {mode:>14}: {ev * 1e3:.2f} ms/step "
                f"({64 / ev:.0f} pairs/s)")
            results.setdefault(mode, []).append(ev)

    for mode, vals in results.items():
        ev = min(vals)
        log(f"BEST {mode}: eval {ev * 1e3:.2f} ms ({64 / ev:.0f} pairs/s)")


if __name__ == "__main__":
    main()
