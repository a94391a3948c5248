#!/usr/bin/env python3
"""Probe: eval-forward throughput vs batch size at the bench config
(256 kpts, bf16 GNN + f32 OT, Pallas kernels).

The bench's pairs/s/chip headline uses batch 64; per-kernel launch and
grid overheads amortize with batch, so a larger deployment batch may
raise throughput for free. Timing per the axon recipe.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 256
K_ENQ = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_bench_cache")
    import __graft_entry__ as g

    tiny = jax.jit(lambda v: v + 1)
    _ = np.asarray(tiny(jax.numpy.ones(())))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(tiny(jax.numpy.ones(())))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    log(f"rtt {rtt * 1e3:.1f} ms")

    for batch in (64, 128, 256):
        model, params, state, data = g._flagship(
            compute_dtype="bfloat16", batch=batch, n=N)

        def forward(p, s, b):
            out, _ = model.apply(p, s, b, train=False)
            return out["matches0"], out["matching_scores0"], out["loss"]

        jfn = jax.jit(forward)
        out = jfn(params, state, data)
        _ = np.asarray(out[2].astype("float32"))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(K_ENQ):
                out = jfn(params, state, data)
            _ = np.asarray(out[2].astype("float32"))
            best = min(best, time.time() - t0 - rtt)
        per_step = best / K_ENQ
        log(f"batch {batch:>3}: {per_step * 1e3:.2f} ms/step -> "
            f"{batch / per_step:.0f} pairs/s")


if __name__ == "__main__":
    main()
