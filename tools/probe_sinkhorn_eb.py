#!/usr/bin/env python3
"""Probe: Sinkhorn-backward element-blocking budget sweep (real TPU).

The trainable-OT backward kernel blocks elements under
``sinkhorn._BWD_EB_BUDGET`` (10 MB -> eb=2 at the reference train config
b=64, N=M=512, f32, 20 iters). The chip's VMEM limit is 56 MB, so wider
blocks (eb=4 at ~21 MB, eb=8 at ~42 MB) are legal — this measures
whether they are *faster* (fewer grid programs / better pipelining) or
neutral (the [512,512] reverse sweeps already fill the VPU, as the
forward-batching experiment bd7f8ac measured).

Isolated fwd+grad of the trainable OT at the exact train-path shapes;
timing per the axon recipe (enqueue K, one readback, subtract RTT).
"""

import os
import sys
import time

import numpy as np

# repo import without PYTHONPATH (which would shadow the axon site dir —
# see memory/CLAUDE.md)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, N, ITERS = 64, 512, 20
K_ENQ = 20


def main():
    import jax
    import jax.numpy as jnp
    from mdgat_tpu.ops.pallas import sinkhorn

    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_probe_cache")

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32)
    alpha = jnp.asarray(1.0, jnp.float32)

    tiny = jax.jit(lambda v: v + 1)
    _ = np.asarray(tiny(jnp.ones(())))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(tiny(jnp.ones(())))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    log(f"rtt {rtt * 1e3:.1f} ms")

    results = {}
    for budget_mb in (10, 21):
        sinkhorn._BWD_EB_BUDGET = budget_mb * 2 ** 20
        eb = 8
        while eb > 1 and 5 * eb * N * N * 4 > sinkhorn._BWD_EB_BUDGET:
            eb //= 2

        def loss_fn(s):
            ot = sinkhorn.pallas_log_optimal_transport_trainable(
                s, alpha, ITERS)
            return jnp.sum(ot.dense) + jnp.sum(ot.bin_row) \
                + jnp.sum(ot.bin_col) + jnp.sum(ot.corner)

        fn = jax.jit(jax.grad(loss_fn))  # fresh fn object -> fresh trace
        g = fn(scores)
        _ = np.asarray(g[0, 0, 0])  # compile + execute
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(K_ENQ):
                g = fn(scores)
            _ = np.asarray(g[0, 0, 0])
            best = min(best, time.time() - t0 - rtt)
        ms = best / K_ENQ * 1e3
        results[budget_mb] = (eb, ms)
        log(f"budget {budget_mb:>2} MB -> eb={eb}: {ms:.2f} ms/step")

    base = results[10][1]
    for mb, (eb, ms) in results.items():
        log(f"  {mb} MB (eb={eb}): {ms:.2f} ms  ({ms / base * 100:.0f}% "
            "of 10 MB baseline)")


if __name__ == "__main__":
    main()
