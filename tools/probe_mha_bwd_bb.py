#!/usr/bin/env python3
"""Probe: MHA-backward block-batching budget sweep (real TPU).

The attention/train-layer backward kernels block batch elements under
``attention._BWD_BB_BUDGET`` (13 MB / ``_BWD_LIVE`` = 5 charged [N, M]
f32 temporaries -> bb=2 at the reference train config b=64, N=M=512).
The lse-residual rebuild removed the masked-score and exp-numerator
temporaries from the live set (~4 real buffers per head iteration:
s, p, dp, ds), so wider blocks are legal — this measures whether they
are *faster* (fewer grid programs) or neutral/slower (the [512, 512]
VPU sweeps already fill the machine, as both Sinkhorn blocking probes
measured).

Isolated fused_train_layer fwd+grad at the exact train-path shapes
(this path contains the shared ``_mha_bwd_block``); timing per the axon
recipe (enqueue K, one readback, subtract RTT).
"""

import os
import sys
import time

import numpy as np

# repo import without PYTHONPATH (which would shadow the axon site dir)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, N, D, H, TOPK = 64, 512, 128, 4, 20
K_ENQ = 20


def main():
    import jax
    import jax.numpy as jnp
    from mdgat_tpu.models.gnn import attentional_propagation_init
    from mdgat_tpu.ops.pallas import attention as pa

    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_probe_cache")

    lp, st = attentional_propagation_init(jax.random.PRNGKey(0), D, H)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)

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
    for budget_mb in (13, 26, 52):
        pa._BWD_BB_BUDGET = budget_mb * 2 ** 20
        bb = pa._mha_blocking(B, H, N, N, False, topk=0, backward=True)

        def loss_fn(p, xx, ss):
            y, mean, var = pa.fused_train_layer(
                TOPK, H, False, False, None, p, xx, ss, None, None)
            return jnp.sum(y) + jnp.sum(mean) + jnp.sum(var)

        fn = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
        try:
            dp, dx = fn(lp, x, src)
            _ = np.asarray(dx[0, 0, 0])  # compile + execute
        except Exception as e:
            log(f"budget {budget_mb:>2} MB -> bb={bb}: FAILED "
                f"({type(e).__name__}: {str(e)[:200]})")
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(K_ENQ):
                dp, dx = fn(lp, x, src)
            _ = np.asarray(dx[0, 0, 0])
            best = min(best, time.time() - t0 - rtt)
        ms = best / K_ENQ * 1e3
        results[budget_mb] = (bb, ms)
        log(f"budget {budget_mb:>2} MB -> bb={bb}: {ms:.2f} ms/fwd+grad")

    if 13 in results:
        base = results[13][1]
        for mb, (bb, ms) in results.items():
            log(f"  {mb} MB (bb={bb}): {ms:.2f} ms  "
                f"({ms / base * 100:.0f}% of 13 MB baseline)")


if __name__ == "__main__":
    main()
