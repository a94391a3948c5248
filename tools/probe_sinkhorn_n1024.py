#!/usr/bin/env python3
"""Probe: Sinkhorn at the stretch config (B=64, N=M=1024, f32, 20 iters).

The trainable-OT path currently falls back to the XLA scan past
``_TRAIN_VMEM_BUDGET`` (12 MB; the full-block residency costs ~17-21 MB
at N=1024), and DESIGN flagged the stretch config as the one place the
fused kernels switch off. But the chip accepts >=21 MB VMEM programs
(probe_sinkhorn_eb measured eb=4 at ~21 MB running, 8% slower than
eb=2 at N=512) — so before building a strip-streaming kernel, measure
whether the EXISTING full-block kernel simply works and wins at eb=1:

  arms: XLA-scan fwd | pallas fwd (eb=1) | XLA fwd+grad | pallas
        trainable fwd+grad (budget bypassed)

Timing per the axon recipe (enqueue K, one readback, subtract RTT).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, N, ITERS = 64, 1024, 20
K_ENQ = 10


def main():
    import jax
    import jax.numpy as jnp
    from mdgat_tpu.ops.pallas import sinkhorn
    from mdgat_tpu.ops.transport import log_optimal_transport

    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_probe_cache")

    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(B, N, N)), jnp.float32)
    alpha = jnp.asarray(1.0, jnp.float32)
    # masked variable-N rows like the eval path
    m0 = jnp.asarray(np.arange(N)[None, :] < rng.integers(N // 2, N + 1, B)[:, None])
    m1 = jnp.asarray(np.arange(N)[None, :] < rng.integers(N // 2, N + 1, B)[:, None])

    tiny = jax.jit(lambda v: v + 1)
    _ = np.asarray(tiny(jnp.ones(())))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(tiny(jnp.ones(())))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    log(f"rtt {rtt * 1e3:.1f} ms")

    sinkhorn._TRAIN_VMEM_BUDGET = 64 * 2 ** 20     # bypass the fallback

    def time_arm(tag, fn, *args):
        try:
            jfn = jax.jit(fn)
            out = jfn(*args)
            ref = np.asarray(jax.tree.leaves(out)[0][:1, :2, :2])
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(K_ENQ):
                    out = jfn(*args)
                _ = np.asarray(jax.tree.leaves(out)[0][:1, :1, :1])
                best = min(best, time.time() - t0 - rtt)
            log(f"{tag:>24}: {best / K_ENQ * 1e3:.2f} ms/call")
            return ref
        except Exception as e:  # noqa: BLE001 — probe records failures
            log(f"{tag:>24}: FAILED {type(e).__name__}: {e}")
            return None

    def xla_fwd(s):
        return log_optimal_transport(s, alpha, ITERS,
                                     row_mask=m0, col_mask=m1).dense

    def pallas_fwd(s):
        return sinkhorn.pallas_log_optimal_transport(
            s, alpha, ITERS, row_mask=m0, col_mask=m1,
            interpret=False).dense

    def xla_grad(s):
        f = lambda x: jnp.sum(jnp.where(
            m0[:, :, None] & m1[:, None, :],
            log_optimal_transport(x, alpha, ITERS, row_mask=m0,
                                  col_mask=m1).dense, 0.0))
        return jax.grad(f)(s)

    def pallas_grad(s):
        f = lambda x: jnp.sum(jnp.where(
            m0[:, :, None] & m1[:, None, :],
            sinkhorn.pallas_log_optimal_transport_trainable(
                x, alpha, ITERS, row_mask=m0, col_mask=m1,
                interpret=False).dense, 0.0))
        return jax.grad(f)(s)

    r_xla = time_arm("xla scan fwd", xla_fwd, scores)
    r_pal = time_arm("pallas fwd eb=1", pallas_fwd, scores)
    if r_xla is not None and r_pal is not None:
        log(f"fwd parity: max|d| = {np.abs(r_xla - r_pal).max():.2e}")
    g_xla = time_arm("xla scan fwd+grad", xla_grad, scores)
    g_pal = time_arm("pallas trainable grad", pallas_grad, scores)
    if g_xla is not None and g_pal is not None:
        log(f"grad parity: max|d| = {np.abs(g_xla - g_pal).max():.2e}")


if __name__ == "__main__":
    main()
