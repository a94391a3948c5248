#!/usr/bin/env python3
"""MXU rate probe: f32-operand vs bf16-operand (f32-acc) matmuls inside
a Pallas kernel.

Decides whether the attention kernels' f32 up-cast before `dot_general`
costs real MXU passes (f32 matmuls decompose into multiple bf16 passes
unless Mosaic already lowers DEFAULT precision to one pass). A chained
dependency (x <- x @ B) prevents hoisting; per-iteration cast keeps the
bf16 variant's operands bf16 while accumulating in f32 — exactly the
shape of the proposed kernel change.

Timing per the axon recipe: enqueue K dispatches, one final readback,
subtract the measured tunnel RTT (CLAUDE.md).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N = 256
ITERS = 64


LANES = 8  # independent chains: one chain is MXU-latency-bound (measured
           # 21 us per dependent 512x512 matmul vs ~6 us roofline)


def make_fn(op_dtype):
    def kernel(x_ref, b_ref, o_ref):
        b = b_ref[...]

        def body(_, xs):
            out = []
            for i, x in enumerate(xs):
                y = jax.lax.dot_general(
                    x, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # rescale keeps values bounded; the cast keeps operands
                # op_dtype — exactly the proposed kernel-change shape
                out.append((y * jnp.asarray(1.0 / N + i * 1e-9,
                                            jnp.float32)).astype(op_dtype))
            return tuple(out)

        x0 = x_ref[...]
        xs = tuple(x0 * jnp.asarray(1.0 + i * 1e-3, op_dtype)
                   for i in range(LANES))
        xs = jax.lax.fori_loop(0, ITERS, body, xs, unroll=False)
        acc = xs[0].astype(jnp.float32)
        for x in xs[1:]:
            acc = acc + x.astype(jnp.float32)
        o_ref[...] = acc

    @jax.jit
    def fn(x, b):
        return pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        )(x.astype(op_dtype), b.astype(op_dtype))

    return fn


def time_fn(fn, x, b, reps=20):
    out = fn(x, b)
    np.asarray(out)  # compile + warm
    tiny = jax.jit(lambda v: v + 1)
    t = tiny(jnp.ones(()))
    np.asarray(t)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(tiny(t))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    t0 = time.time()
    for _ in range(reps):
        out = fn(x, b)
    np.asarray(out)
    dt = (time.time() - t0 - rtt) / reps
    return dt


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, {jax.devices()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(N, N)), jnp.float32)
    flops = 2 * N * N * N * ITERS * LANES
    for name in ("float32", "bfloat16"):
        fn = make_fn(jnp.dtype(name))
        dt = time_fn(fn, x, b)
        print(f"{name}: {dt * 1e3:.3f} ms / {ITERS} chained {N}x{N} "
              f"matmuls -> {flops / dt / 1e12:.1f} TFLOP/s")
