#!/usr/bin/env python3
"""Minimal Mosaic bf16-internals probes (DESIGN.md "Known headroom").

Round 2 found bf16 *internal* compute (scalars, compare+reduce sweeps,
matmuls) failing to compile on this toolchain, forcing f32 kernel
internals with bf16 HBM I/O. Re-run this after toolchain bumps; if a
probe passes, the bisection/softmax VPU sweeps can drop to bf16 and
roughly halve their pass cost (the workload is VPU-bound — DESIGN.md
"Roofline / MFU").

Each probe compiles + runs one tiny kernel on the real TPU and prints
PASS/FAIL with the exception head. Run: `python tools/probe_bf16_kernel.py`.
"""

import functools
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _run(name, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"PASS {name}: out dtype={out.dtype} shape={out.shape}")
        return True
    except Exception as e:  # noqa: BLE001 — report and continue
        head = "".join(traceback.format_exception_only(type(e), e))[:400]
        print(f"FAIL {name}: {head}")
        return False


def probe_compare_reduce():
    """bf16 compare + row-count reduce — the bisection sweep pattern."""
    def kernel(x_ref, o_ref):
        x = x_ref[...]                       # bf16 [256, 256]
        mid = jnp.asarray(0.0, jnp.bfloat16)
        cnt = jnp.sum((x >= mid).astype(jnp.bfloat16), axis=1,
                      keepdims=True)         # bf16 accumulate
        o_ref[...] = cnt

    x = jnp.asarray(np.random.randn(256, 256), jnp.bfloat16)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 1), jnp.bfloat16))(x)


def probe_softmax():
    """bf16 masked softmax sweep (max/exp/sum all in bf16)."""
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        m = jnp.max(x, axis=1, keepdims=True)
        e = jnp.exp(x - m)
        o_ref[...] = e / jnp.sum(e, axis=1, keepdims=True)

    x = jnp.asarray(np.random.randn(256, 256), jnp.bfloat16)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16))(x)


def probe_matmul():
    """bf16 x bf16 -> bf16 MXU matmul with bf16 accumulation type."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.bfloat16)

    a = jnp.asarray(np.random.randn(256, 128), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(128, 256), jnp.bfloat16)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16))(a, b)


def probe_matmul_f32acc():
    """bf16 x bf16 -> f32 MXU matmul (f32 accumulation) — the MXU's
    native fast mode; the kernels currently up-cast operands to f32
    first, which may cost multi-pass f32 matmuls."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.randn(256, 128), jnp.bfloat16)
    b = jnp.asarray(np.random.randn(128, 256), jnp.bfloat16)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(a, b)


def probe_matmul_mixed():
    """f32 x bf16 -> f32 matmul (mixed operand dtypes)."""
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                             preferred_element_type=jnp.float32)

    a = jnp.asarray(np.random.randn(256, 128), jnp.float32)
    b = jnp.asarray(np.random.randn(128, 256), jnp.bfloat16)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32))(a, b)


def probe_scalar_broadcast():
    """bf16 scalar threshold broadcast against a bf16 block."""
    def kernel(x_ref, t_ref, o_ref):
        t = t_ref[0, 0]                      # bf16 scalar from VMEM
        o_ref[...] = jnp.where(x_ref[...] >= t, x_ref[...],
                               jnp.asarray(-1e30, jnp.bfloat16))

    x = jnp.asarray(np.random.randn(256, 256), jnp.bfloat16)
    t = jnp.zeros((1, 1), jnp.bfloat16)
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16))(x, t)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}, {jax.devices()}")
    results = {p.__name__: _run(p.__name__, p) for p in
               (probe_compare_reduce, probe_softmax, probe_matmul,
                probe_matmul_f32acc, probe_matmul_mixed,
                probe_scalar_broadcast)}
    sys.exit(0 if all(results.values()) else 1)
