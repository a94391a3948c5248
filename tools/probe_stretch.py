#!/usr/bin/env python3
"""Measure the 1024-keypoint stretch config (BASELINE configs[4]) on TPU.

Eval forward (batch 8, N 1024, bf16) and full train step (batch 8,
N 1024, bf16 + f32 params, remat, unrolled GNN) with bench.py's timing
protocol (enqueue K, one readback, subtract median RTT). Round-2 floor:
710-735 pairs/s eval / 38.3 ms train (XLA-scan Sinkhorn fallback).

Optional interleaved gate arms over ``mdgat_tpu.ops.pallas.attention``
module gates, probe_gate_ab style:

    probe_stretch.py                       # defaults only
    probe_stretch.py '_TL_BUDGET=13631488' '_TL_BUDGET=25165824'
    probe_stretch.py --eval-only '_PACK_F32=True' '_PACK_F32=False'

Each arm resets every touched gate to its import-time default first, so
arms are independent; 2 interleaved reps cancel tunnel drift.
"""

import ast
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 1024
BATCH = 8
K_EVAL = 20
K_TRAIN = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_arm(spec):
    out = {}
    if spec in ("defaults", ""):
        return out
    for part in spec.split("+"):
        name, _, raw = part.partition("=")
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw
        out[name.strip()] = val
    return out


def main():
    argv = [a for a in sys.argv[1:]
            if a not in ("--eval-only", "--train-only")]
    do_train = "--eval-only" not in sys.argv[1:]
    do_eval = "--train-only" not in sys.argv[1:]
    arms = [parse_arm(a) for a in argv] or [{}]

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_bench_cache")
    import __graft_entry__ as g
    import mdgat_tpu.ops.pallas.attention as A
    from mdgat_tpu.train import create_train_state, make_train_step

    defaults = {}
    for arm in arms:
        for name in arm:
            assert hasattr(A, name), f"no gate {name!r} in pallas.attention"
            defaults.setdefault(name, getattr(A, name))

    tiny = jax.jit(lambda v: v + 1)
    _ = np.asarray(tiny(jax.numpy.ones(())))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(tiny(jax.numpy.ones(())))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    log(f"rtt {rtt*1e3:.1f} ms")

    results = {}
    for rep in range(2 if len(arms) > 1 else 1):
        for arm in arms:
            for name, val in defaults.items():
                setattr(A, name, val)
            for name, val in arm.items():
                setattr(A, name, val)
            tag = "+".join(f"{k}={v}" for k, v in arm.items()) or "defaults"

            ev = float("nan")
            if do_eval:
                model, params, state, data = g._flagship(
                    compute_dtype="bfloat16", batch=BATCH, n=N)
                fwd = jax.jit(
                    lambda p, s, b: model.apply(p, s, b,
                                                train=False)[0]["loss"])
                _ = np.asarray(fwd(params, state, data).astype("float32"))
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(K_EVAL):
                        out = fwd(params, state, data)
                    _ = np.asarray(out.astype("float32"))
                    best = min(best, time.time() - t0 - rtt)
                ev = best / K_EVAL
                log(f"[rep{rep}] eval  {tag}: {ev*1e3:.2f} ms/step "
                    f"({BATCH/ev:.0f} pairs/s)")

            tr = float("nan")
            if do_train:
                tmodel, _, _, tdata = g._flagship(
                    compute_dtype="bfloat16", param_dtype="float32",
                    n=N, batch=BATCH, remat_gnn=True, scan_gnn_pairs=False)
                ts, tx = create_train_state(tmodel, jax.random.PRNGKey(0),
                                            1e-4)
                tstep = make_train_step(tmodel, tx, donate=False)
                ts, mtr = tstep(ts, tdata)
                _ = np.asarray(mtr["loss"])
                best_t = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    for _ in range(K_TRAIN):
                        ts, mtr = tstep(ts, tdata)
                    _ = np.asarray(mtr["loss"])
                    best_t = min(best_t, time.time() - t0 - rtt)
                tr = best_t / K_TRAIN
                log(f"[rep{rep}] train {tag}: {tr*1e3:.1f} ms/step "
                    f"({BATCH/tr:.0f} pairs/s)")
            results.setdefault(tag, []).append((ev, tr))

    for tag, vals in results.items():
        line = f"STRETCH {tag}:"
        if do_eval:
            ev = min(v[0] for v in vals)
            line += (f" eval_ms {ev*1e3:.2f} eval_pairs_s "
                     f"{BATCH/ev:.0f}")
        if do_train:
            tr = min(v[1] for v in vals)
            line += f" train_ms {tr*1e3:.1f}"
        print(line)


if __name__ == "__main__":
    main()
