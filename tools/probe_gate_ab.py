#!/usr/bin/env python3
"""Generic interleaved A/B probe over a module gate in
``mdgat_tpu.ops.pallas.attention``.

Usage: probe_gate_ab.py GATE VALUE [VALUE ...] [--train]
           [--dtype float32|bfloat16]
   or: probe_gate_ab.py --arms 'G1=V1+G2=V2' 'G1=V3' ... [--train]
       (each arm sets several gates at once; gates omitted from an arm
       keep their module defaults — arms reset before applying)

``--dtype`` sets the pipeline compute dtype (default bfloat16, the
bench config); float32 probes the CLI-default pipeline, whose kernels
key their selection resolution on _BISECT_ITERS_F32.

Times the eval forward at the bench config (batch 64, N 256) — and,
with ``--train``, the train step at the reference config (batch 64,
N 512, bf16 + remat) — per gate value, interleaved in one process so
the arms share tunnel conditions. Values are parsed as Python literals
(True/False/'str'). The module gate retraces fresh jit closures per
arm; no git state involved. Timing per the axon recipe (enqueue K, one
readback, subtract RTT).

Supersedes the one-off probe_selection_ab / probe_epilogue_ab scripts
for future gates.
"""

import ast
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_ENQ = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _lit(raw):
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw                    # bare string, e.g. deferred_where


def _parse_arm(spec):
    """'G1=V1+G2=V2' -> {G1: V1, G2: V2}; 'defaults' -> {}."""
    out = {}
    if spec in ("defaults", ""):
        return out
    for part in spec.split("+"):
        name, _, raw = part.partition("=")
        out[name.strip()] = _lit(raw)
    return out


def main():
    argv = [a for a in sys.argv[1:] if a != "--train"]
    do_train = "--train" in sys.argv[1:]
    dtype = "bfloat16"
    if "--dtype" in argv:
        k = argv.index("--dtype")
        dtype = argv[k + 1]
        argv = argv[:k] + argv[k + 2:]
    if argv and argv[0] == "--arms":
        arms = [_parse_arm(a) for a in argv[1:]]
    else:
        gate, raw_values = argv[0], argv[1:]
        arms = [{gate: _lit(v)} for v in raw_values]

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_bench_cache")
    import __graft_entry__ as g
    import mdgat_tpu.ops.pallas.attention as A
    import mdgat_tpu.ops.pallas.sinkhorn as S
    from mdgat_tpu.train import create_train_state, make_train_step

    def gate_mod(name):
        for mod in (A, S):
            if hasattr(mod, name):
                return mod
        raise AssertionError(
            f"no gate {name!r} in pallas.attention or pallas.sinkhorn")

    defaults = {}
    for arm in arms:
        for name in arm:
            defaults.setdefault(name, getattr(gate_mod(name), name))

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
    for rep in range(2):              # interleave arms to cancel drift
        for arm in arms:
            for name, val in defaults.items():
                setattr(gate_mod(name), name, val)
            for name, val in arm.items():
                setattr(gate_mod(name), name, val)
            tag = "+".join(f"{k}={v}" for k, v in arm.items()) or "defaults"

            model, params, state, data = g._flagship(
                compute_dtype=dtype, batch=64, n=256)

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
            log(f"[rep{rep}] eval  {tag}: {ev * 1e3:.2f} ms/step "
                f"({64 / ev:.0f} pairs/s)")

            tr = float("nan")
            if do_train:
                tmodel, _, _, tdata = g._flagship(
                    compute_dtype=dtype, param_dtype="float32",
                    n=512, batch=64, remat_gnn=True, scan_gnn_pairs=False)
                ts, tx = create_train_state(tmodel, jax.random.PRNGKey(0),
                                            1e-4)
                tstep = make_train_step(tmodel, tx, donate=False)
                ts, mtr = tstep(ts, tdata)
                _ = np.asarray(mtr["loss"])
                t0 = time.time()
                for _ in range(5):
                    ts, mtr = tstep(ts, tdata)
                _ = np.asarray(mtr["loss"])
                tr = (time.time() - t0 - rtt) / 5
                log(f"[rep{rep}] train {tag}: {tr * 1e3:.1f} ms/step "
                    f"({64 / tr:.0f} pairs/s)")
            results.setdefault(tag, []).append((ev, tr))

    for tag, vals in results.items():
        ev = min(v[0] for v in vals)
        line = f"BEST {tag}: eval {ev * 1e3:.2f} ms ({64 / ev:.0f} pairs/s)"
        if do_train:
            tr = min(v[1] for v in vals)
            line += f", train {tr * 1e3:.1f} ms ({64 / tr:.0f} pairs/s)"
        log(line)


if __name__ == "__main__":
    main()
