#!/usr/bin/env python3
"""Profile the flagship eval forward (or train step) on TPU and print the
top device ops by total duration.

Parses the xplane.pb trace directly (tensorboard's plugin is version-
mismatched in this sandbox); needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION
=python, which this script sets before importing tensorflow.

Usage: python tools/profile_forward.py [train] [n_top]
"""

import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, ".")


def main(mode: str = "eval", n_top: int = 25):
    import glob
    import shutil

    import jax
    import numpy as np
    from __graft_entry__ import _flagship, _enable_compile_cache

    _enable_compile_cache()
    trace_dir = "/tmp/jaxtrace"
    shutil.rmtree(trace_dir, ignore_errors=True)

    if mode == "train":
        from mdgat_tpu.train import create_train_state, make_train_step
        model, params, state, batch = _flagship(
            compute_dtype="bfloat16", param_dtype="float32",
            n=512, batch=64, remat_gnn=True, scan_gnn_pairs=False)
        ts, tx = create_train_state(model, jax.random.PRNGKey(0), 1e-4)
        step = make_train_step(model, tx, donate=False)
        run = lambda: step(ts, batch)[1]["loss"]
    else:
        model, params, state, batch = _flagship(
            compute_dtype="bfloat16", param_dtype="float32", n=256, batch=64)
        fwd = jax.jit(lambda p, s, b: model.apply(p, s, b, train=False)[0])
        run = lambda: fwd(params, state, batch)["loss"]

    np.asarray(run())                      # compile outside the trace
    jax.profiler.start_trace(trace_dir)
    out = [run() for _ in range(3)]
    np.asarray(out[-1])
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[0], "rb").read())
    totals = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_names = plane.event_metadata
        for line in plane.lines:
            # only the synchronous per-op occupancy line: async copy-start
            # events span WAIT time and drown the real ops (see memory
            # note / round-2 profiling)
            if line.name != "XLA Ops":  # NB: "Async XLA Ops" superstring
                continue
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
    tot = sum(totals.values())
    print(f"plane total: {tot / 1e9:.3f} ms over 3 steps "
          f"({mode}, files={len(files)})")
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:n_top]:
        print(f"{ps / 1e9:9.3f} ms  {100 * ps / tot:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "eval"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    main(mode, n)
