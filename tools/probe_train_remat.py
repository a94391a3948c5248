#!/usr/bin/env python3
"""Interleaved A/B of the train step WITH vs WITHOUT GNN rematerialization
at the reference config (batch 64, N 512, bf16 + f32 params, unrolled).

Round-4 profile attributed ~27 ms of the 56 ms step to "remat pair
replays" — but the fused train-layer custom VJP saves its own residuals
(thr/lse/h1/mean/var, all checkpoint-tagged), which are SMALL
(~34 MB/layer at the reference config vs the ~10 GB of [B,H,N,M]
probabilities the XLA path would store). If those tags cover everything
the backward needs, remat buys nothing and the replays are pure waste.
This probe measures both arms in one session; it also reports device
memory stats when the runtime exposes them (HBM safety check for the
remat-off arm).

Usage: probe_train_remat.py [N [BATCH]]   (default 512 64)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

K_TRAIN = 5


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_bench_cache")
    import __graft_entry__ as g
    from mdgat_tpu.train import create_train_state, make_train_step

    tiny = jax.jit(lambda v: v + 1)
    _ = np.asarray(tiny(jax.numpy.ones(())))
    rtts = []
    for _ in range(5):
        t0 = time.time()
        _ = np.asarray(tiny(jax.numpy.ones(())))
        rtts.append(time.time() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    log(f"rtt {rtt * 1e3:.1f} ms, config batch={batch} N={n}")

    results = {}
    for rep in range(2):
        for remat in (True, False):
            tmodel, _, _, tdata = g._flagship(
                compute_dtype="bfloat16", param_dtype="float32",
                n=n, batch=batch, remat_gnn=remat, scan_gnn_pairs=False)
            ts, tx = create_train_state(tmodel, jax.random.PRNGKey(0), 1e-4)
            tstep = make_train_step(tmodel, tx, donate=False)
            ts, mtr = tstep(ts, tdata)
            _ = np.asarray(mtr["loss"])
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                for _ in range(K_TRAIN):
                    ts, mtr = tstep(ts, tdata)
                _ = np.asarray(mtr["loss"])
                best = min(best, time.time() - t0 - rtt)
            tr = best / K_TRAIN
            log(f"[rep{rep}] remat={remat}: {tr * 1e3:.1f} ms/step "
                f"({batch / tr:.0f} pairs/s)")
            results.setdefault(remat, []).append(tr)
            try:
                ms = jax.devices()[0].memory_stats()
                if ms:
                    log(f"         peak_bytes_in_use="
                        f"{ms.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB")
            except Exception:
                pass

    for remat, vals in results.items():
        tr = min(vals)
        log(f"BEST remat={remat}: {tr * 1e3:.1f} ms/step "
            f"({batch / tr:.0f} pairs/s)")


if __name__ == "__main__":
    main()
