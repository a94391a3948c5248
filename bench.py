#!/usr/bin/env python3
"""Benchmark: matched pairs/sec/chip at 256 keypoints (BASELINE.md).

Measures the flagship MDGAT forward (L=9 -> 18 GNN layers with the default
dynamic top-k schedule, 20 Sinkhorn iterations, match decision + loss) on
the TPU in float32, and the PyTorch-CPU path (float64, as the reference
runs, ``train.py:222``) as the baseline.

Timing protocol: the axon runtime makes ``block_until_ready`` unreliable
and host readbacks pay a ~30 ms tunnel round trip, so we enqueue K steps
and do a single final readback, subtracting one measured RTT.

Prints ONE JSON line to stdout; progress goes to stderr.
"""

import json
import os
import socket
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_KPTS = 256
BATCH = 64
K_STEPS = 30

# The TPU is reached through a local relay (127.0.0.1:8082). When the relay
# process is dead (connection refused), JAX's axon backend init hangs for
# minutes instead of failing fast — so probe the port with a raw socket
# BEFORE importing jax, and retry for a bounded window in case the relay is
# being respawned. See CLAUDE.md "Environment gotchas".
RELAY_ADDR = ("127.0.0.1",
              int(os.environ.get("BENCH_RELAY_PORT", "8082")))
RELAY_WAIT_S = float(os.environ.get("BENCH_RELAY_WAIT_S", "600"))


def relay_alive(timeout=3.0):
    try:
        with socket.create_connection(RELAY_ADDR, timeout=timeout):
            return True
    except OSError:
        return False


def wait_for_relay():
    """True if the relay answers within RELAY_WAIT_S, else False."""
    deadline = time.time() + RELAY_WAIT_S
    while True:
        if relay_alive():
            return True
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        log(f"bench: TPU relay down (connection refused on "
            f"{RELAY_ADDR[0]}:{RELAY_ADDR[1]}); retrying for "
            f"{remaining:.0f}s more")
        time.sleep(min(30.0, remaining))


def measure_rtt(n=5):
    """Median tunnel round-trip of a trivial jitted readback — the
    constant subtracted from every timing window below."""
    import jax
    tiny = jax.jit(lambda v: v + 1)
    x = tiny(jax.numpy.ones(()))
    _ = np.asarray(x)
    rtts = []
    for _ in range(n):
        t0 = time.time()
        _ = np.asarray(tiny(x))
        rtts.append(time.time() - t0)
    return sorted(rtts)[n // 2]


def time_window(step, readback, k, rtt, reps=1):
    """Seconds per ``step()`` call: enqueue ``k`` calls, one final
    ``readback(last)`` device->host sync, subtract one tunnel RTT;
    best-of-``reps`` windows. This is the ONE timing methodology for
    every metric below — axon makes ``block_until_ready`` a no-op, so
    per-call timing through a ~30 ms-RTT tunnel is meaningless (the
    r03/r04 Sinkhorn artifact swung 2x on an unchanged kernel until the
    window was widened past the RTT jitter). Size ``k`` so the device
    window dwarfs the RTT; ``step`` may close over state (train steps)."""
    best = float("inf")
    for _ in range(reps):
        out = None
        t0 = time.time()
        for _ in range(k):
            out = step()
        readback(out)
        best = min(best, time.time() - t0 - rtt)
    return best / k


def bench_tpu():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/.jax_bench_cache")
    import __graft_entry__ as g

    # deployment config: bf16 GNN with f32 score accumulation + f32 OT,
    # Pallas fused attention (bisection top-k) and Sinkhorn kernels
    model, params, state, data = g._flagship(
        compute_dtype="bfloat16", batch=BATCH, n=N_KPTS)

    def forward(params, state, b):
        out, _ = model.apply(params, state, b, train=False)
        return out["matches0"], out["matching_scores0"], out["loss"]

    jfn = jax.jit(forward)
    out = jfn(params, state, data)
    _ = np.asarray(out[2].astype("float32"))  # warm: compile+execute+read
    log(f"tpu: compiled; device={jax.devices()[0]}")

    rtt = measure_rtt()

    per_step = time_window(
        lambda: jfn(params, state, data),
        lambda out: np.asarray(out[2].astype("float32")),
        K_STEPS, rtt, reps=3)
    pairs_per_sec = BATCH / per_step
    log(f"tpu: {per_step * 1e3:.2f} ms/step (rtt {rtt * 1e3:.1f} ms) "
        f"-> {pairs_per_sec:.0f} pairs/s")

    # secondary metric (BASELINE.md): Sinkhorn iterations/sec at 256 kpts.
    # The kernel runs ~0.4 ms/call, so a 20-call window (~8 ms) against a
    # subtracted ~30 ms tunnel RTT was RTT-jitter-dominated — the r03/r04
    # driver artifacts swung 3.6M -> 1.8M pair-iters/s on an unchanged
    # kernel. Enqueue enough calls that the device window dwarfs the RTT
    # (256 x ~0.4 ms ~= 100 ms) and take best-of-3.
    import jax.numpy as jnp
    from mdgat_tpu.ops.pallas import pallas_log_optimal_transport
    scores = jnp.asarray(
        np.random.default_rng(0).normal(size=(BATCH, N_KPTS, N_KPTS)),
        jnp.float32)
    ot_fn = jax.jit(lambda s: pallas_log_optimal_transport(s, 1.0, 20))
    _ = np.asarray(ot_fn(scores).corner)
    per_ot = time_window(lambda: ot_fn(scores),
                         lambda ot: np.asarray(ot.corner),
                         256, rtt, reps=3)
    log(f"sinkhorn: {per_ot * 1e3:.2f} ms / 20 iters x {BATCH} pairs -> "
        f"{20 * BATCH / per_ot:.0f} pair-iters/s")

    # secondary metric: full training step at the reference train config
    # (batch 64, N 512, bf16 GNN + f32 params, Adam, remat). Round-2
    # progression (measured): fused Pallas attention backward 367 -> 127;
    # replayed-backward Pallas Sinkhorn VJP -> 111.5; selective remat
    # policy (save attn out+thr, recompute glue) -> 107.9; unrolled GNN
    # (scan_gnn_pairs=False: no per-iteration stacked-param slicing)
    # -> 97.7; fused-MHA custom VJP (projections+attention+merge in one
    # kernel pair, no split-heads relayouts) + concat-free MLP -> 72.2;
    # head-blocked kernel weights (full-D projection matmuls) -> 65.9;
    # decomposed-dustbin gap loss (no [B,N,M+1] concat slab) -> 62.5.
    # Round 3: train-mode whole-layer fused kernels (MHA+MLP+batch-BN+
    # residual custom VJP) -> 60.8 (the step is ~93% kernel time, XLA
    # glue ~1.6 ms/step, profiled); logsumexp residual in the attention
    # custom VJPs (backward rebuilds probabilities as exp(s - lse)
    # instead of re-running the mask/max/exp/sum/divide sweeps) -> 57.6
    from mdgat_tpu.train import create_train_state, make_train_step

    def train_window(n, batch, k=5):
        """Warm + time the full training step at (n, batch)."""
        m, _, _, d = g._flagship(
            compute_dtype="bfloat16", param_dtype="float32",
            n=n, batch=batch, remat_gnn=True, scan_gnn_pairs=False)
        ts, tx = create_train_state(m, jax.random.PRNGKey(0), 1e-4)
        tstep = make_train_step(m, tx, donate=False)
        box = {"ts": ts}

        def step():
            box["ts"], mtr = tstep(box["ts"], d)
            return mtr

        _ = np.asarray(step()["loss"])  # warm: compile+execute+read
        return time_window(step, lambda mtr: np.asarray(mtr["loss"]),
                           k, rtt)

    per_train = train_window(n=512, batch=64)
    log(f"train: {per_train * 1e3:.1f} ms/step @ reference config "
        f"(batch 64, N 512) -> {64 / per_train:.0f} pairs/s")

    # stretch config (BASELINE.json configs[4]): N=1024, batch 8 — the
    # round-4 wins (962 pairs/s eval / 25.3 ms train) lived only in
    # docs/DESIGN.md; record them in the driver artifact so they are
    # tracked round-over-round (round-4 verdict item 8).
    smodel, sparams, sstate, sdata = g._flagship(
        compute_dtype="bfloat16", batch=8, n=1024)

    def sforward(p, s, b):
        out, _ = smodel.apply(p, s, b, train=False)
        return out["matches0"], out["loss"]

    sfn = jax.jit(sforward)
    _ = np.asarray(sfn(sparams, sstate, sdata)[1].astype("float32"))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(20):
            sout = sfn(sparams, sstate, sdata)
        _ = np.asarray(sout[1].astype("float32"))
        best = min(best, time.time() - t0 - rtt)
    per_seval = best / 20
    log(f"stretch eval: {per_seval * 1e3:.2f} ms/step @ batch 8, N 1024 "
        f"-> {8 / per_seval:.0f} pairs/s")

    stmodel, _, _, stdata = g._flagship(
        compute_dtype="bfloat16", param_dtype="float32",
        n=1024, batch=8, remat_gnn=True, scan_gnn_pairs=False)
    sts, stx = create_train_state(stmodel, jax.random.PRNGKey(0), 1e-4)
    ststep = make_train_step(stmodel, stx, donate=False)
    sts, smtr = ststep(sts, stdata)
    _ = np.asarray(smtr["loss"])
    t0 = time.time()
    for _ in range(5):
        sts, smtr = ststep(sts, stdata)
    _ = np.asarray(smtr["loss"])
    per_strain = (time.time() - t0 - rtt) / 5
    log(f"stretch train: {per_strain * 1e3:.1f} ms/step @ batch 8, N 1024 "
        f"-> {8 / per_strain:.0f} pairs/s")

    return pairs_per_sec, {
        "eval_ms_per_step_b64_n256": round(per_step * 1e3, 2),
        "sinkhorn_pair_iters_per_s": round(20 * BATCH / per_ot),
        "train_ms_per_step_b64_n512": round(per_train * 1e3, 1),
        "train_pairs_per_s": round(64 / per_train),
        "stretch_eval_ms_per_step_b8_n1024": round(per_seval * 1e3, 2),
        "stretch_eval_pairs_per_s": round(8 / per_seval),
        "stretch_train_ms_per_step_b8_n1024": round(per_strain * 1e3, 1),
        "stretch_train_pairs_per_s": round(8 / per_strain),
    }


def bench_torch_cpu():
    """Reference-equivalent forward on CPU (functional torch, float64)."""
    sys.path.insert(0, "tests")
    import torch_ref
    from mdgat_tpu.core.config import train_defaults

    cfg = train_defaults(max_keypoints=N_KPTS)
    sd = torch_ref.make_state_dict(cfg, seed=0, module_prefix=False)
    rng = np.random.default_rng(0)
    batch = {
        "keypoints0": rng.normal(size=(1, N_KPTS, 3)) * 20,
        "keypoints1": rng.normal(size=(1, N_KPTS, 3)) * 20,
        "scores0": rng.uniform(10, 30, (1, N_KPTS)),
        "scores1": rng.uniform(10, 30, (1, N_KPTS)),
        "descriptors0": rng.normal(size=(1, N_KPTS, 33)),
        "descriptors1": rng.normal(size=(1, N_KPTS, 33)),
    }
    # warm
    _ = torch_ref.t_forward_scores(sd, cfg, batch, train=False)
    n_iter = 3
    t0 = time.time()
    for _ in range(n_iter):
        _ = torch_ref.t_forward_scores(sd, cfg, batch, train=False)
    per = (time.time() - t0) / n_iter
    log(f"torch-cpu: {per * 1e3:.1f} ms/pair -> {1 / per:.2f} pairs/s")
    return 1.0 / per


def main():
    if not wait_for_relay():
        # Emit a well-formed result line so the driver records the outage
        # instead of hanging in backend init or crashing without output.
        log("bench: giving up — relay never came up; reporting outage")
        print(json.dumps({
            "metric": "matched pairs/sec/chip @ 256 kpts (MDGAT fwd, bf16+f32-OT, pallas)",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": None,
            "error": "axon TPU relay unreachable (connection refused); "
                     "benchmark could not run",
            # context, NOT a measurement from this run: the most recent
            # successful run of THIS benchmark on the real chip
            # (docs/DESIGN.md round-5 headline; third consecutive run
            # after the ITERS=4 selection cut + dtype keying)
            "last_successful_run": {
                "value": 10884.0, "unit": "pairs/s", "date": "2026-08-19",
                "note": "see docs/DESIGN.md 'Round-5' headline",
            },
        }))
        return
    tpu_pps, extra = bench_tpu()
    try:
        cpu_pps = bench_torch_cpu()
    except Exception as e:  # torch baseline is best-effort
        log(f"torch baseline failed: {e}")
        cpu_pps = None
    vs = (tpu_pps / cpu_pps) if cpu_pps else None
    print(json.dumps({
        "metric": "matched pairs/sec/chip @ 256 kpts (MDGAT fwd, bf16+f32-OT, pallas)",
        "value": round(tpu_pps, 1),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 1) if vs else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
