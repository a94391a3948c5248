"""Multi-host (multi-process) execution — the TPU-pod extension of the
data-parallel mesh.

The reference's parallelism tops out at single-process
``torch.nn.DataParallel`` over <=4 local GPUs (reference
``train.py:190-196``); there is no multi-node path anywhere in it. On a
TPU pod, JAX runs one process per host: ``jax.distributed`` wires the
processes into a single SPMD runtime in which every process sees the
GLOBAL device list, builds the same :func:`~mdgat_tpu.parallel.make_mesh`
over it, and dispatches the same jitted programs — XLA routes the
resulting collectives over ICI within a slice and DCN across slices.
The only genuinely per-process work is input assembly: each host loads
the batch rows that land on its own chips and
``jax.make_array_from_process_local_data`` stitches the per-host shards
into one global array (``jax.device_put`` of full batches only works
when every device is addressable, i.e. single-process).

Layout contract: batch arrays are sharded over the mesh ``data`` axis
(``parallel/mesh.py``), and each process must own a CONTIGUOUS block of
batch rows — true whenever each process's devices form whole rows of the
``(data, seq)`` mesh (devices-per-process divisible by ``seq``), which
:func:`process_batch_rows` verifies from the sharding itself rather than
assuming device order.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from mdgat_tpu.parallel.mesh import batch_sharding


def initialize_distributed(coordinator_address: str = "",
                           num_processes: int = 0,
                           process_id: int = -1) -> bool:
    """Join (or skip) the multi-process runtime. Call before the first
    device use.

    With explicit arguments, connects to the coordinator. With none, runs
    ``jax.distributed.initialize()`` auto-detection ONLY when
    ``JAX_COORDINATOR_ADDRESS`` is set (auto-detection may probe cluster
    metadata endpoints — unwanted on a single-host box) and stays
    single-process otherwise. Returns True when a multi-process runtime
    is active afterwards.
    """
    import os
    if coordinator_address:
        if num_processes < 1 or process_id < 0:
            raise SystemExit(
                "--coordinator_address requires --num_processes >= 1 and "
                f"--process_id >= 0 (got num_processes={num_processes}, "
                f"process_id={process_id})")
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


def is_primary() -> bool:
    """True on the process that owns host-side side effects (checkpoint
    writes, tensorboard logs, progress prints)."""
    return jax.process_index() == 0


def process_batch_rows(mesh, global_batch: int,
                       shard_seq: bool = False) -> slice:
    """The contiguous ``[lo, hi)`` batch-row block this process feeds.

    Derived from the batch sharding's device->index map restricted to
    addressable devices, so it is correct for any mesh/device order JAX
    hands out; raises if this process's rows are NOT one contiguous
    equal-share block (then the mesh layout violates the module's layout
    contract and per-process loading cannot work).
    """
    # row ownership only depends on the leading (data-sharded) axis, so a
    # 1-D P("data") key is representative (seq columns replicate rows)
    sharding = batch_sharding(mesh, "rep", shard_seq)
    index_map = sharding.addressable_devices_indices_map((global_batch,))
    starts = sorted({(idx[0].start or 0,
                      global_batch if idx[0].stop is None else idx[0].stop)
                     for idx in index_map.values()})
    lo, hi = starts[0][0], starts[-1][1]
    covered = sum(b - a for a, b in starts)
    if covered != hi - lo:
        raise ValueError(
            f"process {jax.process_index()} owns non-contiguous batch rows "
            f"{starts} of {global_batch}; use a mesh whose per-process "
            "device blocks form whole (data x seq) rows")
    expect = global_batch // jax.process_count()
    if hi - lo != expect:
        raise ValueError(
            f"process {jax.process_index()} owns {hi - lo} of "
            f"{global_batch} batch rows; equal per-process shares "
            f"({expect}) are required for per-process loading")
    return slice(lo, hi)


def eval_pair_range(n_total: int, max_pairs: int = 0,
                    batch_size: int = 1):
    """This process's contiguous ``[lo, hi)`` slice of the eval pair list.

    Multi-host eval is embarrassingly parallel: each process evaluates a
    contiguous block of pairs on its OWN local devices (no global arrays)
    and the per-pair metric records are merged at the end
    (:func:`allgather_host_vector`). ``max_pairs`` (the CLI cap) applies
    to the GLOBAL prefix first, rounded UP to a whole number of
    ``batch_size`` batches — the single-process loops only check the cap
    after finishing a batch (test.py ``acc.n_pairs >= max_pairs``), so
    they evaluate ``ceil(max_pairs / batch_size) * batch_size`` pairs and
    the merged aggregates must cover the same set to stay
    bit-identical."""
    if max_pairs:
        total = min(n_total, -(-max_pairs // batch_size) * batch_size)
    else:
        total = n_total
    p, np_ = jax.process_index(), jax.process_count()
    return p * total // np_, (p + 1) * total // np_


def allgather_host_vector(vec: np.ndarray):
    """Gather a per-process 1-D f64 host vector from every process;
    returns the list of vectors in process order. Lengths may differ
    (lengths are exchanged first, payloads are padded to the max)."""
    from jax.experimental import multihost_utils

    vec = np.asarray(vec, np.float64).reshape(-1)
    sizes = multihost_utils.process_allgather(
        np.array([vec.size], np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    mx = int(sizes.max()) if sizes.size else 0
    pad = np.zeros(mx, np.float64)
    pad[:vec.size] = vec
    gathered = np.asarray(multihost_utils.process_allgather(pad))
    return [gathered[p, :int(sizes[p])] for p in range(gathered.shape[0])]


def globalize_batch(local_batch: Dict, mesh, global_batch: int,
                    shard_seq: bool = False) -> Dict:
    """Assemble global device arrays from this process's batch rows.

    The multi-process counterpart of
    :func:`mdgat_tpu.parallel.shard_batch`: array values must hold only
    the rows of :func:`process_batch_rows`; host-side metadata
    (``sequence`` strings, ``idx0/idx1``) passes through process-local —
    it never reaches the device.
    """
    out = {}
    for k, v in local_batch.items():
        if k in ("sequence", "idx0", "idx1"):
            out[k] = v
            continue
        sharding = batch_sharding(mesh, k, shard_seq)
        v = np.asarray(v)
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, (global_batch,) + v.shape[1:])
    return out
