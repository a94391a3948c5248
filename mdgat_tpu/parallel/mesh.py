"""Device-mesh parallelism — the TPU-native replacement for DataParallel.

The reference's only parallel strategy is single-process
``torch.nn.DataParallel`` over <=4 GPUs (``train.py:190-196``): replicate
the model, scatter the batch, gather outputs. The TPU-native equivalent is
a ``jax.sharding.Mesh`` with the batch dimension sharded over the ``data``
axis and parameters replicated; ``jax.jit`` propagates the shardings and
XLA inserts the gradient ``psum`` over ICI — no hand-written communication.

A second ``seq`` axis optionally shards the keypoint dimension (sequence/
context parallelism for the 1024+-keypoint stretch config): the N x M
attention/score/Sinkhorn matrices are then sharded over ICI, with XLA
turning the row/col logsumexps of the OT stage into axis collectives.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, seq: int = 1,
              devices=None) -> Mesh:
    """Mesh over (data, seq). Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // seq
    assert data >= 1, f"{seq}-way seq axis exceeds the {n} devices"
    assert data * seq <= n, f"mesh {data}x{seq} exceeds {n} devices"
    dev = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(dev, axis_names=("data", "seq"))


# keypoint-axis sharding applies to [B, N, ...] arrays
_BATCH_KEY_SPECS = {
    "keypoints0": P("data", "seq"), "keypoints1": P("data", "seq"),
    "descriptors0": P("data", "seq"), "descriptors1": P("data", "seq"),
    "scores0": P("data", "seq"), "scores1": P("data", "seq"),
    "gt_matches0": P("data", "seq"), "gt_matches1": P("data", "seq"),
    "mask0": P("data", "seq"), "mask1": P("data", "seq"),
    "T_gt": P("data"), "rep": P("data"),
    "kpts0_world": P("data", "seq"), "kpts1_world": P("data", "seq"),
}


def batch_pspec(key: str, shard_seq: bool = False) -> P:
    """PartitionSpec for a batch key (shard_map in_specs / device_put)."""
    spec = _BATCH_KEY_SPECS.get(key, P("data"))
    if not shard_seq:
        spec = P(*([spec[0]] + [None] * (len(spec) - 1)))
    return spec


def batch_sharding(mesh: Mesh, key: str, shard_seq: bool = False):
    return NamedSharding(mesh, batch_pspec(key, shard_seq))


def shard_batch(batch: Dict, mesh: Mesh, shard_seq: bool = False) -> Dict:
    """device_put each batch array with its mesh sharding."""
    out = {}
    for k, v in batch.items():
        if k in ("sequence",):
            out[k] = v
            continue
        if k in ("idx0", "idx1"):
            out[k] = v
            continue
        out[k] = jax.device_put(v, batch_sharding(mesh, k, shard_seq))
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
