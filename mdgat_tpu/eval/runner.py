"""Pipelined evaluation driver.

The reference evaluates strictly serially — load pair, forward, host
metrics (``test.py:190-203``) — which on TPU leaves the chip idle during
host IO/metrics and the host idle during device compute, and pays a
~30 ms tunnel round trip per readback. This driver overlaps three stages:

1. a producer thread runs disk IO + fixed-shape batching
   (``SparseDataset.batches``);
2. the main thread dispatches the jitted prepare + eval_step for batch
   i+1 (JAX dispatch is asynchronous);
3. the device_get of batch i's small outputs (matches + GT, not the full
   output dict) rides the tunnel while batch i+1 computes; host metric
   post-processing then runs on numpy arrays.

Printed metrics are unchanged — only the schedule differs.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Sequence, Tuple

import numpy as np


class EvalPipeline:
    """Iterates (host_batch, host_outputs) over a dataset split.

    ``host_outputs`` holds the fetched model outputs plus
    ``gt_matches0/1`` as numpy arrays.
    """

    def __init__(self, dataset, prepare, eval_step, params, bn_state,
                 batch_size: int,
                 fetch: Sequence[str] = ("matches0",),
                 fetch_gt: Sequence[str] = ("gt_matches0",),
                 depth: int = 2, shard_inputs=None, pair_range=None):
        self.dataset = dataset
        self.prepare = prepare
        self.eval_step = eval_step
        self.params = params
        self.bn_state = bn_state
        self.batch_size = batch_size
        self.fetch = tuple(fetch)
        self.fetch_gt = tuple(fetch_gt)
        self.depth = depth
        # optional device placement for multi-device eval: applied to the
        # model inputs before dispatch (e.g. shard_batch over the mesh
        # `data` axis for the shard_map eval step, parallel/smap.py)
        self.shard_inputs = shard_inputs
        # optional (lo, hi) pair subset: multi-host eval's per-process
        # contiguous block (parallel/multihost.py::eval_pair_range)
        self.pair_range = pair_range

    def _produce(self, q: queue.Queue):
        try:
            # pair_range only when set: the dataset contract stays minimal
            # for duck-typed datasets (single-process callers)
            kw = ({} if self.pair_range is None
                  else {"pair_range": self.pair_range})
            for batch in self.dataset.batches(self.batch_size,
                                              shuffle=False,
                                              drop_last=False, **kw):
                q.put(self._pad_tail(batch))
            q.put(None)
        except BaseException as e:  # noqa: BLE001 — re-raised in __iter__
            # Propagate IO/shape errors to the consumer: swallowing them
            # here would silently truncate the dataset and print plausible
            # aggregate metrics over a partial eval.
            q.put(e)

    def _pad_tail(self, batch: Dict) -> Dict:
        """Pad a remainder batch to the full batch size by repeating its
        last pair, so the jitted programs compile for ONE batch shape (a
        second shape costs a multi-second XLA compile through the remote
        helper). The extra rows are trimmed before the yield."""
        n = len(batch["idx0"])
        if n == self.batch_size:
            return batch
        pad = self.batch_size - n
        out = {"__n_real__": n}
        for k, v in batch.items():
            if isinstance(v, list):
                out[k] = v + [v[-1]] * pad
            else:
                v = np.asarray(v)
                out[k] = np.concatenate(
                    [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        return out

    def __iter__(self) -> Iterator[Tuple[Dict, Dict[str, np.ndarray]]]:
        import os
        import sys
        import time
        import jax
        from mdgat_tpu.data import model_inputs

        debug = bool(os.environ.get("MDGAT_EVAL_DEBUG"))
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        threading.Thread(target=self._produce, args=(q,),
                         daemon=True).start()
        def emit(item):
            batch, small = item
            got = jax.device_get(small)
            n_real = batch.pop("__n_real__", None)
            if n_real is not None:
                batch = {k: v[:n_real] for k, v in batch.items()}
                got = {k: v[:n_real] for k, v in got.items()}
            return batch, got

        pending = None
        t_prev = time.time()
        while True:
            batch = q.get()
            if batch is None:
                break
            if isinstance(batch, BaseException):
                raise batch
            t_q = time.time()
            n_real = batch.pop("__n_real__", None)
            prepared = self.prepare(batch)
            if n_real is not None:
                batch["__n_real__"] = n_real
            inputs = model_inputs(prepared)
            if self.shard_inputs is not None:
                inputs = self.shard_inputs(inputs)
            out = self.eval_step(self.params, self.bn_state, inputs)
            small = {k: out[k] for k in self.fetch}
            for k in self.fetch_gt:
                small[k] = prepared[k]
            t_d = time.time()
            if pending is not None:
                res = emit(pending)
                if debug:
                    print(f"[pipe] q {t_q - t_prev:.3f}s dispatch "
                          f"{t_d - t_q:.3f}s get {time.time() - t_d:.3f}s",
                          file=sys.stderr)
                yield res
                t_prev = time.time()
            else:
                t_prev = t_d
            pending = (batch, small)
        if pending is not None:
            yield emit(pending)
