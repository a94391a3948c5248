"""KITTI pair pipeline: host loading + jitted device preprocessing.

Mirrors the reference ``SparseDataset`` (``load_data.py:47-321``) split into
the TPU-natural two stages:

* **host** (:class:`SparseDataset`): file IO, score filtering, fixed-size
  shaping, homogeneous world transforms and T_gt (float64 — pose chains
  need the precision), batch stacking.
* **device** (:func:`prepare_batch_fn`): a single jitted function doing
  descriptor L2-normalization and pose-based GT-correspondence generation
  (the O(N^2) ``cdist`` + argmin of ``load_data.py:257-285``) as one fused
  batched kernel.

Fixed-size policy:
* ``ensure_kpts_num=True`` (train default): the reference's exact
  truncate-or-duplicate-pad (``load_data.py:191-211``) — every slot holds a
  real (possibly duplicated) keypoint, mask all-true.
* ``ensure_kpts_num=False`` (eval default): the reference keeps ragged
  counts (``load_data.py:212-214``); TPU needs static shapes, so pairs are
  zero-padded to a 128-multiple bucket with validity masks threaded through
  the model (attention, OT marginals, losses, metrics).

Batch-dict keys follow the reference API (``load_data.py:299-321``):
``keypoints0/1, descriptors0/1, scores0/1, gt_matches0/1, T_gt, rep`` plus
``mask0/1`` (new) and host-side ``sequence``/``idx0``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mdgat_tpu.core.config import Config
from mdgat_tpu.data import kitti
from mdgat_tpu.ops.geometry import gt_correspondences


MODEL_KEYS = ("keypoints0", "keypoints1", "scores0", "scores1",
              "descriptors0", "descriptors1", "gt_matches0", "gt_matches1",
              "mask0", "mask1", "cloud0", "cloud1")


def model_inputs(batch: Dict) -> Dict:
    """Array-only sub-dict consumed by the jitted model apply/train step."""
    return {k: batch[k] for k in MODEL_KEYS if k in batch}


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def duplicate_pad(kp, score, desc, target: int):
    """Reference pad: repeatedly prepend the first (target-len) rows
    (``load_data.py:197-211``). Zero keypoints would loop forever in the
    reference; here it zero-fills (callers emit an all-false mask — the
    model's no-keypoint early-out contract, ``models/mdgat.py:374-382``)."""
    if len(kp) == 0:
        return (np.zeros((target, 3), kp.dtype if hasattr(kp, 'dtype')
                         else np.float32),
                np.zeros((target,), np.float32),
                np.zeros((target, 33), np.float32))
    while target > len(kp):
        take = target - len(kp)
        kp = np.vstack([kp[:take], kp])
        score = np.hstack([score[:take], score])
        desc = np.vstack([desc[:take], desc])
    return kp, score, desc


class SparseDataset:
    """Host-side pair source over KITTI assets (real or synthetic layout)."""

    def __init__(self, cfg: Config, mode: str):
        self.cfg = cfg
        self.mode = mode
        # host->device transfer dtype for keypoint/descriptor arrays: the
        # tunnel pays per byte, and the device immediately casts to the
        # compute dtype anyway. Pose chains/T_gt stay float64 (the world-
        # frame kpts are rounded to the GT dtype on device regardless).
        self.host_dtype = (np.float64 if cfg.compute_dtype == "float64"
                           else np.float32)
        # descriptors dominate the upload (33 channels). float16 shipping
        # (~5e-4 relative error) was measured to flip ~1 match per pair on
        # near-tie-dense inputs — kept at the full host dtype for parity
        # with the f32 pipeline; prepare upcasts f16/bf16 if a caller
        # opts in by overriding this attribute (eval CLIs: --ship_bf16,
        # a documented divergence for slow host links).
        self.desc_dtype = self.host_dtype
        self.pairs, self.seq_list = kitti.make_dataset_kitti_distance(
            cfg.txt_path, mode)
        self.calib: Dict[str, np.ndarray] = {}
        self.poses: Dict[str, np.ndarray] = {}
        self.kp_cache: Dict[str, List[Optional[np.ndarray]]] = {}
        for seq in self.seq_list:
            s = "%02d" % seq
            self.calib[s] = kitti.load_calib(os.path.join(
                cfg.train_path, "calib/sequences", s, "calib.txt"))
            self.poses[s] = kitti.load_poses(os.path.join(
                cfg.train_path, "poses", "%02d.txt" % seq))
            if cfg.memory_is_enough:
                folder = os.path.join(cfg.keypoints_path, s)
                names = sorted(os.listdir(folder), key=lambda x: int(x[:-4]))
                self.kp_cache[s] = [
                    np.fromfile(os.path.join(folder, n), dtype=np.float32)
                    for n in names]

    def __len__(self):
        return len(self.pairs)

    # ------------------------------------------------------------------
    def _load_frame(self, s: str, idx: int):
        if self.cfg.memory_is_enough and s in self.kp_cache:
            raw = self.kp_cache[s][idx]
        else:
            raw = np.fromfile(os.path.join(
                self.cfg.keypoints_path, s, "%06d.bin" % idx),
                dtype=np.float32)
        return kitti.split_keypoint_rows(raw)

    def _shape_keypoints(self, kp, score, desc, pad_to: Optional[int] = None):
        """Apply the fixed-size policy; returns (kp, score, desc, n_valid)."""
        cfg = self.cfg
        if cfg.ensure_kpts_num:
            valid = score > cfg.score_min          # load_data.py:183
            kp, score, desc = kp[valid], score[valid], desc[valid]
            n = cfg.max_keypoints
            n_valid = n if len(kp) > 0 else 0      # empty -> skip_train (N8)
            if n < len(kp):
                kp, score, desc = kp[:n], score[:n], desc[:n]
            else:
                kp, score, desc = duplicate_pad(kp, score, desc, n)
            return kp, score, desc, n_valid
        n = len(kp)
        tgt = pad_to if pad_to is not None else _round_up(max(n, 1), 128)
        out_kp = np.zeros((tgt, 3), kp.dtype)
        out_sc = np.zeros((tgt,), score.dtype)
        out_de = np.zeros((tgt, desc.shape[1]), desc.dtype)
        out_kp[:n], out_sc[:n], out_de[:n] = kp, score, desc
        return out_kp, out_sc, out_de, n

    # ------------------------------------------------------------------
    def get_pair(self, idx: int, pad_to: Optional[int] = None) -> Dict:
        rec = self.pairs[idx]
        s = "%02d" % rec["seq"]
        i0, i1 = rec["anc_idx"], rec["pos_idx"]
        kp0, sc0, de0 = self._load_frame(s, i0)
        kp1, sc1, de1 = self._load_frame(s, i1)
        kp0, sc0, de0, n0 = self._shape_keypoints(kp0, sc0, de0, pad_to)
        kp1, sc1, de1, n1 = self._shape_keypoints(kp1, sc1, de1, pad_to)
        return self._assemble_pair(s, i0, i1, kp0, sc0, de0, n0,
                                   kp1, sc1, de1, n1)

    def _load_cloud(self, s: str, idx: int) -> np.ndarray:
        """Raw 16384x8 cloud for the learned-descriptor path
        (``load_data.py:171-178``)."""
        path = os.path.join(self.cfg.train_path, "kitti_randomsample_16384_n8",
                            s, "%06d.bin" % idx)
        return np.fromfile(path, dtype=np.float32).reshape(-1, 8)

    def _assemble_pair(self, s, i0, i1, kp0, sc0, de0, n0,
                       kp1, sc1, de1, n1) -> Dict:
        pose0 = self.poses[s][i0].astype(np.float64)
        pose1 = self.poses[s][i1].astype(np.float64)
        Tcv = self.calib[s].astype(np.float64)
        # T_gt maps kp1 -> kp0 frame (load_data.py:238)
        T_gt = np.linalg.inv(Tcv) @ np.linalg.inv(pose0) @ pose1 @ Tcv
        # world-frame transforms (load_data.py:241-245)
        M0 = pose0 @ Tcv
        M1 = pose1 @ Tcv

        mask0 = np.zeros(len(kp0), bool); mask0[:n0] = True
        mask1 = np.zeros(len(kp1), bool); mask1[:n1] = True
        hdt = self.host_dtype
        extra = {}
        if self.cfg.descriptor in ("pointnet", "pointnetmsg"):
            extra["cloud0"] = self._load_cloud(s, i0).astype(hdt)
            extra["cloud1"] = self._load_cloud(s, i1).astype(hdt)
        # world kpts in float64 on host (pose chains over km-scale KITTI
        # coordinates need it — f32 matmuls here shift GT boundary pairs
        # by up to ~0.1 m, measured); shipped at the host dtype, which for
        # f32 modes is bit-identical to the device-side f64->f32 cast the
        # GT generator applies anyway
        extra["kpts0_world"] = (kp0.astype(np.float64) @ M0[:3, :3].T
                                + M0[:3, 3]).astype(hdt)
        extra["kpts1_world"] = (kp1.astype(np.float64) @ M1[:3, :3].T
                                + M1[:3, 3]).astype(hdt)
        return {
            **extra,
            "keypoints0": kp0.astype(hdt),
            "keypoints1": kp1.astype(hdt),
            "scores0": sc0.astype(hdt),
            "scores1": sc1.astype(hdt),
            "descriptors0": de0.astype(self.desc_dtype),
            "descriptors1": de1.astype(self.desc_dtype),
            "mask0": mask0, "mask1": mask1,
            "T_gt": T_gt, "sequence": s, "idx0": i0, "idx1": i1,
        }

    # ------------------------------------------------------------------
    def _frame_path(self, s: str, idx: int) -> str:
        return os.path.join(self.cfg.keypoints_path, s, "%06d.bin" % idx)

    def _batch_bucket(self, idxs) -> int:
        """Variable-N bucket for a batch from raw row counts alone (file
        sizes on the disk path, cached-array lengths under
        ``memory_is_enough``) — no keypoint loads, so the Python fallback
        in :meth:`batches` loads each pair exactly once."""
        rows = []
        for i in idxs:
            r = self.pairs[int(i)]
            s = "%02d" % r["seq"]
            for idx in (r["anc_idx"], r["pos_idx"]):
                if self.cfg.memory_is_enough and s in self.kp_cache:
                    rows.append(len(self.kp_cache[s][idx])
                                // kitti.KEYPOINT_ROW_FLOATS)
                else:
                    rows.append(os.path.getsize(self._frame_path(s, idx))
                                // (kitti.KEYPOINT_ROW_FLOATS * 4))
        return _round_up(max(max(rows), 1), 128)

    def _native_batch(self, idxs,
                      bucket: Optional[int] = None) -> Optional[List[Dict]]:
        """Threaded native load+shape of a whole batch (X2 equivalent).

        Used on the disk path (``memory_is_enough=False``); returns None
        when the native library is unavailable (callers fall back to the
        per-pair Python path). ``bucket`` overrides the variable-N pad
        target (multi-host: the global batch's bucket, which may exceed
        this process's own rows)."""
        try:
            from mdgat_tpu.native import NativeLoader, native_available
        except Exception:
            return None
        if not native_available():
            return None
        recs = [self.pairs[int(i)] for i in idxs]
        paths, meta = [], []
        for r in recs:
            s = "%02d" % r["seq"]
            paths.append(self._frame_path(s, r["anc_idx"]))
            paths.append(self._frame_path(s, r["pos_idx"]))
            meta.append((s, r["anc_idx"], r["pos_idx"]))
        if self.cfg.ensure_kpts_num:
            bucket = self.cfg.max_keypoints
        elif bucket is None:
            rows = [os.path.getsize(p) // (kitti.KEYPOINT_ROW_FLOATS * 4)
                    for p in paths]
            bucket = _round_up(max(max(rows), 1), 128)
        loader = NativeLoader(bucket, self.cfg.ensure_kpts_num,
                              self.cfg.score_min,
                              n_threads=min(8, len(paths)))
        kp, score, desc, counts = loader.load(paths)
        pairs = []
        for j, (s, i0, i1) in enumerate(meta):
            pairs.append(self._assemble_pair(
                s, i0, i1,
                kp[2 * j].astype(np.float64), score[2 * j].astype(np.float64),
                desc[2 * j].astype(np.float64), int(counts[2 * j]),
                kp[2 * j + 1].astype(np.float64),
                score[2 * j + 1].astype(np.float64),
                desc[2 * j + 1].astype(np.float64), int(counts[2 * j + 1])))
        return pairs

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0, drop_last: bool = True,
                use_native: bool = True,
                rows: Optional[slice] = None,
                pair_range: Optional[tuple] = None) -> Iterator[Dict]:
        """Stacked numpy batches (the DataLoader equivalent, X2).

        ``rows``: per-process slice of every global batch (multi-host
        TRAIN — ``parallel/multihost.py``): the shuffle order and the
        variable-N bucket stay GLOBAL (identical across processes, same
        seed), but only the sliced rows are loaded/stacked on this host.
        Requires ``drop_last`` (a short final batch would break the equal
        per-process shares the global-array assembly needs).

        ``pair_range``: ``(lo, hi)`` restriction of the (unshuffled) pair
        list — multi-host EVAL's contiguous per-process pair block
        (``parallel/multihost.py::eval_pair_range``); batches are then
        formed from this subset only, entirely process-local.
        """
        if rows is not None and not drop_last:
            raise ValueError("batches(rows=...) requires drop_last=True: "
                             "per-process slices assume equal full-size "
                             "global batches")
        if pair_range is not None and rows is not None:
            raise ValueError("rows= (global batches, sliced per process) "
                             "and pair_range= (process-local pair subset) "
                             "are mutually exclusive")
        order = (np.arange(len(self)) if pair_range is None
                 else np.arange(*pair_range))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n_b = len(order) // batch_size if drop_last else \
            -(-len(order) // batch_size)
        for b in range(n_b):
            g_idxs = order[b * batch_size:(b + 1) * batch_size]
            # variable-N: size the shared bucket from row counts BEFORE
            # loading (each pair loaded exactly once). On the rows= path
            # the bucket comes from the FULL global batch, so every
            # process pads to the same shape (the global-array assembly
            # needs it); on the pair_range= path batches are PROCESS-
            # LOCAL, so buckets may differ per process — correctness
            # there rests on the padded==unpadded output invariant
            # (tests/test_masks.py), not on shape agreement
            tgt = (None if self.cfg.ensure_kpts_num
                   else self._batch_bucket(g_idxs))
            idxs = g_idxs if rows is None else g_idxs[rows]
            pairs = None
            if use_native and not self.cfg.memory_is_enough:
                pairs = self._native_batch(idxs, bucket=tgt)
            if pairs is None:
                pairs = [self.get_pair(int(i), pad_to=tgt) for i in idxs]
            out = {}
            for k in pairs[0]:
                if k in ("sequence",):
                    out[k] = [p[k] for p in pairs]
                elif k in ("idx0", "idx1"):
                    out[k] = np.array([p[k] for p in pairs])
                else:
                    out[k] = np.stack([p[k] for p in pairs])
            yield out


# ----------------------------------------------------------------------
def prepare_batch_fn(threshold: float, mutual_check: bool,
                     compute_dtype: str = "float32",
                     gt_dtype: str = "float32"):
    """Jitted device preprocessing: descriptor L2-norm + GT generation.

    Descriptor normalization: ``load_data.py:290-292``. GT matches use
    int32 with the reference's -1 sentinel (reference used int16,
    ``load_data.py:273``; int32 is the TPU-native integer width).
    """
    cdt = jnp.dtype(compute_dtype)
    gdt = jnp.dtype(gt_dtype)

    @jax.jit
    def prepare(kp0, kp1, sc0, sc1, de0, de1, kp0w, kp1w, mask0, mask1):
        # descriptors may arrive float16/bfloat16 (transfer compression,
        # --ship_bf16); normalize in >= float32 regardless
        if de0.dtype in (jnp.float16, jnp.bfloat16):
            de0 = de0.astype(jnp.float32)
            de1 = de1.astype(jnp.float32)
        n0 = jnp.linalg.norm(de0, axis=-1, keepdims=True)
        n1 = jnp.linalg.norm(de1, axis=-1, keepdims=True)
        de0n = de0 / jnp.maximum(n0, 1e-30)
        de1n = de1 / jnp.maximum(n1, 1e-30)
        gt = gt_correspondences(kp0w.astype(gdt), kp1w.astype(gdt),
                                threshold, mutual_check, mask0, mask1)
        return {
            "keypoints0": kp0.astype(cdt), "keypoints1": kp1.astype(cdt),
            "scores0": sc0.astype(cdt), "scores1": sc1.astype(cdt),
            "descriptors0": de0n.astype(cdt),
            "descriptors1": de1n.astype(cdt),
            "gt_matches0": gt.matches0, "gt_matches1": gt.matches1,
            "rep": gt.rep, "mask0": mask0, "mask1": mask1,
        }

    def run(batch: Dict) -> Dict:
        out = prepare(batch["keypoints0"], batch["keypoints1"],
                      batch["scores0"], batch["scores1"],
                      batch["descriptors0"], batch["descriptors1"],
                      batch["kpts0_world"], batch["kpts1_world"],
                      batch["mask0"], batch["mask1"])
        out = dict(out)
        out["T_gt"] = batch["T_gt"]
        for k in ("sequence", "idx0", "idx1", "cloud0", "cloud1"):
            if k in batch:
                out[k] = batch[k]
        return out

    return run
