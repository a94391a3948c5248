"""High-level inference API: load a checkpoint, match two keypoint
clouds, optionally fit the rigid pose.

The reference exposes inference only through its eval scripts
(``test.py:131-298``: build ``MDGAT``, DataParallel-wrap, iterate a
DataLoader); a library user has to re-assemble that spine by hand.
:class:`Matcher` packages it: checkpoint loading (native ``.npz`` or
reference ``.pth`` via the converter), 128-bucket padding with validity
masks (the static-shape contract — padded results equal unpadded,
tested), one jitted forward per shape bucket, and the reference's SVD
pose fit (``utils/utils_test.py:73-110``).

    >>> m = Matcher("checkpoint/best_model.npz")           # doctest: +SKIP
    >>> out = m.match(kp0, desc0, kp1, desc1)               # doctest: +SKIP
    >>> reg = m.register(kp0, desc0, kp1, desc1)            # doctest: +SKIP
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from mdgat_tpu.core.config import Config, test_defaults
from mdgat_tpu.data.pipeline import _round_up as _bucket_round_up

_BUCKET = 128


class Matcher:
    """Checkpointed MDGAT/SuperGlue matcher for library use.

    ``checkpoint``: path to a native ``.npz`` (``core/checkpoint.py``) or
    a reference ``.pth`` (converted; needs torch installed). Pass
    ``params=``/``bn_state=`` pytrees instead to skip file loading.
    ``overrides``: :class:`~mdgat_tpu.core.config.Config` fields on top
    of the eval preset (``test_defaults()`` — the reference ``test.py``
    defaults), e.g. ``net="superglue"``, ``descriptor="FPFH_only"``,
    ``compute_dtype="bfloat16"``. Architecture fields must match the
    checkpoint (as in the reference, where the eval CLI re-declares
    them, ``test.py:137-151``).

    Multi-device serving: pass ``data_parallel=N`` (and optionally
    ``seq_parallel=M``) to dispatch ``match_batch`` batches over a device
    mesh through the same runtime the eval CLIs use; ``shard_map=True``
    forces the explicit per-shard-kernel path. Batches pad to a multiple
    of the data axis with duplicate rows (trimmed from the results), so
    results stay element-wise identical to single-device calls.
    """

    def __init__(self, checkpoint: Optional[str] = None, *,
                 params=None, bn_state=None, **overrides):
        import jax
        from mdgat_tpu.models import build_model
        from mdgat_tpu.parallel import make_eval_runtime

        self.cfg: Config = test_defaults().replace(**overrides)
        self.model = build_model(self.cfg)
        self.meta: Dict = {}
        if checkpoint is not None:
            if checkpoint.endswith(".pth"):
                from mdgat_tpu.core.checkpoint import load_pth_checkpoint
                params, bn_state, self.meta = load_pth_checkpoint(
                    checkpoint, self.cfg,
                    dtype=np.dtype(self.cfg.param_dtype))
            else:
                from mdgat_tpu.core.checkpoint import load_checkpoint
                ck = load_checkpoint(checkpoint)
                params = jax.tree.map(np.asarray, ck["params"])
                bn_state = jax.tree.map(np.asarray, ck["bn_state"])
                self.meta = ck["meta"]
        elif params is None or bn_state is None:
            raise ValueError(
                "pass a checkpoint path or BOTH params and bn_state")
        self.params, self.bn_state = params, bn_state
        # Serving executor: the same mesh-aware runtime the eval CLIs use.
        # With the default config (data_parallel=1, seq_parallel=1) this
        # is a plain jitted step cached per shape bucket; pass
        # data_parallel=N / seq_parallel=M (+ shard_map=True to force the
        # explicit per-shard-kernel path) to serve batches over a device
        # mesh. self._mesh_b is the data-axis size every dispatched batch
        # must be a multiple of — match_batch pads with duplicate rows
        # and trims.
        self._mesh_b = max(self.cfg.data_parallel or 1, 1)
        (self._step, self.params, self.bn_state,
         self._shard_inputs) = make_eval_runtime(
            self.model, self.cfg, self.params, self.bn_state,
            batch_size=self._mesh_b)

    # ------------------------------------------------------------------
    def _pad_cloud(self, kp, desc, score, dt):
        kp = np.asarray(kp, dt)
        desc = np.asarray(desc, dt)
        n = len(kp)
        score = (np.full((n,), 20.0, dt) if score is None
                 else np.asarray(score, dt))
        tgt = max(_bucket_round_up(n, _BUCKET), _BUCKET)
        out_kp = np.zeros((tgt, 3), dt)
        out_ds = np.zeros((tgt, desc.shape[1]), dt)
        out_sc = np.zeros((tgt,), dt)
        mask = np.zeros((tgt,), bool)
        out_kp[:n], out_ds[:n], out_sc[:n], mask[:n] = kp, desc, score, True
        return out_kp, out_ds, out_sc, mask, n

    def match(self, kp0, desc0, kp1, desc1, score0=None, score1=None,
              normalize: bool = True) -> Dict[str, np.ndarray]:
        """Match one pair of keypoint clouds.

        ``kp*``: [n, 3] coordinates; ``desc*``: [n, D] descriptors
        (D = 33 FPFH for the stock model); ``score*``: [n] detector
        saliencies (keypoint-encoder input, ``models/mdgat.py:176-188``;
        defaults to a constant when the detector provides none).
        ``normalize`` L2-normalizes descriptor rows (the reference data
        layer always does, ``load_data.py:290-292``).

        Returns numpy ``matches0`` [n0] / ``matches1`` [n1] (index into
        the other cloud, -1 = unmatched) and ``matching_scores0/1``.
        """
        # a batch of one: the shared bucket of a singleton batch is the
        # pair's own bucket, so this is the identical program and shapes
        # the standalone implementation used
        return self.match_batch(
            [dict(kp0=kp0, desc0=desc0, kp1=kp1, desc1=desc1,
                  score0=score0, score1=score1)], normalize)[0]

    def match_batch(self, pairs, normalize: bool = True):
        """Match many pairs in ONE batched device dispatch (the serving
        path: the jitted forward amortizes launch overhead and fills the
        chip — the per-pair :meth:`match` dispatches a batch of 1).

        ``pairs``: sequence of dicts with keys ``kp0, desc0, kp1, desc1``
        and optional ``score0, score1`` (the :meth:`match` arguments).
        All pairs are padded to shared per-side buckets (max keypoint
        count rounded up to 128 — the validity-mask contract makes padded
        results equal unpadded, tested), so a steady serving batch size
        reuses one compiled program per shape bucket.

        Returns a list of per-pair dicts, each exactly what
        :meth:`match` returns.
        """
        pairs = list(pairs)  # accept any iterable (an empty generator is
        # truthy, so a falsy check alone would fall through to max() of
        # an empty sequence)
        if not pairs:
            return []
        dt = np.dtype(self.cfg.compute_dtype if self.cfg.compute_dtype
                      != "bfloat16" else "float32")
        padded = []
        for p in pairs:
            k0, d0, s0, m0, n0 = self._pad_cloud(
                p["kp0"], p["desc0"], p.get("score0"), dt)
            k1, d1, s1, m1, n1 = self._pad_cloud(
                p["kp1"], p["desc1"], p.get("score1"), dt)
            if normalize:
                for d, n in ((d0, n0), (d1, n1)):
                    nrm = np.linalg.norm(d[:n], axis=1, keepdims=True)
                    d[:n] /= np.maximum(nrm, 1e-12)
            padded.append((k0, d0, s0, m0, n0, k1, d1, s1, m1, n1))

        # mesh alignment: the shard_map path splits the batch axis over
        # the data mesh axis, so pad to a multiple with duplicate rows
        # (trimmed from the results below)
        n_real = len(padded)
        fill = (-n_real) % self._mesh_b
        padded.extend([padded[-1]] * fill)

        # shared per-side buckets: re-pad each cloud to the batch max
        t0 = max(x[0].shape[0] for x in padded)
        t1 = max(x[5].shape[0] for x in padded)

        def grow(arr, tgt):
            if arr.shape[0] == tgt:
                return arr
            out = np.zeros((tgt,) + arr.shape[1:], arr.dtype)
            out[: arr.shape[0]] = arr
            return out

        batch = {
            "keypoints0": np.stack([grow(x[0], t0) for x in padded]),
            "descriptors0": np.stack([grow(x[1], t0) for x in padded]),
            "scores0": np.stack([grow(x[2], t0) for x in padded]),
            "mask0": np.stack([grow(x[3], t0) for x in padded]),
            "keypoints1": np.stack([grow(x[5], t1) for x in padded]),
            "descriptors1": np.stack([grow(x[6], t1) for x in padded]),
            "scores1": np.stack([grow(x[7], t1) for x in padded]),
            "mask1": np.stack([grow(x[8], t1) for x in padded]),
        }
        if self._shard_inputs is not None:
            batch = self._shard_inputs(batch)
        out = self._step(self.params, self.bn_state, batch)
        # distinct names from the m0/s0 mask/score loop variables above;
        # .copy() so a retained per-pair result doesn't pin the whole
        # [B, t] batch buffers (these are trimmed views otherwise)
        ma0 = np.asarray(out["matches0"])
        ma1 = np.asarray(out["matches1"])
        msc0 = np.asarray(out["matching_scores0"], np.float32)
        msc1 = np.asarray(out["matching_scores1"], np.float32)
        return [{
            "matches0": ma0[b, : x[4]].copy(),
            "matches1": ma1[b, : x[9]].copy(),
            "matching_scores0": msc0[b, : x[4]].copy(),
            "matching_scores1": msc1[b, : x[9]].copy(),
        } for b, x in enumerate(padded[:n_real])]

    def register(self, kp0, desc0, kp1, desc1, score0=None, score1=None,
                 normalize: bool = True, min_matches: int = 4,
                 inlier_radius: float = 1.0) -> Dict:
        """Match + one-step SVD pose fit (``solve_icp`` semantics,
        ``utils/utils_test.py:73-110``; the reference eval fails pairs
        with < 4 matches, ``test.py:272-274``).

        Returns the match dict plus ``T`` (4x4 mapping cloud-1 points
        into cloud 0's frame; ``None`` when under ``max(min_matches, 3)``
        — the SVD fit itself needs three correspondences),
        ``n_matches``, ``inliers`` (matches within ``inlier_radius`` of
        their counterpart after applying T).
        """
        out = self.match(kp0, desc0, kp1, desc1, score0, score1,
                         normalize=normalize)
        return self._pose_fit(out, kp0, kp1, min_matches, inlier_radius)

    def register_batch(self, pairs, normalize: bool = True,
                       min_matches: int = 4, inlier_radius: float = 1.0):
        """:meth:`register` over many pairs with the matching done in ONE
        batched device dispatch (:meth:`match_batch`); the SVD pose fits
        are cheap host numpy. Returns a list of :meth:`register` dicts."""
        pairs = list(pairs)
        outs = self.match_batch(pairs, normalize=normalize)
        return [self._pose_fit(out, p["kp0"], p["kp1"], min_matches,
                               inlier_radius)
                for p, out in zip(pairs, outs)]

    @staticmethod
    def _pose_fit(out: Dict, kp0, kp1, min_matches: int,
                  inlier_radius: float) -> Dict:
        """Extend a match dict with the SVD pose fit (shared by
        :meth:`register` / :meth:`register_batch`)."""
        from mdgat_tpu.eval.metrics import np_kabsch

        valid = out["matches0"] >= 0
        out["n_matches"] = int(valid.sum())
        if out["n_matches"] < max(min_matches, 3):  # SVD needs >= 3
            out["T"], out["inliers"] = None, 0
            return out
        mk0 = np.asarray(kp0, np.float64)[valid]
        mk1 = np.asarray(kp1, np.float64)[out["matches0"][valid]]
        T = np_kabsch(mk1, mk0)
        moved = mk1 @ T[:3, :3].T + T[:3, 3]
        out["T"] = T
        out["inliers"] = int(
            (np.linalg.norm(moved - mk0, axis=1) < inlier_radius).sum())
        return out
