"""MDGAT — the paper model, functional TPU-native form.

Reference: class ``MDGAT`` (``models/mdgat.py:315-603``). Forward pipeline:
encoders -> 2L-layer attentional GNN (with the dynamic top-k schedule) ->
final 1x1 projection -> scaled descriptor inner-product scores ->
log-domain Sinkhorn OT with dustbins -> match decision + loss.

API contract (matching ``models/mdgat.py:596-603``): ``apply`` returns a
dict with ``matches0/1`` (int32, -1 = unmatched), ``matching_scores0/1``,
and ``loss`` ([B] per-example vector). Ground-truth inputs use the
reference's convention: int, -1 = unmatched (``load_data.py:273``). Unlike
the reference, gt arrays are never mutated in-place.

Masks: ``mask0``/``mask1`` ([B,N] bool) mark valid keypoints, enabling
fixed-shape padded batches on TPU (reference eval used ragged shapes,
``test.py:98-100``). When absent, all points are valid.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mdgat_tpu.core.config import Config
from mdgat_tpu.models import encoders as enc
from mdgat_tpu.models.gnn import gnn_apply, gnn_init
from mdgat_tpu.ops.losses import gap_loss, superglue_nll_loss, triplet_loss
from mdgat_tpu.ops.matching import match_decision
from mdgat_tpu.ops.mlp import conv1x1_apply, conv1x1_init
from mdgat_tpu.ops.transport import assemble_full_scores, log_optimal_transport


class MDGAT:
    """Namespace for init/apply. Params and BN state are explicit pytrees."""

    def __init__(self, config: Config):
        self.config = config

    # ------------------------------------------------------------------
    def init(self, key):
        cfg = self.config
        dtype = jnp.dtype(cfg.param_dtype)
        keys = jax.random.split(key, 6)
        params: Dict[str, Any] = {}
        state: Dict[str, Any] = {}

        fd = cfg.descriptor_dim
        if cfg.descriptor in ("FPFH", "FPFH_gloabal"):
            params["kenc"], state["kenc"] = enc.keypoint_encoder_init(
                keys[0], fd, cfg.keypoint_encoder, dtype)
            if cfg.descriptor == "FPFH":
                params["denc"], state["denc"] = enc.descriptor_encoder_init(
                    keys[1], fd, cfg.descriptor_encoder, dtype)
            else:
                params["denc"], state["denc"] = \
                    enc.descriptor_global_encoder_init(
                        keys[1], fd, cfg.descriptor_encoder, dtype)
        elif cfg.descriptor == "FPFH_only":
            params["denc"], state["denc"] = enc.descriptor_encoder_init(
                keys[1], fd, cfg.descriptor_encoder, dtype)
        elif cfg.descriptor in ("pointnet", "pointnetmsg"):
            from mdgat_tpu.models.pointnet_encoder import pointnet_encoder_init
            sg = cfg.net == "superglue"
            params["penc"], state["penc"] = pointnet_encoder_init(
                keys[0], fd, cfg.keypoint_encoder,
                msg=(cfg.descriptor == "pointnetmsg"), dtype=dtype,
                superglue=sg)
            if sg:
                # reference SuperGlue also constructs a KeypointEncoder and
                # pointnetDescriptorEncoder for the pointnet modes
                # (superglue.py:345-360) though its forward never calls
                # them (superglue.py:421-424); kept for checkpoint parity.
                params["kenc"], state["kenc"] = enc.keypoint_encoder_init(
                    keys[4], fd, cfg.keypoint_encoder, dtype)
                params["denc"], state["denc"] = \
                    enc.pointnet_descriptor_encoder_init(keys[5], fd, dtype)
        else:
            raise ValueError(f"Invalid descriptor: {cfg.descriptor}")

        n_layers = 2 * cfg.L
        params["gnn"], state["gnn"] = gnn_init(
            keys[2], fd, n_layers, cfg.num_heads, dtype)
        params["final_proj"] = conv1x1_init(keys[3], fd, fd, dtype)
        params["bin_score"] = jnp.asarray(1.0, dtype)  # models/mdgat.py:359
        return params, state

    # ------------------------------------------------------------------
    def encode(self, params, state, data, train: bool):
        """Descriptor encoding stage; returns (desc0, desc1, new_state)."""
        cfg = self.config
        dt = jnp.dtype(cfg.compute_dtype)
        kpts0 = data["keypoints0"].astype(dt)
        kpts1 = data["keypoints1"].astype(dt)
        scores0 = data["scores0"].astype(dt)
        scores1 = data["scores1"].astype(dt)
        mask0 = data.get("mask0")
        mask1 = data.get("mask1")
        new_state = dict(state)

        if cfg.descriptor in ("FPFH", "FPFH_gloabal"):
            d0 = data["descriptors0"].astype(dt)
            d1 = data["descriptors1"].astype(dt)
            apply_denc = (enc.descriptor_encoder_apply
                          if cfg.descriptor == "FPFH"
                          else enc.descriptor_global_encoder_apply)
            e0, st = apply_denc(params["denc"], state["denc"], d0, train, mask0)
            e1, st = apply_denc(params["denc"], st, d1, train, mask1)
            k0, stk = enc.keypoint_encoder_apply(
                params["kenc"], state["kenc"], kpts0, scores0, train, mask0)
            k1, stk = enc.keypoint_encoder_apply(
                params["kenc"], stk, kpts1, scores1, train, mask1)
            desc0, desc1 = e0 + k0, e1 + k1
            new_state["denc"], new_state["kenc"] = st, stk
        elif cfg.descriptor == "FPFH_only":
            d0 = data["descriptors0"].astype(dt)
            d1 = data["descriptors1"].astype(dt)
            e0, st = enc.descriptor_encoder_apply(
                params["denc"], state["denc"], d0, train, mask0)
            e1, st = enc.descriptor_encoder_apply(
                params["denc"], st, d1, train, mask1)
            desc0, desc1 = e0, e1
            new_state["denc"] = st
        else:  # pointnet / pointnetmsg
            from mdgat_tpu.models.pointnet_encoder import pointnet_encoder_apply
            sg = cfg.net == "superglue"
            pc0 = data["cloud0"].astype(dt)
            pc1 = data["cloud1"].astype(dt)
            desc0, st = pointnet_encoder_apply(
                params["penc"], state["penc"], pc0, kpts0, scores0,
                msg=(cfg.descriptor == "pointnetmsg"), train=train,
                superglue=sg)
            desc1, st = pointnet_encoder_apply(
                params["penc"], st, pc1, kpts1, scores1,
                msg=(cfg.descriptor == "pointnetmsg"), train=train,
                superglue=sg)
            new_state["penc"] = st
        return desc0, desc1, new_state

    # ------------------------------------------------------------------
    def apply(self, params, state, data, train: bool = False,
              return_full_scores: bool = False, axis_name=None,
              seq_axis=None, seq_size: int = 1):
        """Full forward pass. Returns (outputs dict, new_state).

        ``axis_name``: cross-replica mesh axis (or tuple of axes) when
        running inside an explicit ``shard_map`` (see ``parallel/smap.py``)
        — train-mode BatchNorm statistics then psum over it so per-shard
        execution reproduces the global-batch numerics. None under plain
        jit (sharding propagation) or single-device runs.

        ``seq_axis``/``seq_size``: context-parallel shard_map execution —
        the keypoint axis of every batch input is sharded over the named
        mesh axis of (static) size ``seq_size``. The GNN runs on local
        query rows with per-layer all-gathered key/value activations; the
        O(iters·N·M) OT/decision/loss tail runs on all-gathered
        descriptors, replicated over the (small) seq axis — see
        ``parallel/smap.py`` for the gradient-reduction contract.
        """
        from mdgat_tpu.ops.mlp import bn_cross_replica
        with bn_cross_replica(axis_name if train else None):
            return self._apply(params, state, data, train,
                               return_full_scores, seq_axis, seq_size)

    def _apply(self, params, state, data, train: bool = False,
               return_full_scores: bool = False, seq_axis=None,
               seq_size: int = 1):
        cfg = self.config
        desc0, desc1, new_state = self.encode(params, state, data, train)
        mask0 = data.get("mask0")
        mask1 = data.get("mask1")

        # staged training for learned descriptors (models/mdgat.py:398-420)
        run_gnn = True
        if cfg.descriptor in ("pointnet", "pointnetmsg"):
            if cfg.train_step == 1:
                run_gnn = False
            elif cfg.train_step == 2:
                desc0 = jax.lax.stop_gradient(desc0)
                desc1 = jax.lax.stop_gradient(desc1)

        # Pallas fused kernels. Attention has a custom VJP (sort-free
        # backward) so it serves training too; Sinkhorn has a forward-only
        # kernel for eval and a replayed-backward custom VJP for training
        # (exact backprop through the iterations — reference semantics,
        # ``models/mdgat.py:279-285`` under autograd). CPU lacks the Mosaic
        # backend — fall back to the XLA versions.
        on_accel = (jax.default_backend() != "cpu"
                    or cfg.pallas_interpret)  # tests: interpreter on CPU
        use_pallas = cfg.use_pallas and on_accel
        pallas_attn = cfg.pallas_attention and on_accel
        if pallas_attn and cfg.pallas_exact_topk:
            pallas_attn = "exact"

        if run_gnn:
            # k-schedule gates compare against the GLOBAL keypoint count
            # (the local shape is N/seq_size under context parallelism)
            n = desc0.shape[1] * seq_size
            k_sched = cfg.layer_k_schedule(n)
            desc0, desc1, st_gnn = gnn_apply(
                params["gnn"], state["gnn"], desc0, desc1,
                cfg.gnn_layer_names, k_sched, cfg.num_heads, train,
                mask0, mask1, use_pallas=pallas_attn,
                remat=cfg.remat_gnn and train,
                scan_pairs=cfg.scan_gnn_pairs,
                train_layer=cfg.pallas_train_layer, seq_axis=seq_axis)
            new_state["gnn"] = st_gnn
            mdesc0 = conv1x1_apply(params["final_proj"], desc0)
            mdesc1 = conv1x1_apply(params["final_proj"], desc1)
        else:
            mdesc0, mdesc1 = desc0, desc1

        if seq_axis is not None:
            # context-parallel tail: the O(L·N²·C) GNN above ran sharded;
            # the OT/decision/loss tail is O(iters·N·M) with per-iteration
            # global row/col reductions — gather the [B, N/s, C]
            # DESCRIPTORS (activations, not the N×M score slab) and run
            # the tail replicated over the small seq axis instead of
            # distributing the Sinkhorn reductions. The redundancy costs
            # (s−1)/s of a ~5%-of-step stage; the gradient double-count it
            # creates is cancelled by the 1/s loss cotangent scale +
            # psum-over-seq grad reduction in parallel/smap.py.
            gather = lambda x: None if x is None else jax.lax.all_gather(
                x, seq_axis, axis=1, tiled=True)
            mdesc0, mdesc1 = gather(mdesc0), gather(mdesc1)
            mask0, mask1 = gather(mask0), gather(mask1)

        # scaled inner-product scores (models/mdgat.py:430-431).
        # Mixed precision: the OT/decision/loss stages run in >= float32
        # even when the GNN computes in bfloat16 — log-domain Sinkhorn in
        # bf16 loses the transport numerics.
        ot_dtype = jnp.float32 if mdesc0.dtype == jnp.bfloat16 \
            else mdesc0.dtype
        scores = jnp.einsum("bnd,bmd->bnm", mdesc0, mdesc1,
                            preferred_element_type=ot_dtype)
        scores = scores.astype(ot_dtype)
        scores = scores / jnp.asarray(cfg.descriptor_dim, scores.dtype) ** 0.5

        ot_aux = None
        if use_pallas and train:
            from mdgat_tpu.ops.pallas import (
                pallas_log_optimal_transport_trainable)
            ot = pallas_log_optimal_transport_trainable(
                scores, params["bin_score"].astype(scores.dtype),
                cfg.sinkhorn_iterations, row_mask=mask0, col_mask=mask1)
        elif use_pallas:
            # eval: decision_aux=True REQUESTS the fused match-decision
            # epilogue, but the kernel only honours it under its
            # _DECISION_AUX gate — which ships OFF (chip-measured loser,
            # see ops/pallas/sinkhorn.py) — so ot_aux is None in
            # production and match_decision takes its XLA dense path
            from mdgat_tpu.ops.pallas import pallas_log_optimal_transport
            ot, ot_aux = pallas_log_optimal_transport(
                scores, params["bin_score"].astype(scores.dtype),
                cfg.sinkhorn_iterations, row_mask=mask0, col_mask=mask1,
                decision_aux=True)
        else:
            ot = log_optimal_transport(
                scores, params["bin_score"].astype(scores.dtype),
                cfg.sinkhorn_iterations, row_mask=mask0, col_mask=mask1)

        result = match_decision(ot, cfg.loss_method, cfg.match_threshold,
                                cfg.mutual_check, mask0, mask1, aux=ot_aux)

        out = {
            "matches0": result.matches0,
            "matches1": result.matches1,
            "matching_scores0": result.matching_scores0,
            "matching_scores1": result.matching_scores1,
        }

        if "gt_matches0" in data:
            gt0 = data["gt_matches0"].astype(jnp.int32)
            gt1 = data["gt_matches1"].astype(jnp.int32)
            if seq_axis is not None:
                # gt values index the GLOBAL row/col axes (host-computed
                # on the full clouds); gather the seq-sharded vectors to
                # match the gathered transport
                gt0 = jax.lax.all_gather(gt0, seq_axis, axis=1, tiled=True)
                gt1 = jax.lax.all_gather(gt1, seq_axis, axis=1, tiled=True)
            if cfg.loss_method == "superglue":
                loss = superglue_nll_loss(ot, gt0, gt1, mask0, mask1)
            elif cfg.loss_method == "triplet_loss":
                loss = triplet_loss(ot, gt0, gt1, cfg.triplet_loss_gamma,
                                    mask0, mask1)
            elif cfg.loss_method == "gap_loss":
                # independent of the Sinkhorn kernel choice: the fused
                # loss consumes the transport block either way
                if cfg.pallas_loss and on_accel:
                    from mdgat_tpu.ops.pallas.loss import pallas_gap_loss
                    loss = pallas_gap_loss(
                        ot, gt0, gt1, cfg.triplet_loss_gamma, mask0, mask1,
                        interpret=jax.default_backend() == "cpu")
                else:
                    loss = gap_loss(ot, gt0, gt1, cfg.triplet_loss_gamma,
                                    mask0, mask1)
            else:
                raise ValueError(f"Invalid loss_method: {cfg.loss_method}")
            out["loss"] = loss

        if return_full_scores:
            out["scores"] = assemble_full_scores(ot)
        return out, new_state
