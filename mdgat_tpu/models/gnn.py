"""Attentional GNN with the multiplex-dynamic-graph k-schedule.

Reference: ``AttentionalPropagation`` / ``AttentionalGNN``
(``models/mdgat.py:239-276``). 2L alternating self/cross layers; a layer
computes ``message = MHA(x, source)`` and the residual update
``x += MLP(concat(x, message))``. Late layers switch to dynamic top-k
attention per the k-schedule (``models/mdgat.py:268-272``); the "dynamic
graph" is the top-k of the *current layer's* attention scores, rebuilt
every layer — realized here as a threshold-masked softmax
(:func:`mdgat_tpu.ops.attention.topk_attention`) instead of the
reference's dense scatter.

Each layer's weights are shared between the two clouds; the reference
applies the layer to cloud0 then cloud1 (``models/mdgat.py:270-272``), so
BN batch statistics are per-cloud and running stats update twice per layer
— reproduced here by sequential application.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from mdgat_tpu.ops.attention import multi_head_attention
from mdgat_tpu.ops.mlp import conv1x1_init, mlp_apply, mlp_init, mlp_state_init


def attentional_propagation_init(key, feature_dim: int, num_heads: int,
                                 dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    ch = [feature_dim * 2, feature_dim * 2, feature_dim]
    params = {
        "attn": {
            "q": conv1x1_init(ks[0], feature_dim, feature_dim, dtype),
            "k": conv1x1_init(ks[1], feature_dim, feature_dim, dtype),
            "v": conv1x1_init(ks[2], feature_dim, feature_dim, dtype),
            "merge": conv1x1_init(ks[3], feature_dim, feature_dim, dtype),
        },
        "mlp": mlp_init(ks[4], ch, dtype=dtype, zero_last_bias=True),
    }
    state = {"mlp": mlp_state_init(ch, dtype=dtype)}
    return params, state


def attentional_propagation_apply(params, state, x, source,
                                  topk: Optional[int], num_heads: int,
                                  train=False, valid_mask=None, kv_mask=None,
                                  use_pallas: bool = False):
    message = multi_head_attention(params["attn"], x, source, topk,
                                   num_heads=num_heads, kv_mask=kv_mask,
                                   use_pallas=use_pallas)
    # concat-free MLP input: cat(x, message) @ w1 == x @ w1[:C] +
    # message @ w1[C:] — the materialized concat was a pure HBM copy
    delta, st = mlp_apply(params["mlp"], state["mlp"], (x, message),
                          train, valid_mask)
    return delta, {"mlp": st}


def gnn_init(key, feature_dim: int, n_layers: int, num_heads: int = 4,
             dtype=jnp.float32):
    keys = jax.random.split(key, n_layers)
    params, states = [], []
    for i in range(n_layers):
        p, s = attentional_propagation_init(keys[i], feature_dim, num_heads,
                                            dtype)
        params.append(p)
        states.append(s)
    return params, states


def _apply_layer(p, st, desc0, desc1, name, k, num_heads, train,
                 mask0, mask1, use_pallas, train_layer=True,
                 seq_axis=None):
    if name == "cross":
        src0, src1, kvm0, kvm1 = desc1, desc0, mask1, mask0
    else:
        src0, src1, kvm0, kvm1 = desc0, desc1, mask0, mask1
    if seq_axis is not None:
        # context-parallel shard_map execution (parallel/smap.py): the
        # keypoint axis is sharded over ``seq_axis``. Queries stay local;
        # the key/value side needs every row — all-gather the [B, N/s, C]
        # ACTIVATIONS over ICI (cheap: O(N·C), never the N×M score slab).
        # Gradient flow back through the gather is its transpose
        # (psum-scatter), restoring exact single-device numerics.
        gather = lambda x: None if x is None else jax.lax.all_gather(
            x, seq_axis, axis=1, tiled=True)
        src0, src1 = gather(src0), gather(src1)
        kvm0, kvm1 = gather(kvm0), gather(kvm1)
    if use_pallas and train and train_layer:
        # train: whole layer (fused MHA + MLP + batch-stat BN + residual)
        # as a custom-VJP Pallas kernel pair each way; the BN stats ride
        # the sequential batch grid (see ops/pallas/attention.py TL-*).
        # Sequential cloud0-then-cloud1 application preserves the
        # reference's twice-per-layer running-stat update.
        from mdgat_tpu.ops.mlp import bn_axis_name
        from mdgat_tpu.ops.pallas.attention import (
            fused_train_layer_apply, fused_train_layer_fits)
        interp = jax.default_backend() == "cpu"
        axis = bn_axis_name()  # cross-replica BN under shard_map
        d = desc0.shape[-1]
        # BOTH cloud applications must fit before committing to the fused
        # path (differently-padded clouds could straddle the size gate)
        if (fused_train_layer_fits(num_heads, d, desc0.shape[1],
                                   src0.shape[1])
                and fused_train_layer_fits(num_heads, d, desc1.shape[1],
                                           src1.shape[1])):
            d0, st = fused_train_layer_apply(p, st, desc0, src0, k,
                                             num_heads, mask0, kvm0,
                                             exact=use_pallas == "exact",
                                             interpret=interp,
                                             axis_name=axis)
            d1, st = fused_train_layer_apply(p, st, desc1, src1, k,
                                             num_heads, mask1, kvm1,
                                             exact=use_pallas == "exact",
                                             interpret=interp,
                                             axis_name=axis)
            return d0, d1, st
    if use_pallas and not train:
        # eval: whole layer (attention + merge + MLP + residual) in one
        # fused kernel; BN folds to its running-stats affine, so the BN
        # state passes through unchanged exactly like mlp_apply(train=False)
        from mdgat_tpu.ops.pallas.attention import fused_layer_apply
        interp = jax.default_backend() == "cpu"
        o0 = fused_layer_apply(p, st, desc0, src0, k, num_heads, kvm0,
                               exact=use_pallas == "exact", interpret=interp)
        if o0 is not None:
            o1 = fused_layer_apply(p, st, desc1, src1, k, num_heads, kvm1,
                                   exact=use_pallas == "exact",
                                   interpret=interp)
            return o0, o1, st
    delta0, st = attentional_propagation_apply(
        p, st, desc0, src0, k, num_heads, train, mask0, kvm0,
        use_pallas=use_pallas)
    delta1, st = attentional_propagation_apply(
        p, st, desc1, src1, k, num_heads, train, mask1, kvm1,
        use_pallas=use_pallas)
    return desc0 + delta0, desc1 + delta1, st


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _tree_index(tree, j):
    return jax.tree.map(lambda x: x[j], tree)


def gnn_apply(params, states, desc0, desc1,
              layer_names: Sequence[str],
              k_schedule: Sequence[Optional[int]],
              num_heads: int = 4, train=False,
              mask0=None, mask1=None, use_pallas: bool = False,
              scan_pairs: bool = True, remat: bool = False,
              train_layer: bool = True, seq_axis=None):
    """Run the full GNN stack; returns (desc0, desc1, new_states).

    ``scan_pairs``: consecutive layer *pairs* with identical
    (name, k)-signatures run under one ``lax.scan`` over stacked params —
    the 18-layer default compiles ~3 distinct pair bodies instead of 18
    layers (the single-core host pays minutes per XLA compile). Numerics
    are identical to the unrolled loop.

    ``remat``: checkpoint each layer pair — the backward pass recomputes
    the layer instead of storing 2L dense [B,H,N,M] probability matrices
    (~10 GB at the reference train config of batch 64 / N 512, which
    overflows a 16 GB chip; the reference spread this over 4 GPUs via
    DataParallel). The policy keeps the Pallas attention output and its
    per-row threshold + logsumexp (tagged in ``_fused_mha_fwd``) so the
    replay skips the attention kernel and recomputes only
    projections/merge/MLP; with the
    XLA attention path no tags exist and the policy degrades to full
    remat.
    """
    # saved across the remat boundary: the attention kernel outputs
    # (fused-MHA path) or the pre-BN activation + batch stats (fused
    # train-layer path) — the replay recomputes only the cheap epilogue
    remat_policy = jax.checkpoint_policies.save_only_these_names(
        "attn_out", "attn_thr", "attn_lse", "layer_h1", "layer_bn_mean",
        "layer_bn_var")
    n_layers = len(params)
    if not scan_pairs or n_layers % 2 != 0:
        new_states = []
        for i in range(n_layers):
            fn = _apply_layer
            if remat:
                fn = jax.checkpoint(_apply_layer,
                                    static_argnums=(4, 5, 6, 7, 10, 11, 12),
                                    policy=remat_policy)
            desc0, desc1, st = fn(
                params[i], states[i], desc0, desc1, layer_names[i],
                k_schedule[i], num_heads, train, mask0, mask1, use_pallas,
                train_layer, seq_axis)
            new_states.append(st)
        return desc0, desc1, new_states

    # segment consecutive pairs by (nameA, kA, nameB, kB) signature
    pairs = [(layer_names[i], k_schedule[i],
              layer_names[i + 1], k_schedule[i + 1])
             for i in range(0, n_layers, 2)]
    segments = []  # (signature, start_pair, count)
    for j, sig in enumerate(pairs):
        if segments and segments[-1][0] == sig:
            segments[-1] = (sig, segments[-1][1], segments[-1][2] + 1)
        else:
            segments.append((sig, j, 1))

    new_states: List = [None] * n_layers
    for sig, start, count in segments:
        nameA, kA, nameB, kB = sig
        li = 2 * start

        def pair_step(d0, d1, pA, sA, pB, sB):
            d0, d1, sA2 = _apply_layer(pA, sA, d0, d1, nameA, kA,
                                       num_heads, train, mask0, mask1,
                                       use_pallas, train_layer, seq_axis)
            d0, d1, sB2 = _apply_layer(pB, sB, d0, d1, nameB, kB,
                                       num_heads, train, mask0, mask1,
                                       use_pallas, train_layer, seq_axis)
            return d0, d1, sA2, sB2

        if remat:
            pair_step = jax.checkpoint(pair_step, policy=remat_policy)

        if count == 1:
            desc0, desc1, sA2, sB2 = pair_step(
                desc0, desc1, params[li], states[li],
                params[li + 1], states[li + 1])
            new_states[li], new_states[li + 1] = sA2, sB2
        else:
            xs = (_tree_stack(params[li:li + 2 * count:2]),
                  _tree_stack(states[li:li + 2 * count:2]),
                  _tree_stack(params[li + 1:li + 2 * count:2]),
                  _tree_stack(states[li + 1:li + 2 * count:2]))

            def body(carry, x):
                d0, d1 = carry
                pA, sA, pB, sB = x
                d0, d1, sA2, sB2 = pair_step(d0, d1, pA, sA, pB, sB)
                return (d0, d1), (sA2, sB2)

            (desc0, desc1), (ysA, ysB) = jax.lax.scan(
                body, (desc0, desc1), xs)
            for j in range(count):
                new_states[li + 2 * j] = _tree_index(ysA, j)
                new_states[li + 2 * j + 1] = _tree_index(ysB, j)
    return desc0, desc1, new_states
