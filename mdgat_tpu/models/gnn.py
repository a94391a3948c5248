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
    h = jnp.concatenate([x, message], axis=-1)
    delta, st = mlp_apply(params["mlp"], state["mlp"], h, train, valid_mask)
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


def gnn_apply(params, states, desc0, desc1,
              layer_names: Sequence[str],
              k_schedule: Sequence[Optional[int]],
              num_heads: int = 4, train=False,
              mask0=None, mask1=None, use_pallas: bool = False):
    """Run the full GNN stack; returns (desc0, desc1, new_states)."""
    new_states = []
    for i, (p, st, name) in enumerate(zip(params, states, layer_names)):
        if name == "cross":
            src0, src1, kvm0, kvm1 = desc1, desc0, mask1, mask0
        else:
            src0, src1, kvm0, kvm1 = desc0, desc1, mask0, mask1
        k = k_schedule[i]
        delta0, st = attentional_propagation_apply(
            p, st, desc0, src0, k, num_heads, train, mask0, kvm0,
            use_pallas=use_pallas)
        delta1, st = attentional_propagation_apply(
            p, st, desc1, src1, k, num_heads, train, mask1, kvm1,
            use_pallas=use_pallas)
        desc0 = desc0 + delta0
        desc1 = desc1 + delta1
        new_states.append(st)
    return desc0, desc1, new_states
