"""Full and dynamic top-k attention — the MDGAT compute core.

The reference implements two attention modes (``models/mdgat.py:190-210``):

* ``attention``: dense softmax attention.
* ``dynamic_attention``: the paper's "multiplex dynamic graph" — per query
  row, softmax over only the top-k score entries. The reference realizes
  this by gathering top-k scores with advanced-indexing index cubes and
  scattering the softmax back into a dense zero ``[B,H,N,M]`` float64
  matrix. That scatter is hostile to TPUs (dynamic scatter, huge transient).

TPU-native formulation used here: the top-k softmax equals a *masked*
softmax where the mask keeps entries ``>=`` the k-th largest value of the
row. ``jax.lax.top_k`` (an XLA TopK HLO) provides the k-th value; the mask,
softmax and the prob@V matmul then fuse in XLA without any scatter. Ties at
the threshold can admit >k entries (measure-zero for continuous scores);
``exact=True`` switches to a scatter-based implementation with the exact
reference tie-breaking for parity testing.

Layout: q, k, v are ``[B, H, N, D]`` (heads-major), the natural layout for
MXU-tiled batched matmuls. The reference's ``[B, D, H, N]`` layout is an
artifact of torch 1x1-conv projections; the weight converter accounts for
the permutation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _scores(q, k):
    """Scaled attention scores [B, H, N, M]; scale = sqrt(head_dim).

    Matches ``models/mdgat.py:192``: ``einsum('bdhn,bdhm->bhnm') / d**0.5``.
    Accumulates in >= float32 (bf16 inputs keep f32 scores for the
    softmax; the PV matmul downcasts prob back to the compute dtype).
    """
    d = q.shape[-1]
    acc = jnp.float32 if q.dtype == jnp.bfloat16 else q.dtype
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=acc)
    return s.astype(acc) / jnp.asarray(d, acc) ** 0.5


BIG_NEG = -1e30  # -inf stand-in; exp()s to 0, safe in f32 and f64


def _masked_softmax(s, mask, axis=-1):
    """Softmax over entries where mask is True; 0 elsewhere."""
    neg = jnp.asarray(BIG_NEG, s.dtype)
    s_masked = jnp.where(mask, s, neg)
    m = jnp.max(s_masked, axis=axis, keepdims=True)
    e = jnp.exp(s_masked - m) * mask.astype(s.dtype)
    return e / jnp.maximum(jnp.sum(e, axis=axis, keepdims=True),
                           jnp.asarray(jnp.finfo(s.dtype).tiny, s.dtype))


def full_attention(q, k, v, kv_mask: Optional[jnp.ndarray] = None,
                   return_prob: bool = False):
    """Dense attention (``models/mdgat.py:190-194``).

    q,k,v: [B, H, N, D] / [B, H, M, D]. ``kv_mask`` [B, M] masks padded
    source points out of the softmax (no reference equivalent — the
    reference never pads; needed for fixed-shape TPU eval).
    """
    s = _scores(q, k)
    if kv_mask is not None:
        mask = kv_mask[:, None, None, :]
        prob = _masked_softmax(s, jnp.broadcast_to(mask, s.shape))
    else:
        prob = jax.nn.softmax(s, axis=-1)
    acc = jnp.float32 if v.dtype == jnp.bfloat16 else v.dtype
    out = jnp.einsum("bhnm,bhmd->bhnd", prob.astype(v.dtype), v,
                     preferred_element_type=acc).astype(v.dtype)
    if return_prob:
        return out, prob
    return out


def topk_attention(q, k, v, topk: int, kv_mask: Optional[jnp.ndarray] = None,
                   exact: bool = False, return_prob: bool = False):
    """Dynamic top-k attention (``models/mdgat.py:196-210``).

    Per query row, keep only the ``topk`` highest-scoring source entries and
    softmax over them. ``exact=True`` reproduces the reference's exact
    member set under ties (top_k indices + scatter); the default threshold
    formulation keeps every entry >= the k-th value (identical for
    distinct scores, scatter-free and XLA-fusable).
    """
    s = _scores(q, k)
    if kv_mask is not None:
        neg = jnp.asarray(BIG_NEG, s.dtype)
        s = jnp.where(kv_mask[:, None, None, :], s, neg)

    if exact:
        vals, idx = jax.lax.top_k(s, topk)             # [B,H,N,K]
        sm = jax.nn.softmax(vals, axis=-1)
        prob = jnp.zeros_like(s)
        b_i = jnp.arange(s.shape[0])[:, None, None, None]
        h_i = jnp.arange(s.shape[1])[None, :, None, None]
        n_i = jnp.arange(s.shape[2])[None, None, :, None]
        prob = prob.at[b_i, h_i, n_i, idx].set(sm)
    else:
        kth = jax.lax.top_k(s, topk)[0][..., -1:]       # [B,H,N,1]
        mask = s >= kth
        prob = _masked_softmax(s, mask)

    acc = jnp.float32 if v.dtype == jnp.bfloat16 else v.dtype
    out = jnp.einsum("bhnm,bhmd->bhnd", prob.astype(v.dtype), v,
                     preferred_element_type=acc).astype(v.dtype)
    if return_prob:
        return out, prob
    return out


def split_heads(x, num_heads: int):
    """[B, N, C] -> [B, H, N, D] with the reference's channel split.

    The reference reshapes the conv output ``[B, C, N]`` via
    ``view(B, dim, heads, N)`` (``models/mdgat.py:227``), i.e. channel
    c = d * heads + h. We mirror that split so converted torch weights
    produce identical per-head projections.
    """
    b, n, c = x.shape
    d = c // num_heads
    x = x.reshape(b, n, d, num_heads)       # c -> (d, h), d-major as torch view
    return x.transpose(0, 3, 1, 2)          # [B, H, N, D]


def merge_heads(x):
    """[B, H, N, D] -> [B, N, C], inverse of :func:`split_heads`."""
    b, h, n, d = x.shape
    return x.transpose(0, 2, 3, 1).reshape(b, n, d * h)


def multi_head_attention(proj_params, x, source, topk: Optional[int],
                         num_heads: int = 4,
                         kv_mask: Optional[jnp.ndarray] = None,
                         exact: bool = False, use_pallas: bool = False):
    """MultiHeadedAttention of ``models/mdgat.py:213-237`` (functional).

    proj_params: {"q","k","v","merge"} each a conv1x1 param dict.
    x, source: [B, N, C]. topk=None selects dense attention.
    ``use_pallas`` routes through the fused TPU kernel: ``True`` uses the
    fast value-bisection top-k, ``"exact"`` the bit-exact integer-key
    search (see ``ops/pallas/attention.py``).
    The reference's ``self.prob`` side-channel accumulation
    (``models/mdgat.py:236``) is dropped — it holds the full dense prob
    matrices in memory and is unused by training/eval.
    """
    from mdgat_tpu.ops.mlp import conv1x1_apply

    if use_pallas:
        # fully-fused path: projections + attention + merge in one custom-
        # VJP kernel pair — no [B, H, N, D] relayouts of activations (the
        # split/merge transposes measured ~28 ms/step of layout copies at
        # the reference train config)
        from mdgat_tpu.ops.pallas.attention import fused_mha
        return fused_mha(topk, num_heads, use_pallas == "exact",
                         proj_params, x, source, kv_mask)
    q = split_heads(conv1x1_apply(proj_params["q"], x), num_heads)
    k = split_heads(conv1x1_apply(proj_params["k"], source), num_heads)
    v = split_heads(conv1x1_apply(proj_params["v"], source), num_heads)
    if topk is None:
        o = full_attention(q, k, v, kv_mask=kv_mask)
    else:
        o = topk_attention(q, k, v, topk, kv_mask=kv_mask, exact=exact)
    return conv1x1_apply(proj_params["merge"], merge_heads(o))
