"""Checkpointing: native format + PyTorch ``.pth`` conversion.

Native format: a flat ``.npz`` of path-keyed arrays plus the reference's
five logical fields (``net`` = params+bn-state, ``optimizer``, ``epoch``,
``lr_schedule``, ``loss`` — ``train.py:288-294``). Dependency-free and
mmap-friendly; no pickle.

``.pth`` conversion (``convert_pth_state_dict``): maps a reference torch
``state_dict`` onto our param/state pytrees —
* strips the ``DataParallel`` ``module.`` prefix (the reference wraps
  unconditionally, ``train.py:196``);
* 1x1 ``Conv1d`` weights ``[out, in, 1]`` -> dense kernels ``[in, out]``;
* ``BatchNorm1d`` weight/bias -> bn scale/bias (params), running
  mean/var -> bn state;
* the q/k/v head split needs no re-permutation: our ``split_heads``
  mirrors torch's ``view(B, dim, heads, N)`` channel mapping.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# flat-path (de)serialization for pytrees of arrays
# ---------------------------------------------------------------------------

def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


_NONE_SENTINEL = "__none__"


def tree_to_flat(tree) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(
        tree, is_leaf=lambda x: x is None)[0]
    for path, leaf in leaves:
        if leaf is None:
            # BN-less MLP layers carry None state slots; keep them explicit
            # so list lengths survive the roundtrip.
            flat[_path_str(path)] = np.asarray(_NONE_SENTINEL)
        else:
            flat[_path_str(path)] = np.asarray(leaf)
    return flat


def flat_to_tree(flat: Dict[str, np.ndarray]):
    """Rebuild nested dicts/lists from path keys (digit segments = lists)."""
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for i, p in enumerate(parts[:-1]):
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            if (isinstance(node, np.ndarray) and node.dtype.kind == "U"
                    and node.ndim == 0 and str(node) == _NONE_SENTINEL):
                return None
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            idxs = sorted(int(k) for k in keys)
            return [listify(node[str(i)]) for i in idxs]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_checkpoint(path: str, params, bn_state, opt_state=None,
                    epoch: int = 0, lr: float = 0.0, loss: float = 0.0):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {}
    for name, tree in (("params", params), ("bn_state", bn_state),
                       ("opt_state", opt_state)):
        if tree is None:
            continue
        for k, v in tree_to_flat(tree).items():
            flat[f"{name}::{k}"] = v
    flat["meta::epoch"] = np.asarray(epoch)
    flat["meta::lr_schedule"] = np.asarray(lr)
    flat["meta::loss"] = np.asarray(loss)
    np.savez(path, **flat)


def restore_opt_state(saved, template):
    """Rebuild an optax state (nested NamedTuples) from a loaded checkpoint.

    ``flat_to_tree`` reconstructs plain dicts/lists; optax states are
    NamedTuple nodes, so we re-thread the saved leaves (whose order is the
    template's flatten order by construction — ``tree_to_flat`` walks the
    tree in flatten order and ``np.savez``/``np.load`` preserve key order)
    through the template's treedef.

    Note: the reference train.py does NOT restore Adam moments on resume —
    it builds a fresh Adam at the checkpointed lr (``train.py:160,202-204``).
    This helper exists so the saved ``optimizer`` field (``train.py:288-294``)
    is faithfully recoverable; ``train.py --resume`` mirrors the reference
    and does not call it.
    """
    leaves = jax.tree_util.tree_leaves(saved)
    treedef = jax.tree_util.tree_structure(template)
    if len(leaves) != treedef.num_leaves:
        raise ValueError(
            f"saved optimizer state has {len(leaves)} leaves, template has "
            f"{treedef.num_leaves} — architecture/optimizer mismatch")
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])


def load_checkpoint(path: str):
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    meta = {}
    for key in data.files:
        group, sub = key.split("::", 1)
        if group == "meta":
            meta[sub] = data[key].item()
        else:
            groups.setdefault(group, {})[sub] = data[key]
    out = {name: flat_to_tree(flat) for name, flat in groups.items()}
    out["meta"] = meta
    return out


# ---------------------------------------------------------------------------
# torch .pth conversion
# ---------------------------------------------------------------------------

def _strip_module(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                            else v)
    return out


def _conv_positions(n_channels: int):
    """Sequential indices of the convs in MLP(channels): conv_i at 3*i
    (each non-last layer is conv+bn+relu)."""
    return [3 * i for i in range(n_channels - 1)]


def _convert_mlp(sd, prefix: str, channels, dtype=np.float64):
    """(params_list, state_list) for one reference MLP stack."""
    n = len(channels)
    params, state = [], []
    for i, pos in enumerate(_conv_positions(n)):
        w = sd[f"{prefix}.{pos}.weight"]            # [out, in, 1]
        b = sd[f"{prefix}.{pos}.bias"]
        layer = {"lin": {"w": jnp.asarray(w[:, :, 0].T, dtype),
                         "b": jnp.asarray(b, dtype)}}
        if i < n - 2:  # has BN
            layer["bn"] = {
                "scale": jnp.asarray(sd[f"{prefix}.{pos + 1}.weight"], dtype),
                "bias": jnp.asarray(sd[f"{prefix}.{pos + 1}.bias"], dtype),
            }
            state.append({
                "mean": jnp.asarray(sd[f"{prefix}.{pos + 1}.running_mean"],
                                    dtype),
                "var": jnp.asarray(sd[f"{prefix}.{pos + 1}.running_var"],
                                   dtype),
            })
        else:
            state.append(None)
        params.append(layer)
    return params, state


def _convert_conv(sd, prefix: str, dtype=np.float64):
    w = sd[f"{prefix}.weight"]
    return {"w": jnp.asarray(w[:, :, 0].T, dtype),
            "b": jnp.asarray(sd[f"{prefix}.bias"], dtype)}


def _convert_conv2d_stack(sd, conv_prefix: str, bn_prefix: str,
                          n_layers: int, dtype=np.float64):
    """(params, state) for a PointNet++ Conv2d(1x1)+BN2d stack — BN on
    EVERY layer (``pointnet_util.py:186-191``), unlike the MLP helper.
    Conv2d weights are [out, in, 1, 1] -> dense kernels [in, out]."""
    params, state = [], []
    for j in range(n_layers):
        w = sd[f"{conv_prefix}.{j}.weight"]
        params.append({
            "lin": {"w": jnp.asarray(w[:, :, 0, 0].T, dtype),
                    "b": jnp.asarray(sd[f"{conv_prefix}.{j}.bias"], dtype)},
            "bn": {"scale": jnp.asarray(sd[f"{bn_prefix}.{j}.weight"], dtype),
                   "bias": jnp.asarray(sd[f"{bn_prefix}.{j}.bias"], dtype)},
        })
        state.append({
            "mean": jnp.asarray(sd[f"{bn_prefix}.{j}.running_mean"], dtype),
            "var": jnp.asarray(sd[f"{bn_prefix}.{j}.running_var"], dtype),
        })
    return params, state


def _convert_pointnet_encoder(sd, config, dtype=np.float64):
    """PointnetEncoder[Msg] weights (``models/mdgat.py:53-143``) ->
    our ``penc`` pytree ({sa1, sa2, mlp, kenc}).

    Reference module layout (state_dict prefixes under ``penc.``):
    * ``sa1`` = PointNetSetKptsMsg: ``conv_blocks.{scale}.{layer}`` +
      ``bn_blocks.{scale}.{layer}`` (``pointnet_util.py:284-302``);
    * ``sa2`` = PointNetSetAbstraction(group_all): ``mlp_convs.{layer}`` +
      ``mlp_bns.{layer}`` (``pointnet_util.py:180-191``);
    * ``mlp`` = MLP([2D, 2D, D]) and ``kenc`` = KeypointEncoder
      (``models/mdgat.py:68-69``).
    """
    from mdgat_tpu.models.pointnet_encoder import MSG_SPEC, SSG_SPEC
    spec = MSG_SPEC if config.descriptor == "pointnetmsg" else SSG_SPEC
    fd = config.descriptor_dim
    superglue = config.net == "superglue"
    sa1_p, sa1_s = [], []
    for i, mlp in enumerate(spec["mlps"]):
        p, s = _convert_conv2d_stack(sd, f"penc.sa1.conv_blocks.{i}",
                                     f"penc.sa1.bn_blocks.{i}",
                                     len(mlp), dtype)
        sa1_p.append(p)
        sa1_s.append(s)
    sa2_p, sa2_s = _convert_conv2d_stack(sd, "penc.sa2.mlp_convs",
                                         "penc.sa2.mlp_bns", 3, dtype)
    params = {"sa1": sa1_p, "sa2": sa2_p}
    state = {"sa1": sa1_s, "sa2": sa2_s}
    if not superglue:
        # MDGAT's variant fuses kenc + output MLP (models/mdgat.py:68-69);
        # SuperGlue's is sa1+sa2 only (superglue.py:108-126)
        mlp_p, mlp_s = _convert_mlp(sd, "penc.mlp", [fd * 2, fd * 2, fd],
                                    dtype)
        kch = [4] + list(config.keypoint_encoder) + [fd]
        kenc_p, kenc_s = _convert_mlp(sd, "penc.kenc.encoder", kch, dtype)
        params["mlp"], state["mlp"] = mlp_p, mlp_s
        params["kenc"] = {"mlp": kenc_p}
        state["kenc"] = {"mlp": kenc_s}
    return params, state


def convert_pth_state_dict(sd: Dict[str, Any], config,
                           dtype=np.float64) -> Tuple[Dict, Dict]:
    """Reference MDGAT/SuperGlue ``state_dict`` -> (params, bn_state)."""
    sd = _strip_module(sd)
    fd = config.descriptor_dim
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}

    if config.descriptor in ("FPFH", "FPFH_gloabal"):
        ch = [4] + list(config.keypoint_encoder) + [fd]
        p, s = _convert_mlp(sd, "kenc.encoder", ch, dtype)
        params["kenc"], state["kenc"] = {"mlp": p}, {"mlp": s}
    if config.descriptor in ("FPFH", "FPFH_only"):
        ch = [33] + list(config.descriptor_encoder) + [fd]
        p, s = _convert_mlp(sd, "denc.encoder", ch, dtype)
        params["denc"], state["denc"] = {"mlp": p}, {"mlp": s}
    elif config.descriptor == "FPFH_gloabal":
        ch1 = [33] + list(config.descriptor_encoder) + [fd]
        ch2 = [fd * 2, fd * 2, fd]
        p1, s1 = _convert_mlp(sd, "denc.encoder", ch1, dtype)
        p2, s2 = _convert_mlp(sd, "denc.encoder2", ch2, dtype)
        params["denc"] = {"mlp": p1, "mlp2": p2}
        state["denc"] = {"mlp": s1, "mlp2": s2}
    elif config.descriptor in ("pointnet", "pointnetmsg"):
        params["penc"], state["penc"] = _convert_pointnet_encoder(
            sd, config, dtype)
        if config.net == "superglue":
            # constructed-but-unused companions (superglue.py:345-360);
            # converted so reference checkpoints roundtrip completely
            kch = [4] + list(config.keypoint_encoder) + [fd]
            kp, ks = _convert_mlp(sd, "kenc.encoder", kch, dtype)
            params["kenc"], state["kenc"] = {"mlp": kp}, {"mlp": ks}
            dp, ds = _convert_mlp(sd, "denc.encoder",
                                  [fd * 2, fd * 2, fd], dtype)
            params["denc"], state["denc"] = {"mlp": dp}, {"mlp": ds}

    n_layers = 2 * config.L
    glayers, gstates = [], []
    mlp_ch = [fd * 2, fd * 2, fd]
    for i in range(n_layers):
        pre = f"gnn.layers.{i}"
        attn = {
            "q": _convert_conv(sd, f"{pre}.attn.proj.0", dtype),
            "k": _convert_conv(sd, f"{pre}.attn.proj.1", dtype),
            "v": _convert_conv(sd, f"{pre}.attn.proj.2", dtype),
            "merge": _convert_conv(sd, f"{pre}.attn.merge", dtype),
        }
        mp, ms = _convert_mlp(sd, f"{pre}.mlp", mlp_ch, dtype)
        glayers.append({"attn": attn, "mlp": mp})
        gstates.append({"mlp": ms})
    params["gnn"], state["gnn"] = glayers, gstates

    params["final_proj"] = _convert_conv(sd, "final_proj", dtype)
    params["bin_score"] = jnp.asarray(sd["bin_score"], dtype).reshape(())
    return params, state


# ---------------------------------------------------------------------------
# torch .pth export (the exact inverse of the conversion above)
# ---------------------------------------------------------------------------

def _export_conv(p, prefix: str, out, dtype):
    """Dense kernel [in, out] -> 1x1 ``Conv1d`` weight [out, in, 1]."""
    out[f"{prefix}.weight"] = np.asarray(p["w"], dtype).T[:, :, None]
    out[f"{prefix}.bias"] = np.asarray(p["b"], dtype)


def _export_mlp(params, state, prefix: str, out, dtype):
    """Inverse of ``_convert_mlp``: one reference MLP stack (conv at
    sequential index 3*i, BN at 3*i+1 on every non-last layer)."""
    for i, pos in enumerate(_conv_positions(len(params) + 1)):
        _export_conv(params[i]["lin"], f"{prefix}.{pos}", out, dtype)
        if "bn" in params[i]:
            out[f"{prefix}.{pos + 1}.weight"] = np.asarray(
                params[i]["bn"]["scale"], dtype)
            out[f"{prefix}.{pos + 1}.bias"] = np.asarray(
                params[i]["bn"]["bias"], dtype)
            out[f"{prefix}.{pos + 1}.running_mean"] = np.asarray(
                state[i]["mean"], dtype)
            out[f"{prefix}.{pos + 1}.running_var"] = np.asarray(
                state[i]["var"], dtype)
            # we do not track batch counts (irrelevant with torch's
            # default exponential-momentum BN); 0 keeps strict loads happy
            out[f"{prefix}.{pos + 1}.num_batches_tracked"] = np.asarray(
                0, np.int64)


def _export_conv2d_stack(params, state, conv_prefix: str, bn_prefix: str,
                         out, dtype):
    """Inverse of ``_convert_conv2d_stack``: PointNet++ Conv2d(1x1)+BN2d
    stacks (BN on EVERY layer) — kernels [in, out] -> [out, in, 1, 1]."""
    for j, layer in enumerate(params):
        out[f"{conv_prefix}.{j}.weight"] = np.asarray(
            layer["lin"]["w"], dtype).T[:, :, None, None]
        out[f"{conv_prefix}.{j}.bias"] = np.asarray(layer["lin"]["b"], dtype)
        out[f"{bn_prefix}.{j}.weight"] = np.asarray(
            layer["bn"]["scale"], dtype)
        out[f"{bn_prefix}.{j}.bias"] = np.asarray(layer["bn"]["bias"], dtype)
        out[f"{bn_prefix}.{j}.running_mean"] = np.asarray(
            state[j]["mean"], dtype)
        out[f"{bn_prefix}.{j}.running_var"] = np.asarray(
            state[j]["var"], dtype)
        out[f"{bn_prefix}.{j}.num_batches_tracked"] = np.asarray(0, np.int64)


def _export_pointnet_encoder(params, state, config, out, dtype):
    """Inverse of ``_convert_pointnet_encoder`` (``penc.*`` prefixes)."""
    for i, (p, s) in enumerate(zip(params["sa1"], state["sa1"])):
        _export_conv2d_stack(p, s, f"penc.sa1.conv_blocks.{i}",
                             f"penc.sa1.bn_blocks.{i}", out, dtype)
    _export_conv2d_stack(params["sa2"], state["sa2"], "penc.sa2.mlp_convs",
                         "penc.sa2.mlp_bns", out, dtype)
    if config.net != "superglue":  # MDGAT variant: fused kenc + output MLP
        _export_mlp(params["mlp"], state["mlp"], "penc.mlp", out, dtype)
        _export_mlp(params["kenc"]["mlp"], state["kenc"]["mlp"],
                    "penc.kenc.encoder", out, dtype)


def export_pth_state_dict(params, bn_state, config, dtype=np.float32,
                          module_prefix: bool = True) -> Dict[str, np.ndarray]:
    """Our (params, bn_state) pytrees -> a reference torch ``state_dict``
    (numpy values; the exact inverse of ``convert_pth_state_dict``).

    ``module_prefix=True`` emits the ``module.``-prefixed keys the
    reference's own checkpoints carry: its eval wraps in ``DataParallel``
    unconditionally (``test.py:158-159``) and its train resume wraps
    whenever CUDA is available (``train.py:190-203``) — i.e. everywhere
    its own checkpoints are produced and consumed. For a CPU-only
    reference ``train.py`` resume (bare, unwrapped net) pass
    ``module_prefix=False``. ``num_batches_tracked`` is emitted as 0 (we
    don't track it; torch's default momentum-BN never reads it).
    """
    out: Dict[str, np.ndarray] = {}
    if config.descriptor in ("FPFH", "FPFH_gloabal"):
        _export_mlp(params["kenc"]["mlp"], bn_state["kenc"]["mlp"],
                    "kenc.encoder", out, dtype)
    if config.descriptor in ("FPFH", "FPFH_only"):
        _export_mlp(params["denc"]["mlp"], bn_state["denc"]["mlp"],
                    "denc.encoder", out, dtype)
    elif config.descriptor == "FPFH_gloabal":
        _export_mlp(params["denc"]["mlp"], bn_state["denc"]["mlp"],
                    "denc.encoder", out, dtype)
        _export_mlp(params["denc"]["mlp2"], bn_state["denc"]["mlp2"],
                    "denc.encoder2", out, dtype)
    elif config.descriptor in ("pointnet", "pointnetmsg"):
        _export_pointnet_encoder(params["penc"], bn_state["penc"], config,
                                 out, dtype)
        if config.net == "superglue":
            # constructed-but-unused companions (superglue.py:345-360)
            _export_mlp(params["kenc"]["mlp"], bn_state["kenc"]["mlp"],
                        "kenc.encoder", out, dtype)
            _export_mlp(params["denc"]["mlp"], bn_state["denc"]["mlp"],
                        "denc.encoder", out, dtype)
    elif config.descriptor != "FPFH":
        # no branch read anything — exporting would silently produce a
        # file missing every encoder weight (note the reference's sic
        # spelling "FPFH_gloabal")
        raise ValueError(f"unknown descriptor {config.descriptor!r}")

    for i, (layer, lstate) in enumerate(zip(params["gnn"],
                                            bn_state["gnn"])):
        pre = f"gnn.layers.{i}"
        for j, name in enumerate(("q", "k", "v")):
            _export_conv(layer["attn"][name], f"{pre}.attn.proj.{j}", out,
                         dtype)
        _export_conv(layer["attn"]["merge"], f"{pre}.attn.merge", out, dtype)
        _export_mlp(layer["mlp"], lstate["mlp"], f"{pre}.mlp", out, dtype)

    _export_conv(params["final_proj"], "final_proj", out, dtype)
    out["bin_score"] = np.asarray(params["bin_score"], dtype).reshape(())
    if module_prefix:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def save_pth_checkpoint(path: str, params, bn_state, config,
                        epoch: int = 0, lr: float = 0.0, loss: float = 0.0,
                        dtype=np.float32, module_prefix: bool = True):
    """Write a reference-compatible ``.pth`` training checkpoint — the
    five logical fields the reference saves (``train.py:288-294``), with
    ``net`` from :func:`export_pth_state_dict`. The reference's resume
    reads only ``net``/``lr_schedule``/``loss`` (``train.py:160-163,203``);
    ``optimizer`` is emitted in ``torch.optim.Adam.state_dict()`` shape
    with empty per-parameter state (it never restores moments — it builds
    a fresh Adam at the checkpointed lr). The param_group lists only the
    trainable-parameter indices (BN running stats/counters are buffers,
    not Adam params), matching a genuine Adam state_dict."""
    import torch  # local import: torch is only needed for .pth IO
    sd = export_pth_state_dict(params, bn_state, config, dtype=dtype,
                               module_prefix=module_prefix)
    net = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
           sd.items()}
    n_trainable = sum(1 for k in net if not k.endswith(
        ("running_mean", "running_var", "num_batches_tracked")))
    checkpoint = {
        "net": net,
        "optimizer": {
            "state": {},
            "param_groups": [{
                "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8,
                "weight_decay": 0, "amsgrad": False,
                "params": list(range(n_trainable)),
            }],
        },
        "epoch": epoch,
        "lr_schedule": lr,
        "loss": loss,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(checkpoint, path)


def load_pth_checkpoint(path: str, config, dtype=np.float64):
    """Load a reference ``.pth`` training checkpoint
    (``{net, optimizer, epoch, lr_schedule, loss}``, ``train.py:288-294``)."""
    import torch  # local import: torch is only needed for conversion
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["net"] if "net" in ckpt else ckpt
    params, state = convert_pth_state_dict(sd, config, dtype)
    meta = {
        "epoch": int(ckpt.get("epoch", 0)),
        "lr_schedule": float(ckpt.get("lr_schedule", 0.0)),
        "loss": float(ckpt.get("loss", 0.0)) if not hasattr(
            ckpt.get("loss", 0.0), "item") else float(ckpt["loss"].item()),
    }
    return params, state, meta
