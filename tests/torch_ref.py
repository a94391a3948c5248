"""Test-only functional torch ground truth.

Builds a reference-compatible ``state_dict`` (same key naming/shapes as the
upstream torch model, so the converter is exercised for real) and runs a
*functional* torch forward with the reference's documented semantics
(SURVEY.md §2.2/§2.3). Used purely as a golden oracle for conversion/parity
tests; the framework itself never imports torch outside checkpoint
conversion.
"""

from collections import OrderedDict

import numpy as np
import torch
import torch.nn.functional as F

torch.set_default_dtype(torch.float64)


# ---------------------------------------------------------------- state dict

def _conv_entry(sd, key, c_in, c_out, rng):
    bound = 1.0 / np.sqrt(c_in)
    sd[f"{key}.weight"] = torch.tensor(
        rng.uniform(-bound, bound, size=(c_out, c_in, 1)))
    sd[f"{key}.bias"] = torch.tensor(
        rng.uniform(-bound, bound, size=(c_out,)))


def _mlp_entries(sd, prefix, channels, rng):
    n = len(channels)
    for i in range(n - 1):
        _conv_entry(sd, f"{prefix}.{3 * i}", channels[i], channels[i + 1], rng)
        if i < n - 2:
            p = 3 * i + 1
            c = channels[i + 1]
            sd[f"{prefix}.{p}.weight"] = torch.tensor(
                rng.uniform(0.5, 1.5, size=(c,)))
            sd[f"{prefix}.{p}.bias"] = torch.tensor(
                rng.uniform(-0.1, 0.1, size=(c,)))
            sd[f"{prefix}.{p}.running_mean"] = torch.tensor(
                rng.normal(scale=0.2, size=(c,)))
            sd[f"{prefix}.{p}.running_var"] = torch.tensor(
                rng.uniform(0.5, 1.5, size=(c,)))
            sd[f"{prefix}.{p}.num_batches_tracked"] = torch.tensor(7)


def _conv2d_entry(sd, key, c_in, c_out, rng):
    bound = 1.0 / np.sqrt(c_in)
    sd[f"{key}.weight"] = torch.tensor(
        rng.uniform(-bound, bound, size=(c_out, c_in, 1, 1)))
    sd[f"{key}.bias"] = torch.tensor(
        rng.uniform(-bound, bound, size=(c_out,)))


def _conv2d_bn_stack_entries(sd, conv_prefix, bn_prefix, channels, rng):
    """PointNet++ Conv2d+BN2d stack: BN on every layer
    (pointnet_util.py:186-191 / 295-300)."""
    for j in range(len(channels) - 1):
        _conv2d_entry(sd, f"{conv_prefix}.{j}", channels[j],
                      channels[j + 1], rng)
        c = channels[j + 1]
        sd[f"{bn_prefix}.{j}.weight"] = torch.tensor(
            rng.uniform(0.5, 1.5, size=(c,)))
        sd[f"{bn_prefix}.{j}.bias"] = torch.tensor(
            rng.uniform(-0.1, 0.1, size=(c,)))
        sd[f"{bn_prefix}.{j}.running_mean"] = torch.tensor(
            rng.normal(scale=0.2, size=(c,)))
        sd[f"{bn_prefix}.{j}.running_var"] = torch.tensor(
            rng.uniform(0.5, 1.5, size=(c,)))
        sd[f"{bn_prefix}.{j}.num_batches_tracked"] = torch.tensor(7)


POINTNET_SSG = {"radii": [2.0], "nsamples": [32], "mlps": [[64, 64, 128]]}
# SuperGlue's SSG variant groups at radius 1 (superglue.py:113)
POINTNET_SG_SSG = {"radii": [1.0], "nsamples": [32], "mlps": [[64, 64, 128]]}
POINTNET_MSG = {"radii": [1.0, 1.5, 2.25], "nsamples": [16, 32, 128],
                "mlps": [[32, 32, 64], [64, 64, 128], [64, 96, 128]]}


def _pointnet_spec(cfg):
    if cfg.descriptor == "pointnetmsg":
        return POINTNET_MSG
    return POINTNET_SG_SSG if cfg.net == "superglue" else POINTNET_SSG


def make_state_dict(cfg, seed=0, module_prefix=True):
    rng = np.random.default_rng(seed)
    sd = OrderedDict()
    fd = cfg.descriptor_dim
    if cfg.descriptor in ("FPFH", "FPFH_gloabal"):
        _mlp_entries(sd, "kenc.encoder",
                     [4] + list(cfg.keypoint_encoder) + [fd], rng)
    if cfg.descriptor in ("FPFH", "FPFH_only"):
        _mlp_entries(sd, "denc.encoder",
                     [33] + list(cfg.descriptor_encoder) + [fd], rng)
    elif cfg.descriptor == "FPFH_gloabal":
        _mlp_entries(sd, "denc.encoder",
                     [33] + list(cfg.descriptor_encoder) + [fd], rng)
        _mlp_entries(sd, "denc.encoder2", [fd * 2, fd * 2, fd], rng)
    elif cfg.descriptor in ("pointnet", "pointnetmsg"):
        spec = _pointnet_spec(cfg)
        for i, mlp in enumerate(spec["mlps"]):
            _conv2d_bn_stack_entries(sd, f"penc.sa1.conv_blocks.{i}",
                                     f"penc.sa1.bn_blocks.{i}",
                                     [5 + 3] + mlp, rng)
        scale_out = sum(m[-1] for m in spec["mlps"])
        _conv2d_bn_stack_entries(sd, "penc.sa2.mlp_convs",
                                 "penc.sa2.mlp_bns",
                                 [scale_out + 3, 256, 256, fd], rng)
        if cfg.net == "superglue":
            # constructed-but-unused companions (superglue.py:345-360)
            _mlp_entries(sd, "kenc.encoder",
                         [4] + list(cfg.keypoint_encoder) + [fd], rng)
            _mlp_entries(sd, "denc.encoder", [fd * 2, fd * 2, fd], rng)
        else:
            _mlp_entries(sd, "penc.mlp", [fd * 2, fd * 2, fd], rng)
            _mlp_entries(sd, "penc.kenc.encoder",
                         [4] + list(cfg.keypoint_encoder) + [fd], rng)
    for i in range(2 * cfg.L):
        for j in range(3):
            _conv_entry(sd, f"gnn.layers.{i}.attn.proj.{j}", fd, fd, rng)
        _conv_entry(sd, f"gnn.layers.{i}.attn.merge", fd, fd, rng)
        _mlp_entries(sd, f"gnn.layers.{i}.mlp", [fd * 2, fd * 2, fd], rng)
    _conv_entry(sd, "final_proj", fd, fd, rng)
    sd["bin_score"] = torch.tensor(1.0)
    if module_prefix:
        sd = OrderedDict((f"module.{k}", v) for k, v in sd.items())
    return sd


# ---------------------------------------------------------------- forward

def t_mlp(sd, prefix, channels, x, train):
    """x: [B, C, N]; conv1x1 + BN + ReLU stack."""
    n = len(channels)
    for i in range(n - 1):
        x = F.conv1d(x, sd[f"{prefix}.{3 * i}.weight"],
                     sd[f"{prefix}.{3 * i}.bias"])
        if i < n - 2:
            p = 3 * i + 1
            x = F.batch_norm(x, sd[f"{prefix}.{p}.running_mean"].clone(),
                             sd[f"{prefix}.{p}.running_var"].clone(),
                             sd[f"{prefix}.{p}.weight"],
                             sd[f"{prefix}.{p}.bias"],
                             training=train, momentum=0.1, eps=1e-5)
            x = F.relu(x)
    return x


def t_conv2d_bn_stack(sd, conv_prefix, bn_prefix, x, n_layers, train):
    """x: [B, C, K, S]; conv2d(1x1) + BN2d + ReLU on every layer
    (pointnet_util.py:215-217)."""
    for j in range(n_layers):
        x = F.conv2d(x, sd[f"{conv_prefix}.{j}.weight"],
                     sd[f"{conv_prefix}.{j}.bias"])
        x = F.batch_norm(x, sd[f"{bn_prefix}.{j}.running_mean"].clone(),
                         sd[f"{bn_prefix}.{j}.running_var"].clone(),
                         sd[f"{bn_prefix}.{j}.weight"],
                         sd[f"{bn_prefix}.{j}.bias"],
                         training=train, momentum=0.1, eps=1e-5)
        x = F.relu(x)
    return x


def t_query_ball(radius, nsample, xyz, new_xyz):
    """query_ball_point (pointnet_util.py:101-121): ascending-index sort of
    in-radius points, first-index backfill, N sentinel for empty balls."""
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    dist = (-2 * torch.matmul(new_xyz, xyz.permute(0, 2, 1))
            + torch.sum(new_xyz ** 2, -1).view(B, S, 1)
            + torch.sum(xyz ** 2, -1).view(B, 1, N))
    group_idx = torch.arange(N, dtype=torch.long).view(1, 1, N).repeat(B, S, 1)
    group_idx[dist > radius ** 2] = N
    group_idx = group_idx.sort(dim=-1)[0][:, :, :nsample]
    group_first = group_idx[:, :, 0].view(B, S, 1).repeat(1, 1, nsample)
    mask = group_idx == N
    group_idx[mask] = group_first[mask]
    return group_idx


def t_index_points_zero(points, idx):
    """index_points with the appended zero sentinel row
    (pointnet_util.py:43-74): idx == N gathers zeros."""
    B, N, D = points.shape
    pts = torch.cat([points, torch.zeros(B, 1, D, dtype=points.dtype)], 1)
    batch = torch.arange(B, dtype=torch.long).view(B, 1, 1)
    return pts[batch, idx, :]


def t_pointnet_desc(sd, cfg, cloud, kpts, scores, train):
    """PointnetEncoder[Msg].forward (models/mdgat.py:71-97/125-141):
    KptsMsg grouping -> per-scale conv stacks + K-max-pool -> group_all SA
    (pointwise, pool commented out upstream) -> concat with kenc -> MLP.
    cloud [B, Np, 8]; kpts [B, S, 3]; scores [B, S]. Returns [B, D, S]."""
    spec = _pointnet_spec(cfg)
    fd = cfg.descriptor_dim
    xyz, norm = cloud[..., :3], cloud[..., 3:8]
    B, S, _ = kpts.shape
    outs = []
    for i, radius in enumerate(spec["radii"]):
        idx = t_query_ball(radius, spec["nsamples"][i], xyz, kpts)
        gx = t_index_points_zero(xyz, idx) - kpts.view(B, S, 1, 3)
        gf = t_index_points_zero(norm, idx)
        grouped = torch.cat([gf, gx], dim=-1)        # [feat, rel_xyz] quirk
        grouped = grouped.permute(0, 3, 2, 1)        # [B, C, K, S]
        h = t_conv2d_bn_stack(sd, f"penc.sa1.conv_blocks.{i}",
                              f"penc.sa1.bn_blocks.{i}", grouped,
                              len(spec["mlps"][i]), train)
        outs.append(h.max(2)[0])                     # [B, D', S]
    l1 = torch.cat(outs, dim=1)
    # sa2 (group_all): concat [xyz, feats] channelwise, pointwise conv stack
    x = torch.cat([kpts.permute(0, 2, 1), l1], dim=1).unsqueeze(2)
    x = t_conv2d_bn_stack(sd, "penc.sa2.mlp_convs", "penc.sa2.mlp_bns",
                          x, 3, train)
    desc = x.view(B, fd, S)
    if cfg.net == "superglue":
        # SuperGlue's encoder returns sa2's output raw (superglue.py:126-153)
        return desc
    kch = [4] + list(cfg.keypoint_encoder) + [fd]
    kin = torch.cat([kpts.permute(0, 2, 1), scores.unsqueeze(1)], 1)
    kemb = t_mlp(sd, "penc.kenc.encoder", kch, kin, train)
    return t_mlp(sd, "penc.mlp", [fd * 2, fd * 2, fd],
                 torch.cat([kemb, desc], dim=1), train)


def t_dense_attn(q, k, v):
    d = q.shape[1]
    s = torch.einsum("bdhn,bdhm->bhnm", q, k) / d ** 0.5
    p = F.softmax(s, dim=-1)
    return torch.einsum("bhnm,bdhm->bdhn", p, v)


def t_topk_attn(q, k, v, kk):
    d = q.shape[1]
    s = torch.einsum("bdhn,bdhm->bhnm", q, k) / d ** 0.5
    vals, idx = s.topk(kk, dim=3)
    sm = F.softmax(vals, dim=-1)
    p = torch.zeros_like(s)
    p.scatter_(3, idx, sm)
    return torch.einsum("bhnm,bdhm->bdhn", p, v)


def t_mha(sd, prefix, x, source, kk, heads=4):
    b, c, n = x.shape
    d = c // heads
    proj = []
    for j, inp in enumerate((x, source, source)):
        w = sd[f"{prefix}.proj.{j}.weight"]
        bb = sd[f"{prefix}.proj.{j}.bias"]
        proj.append(F.conv1d(inp, w, bb).view(b, d, heads, -1))
    q, k, v = proj
    o = t_dense_attn(q, k, v) if kk is None else t_topk_attn(q, k, v, kk)
    o = o.contiguous().view(b, d * heads, -1)
    return F.conv1d(o, sd[f"{prefix}.merge.weight"],
                    sd[f"{prefix}.merge.bias"])


def t_gnn(sd, cfg, d0, d1, train):
    names = ["self", "cross"] * cfg.L
    n_layers = 2 * cfg.L
    klist = list(cfg.k) if cfg.k is not None else None
    for i, name in enumerate(names):
        pre = f"gnn.layers.{i}"
        s0, s1 = (d1, d0) if name == "cross" else (d0, d1)
        kk = None
        if klist is not None and i > n_layers - 1 - len(klist):
            kk = klist[i - n_layers + len(klist)]
        m0 = t_mha(sd, f"{pre}.attn", d0, s0, kk)
        m1 = t_mha(sd, f"{pre}.attn", d1, s1, kk)
        ch = [cfg.descriptor_dim * 2] * 2 + [cfg.descriptor_dim]
        delta0 = t_mlp(sd, f"{pre}.mlp", ch, torch.cat([d0, m0], 1), train)
        delta1 = t_mlp(sd, f"{pre}.mlp", ch, torch.cat([d1, m1], 1), train)
        d0, d1 = d0 + delta0, d1 + delta1
    return d0, d1


def t_log_ot(scores, alpha, iters):
    b, m, n = scores.shape
    a = alpha.expand(b, 1, 1)
    top = torch.cat([scores, alpha.expand(b, m, 1)], 2)
    bot = torch.cat([alpha.expand(b, 1, n), a], 2)
    Z = torch.cat([top, bot], 1)
    norm = -torch.tensor(float(m + n)).log()
    log_mu = torch.cat([norm.expand(m), torch.tensor(float(n)).log()[None]
                        + norm]).expand(b, -1)
    log_nu = torch.cat([norm.expand(n), torch.tensor(float(m)).log()[None]
                        + norm]).expand(b, -1)
    u, v = torch.zeros_like(log_mu), torch.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - torch.logsumexp(Z + v.unsqueeze(1), dim=2)
        v = log_nu - torch.logsumexp(Z + u.unsqueeze(2), dim=1)
    return Z + u.unsqueeze(2) + v.unsqueeze(1) - norm


def t_forward_scores(sd, cfg, batch, train=False):
    """Full forward to the post-OT score matrix [B, N+1, M+1] (numpy)."""
    sd = OrderedDict((k[len("module."):] if k.startswith("module.") else k, v)
                     for k, v in sd.items())
    kp0 = torch.tensor(np.asarray(batch["keypoints0"]))
    kp1 = torch.tensor(np.asarray(batch["keypoints1"]))
    sc0 = torch.tensor(np.asarray(batch["scores0"]))
    sc1 = torch.tensor(np.asarray(batch["scores1"]))
    de0 = (torch.tensor(np.asarray(batch["descriptors0"])).transpose(1, 2)
           if "descriptors0" in batch else None)
    de1 = (torch.tensor(np.asarray(batch["descriptors1"])).transpose(1, 2)
           if "descriptors1" in batch else None)
    fd = cfg.descriptor_dim

    kch = [4] + list(cfg.keypoint_encoder) + [fd]
    dch = [33] + list(cfg.descriptor_encoder) + [fd]
    kin0 = torch.cat([kp0.transpose(1, 2), sc0.unsqueeze(1)], 1)
    kin1 = torch.cat([kp1.transpose(1, 2), sc1.unsqueeze(1)], 1)
    if cfg.descriptor == "FPFH":
        d0 = t_mlp(sd, "denc.encoder", dch, de0, train) \
            + t_mlp(sd, "kenc.encoder", kch, kin0, train)
        d1 = t_mlp(sd, "denc.encoder", dch, de1, train) \
            + t_mlp(sd, "kenc.encoder", kch, kin1, train)
    elif cfg.descriptor == "FPFH_only":
        d0 = t_mlp(sd, "denc.encoder", dch, de0, train)
        d1 = t_mlp(sd, "denc.encoder", dch, de1, train)
    elif cfg.descriptor in ("pointnet", "pointnetmsg"):
        pc0 = torch.tensor(np.asarray(batch["cloud0"]))
        pc1 = torch.tensor(np.asarray(batch["cloud1"]))
        d0 = t_pointnet_desc(sd, cfg, pc0, kp0, sc0, train)
        d1 = t_pointnet_desc(sd, cfg, pc1, kp1, sc1, train)
    else:
        raise NotImplementedError(cfg.descriptor)

    d0, d1 = t_gnn(sd, cfg, d0, d1, train)
    md0 = F.conv1d(d0, sd["final_proj.weight"], sd["final_proj.bias"])
    md1 = F.conv1d(d1, sd["final_proj.weight"], sd["final_proj.bias"])
    scores = torch.einsum("bdn,bdm->bnm", md0, md1) / fd ** 0.5
    Z = t_log_ot(scores, sd["bin_score"], cfg.sinkhorn_iterations)
    return Z.numpy()
