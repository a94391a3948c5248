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
    de0 = torch.tensor(np.asarray(batch["descriptors0"])).transpose(1, 2)
    de1 = torch.tensor(np.asarray(batch["descriptors1"])).transpose(1, 2)
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
    else:
        raise NotImplementedError(cfg.descriptor)

    d0, d1 = t_gnn(sd, cfg, d0, d1, train)
    md0 = F.conv1d(d0, sd["final_proj.weight"], sd["final_proj.bias"])
    md1 = F.conv1d(d1, sd["final_proj.weight"], sd["final_proj.bias"])
    scores = torch.einsum("bdn,bdm->bnm", md0, md1) / fd ** 0.5
    Z = t_log_ot(scores, sd["bin_score"], cfg.sinkhorn_iterations)
    return Z.numpy()
