"""Configuration for the mdgat_tpu framework.

One dataclass covers every flag of the reference entry points, which
duplicated argparse blocks with divergent defaults per script
(reference ``train.py:16-123`` vs ``test.py:18-126``). ``train_defaults()``
and ``test_defaults()`` reproduce those exact per-entry-point presets.

TPU-specific knobs (``compute_dtype``, mesh shape, padding buckets) have no
reference equivalent; the reference ran float64 on up to 4 GPUs via
``torch.nn.DataParallel`` (``train.py:190-196``).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple


# The reference's k-schedule default (train.py:61, test.py:83): None entries
# mean full attention for that layer.
DEFAULT_K: Tuple[Optional[int], ...] = (128, None, 128, None, 64, None, 64, None)


@dataclasses.dataclass
class Config:
    # --- model architecture (reference models/mdgat.py:316-323) ---
    descriptor_dim: int = 128
    keypoint_encoder: Tuple[int, ...] = (32, 64, 128)
    descriptor_encoder: Tuple[int, ...] = (64, 128)  # 'descritor_encoder' (sic) upstream
    num_heads: int = 4
    L: int = 9                      # GNN has 2*L alternating self/cross layers
    k: Optional[Tuple[Optional[int], ...]] = DEFAULT_K
    net: str = "mdgat"              # mdgat | superglue | raw
    descriptor: str = "FPFH"        # FPFH | FPFH_gloabal | FPFH_only | pointnet | pointnetmsg
    sinkhorn_iterations: int = 20   # CLI default (train.py:21); model default was 100
    match_threshold: float = 0.2
    loss_method: str = "gap_loss"   # superglue | triplet_loss | gap_loss
    triplet_loss_gamma: float = 0.5
    mutual_check: bool = False
    train_step: int = 3             # staged training for pointnet descriptors

    # --- data pipeline (reference load_data.py) ---
    dataset: str = "kitti"
    keypoints: str = "USIP"
    max_keypoints: int = 512
    ensure_kpts_num: bool = True
    threshold: float = 0.5          # GT correspondence distance threshold (m)
    memory_is_enough: bool = True
    train_path: str = "./KITTI/"
    keypoints_path: str = "./KITTI/keypoints/tsf_256_FPFH_16384-512-k1k16-2d-nonoise"
    txt_path: str = "./KITTI/preprocess-random-full"
    score_min: float = 10.0         # USIP score filter (load_data.py:183)

    # --- training (reference train.py) ---
    learning_rate: float = 1e-4
    epoch: int = 1000
    batch_size: int = 64
    resume: bool = False
    resume_model: str = "./your_model.pth"
    model_out_path: str = "./checkpoint"

    # --- TPU-native execution (new; no reference equivalent) ---
    compute_dtype: str = "float32"  # float32 | bfloat16 | float64
    param_dtype: str = "float32"
    data_parallel: int = 1          # mesh size along the batch axis
    seq_parallel: int = 1           # mesh size along the keypoint axis (stretch)
    use_pallas: bool = True         # fused Sinkhorn kernel (eval path)
    pallas_attention: bool = True   # fused attention kernel: per-head MXU
                                    # matmuls + stacked-head bisection top-k
                                    # (avoids XLA's sort-based TopK)
    pallas_interpret: bool = False  # run the Pallas paths on CPU via the
                                    # interpreter (slow; integration tests)
    pallas_exact_topk: bool = False  # integer-key search: bit-exact top-k
                                     # selection (~1.6x slower eval fwd)
    pallas_train_layer: bool = True  # train: whole-layer fused kernel pair
                                     # (fused MHA + MLP + batch-stat BN +
                                     # residual, custom VJP)
    pallas_loss: bool = False        # fused gap-loss kernel (custom VJP).
                                     # Measured NEUTRAL-to-slightly-slower
                                     # end-to-end on v5e (XLA already fuses
                                     # the loss well) — off by default,
                                     # kept as gated infrastructure
    shard_map: Optional[bool] = None  # explicit shard_map execution over
                                      # the data axis (parallel/smap.py):
                                      # per-shard Pallas kernels + pmean
                                      # grads + psum'd BN stats. None=auto:
                                      # on when data>1, seq==1 and the
                                      # Pallas kernels are enabled (plain
                                      # jit has no pallas_call partitioning
                                      # rule — operands get all-gathered)
    coordinator_address: str = ""   # multi-host: jax.distributed coordinator
                                    # ("host:port"; empty = single-process
                                    # unless JAX_COORDINATOR_ADDRESS is set)
    num_processes: int = 0          # multi-host: process count (with
                                    # coordinator_address)
    process_id: int = -1            # multi-host: this process's id
    donate_state: bool = True
    prefetch: int = 2               # train-loop batch prefetch depth (a
                                    # producer thread runs the host batch
                                    # assembly; the DataLoader(num_workers)
                                    # equivalent). 0 = serial
    remat_gnn: bool = True          # checkpoint GNN layers in training
    scan_gnn_pairs: bool = True     # lax.scan over equal-signature layer
                                    # pairs (fast compiles); False unrolls
    seed: int = 0

    # ------------------------------------------------------------------
    @property
    def gnn_layer_names(self) -> List[str]:
        # both nets alternate self/cross for 2L layers
        # (models/mdgat.py:335, models/superglue.py:232)
        return ["self", "cross"] * self.L

    def layer_k_schedule(self, num_keypoints: int) -> List[Optional[int]]:
        """Per-layer top-k values (None = full attention).

        Mirrors the gating in the reference GNN forward
        (``models/mdgat.py:268-272``): layer i is dynamic iff
        ``i > 2L - 1 - len(k)`` with ``k = k_list[i - 2L + len(k_list)]``.
        ``net='raw'`` (or k=None) disables dynamic attention everywhere
        (``train.py:130-132``).
        """
        n_layers = 2 * self.L
        if self.k is None or self.net in ("raw", "superglue"):
            return [None] * n_layers
        ks: List[Optional[int]] = []
        klist = list(self.k)
        for i in range(n_layers):
            if i > n_layers - 1 - len(klist):
                kk = klist[i - n_layers + len(klist)]
                if kk is not None and kk >= num_keypoints:
                    kk = None  # top-k over >= all points is full attention
                ks.append(kk)
            else:
                ks.append(None)
        return ks

    def resolve_shard_map(self, n_data: int) -> bool:
        """Whether to run the explicit shard_map path over an ``n_data``-way
        data axis (and the ``seq_parallel``-way keypoint axis). Explicit
        True/False wins; auto (None) turns it on when the Pallas kernels
        are enabled on a multi-device mesh — the configuration where
        sharding propagation would all-gather every kernel operand
        (parallel/smap.py; seq-sharded kernels run context-parallel with
        per-layer K/V gathers there)."""
        multi = n_data > 1 or self.seq_parallel > 1
        if self.shard_map is not None:
            return self.shard_map and multi
        # pallas_train_layer is deliberately NOT part of the gate: it only
        # takes effect when pallas_attention is on (models/mdgat.py routes
        # the gnn's use_pallas from pallas_attention), so alone it runs no
        # kernel; pallas_loss runs its kernel independently.
        return multi and (self.use_pallas or self.pallas_attention
                          or self.pallas_loss)

    def model_name(self) -> str:
        """Run-name scheme of the reference (``train.py:130-136``)."""
        kstr = _k_repr(self.k)
        base = "{}-k{}-batch{}-{}-{}-{}".format(
            self.net, kstr, self.batch_size, self.loss_method,
            self.descriptor, self.keypoints)
        if not self.mutual_check:
            base = "nomutualcheck-" + base
        return base

    def run_dir(self, root: str) -> str:
        """Log/checkpoint directory scheme (``train.py:138-151``)."""
        kstr = _k_repr(self.k)
        path = "{}/{}/{}{}-k{}-{}-{}".format(
            root, self.dataset, self.net, self.L, kstr,
            self.loss_method, self.descriptor)
        if self.descriptor in ("pointnet", "pointnetmsg"):
            path = "{}/train_step{}".format(path, self.train_step)
        return "{}/{}".format(path, self.model_name())

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _k_repr(k) -> str:
    if k is None:
        return "None"
    return "[{}]".format(", ".join(str(x) for x in k))


def train_defaults(**overrides) -> Config:
    """Preset matching ``train.py`` argparse defaults (``train.py:16-123``)."""
    return Config().replace(**overrides)


def test_defaults(**overrides) -> Config:
    """Preset matching ``test.py`` argparse defaults (``test.py:18-126``).

    Divergences from the train preset, as in the reference: batch_size=1,
    max_keypoints=256, ensure_kpts_num=False, loss_method='triplet_loss',
    memory_is_enough=False.
    """
    cfg = Config().replace(
        batch_size=1,
        max_keypoints=256,
        ensure_kpts_num=False,
        loss_method="triplet_loss",
        memory_is_enough=False,
    )
    return cfg.replace(**overrides)
