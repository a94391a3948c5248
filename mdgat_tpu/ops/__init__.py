from mdgat_tpu.ops.mlp import (
    mlp_init, mlp_apply, mlp_state_init, conv1x1_init, conv1x1_apply,
)
from mdgat_tpu.ops.attention import (
    full_attention, topk_attention, multi_head_attention,
)
from mdgat_tpu.ops.transport import (
    log_sinkhorn, log_optimal_transport, assemble_full_scores,
)
from mdgat_tpu.ops.matching import match_decision
from mdgat_tpu.ops.losses import gap_loss, triplet_loss, superglue_nll_loss
from mdgat_tpu.ops.geometry import (
    pairwise_dist2, gt_correspondences, kabsch, registration_errors,
    transform_points,
)
