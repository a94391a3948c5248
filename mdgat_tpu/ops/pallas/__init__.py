from mdgat_tpu.ops.pallas.sinkhorn import (
    OTDecisionAux,
    pallas_log_optimal_transport,
    pallas_log_optimal_transport_trainable,
)
from mdgat_tpu.ops.pallas.attention import pallas_topk_attention
