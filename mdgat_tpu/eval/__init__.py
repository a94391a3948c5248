from mdgat_tpu.eval.metrics import (
    AverageMeter, matching_metrics, pose_metrics, registration_summary,
)
