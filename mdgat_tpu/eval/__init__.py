from mdgat_tpu.eval.metrics import (
    AverageMeter, TestEvalAccumulator, matching_metrics, pose_metrics,
    registration_summary,
)
