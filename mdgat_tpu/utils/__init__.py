from mdgat_tpu.utils.logging import ScalarLogger
from mdgat_tpu.utils.profiling import PhaseTimer, trace_annotation
