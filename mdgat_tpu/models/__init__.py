from mdgat_tpu.models.mdgat import MDGAT
from mdgat_tpu.models.superglue import SuperGlue
from mdgat_tpu.models.factory import build_model
