"""Model factory mirroring the reference's net selection
(``train.py:185-188``, ``test.py:152-156``): 'superglue' builds the
baseline; 'mdgat' and 'raw' build MDGAT ('raw' forces k=None, i.e. full
attention, ``train.py:130-132``)."""

from __future__ import annotations

from mdgat_tpu.core.config import Config
from mdgat_tpu.models.mdgat import MDGAT
from mdgat_tpu.models.superglue import SuperGlue


def build_model(config: Config):
    if config.net == "superglue":
        return SuperGlue(config)
    if config.net == "raw":
        return MDGAT(config.replace(k=None))
    return MDGAT(config)
