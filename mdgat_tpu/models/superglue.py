"""SuperGlue baseline (Sarlin et al., CVPR 2020) adapted to 3D keypoints.

Reference: ``models/superglue.py:315-625``. Architecturally it is MDGAT
with full (non-dynamic) attention in every GNN layer; encoders, optimal
transport, match decision and losses are shared.

Divergence note (documented, intentionally not reproduced): the reference's
``--net superglue`` path crashes as shipped — its FPFH branches call
``self.gnn(desc0, desc1, self.k, L)`` (``models/superglue.py:418,434``) but
``AttentionalGNN.forward`` takes 2 args (``models/superglue.py:267``) and
``self.k`` is never assigned; it also reads GT keys ``match0/match1``
(``models/superglue.py:461-462``) that ``load_data.py`` never emits. This
implementation provides the *intended* baseline: 2-arg full-attention GNN
and the standard ``gt_matches0/1`` keys.
"""

from __future__ import annotations

from mdgat_tpu.core.config import Config
from mdgat_tpu.models.mdgat import MDGAT


class SuperGlue(MDGAT):
    def __init__(self, config: Config):
        # full attention everywhere: layer_k_schedule returns all-None for
        # net == 'superglue' (see Config.layer_k_schedule)
        super().__init__(config.replace(net="superglue"))
