"""Real-data / pre-trained-checkpoint parity (VERDICT r2 #9).

The reference's pre-trained checkpoint (``pre-trained/best_model.pth``)
and USIP/FPFH keypoint features are absent from the read-only mount
(``/root/reference/.MISSING_LARGE_BLOBS``), so true KITTI-seq-10 parity
cannot run today. These tests keep that path warm: they skip cleanly
while the assets are missing and activate the moment both appear at the
reference's own default locations (``test.py:60-68`` upstream).

What runs once the assets exist:
1. converter smoke + full ``test.py`` metric protocol on seq-10 pairs
   (eval config of BASELINE.md: max_keypoints 256, variable-N, f64);
2. match-matrix parity of the converted JAX model against the
   functional torch oracle (``tests/torch_ref.py``) on a REAL batch —
   the tolerance-parity check BASELINE.md names as the north star.
"""

import os

import numpy as np
import pytest

REF = "/root/reference"
CKPT = os.path.join(REF, "pre-trained", "best_model.pth")
KP_DIR = os.path.join(
    REF, "KITTI", "keypoints", "tsf_256_FPFH_16384-512-k1k16-2d-nonoise")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CKPT) and os.path.isdir(KP_DIR)),
    reason="reference pre-trained checkpoint / keypoint features absent "
           "(.MISSING_LARGE_BLOBS) — test activates when they appear")


def _cfg():
    from mdgat_tpu.core.config import test_defaults
    return test_defaults(
        train_path=os.path.join(REF, "KITTI"),
        keypoints_path=KP_DIR,
        txt_path=os.path.join(REF, "KITTI", "preprocess-random-full"),
        resume_model=CKPT,
        compute_dtype="float64", param_dtype="float64",
        use_pallas=False)  # CPU parity path


@pytest.fixture(scope="module")
def converted():
    from mdgat_tpu.core.checkpoint import load_pth_checkpoint
    cfg = _cfg()
    params, bn_state, meta = load_pth_checkpoint(CKPT, cfg)
    return cfg, params, bn_state, meta


def test_seq10_eval_protocol(converted):
    """test.py protocol on the first seq-10 pairs: the pre-trained model
    must be far above chance (precision bar conservative — the paper's
    own numbers are not vendored in the repo, BASELINE.md)."""
    from mdgat_tpu.data import SparseDataset, model_inputs, prepare_batch_fn
    from mdgat_tpu.eval import TestEvalAccumulator
    from mdgat_tpu.models import build_model
    from mdgat_tpu.train import make_eval_step

    cfg, params, bn_state, _ = converted
    model = build_model(cfg)
    ds = SparseDataset(cfg, "test")
    prepare = prepare_batch_fn(cfg.threshold, cfg.mutual_check,
                               "float64", "float64")
    eval_step = make_eval_step(model)
    acc = TestEvalAccumulator()
    n = 0
    for batch in ds.batches(4, shuffle=False, drop_last=False):
        prepared = prepare(batch)
        out = eval_step(params, bn_state, model_inputs(prepared))
        for b in range(len(batch["idx0"])):
            mask = np.asarray(batch["mask0"][b])
            acc.update_pair(
                np.asarray(out["matches0"][b])[mask],
                np.asarray(prepared["gt_matches0"][b])[mask],
                np.asarray(batch["keypoints0"][b])[mask],
                np.asarray(batch["keypoints1"][b])[np.asarray(
                    batch["mask1"][b])],
                batch["T_gt"][b], calculate_pose=True)
            n += 1
        if n >= 8:
            break
    s = acc.summary()
    assert s["precision"] > 0.5, s
    assert s["repeatability"] > 0.1, s


def test_match_matrix_parity_vs_torch_oracle(converted):
    """Converted params through the JAX model vs the torch oracle on one
    REAL batch: OT score matrices to tight tolerance, matches >=99%."""
    import torch
    import torch_ref
    from mdgat_tpu.data import SparseDataset, model_inputs, prepare_batch_fn
    from mdgat_tpu.models import build_model

    cfg, params, bn_state, _ = converted
    sd = torch.load(CKPT, map_location="cpu", weights_only=False)["net"]
    model = build_model(cfg)
    ds = SparseDataset(cfg, "test")
    prepare = prepare_batch_fn(cfg.threshold, cfg.mutual_check,
                               "float64", "float64")
    prepared = prepare(next(ds.batches(2, shuffle=False)))
    batch = model_inputs(prepared)

    out, _ = model.apply(params, bn_state, batch, train=False,
                         return_full_scores=True)
    ref = torch_ref.t_forward_scores(sd, cfg, batch, train=False)
    np.testing.assert_allclose(np.asarray(out["scores"]), ref,
                               rtol=1e-6, atol=1e-7)
