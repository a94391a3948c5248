"""EvalPipeline scheduling/robustness tests (``mdgat_tpu/eval/runner.py``)."""

import numpy as np
import pytest

from mdgat_tpu.eval.runner import EvalPipeline


def _identity_prepare(batch):
    return batch


def _fake_eval_step(params, bn_state, batch):
    return {"matches0": np.zeros((2, 4), np.int32)}


def _batch(i):
    return {"idx0": [2 * i, 2 * i + 1],
            "gt_matches0": np.full((2, 4), i, np.int32)}


class _FailingDataset:
    """Yields one good batch, then dies mid-dataset (e.g. disk IO)."""

    def batches(self, batch_size, shuffle=False, drop_last=False):
        yield _batch(0)
        raise IOError("keypoint file vanished mid-eval")


class _GoodDataset:
    def batches(self, batch_size, shuffle=False, drop_last=False):
        for i in range(3):
            yield _batch(i)


def _pipeline(dataset):
    return EvalPipeline(dataset, _identity_prepare, _fake_eval_step,
                        params=None, bn_state=None, batch_size=2,
                        fetch=("matches0",), fetch_gt=("gt_matches0",))


def test_producer_error_propagates():
    """A mid-dataset IO error must surface to the caller — not silently
    truncate the dataset into plausible partial metrics (VERDICT r2 #3)."""
    with pytest.raises(IOError, match="vanished"):
        list(_pipeline(_FailingDataset()))


def test_healthy_dataset_yields_all_batches():
    results = list(_pipeline(_GoodDataset()))
    assert len(results) == 3
    for i, (batch, got) in enumerate(results):
        np.testing.assert_array_equal(got["gt_matches0"],
                                      np.full((2, 4), i))
        assert got["matches0"].shape == (2, 4)
