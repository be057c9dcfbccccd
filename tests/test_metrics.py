"""Metric parity vs. sklearn (the reference's metric source, train2.py:636-677)."""

import numpy as np
import pytest

from mmer_tpu.train.metrics import (accuracy_from_confusion, confusion_matrix,
                                    prf_from_confusion)

sklearn_metrics = pytest.importorskip("sklearn.metrics")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_confusion_and_prf_match_sklearn(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 6, size=500)
    p = rng.integers(0, 6, size=500)
    cm = np.asarray(confusion_matrix(y, p, 6))
    ref_cm = sklearn_metrics.confusion_matrix(y, p, labels=range(6))
    np.testing.assert_array_equal(cm.astype(int), ref_cm)

    ours = prf_from_confusion(cm)
    for avg in ("macro", "micro"):
        pr, rc, f1, _ = sklearn_metrics.precision_recall_fscore_support(
            y, p, average=avg, zero_division=0)
        assert abs(ours[f"{avg}_precision"] - pr) < 1e-6
        assert abs(ours[f"{avg}_recall"] - rc) < 1e-6
        assert abs(ours[f"{avg}_f1"] - f1) < 1e-6

    acc = accuracy_from_confusion(cm)
    assert abs(acc - (y == p).mean()) < 1e-6


def test_prf_zero_division():
    # class 5 never predicted and never true → precision/recall 0, not NaN
    y = np.array([0, 0, 1, 1])
    p = np.array([0, 1, 1, 0])
    cm = np.asarray(confusion_matrix(y, p, 6))
    out = prf_from_confusion(cm)
    assert np.isfinite(list(out.values())).all()


def test_sample_weight_excludes_padding():
    y = np.array([0, 1, 2, 3])
    p = np.array([0, 1, 0, 0])
    sw = np.array([1.0, 1.0, 0.0, 0.0])
    cm = np.asarray(confusion_matrix(y, p, 6, sample_weight=sw))
    assert cm.sum() == 2
    assert cm[0, 0] == 1 and cm[1, 1] == 1
