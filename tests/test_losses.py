"""Loss numerics vs. torch ground truth (CPU torch is a test-only oracle)."""

import numpy as np
import pytest

from mmer_tpu.ops.losses import focal_loss, weighted_cross_entropy

torch = pytest.importorskip("torch")


def _rand(b=17, c=6, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(b, c)).astype(np.float32)
    labels = rng.integers(0, c, size=(b,)).astype(np.int32)
    weights = rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32)
    return logits, labels, weights


def test_weighted_ce_matches_torch():
    logits, labels, weights = _rand()
    ours = float(weighted_cross_entropy(logits, labels, weights))
    crit = torch.nn.CrossEntropyLoss(weight=torch.tensor(weights))
    ref = float(crit(torch.tensor(logits), torch.tensor(labels, dtype=torch.long)))
    assert abs(ours - ref) < 1e-5


def test_unweighted_ce_matches_torch():
    logits, labels, _ = _rand(seed=1)
    ours = float(weighted_cross_entropy(logits, labels, None))
    ref = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long)))
    assert abs(ours - ref) < 1e-5


def test_focal_matches_reference_formula():
    """Reference FocalLoss (train2.py:40-70): (1-pt)^g * ce, alpha[y] scaling."""
    logits, labels, weights = _rand(seed=2)
    gamma = 2.0
    tl, ty = torch.tensor(logits), torch.tensor(labels, dtype=torch.long)
    ce = torch.nn.functional.cross_entropy(tl, ty, reduction="none")
    pt = torch.exp(-ce)
    ref = ((1 - pt) ** gamma * ce * torch.tensor(weights)[ty]).mean()
    ours = float(focal_loss(logits, labels, gamma=gamma, alpha=weights))
    assert abs(ours - float(ref)) < 1e-5


def test_sample_weight_zero_entries_do_not_contribute():
    logits, labels, weights = _rand(b=8, seed=3)
    sw = np.array([1, 1, 1, 1, 0, 0, 0, 0], dtype=np.float32)
    masked = float(weighted_cross_entropy(logits, labels, weights, sw))
    subset = float(weighted_cross_entropy(logits[:4], labels[:4], weights))
    assert abs(masked - subset) < 1e-6
    masked_f = float(focal_loss(logits, labels, sample_weight=sw))
    subset_f = float(focal_loss(logits[:4], labels[:4]))
    assert abs(masked_f - subset_f) < 1e-6


def test_label_smoothing_matches_torch():
    """weighted_cross_entropy(label_smoothing=ε) must equal
    torch.nn.CrossEntropyLoss(label_smoothing=ε) (unweighted case)."""
    import pytest
    torch = pytest.importorskip("torch")
    import numpy as np
    import jax.numpy as jnp
    from mmer_tpu.ops.losses import weighted_cross_entropy

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 6)).astype(np.float32)
    labels = rng.integers(0, 6, size=(8,))
    for eps in (0.0, 0.05, 0.2):
        want = torch.nn.CrossEntropyLoss(label_smoothing=eps)(
            torch.from_numpy(logits), torch.from_numpy(labels)).item()
        got = float(weighted_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels),
            label_smoothing=eps))
        np.testing.assert_allclose(got, want, rtol=1e-5)
