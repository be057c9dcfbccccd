"""v1 trainer semantics (reference train.py): BatchNorm norm layers,
FocalLoss criterion, per-sample normalization, NEU oversampling."""

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig, TrainConfig
from mmer_tpu.data.pipeline import (normalize_per_sample,
                                    oversample_neutral)
from mmer_tpu.train.loop import train_model


@pytest.fixture(scope="module")
def tiny_dataset():
    from conftest import make_tiny_dataset
    return make_tiny_dataset(seed=2)


def test_v1_batchnorm_focal_trains(tiny_dataset):
    """The v1 configuration (train.py:50-51 BatchNorm, :251 FocalLoss) runs
    through the epoch-loop trainer with mutable batch stats."""
    data, splits = tiny_dataset
    cfg = ModelConfig(max_seq_len=4, fusion_layers=1, norm="batchnorm",
                      compute_dtype="float32")
    out = train_model(
        data, splits, cfg,
        TrainConfig(num_epochs=2, lr=1e-3, loss="focal",
                    save_checkpoints=False, patience=10 ** 9),
        batch_size=32, verbose=False)
    assert len(out.results) == 2
    assert np.isfinite(out.results[-1]["train_loss"])


def test_oversample_neutral_reaches_target():
    rng = np.random.default_rng(0)
    labels = np.concatenate([np.zeros(50, np.int32),
                             rng.integers(1, 6, size=(400,)).astype(np.int32)])
    train_idx = np.arange(len(labels), dtype=np.int32)
    out = oversample_neutral(train_idx, labels, target_count=120, seed=0)
    # NEU count reaches the target (train.py:199-211 semantics).
    assert (labels[out] == 0).sum() == 120
    # non-NEU samples untouched
    assert (labels[out] != 0).sum() == 400


def test_per_sample_normalization():
    rng = np.random.default_rng(1)
    videos = [rng.normal(loc=5.0, size=(4, 16)).astype(np.float32)]
    audios = rng.normal(loc=-2.0, size=(2, 8)).astype(np.float32)
    nv, na, _ = normalize_per_sample(videos, audios)
    # v1 normalizes each sample to ~zero mean / unit std (train.py:176-177)
    np.testing.assert_allclose(nv[0].mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(na.mean(axis=1), 0.0, atol=1e-5)


def test_v1_best_metric_val_acc(tiny_dataset):
    """v1 selects the best model by val ACCURACY (train.py:334-338)."""
    data, splits = tiny_dataset
    cfg = ModelConfig(max_seq_len=4, fusion_layers=1,
                      compute_dtype="float32")
    out = train_model(
        data, splits, cfg,
        TrainConfig(num_epochs=3, lr=1e-3, best_metric="val_acc",
                    save_checkpoints=False, patience=10 ** 9),
        batch_size=32, verbose=False, fused=True)
    accs = [r["val_acc"] for r in out.results]
    assert out.best_epoch == int(np.argmax(accs)) + 1


def test_batchnorm_best_artifact_carries_running_stats(tiny_dataset,
                                                       tmp_path):
    """Batchnorm (v1) models: the best-model artifact must bundle the
    running stats captured AT the best epoch — params alone cannot be
    restored faithfully, and evaluating the best params under the final
    epoch's drifted stats reports a confusion matrix the saved model never
    produces (the reference deepcopies the full state_dict,
    train.py:334-338) (review r3)."""
    from flax import serialization

    data, splits = tiny_dataset
    cfg = ModelConfig(max_seq_len=4, fusion_layers=1, norm="batchnorm",
                      compute_dtype="float32")
    out = train_model(
        data, splits, cfg,
        TrainConfig(num_epochs=3, lr=1e-3, loss="focal",
                    save_checkpoints=True, output_dir=str(tmp_path),
                    patience=10 ** 9),
        batch_size=32, verbose=False)
    best = [p for p in tmp_path.iterdir() if p.name.startswith("best_model")]
    assert len(best) == 1
    tree = serialization.msgpack_restore(best[0].read_bytes())
    assert set(tree) == {"params", "batch_stats"}
    assert tree["batch_stats"]                 # non-empty running stats
    # Layernorm (v2) artifacts stay a bare params tree (serving's schema).
    out2_dir = tmp_path / "ln"
    train_model(
        data, splits,
        ModelConfig(max_seq_len=4, fusion_layers=1,
                    compute_dtype="float32"),
        TrainConfig(num_epochs=2, lr=1e-3, save_checkpoints=True,
                    output_dir=str(out2_dir), patience=10 ** 9),
        batch_size=32, verbose=False)
    best2 = [p for p in out2_dir.iterdir()
             if p.name.startswith("best_model")]
    tree2 = serialization.msgpack_restore(best2[0].read_bytes())
    assert "batch_stats" not in tree2
