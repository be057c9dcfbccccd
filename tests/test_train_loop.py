"""Training-loop tests on synthetic features: loss goes down, artifacts are
written with the reference schema, scheduler/early-stop semantics hold."""

import json
import os

import numpy as np
import pytest

from mmer_tpu.config import DataConfig, MeshConfig, ModelConfig, TrainConfig
from mmer_tpu.data.pipeline import load_dataset
from mmer_tpu.train.loop import (PlateauScheduler, train_model)


@pytest.fixture(scope="module")
def tiny_dataset(synthetic_feature_dirs):
    vdir, adir = synthetic_feature_dirs
    cfg = DataConfig(video_feat_dir=vdir, audio_feat_dir=adir, batch_size=16)
    return load_dataset(cfg)


def small_model_cfg(data):
    return ModelConfig(max_seq_len=data.max_chunks + 1, fused_dim=64,
                       fusion_layers=1, fusion_heads=4, fusion_ffn_dim=128,
                       classifier_hidden_dim=32, compute_dtype="float32")


def test_training_reduces_loss_and_writes_artifacts(tiny_dataset, tmp_path):
    data, splits = tiny_dataset
    model_cfg = small_model_cfg(data)
    train_cfg = TrainConfig(num_epochs=8, lr=1e-3, patience=100,
                            output_dir=str(tmp_path / "runs"))
    out = train_model(data, splits, model_cfg, train_cfg, batch_size=16,
                      mesh_cfg=MeshConfig(data_parallel=1), verbose=False)

    losses = [r["train_loss"] for r in out.results]
    assert losses[-1] < losses[0]
    assert out.best_params is not None

    with open(out.results_path) as f:
        blob = json.load(f)
    # Reference results schema (train2.py:748-764)
    assert "training_progress" in blob and "best_model" in blob \
        and "hyperparameters" in blob
    row = blob["training_progress"][0]
    for key in ("epoch", "train_loss", "val_loss", "val_acc",
                "val_macro_f1", "test_acc", "test_macro_f1"):
        assert key in row
    assert blob["best_model"]["epoch"] == out.best_epoch
    assert os.path.exists(out.best_model_path)
    assert os.path.exists(out.final_model_path)
    assert out.confusion.shape == (6, 6)
    # confusion matrix counts the whole test split
    assert out.confusion.sum() == len(splits.test)


def test_early_stopping_on_plateau(tiny_dataset, tmp_path):
    data, splits = tiny_dataset
    model_cfg = small_model_cfg(data)
    # lr=0 → no improvement ever → must stop after `patience` epochs
    train_cfg = TrainConfig(num_epochs=50, lr=0.0, patience=3,
                            save_checkpoints=False,
                            eval_test_every_epoch=False)
    out = train_model(data, splits, model_cfg, train_cfg, batch_size=16,
                      mesh_cfg=MeshConfig(data_parallel=1), verbose=False)
    assert len(out.results) <= 5


def test_focal_loss_variant_runs(tiny_dataset):
    data, splits = tiny_dataset
    model_cfg = small_model_cfg(data)
    train_cfg = TrainConfig(num_epochs=2, lr=1e-3, loss="focal",
                            save_checkpoints=False,
                            eval_test_every_epoch=False)
    out = train_model(data, splits, model_cfg, train_cfg, batch_size=16,
                      mesh_cfg=MeshConfig(data_parallel=1), verbose=False)
    assert np.isfinite(out.results[-1]["train_loss"])


def test_plateau_scheduler_torch_semantics():
    s = PlateauScheduler(factor=0.5, patience=2, threshold=1e-4)
    lr = 1.0
    lr = s.step(1.0, lr)   # first value becomes best
    assert lr == 1.0
    lr = s.step(1.0, lr)   # bad 1
    lr = s.step(1.0, lr)   # bad 2
    assert lr == 1.0       # num_bad == patience, not yet > patience
    lr = s.step(1.0, lr)   # bad 3 → reduce
    assert lr == 0.5
    lr = s.step(0.5, lr)   # big improvement resets
    assert lr == 0.5
    lr = s.step(0.49, lr)
    assert lr == 0.5
