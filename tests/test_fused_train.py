"""Fused whole-run-on-device training: correctness of control flow
(early stop, best tracking, scheduler) and artifact parity with the
epoch-loop trainer."""

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig, TrainConfig
from mmer_tpu.train.loop import train_model

CFG = ModelConfig(max_seq_len=4, fusion_layers=1, compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny_dataset():
    from conftest import make_tiny_dataset
    return make_tiny_dataset(seed=0, separable=True)


def _run(tiny_dataset, fused, **kw):
    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=6, lr=1e-3, save_checkpoints=False,
                      patience=10 ** 9, **kw)
    return train_model(data, splits, CFG, cfg, batch_size=32,
                       verbose=False, fused=fused)


def test_fused_matches_loop_schema_and_quality(tiny_dataset):
    out_loop = _run(tiny_dataset, fused=False)
    out_fused = _run(tiny_dataset, fused=True)

    assert len(out_fused.results) == len(out_loop.results) == 6
    assert set(out_fused.results[0]) >= set(out_loop.results[0])
    # Same data/model/optimizer: both must learn the separable signal.
    assert out_fused.results[-1]["train_loss"] < out_fused.results[0]["train_loss"]
    assert abs(out_fused.results[-1]["train_loss"]
               - out_loop.results[-1]["train_loss"]) < 0.5
    assert out_fused.best_epoch >= 1
    # best epoch is the val-loss argmin of its own trace
    vals = [r["val_loss"] for r in out_fused.results]
    assert out_fused.best_epoch == int(np.argmin(vals)) + 1


def test_fused_early_stopping(tiny_dataset):
    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=50, lr=0.0, save_checkpoints=False,
                      patience=3, min_delta=1e-4)
    out = train_model(data, splits, CFG, cfg, batch_size=32, verbose=False,
                      fused=True)
    # lr=0 → no improvement ever.  Epoch 1 always counts as improved (prev
    # loss starts at inf, same as the loop/reference semantics), so the run
    # stops after 1 + patience epochs.
    assert len(out.results) == 4


def test_fused_artifacts(tiny_dataset, tmp_path):
    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=2, lr=1e-3, patience=10 ** 9,
                      output_dir=str(tmp_path))
    out = train_model(data, splits, CFG, cfg, batch_size=32, verbose=False,
                      fused=True)
    import json
    blob = json.load(open(out.results_path))
    assert blob["hyperparameters"]["fused_run"] is True
    assert len(blob["training_progress"]) == 2
    assert out.best_model_path and out.confusion is not None
