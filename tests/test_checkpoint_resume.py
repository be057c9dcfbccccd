"""Checkpoint/resume: periodic full-state saves and mid-run restore — the
failure-recovery capability the reference lacks (SURVEY.md §5:
save-only, no optimizer state, no resume)."""

import os

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig, TrainConfig
from mmer_tpu.train import checkpoint as ckpt
from mmer_tpu.train.loop import train_model

CFG = ModelConfig(max_seq_len=4, fusion_layers=1, compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny_dataset():
    from conftest import make_tiny_dataset
    return make_tiny_dataset(seed=1)


def test_periodic_checkpoints_and_resume(tiny_dataset, tmp_path):
    data, splits = tiny_dataset
    out_dir = str(tmp_path / "run")
    cfg = TrainConfig(num_epochs=2, lr=1e-3, patience=10 ** 9,
                      output_dir=out_dir, checkpoint_every=1)
    out_a = train_model(data, splits, CFG, cfg, batch_size=32,
                        verbose=False)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    latest = ckpt.latest_checkpoint(ckpt_dir)
    assert latest is not None and "state_000002" in latest

    # Resume: continues from epoch 2 → only 1 more epoch runs.
    cfg2 = TrainConfig(num_epochs=3, lr=1e-3, patience=10 ** 9,
                       output_dir=str(tmp_path / "run2"))
    out_b = train_model(data, splits, CFG, cfg2, batch_size=32,
                        verbose=False, resume_dir=ckpt_dir)
    assert len(out_b.results) == 1
    assert out_b.results[0]["epoch"] == 3

    # The resumed first epoch continues training (loss near the end of run
    # A, not back at the start).
    assert out_b.results[0]["train_loss"] < out_a.results[0]["train_loss"]
