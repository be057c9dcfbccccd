"""Full train_model over the 8-device CPU mesh: the end-to-end dp path
(sharded params placement + batch-sharding constraints inside the epoch
scan) must run and learn."""

import jax
import numpy as np
import pytest

from mmer_tpu.config import MeshConfig, ModelConfig, TrainConfig
from mmer_tpu.data.pipeline import (DataSplits, DatasetArrays,
                                    balanced_class_weights,
                                    stratified_splits)
from mmer_tpu.train.loop import train_model

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_train_model_on_mesh():
    rng = np.random.default_rng(4)
    n, t = 128, 3
    labels = rng.integers(0, 6, size=(n,)).astype(np.int32)
    lengths = rng.integers(1, t + 1, size=(n,)).astype(np.int32)
    video = rng.normal(size=(n, t, 768)).astype(np.float32)
    video[:, :, 0] += labels[:, None] * 2.0
    data = DatasetArrays(
        video=video,
        audio=rng.normal(size=(n, 1024)).astype(np.float32),
        pad_mask=np.arange(t)[None, :] >= lengths[:, None],
        labels=labels, lengths=lengths,
        keys=[str(i) for i in range(n)], max_chunks=t)
    tr, va, te = stratified_splits(labels, seed=42)
    splits = DataSplits(tr, va, te, balanced_class_weights(labels[tr]))

    out = train_model(
        data, splits,
        ModelConfig(max_seq_len=4, fusion_layers=1,
                    compute_dtype="float32"),
        TrainConfig(num_epochs=4, lr=1e-3, save_checkpoints=False,
                    patience=10 ** 9),
        batch_size=32, mesh_cfg=MeshConfig(),   # all 8 devices on data axis
        verbose=False)
    assert len(out.results) == 4
    assert out.results[-1]["train_loss"] < out.results[0]["train_loss"]
    assert np.isfinite(out.results[-1]["val_loss"])
