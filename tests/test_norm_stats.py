"""Train→serve normalization consistency: stats saved by training are
loaded and applied by the serving engine (the reference trains on z-scored
features but serves raw ones — train2.py:362-378 vs libs/inference.py)."""

import glob
import os

import numpy as np

from mmer_tpu.config import ModelConfig, TrainConfig, ViViTConfig
from mmer_tpu.data.pipeline import (DataSplits, DatasetArrays,
                                    balanced_class_weights,
                                    stratified_splits)
from mmer_tpu.serve.engine import InferenceEngine
from mmer_tpu.train.loop import train_model

CFG = ModelConfig(max_seq_len=4, fusion_layers=1, compute_dtype="float32")


def test_norm_stats_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n, t = 96, 3
    labels = rng.integers(0, 6, size=(n,)).astype(np.int32)
    lengths = rng.integers(1, t + 1, size=(n,)).astype(np.int32)
    data = DatasetArrays(
        video=rng.normal(size=(n, t, 768)).astype(np.float32),
        audio=rng.normal(size=(n, 1024)).astype(np.float32),
        pad_mask=np.arange(t)[None, :] >= lengths[:, None],
        labels=labels, lengths=lengths,
        keys=[str(i) for i in range(n)], max_chunks=t,
        video_mean=np.full(768, 2.0, np.float32),
        video_std=np.full(768, 3.0, np.float32),
        audio_mean=np.full(1024, -1.0, np.float32),
        audio_std=np.full(1024, 0.5, np.float32))
    tr, va, te = stratified_splits(labels, seed=42)
    splits = DataSplits(tr, va, te, balanced_class_weights(labels[tr]))

    out = train_model(
        data, splits, CFG,
        TrainConfig(num_epochs=1, lr=1e-3, patience=10 ** 9,
                    output_dir=str(tmp_path)),
        batch_size=32, verbose=False, fused=True)
    assert out.norm_stats_path and os.path.exists(out.norm_stats_path)
    assert glob.glob(os.path.join(str(tmp_path), "norm_stats_*.npz"))

    engine = InferenceEngine(model_cfg=CFG,
                             vivit_cfg=ViViTConfig(image_size=(32, 32)),
                             norm_stats_path=out.norm_stats_path)
    v = np.ones((1, 2, 768), np.float32)
    a = np.ones((1, 1024), np.float32)
    nv, na = engine._normalize(v, a)
    np.testing.assert_allclose(nv, (1.0 - 2.0) / 3.0)
    np.testing.assert_allclose(na, (1.0 + 1.0) / 0.5)
