"""Streaming pipeline: batch contract, shuffling, prefetch, and the
streaming trainer end-to-end on disk-backed features."""

import numpy as np

from mmer_tpu.config import ModelConfig, TrainConfig
from mmer_tpu.data.catalog import build_catalog
from mmer_tpu.data.streaming import StreamingFeatureDataset
from mmer_tpu.train.streaming import train_streaming


def _dataset(synthetic_feature_dirs, batch_size=16):
    vdir, adir = synthetic_feature_dirs
    catalog = build_catalog(vdir, adir, "key")
    return catalog, StreamingFeatureDataset(catalog, batch_size,
                                            max_chunks=5, seed=0)


def test_batch_contract(synthetic_feature_dirs):
    catalog, ds = _dataset(synthetic_feature_dirs)
    batches = list(ds.epoch(0, device_put=False))
    assert len(batches) == len(ds)
    total_weight = 0.0
    for b in batches:
        assert b["video"].shape == (16, 5, 768)
        assert b["audio"].shape == (16, 1024)
        assert b["pad_mask"].shape == (16, 5)
        total_weight += float(b["weight"].sum())
        # padded positions are masked True; real rows have weight 1
        real = b["weight"] > 0
        assert (~b["pad_mask"][real]).sum() > 0
    assert int(total_weight) == len(catalog)


def test_shuffling_changes_between_epochs_and_is_seeded(synthetic_feature_dirs):
    _, ds = _dataset(synthetic_feature_dirs)
    e0 = [b["labels"].tolist() for b in ds.epoch(0, device_put=False)]
    e1 = [b["labels"].tolist() for b in ds.epoch(1, device_put=False)]
    e0b = [b["labels"].tolist() for b in ds.epoch(0, device_put=False)]
    assert e0 == e0b            # restartable
    assert e0 != e1             # reshuffled


def test_train_streaming_learns(synthetic_feature_dirs):
    catalog, _ = _dataset(synthetic_feature_dirs)
    train_ds = StreamingFeatureDataset(catalog[:100], 16, max_chunks=5)
    val_ds = StreamingFeatureDataset(catalog[100:], 16, max_chunks=5)
    out = train_streaming(
        train_ds, val_ds,
        ModelConfig(max_seq_len=6, fusion_layers=1,
                    compute_dtype="float32"),
        TrainConfig(num_epochs=2, lr=1e-3, patience=10 ** 9),
        class_weights=np.ones(6, np.float32), verbose=False)
    assert len(out["results"]) == 2
    assert np.isfinite(out["results"][-1]["val_loss"])
    assert out["best_params"] is not None
