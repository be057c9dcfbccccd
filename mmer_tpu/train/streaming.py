"""Streaming trainer: disk→device batch stream for beyond-HBM datasets.

Same optimization semantics as train/loop.py (Adam + clip + weighted CE,
plateau scheduler, early stopping, best-by-val-loss) driven by
data/streaming.py's prefetched batch iterator.  One jitted step serves
every batch (fixed shapes); the host loop only sequences epochs.

Use when the feature set can't be HBM-resident; otherwise prefer
``train_model(..., fused=True)`` — it's strictly faster.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmer_tpu.config import ModelConfig, TrainConfig
from mmer_tpu.data.streaming import StreamingFeatureDataset
from mmer_tpu.models.fusion import MultimodalEmotionModel
from mmer_tpu.ops.losses import weighted_cross_entropy
from mmer_tpu.train.loop import (PlateauScheduler, get_learning_rate,
                                 make_optimizer, set_learning_rate)


def train_streaming(train_ds: StreamingFeatureDataset,
                    val_ds: StreamingFeatureDataset,
                    model_cfg: ModelConfig, train_cfg: TrainConfig,
                    class_weights: np.ndarray, seed: int = 0,
                    verbose: bool = True) -> Dict:
    """→ {"params", "best_params", "results"} (reference row schema subset)."""
    model = MultimodalEmotionModel(model_cfg)
    optimizer = make_optimizer(train_cfg)
    cw = jnp.asarray(class_weights, jnp.float32)

    rng = jax.random.PRNGKey(seed)
    t = model_cfg.max_seq_len - 1
    params = model.init(
        {"params": rng}, jnp.zeros((1, t, model_cfg.video_dim)),
        jnp.zeros((1, model_cfg.audio_dim)), jnp.zeros((1, t), bool))["params"]
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, step, batch):
        def loss_of(p):
            _, logits, _ = model.apply(
                {"params": p}, batch["video"], batch["audio"],
                batch["pad_mask"], train=True,
                rngs={"dropout": jax.random.fold_in(rng, step)})
            return weighted_cross_entropy(logits, batch["labels"], cw,
                                          batch["weight"])

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        _, logits, _ = model.apply({"params": params}, batch["video"],
                                   batch["audio"], batch["pad_mask"])
        loss = weighted_cross_entropy(logits, batch["labels"], cw,
                                      batch["weight"])
        correct = jnp.sum((jnp.argmax(logits, -1) == batch["labels"])
                          * batch["weight"])
        return loss * jnp.sum(batch["weight"]), correct, jnp.sum(batch["weight"])

    scheduler = PlateauScheduler(train_cfg.scheduler_factor,
                                 train_cfg.scheduler_patience)
    lr = train_cfg.lr
    best_val = float("inf")
    best_params = None
    prev_val = float("inf")
    no_improve = 0
    results: List[Dict] = []
    step = 0

    for epoch in range(train_cfg.num_epochs):
        losses = []
        for batch in train_ds.epoch(epoch):
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(step, jnp.int32), batch)
            losses.append(loss)
            step += 1
        train_loss = float(jnp.mean(jnp.stack(losses)))

        loss_sum = correct = weight_sum = 0.0
        for batch in val_ds.epoch(0):          # fixed order for eval
            ls, c, w = eval_step(params, batch)
            loss_sum += float(ls)
            correct += float(c)
            weight_sum += float(w)
        val_loss = loss_sum / max(weight_sum, 1.0)
        val_acc = 100.0 * correct / max(weight_sum, 1.0)

        lr = scheduler.step(val_loss, lr)
        opt_state = set_learning_rate(opt_state, lr)
        if val_loss < best_val:
            best_val = val_loss
            best_params = jax.tree_util.tree_map(jnp.copy, params)
        results.append({"epoch": epoch + 1, "train_loss": train_loss,
                        "val_loss": val_loss, "val_acc": val_acc,
                        "learning_rate": get_learning_rate(opt_state)})
        if verbose:
            print(f"Epoch {epoch + 1}: train {train_loss:.4f} "
                  f"val {val_loss:.4f} acc {val_acc:.2f}%", flush=True)

        if prev_val - val_loss < train_cfg.min_delta:
            no_improve += 1
            if no_improve >= train_cfg.patience:
                break
        else:
            no_improve = 0
        prev_val = val_loss

    return {"params": params, "best_params": best_params,
            "results": results}
