"""Jitted training loop for the fusion classifier.

TPU-first architecture (contrast with the reference's host-driven loop,
train2.py:495-774):

- The **entire dataset lives in HBM** as dense padded arrays; every epoch is
  ONE jitted call that `lax.scan`s over minibatches gathered on-device from a
  shuffled index array.  There are zero host→device transfers inside an
  epoch, vs. the reference's per-batch `tensor.to(device)` copies
  (train2.py:564-568).
- Evaluation is a single jitted call per split that reduces to a weighted
  loss and a (C, C) confusion matrix on device — only C²+2 scalars cross to
  host, vs. the reference syncing every prediction for sklearn each epoch
  (train2.py:636-677).
- Optimization matches the reference step for step: Adam(lr, wd=1e-4 as
  L2-into-grad, torch-style), global-norm grad clipping at 1.0
  (train2.py:525,576), class-weighted CE with torch's sum(w·ce)/sum(w)
  normalization (train2.py:523), ReduceLROnPlateau(factor=0.3, patience=20,
  rel threshold 1e-4) on val loss (train2.py:526), early stop after
  `patience` epochs with per-epoch val-loss improvement < 1e-4
  (train2.py:622-633), best model tracked by val loss (train2.py:617-620).
- Epoch-shuffling, dropout and the lr live inside the jitted state
  (optax.inject_hyperparams), so host↔device traffic per epoch is O(1).

Data parallelism: batches are sharded over the mesh's data axis and
parameters are placed by parallel/sharding.py rules; XLA inserts the psum
for gradient reduction.  On a single chip everything degrades to no-ops.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from datetime import datetime
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mmer_tpu.config import ModelConfig, TrainConfig, MeshConfig
from mmer_tpu.data.pipeline import DataSplits, DatasetArrays
from mmer_tpu.models.fusion import MultimodalEmotionModel
from mmer_tpu.ops.losses import focal_loss, weighted_cross_entropy
from mmer_tpu.train import checkpoint as ckpt
from mmer_tpu.train.metrics import (accuracy_from_confusion, confusion_matrix,
                                    prf_from_confusion)
from mmer_tpu.core.mesh import create_mesh
from mmer_tpu.parallel.sharding import batch_spec, shard_params


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    batch_stats: Any  # {} for layernorm models
    rng: jax.Array
    step: jax.Array


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip(1.0) → L2-weight-decay-into-grad → Adam → -lr, with the lr
    injected as dynamic state so ReduceLROnPlateau needs no recompile."""

    def build(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(cfg.clip_norm),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(build)(learning_rate=cfg.lr)


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class PlateauScheduler:
    """torch ``ReduceLROnPlateau(mode='min', factor, patience)`` semantics
    with the default relative threshold 1e-4 (reference train2.py:526) and
    torch's ``eps=1e-8`` rule: a reduction smaller than eps is skipped
    (this effectively floors the lr; trajectory parity is tested against
    the real torch scheduler in tests/test_scheduler_torch_parity.py)."""

    def __init__(self, factor: float, patience: int, threshold: float = 1e-4,
                 eps: float = 1e-8):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.eps = eps
        self.best = float("inf")
        self.num_bad = 0

    def step(self, value: float, lr: float) -> float:
        if value < self.best * (1.0 - self.threshold):
            self.best = value
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            new_lr = lr * self.factor
            if lr - new_lr > self.eps:
                return new_lr
        return lr


def _loss_fn(cfg: TrainConfig):
    if cfg.loss == "weighted_ce":
        return lambda logits, labels, cw, sw: weighted_cross_entropy(
            logits, labels, cw, sw, label_smoothing=cfg.label_smoothing)
    if cfg.loss == "focal":
        return lambda logits, labels, cw, sw: focal_loss(
            logits, labels, gamma=cfg.focal_gamma, alpha=None,
            sample_weight=sw)
    raise ValueError(f"unknown loss {cfg.loss}")


def _pad_batches(idx: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Pad an index vector with -1 sentinels and reshape to (steps, batch)
    — the fixed-shape scan layout shared by every trainer here."""
    n = idx.shape[0]
    steps = -(-n // batch)
    padded = jnp.concatenate(
        [idx, jnp.full((steps * batch - n,), -1, jnp.int32)])
    return padded.reshape(steps, batch)


def build_train_epoch(model: MultimodalEmotionModel,
                      optimizer: optax.GradientTransformation,
                      train_cfg: TrainConfig,
                      batch_size: int,
                      mesh=None) -> Callable:
    """One full epoch as a single jitted function.

    With a multi-device ``mesh``, every gathered minibatch is constrained
    to batch-sharding over the data axis, so the fwd/bwd runs data-parallel
    and XLA inserts the gradient psum over ICI.
    """
    loss_fn = _loss_fn(train_cfg)
    shard_batches = mesh is not None and mesh.size > 1

    def gather(arr, idx):
        out = jnp.take(arr, idx, axis=0)
        if shard_batches:
            out = jax.lax.with_sharding_constraint(
                out, batch_spec(mesh, out.ndim))
        return out

    def epoch(state: TrainState, data: Dict[str, jax.Array],
              train_idx: jax.Array, class_weights: jax.Array):
        n = train_idx.shape[0]
        rng, shuffle_key = jax.random.split(state.rng)
        perm = jax.random.permutation(shuffle_key, n)
        batches = _pad_batches(jnp.take(train_idx, perm, axis=0), batch_size)

        def step_fn(carry, idx):
            state = carry
            sw = (idx >= 0).astype(jnp.float32)
            safe_idx = jnp.maximum(idx, 0)
            video = gather(data["video"], safe_idx)
            audio = gather(data["audio"], safe_idx)
            mask = gather(data["pad_mask"], safe_idx)
            labels = gather(data["labels"], safe_idx)
            dropout_key = jax.random.fold_in(rng, state.step)

            def loss_of(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    (_, logits, _), updates = model.apply(
                        variables, video, audio, mask, train=True,
                        rngs={"dropout": dropout_key},
                        mutable=["batch_stats"])
                    new_bs = updates["batch_stats"]
                else:
                    _, logits, _ = model.apply(
                        variables, video, audio, mask, train=True,
                        rngs={"dropout": dropout_key})
                    new_bs = state.batch_stats
                return loss_fn(logits, labels, class_weights, sw), new_bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            updates, new_opt = optimizer.update(
                grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=new_params, opt_state=new_opt, batch_stats=new_bs,
                step=state.step + 1)
            return new_state, loss

        state, losses = jax.lax.scan(step_fn, state, batches)
        state = state.replace(rng=rng)
        return state, jnp.mean(losses)

    return jax.jit(epoch, donate_argnums=(0,))


def build_eval(model: MultimodalEmotionModel, train_cfg: TrainConfig,
               num_classes: int, eval_batch: int = 1024) -> Callable:
    """Full-split eval → (weighted mean loss, confusion matrix), one call."""
    loss_fn = _loss_fn(train_cfg)

    def evaluate(params, batch_stats, data: Dict[str, jax.Array],
                 idx: jax.Array, class_weights: jax.Array):
        batches = _pad_batches(idx, eval_batch)

        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats

        def step_fn(carry, b):
            loss_sum, w_sum, cm = carry
            sw = (b >= 0).astype(jnp.float32)
            safe = jnp.maximum(b, 0)
            video = jnp.take(data["video"], safe, axis=0)
            audio = jnp.take(data["audio"], safe, axis=0)
            mask = jnp.take(data["pad_mask"], safe, axis=0)
            labels = jnp.take(data["labels"], safe, axis=0)
            _, logits, _ = model.apply(variables, video, audio, mask)
            batch_loss = loss_fn(logits, labels, class_weights, sw)
            bw = jnp.sum(sw)
            preds = jnp.argmax(logits, axis=-1)
            cm = cm + confusion_matrix(labels, preds, num_classes,
                                       sample_weight=sw)
            return (loss_sum + batch_loss * bw, w_sum + bw, cm), None

        init = (jnp.zeros(()), jnp.zeros(()),
                jnp.zeros((num_classes, num_classes)))
        (loss_sum, w_sum, cm), _ = jax.lax.scan(step_fn, init, batches)
        return loss_sum / jnp.maximum(w_sum, 1.0), cm

    return jax.jit(evaluate)


def _build_hyperparameters(model_cfg: ModelConfig,
                           train_cfg: TrainConfig,
                           batch_size: int, **extra) -> dict:
    """Run-log hyperparameters with the reference's key set
    (train2.py:748-764), shared by both trainer paths."""
    out = {
        "num_epochs": train_cfg.num_epochs, "lr": train_cfg.lr,
        "weight_decay": train_cfg.weight_decay,
        "patience": train_cfg.patience, "batch_size": batch_size,
        "device": jax.devices()[0].platform,
        "video_dim": model_cfg.video_dim, "audio_dim": model_cfg.audio_dim,
        "fused_dim": model_cfg.fused_dim,
        "num_classes": model_cfg.num_classes,
        "max_seq_len": model_cfg.max_seq_len,
        "fusion_dropout": model_cfg.fusion_dropout,
        "classifier_dropout": model_cfg.classifier_dropout,
        "num_layers": model_cfg.fusion_layers,
        "num_heads": model_cfg.fusion_heads,
        "scheduler_factor": train_cfg.scheduler_factor,
        "scheduler_patience": train_cfg.scheduler_patience,
        "focal_gamma": train_cfg.focal_gamma, "loss": train_cfg.loss,
    }
    out.update(extra)
    return out


def _save_run_artifacts(data: DatasetArrays, train_cfg: TrainConfig,
                        batch_size: int, results: list, best_epoch: int,
                        hyperparameters: dict, confusion,
                        best_params, final_params, verbose: bool,
                        best_batch_stats=None, final_batch_stats=None):
    """Results JSON + best/final msgpack + norm stats, with the reference's
    naming scheme (train2.py:748-774).  Shared by both trainer paths."""
    if not train_cfg.save_checkpoints:
        return None, None, None, None
    os.makedirs(train_cfg.output_dir, exist_ok=True)
    ts = datetime.now().strftime("%Y%m%d_%H%M%S")
    stem = f"bs{batch_size}_ep{train_cfg.num_epochs}_lr{train_cfg.lr}_{ts}"
    results_path = os.path.join(train_cfg.output_dir, f"results_{stem}.json")
    with open(results_path, "w") as f:
        json.dump({
            "training_progress": results,
            "best_model": {"epoch": best_epoch},
            "hyperparameters": hyperparameters,
            "confusion_matrix": confusion.astype(int).tolist()
            if confusion is not None else None,
        }, f, indent=4)
    best_path = os.path.join(train_cfg.output_dir,
                             f"best_model_{stem}.msgpack")
    final_path = os.path.join(train_cfg.output_dir,
                              f"final_model_{stem}.msgpack")
    # Batchnorm (v1) models: the artifact must carry the running stats
    # too, or the saved model cannot be restored faithfully — wrap as
    # {"params", "batch_stats"}; layernorm artifacts stay a bare params
    # tree (the schema serving loads).
    def _composite(p, bs):
        return {"params": p, "batch_stats": bs} if bs else p
    if best_params is not None:
        ckpt.save_params_msgpack(best_path,
                                 _composite(best_params, best_batch_stats))
    ckpt.save_params_msgpack(final_path,
                             _composite(final_params, final_batch_stats))
    stats_path = _save_norm_stats(data, train_cfg.output_dir, stem)
    if verbose:
        print(f"Training results saved to {results_path}")
    return results_path, best_path, final_path, stats_path


def _save_norm_stats(data: DatasetArrays, output_dir: str,
                     stem: str) -> Optional[str]:
    """Persist the training-time global z-score stats next to the model
    artifacts so SERVING normalizes features the same way.  The reference
    never does this — it trains on z-scored features (train2.py:362-378)
    but serves raw extractor outputs (libs/inference.py has no
    normalization at all), a silent train/serve skew."""
    if data.video_mean is None:
        return None
    path = os.path.join(output_dir, f"norm_stats_{stem}.npz")
    np.savez(path, video_mean=data.video_mean, video_std=data.video_std,
             audio_mean=data.audio_mean, audio_std=data.audio_std)
    return path


def _train_model_fused(data: DatasetArrays, splits: DataSplits,
                       model_cfg: ModelConfig, train_cfg: TrainConfig,
                       batch_size: int,
                       mesh_cfg: Optional[MeshConfig] = None,
                       seed: int = 0,
                       verbose: bool = True,
                       soft_targets=None) -> "TrainOutput":
    """Whole-run-on-device training (see train/fused.py), dp(+tp)-sharded
    over the ``mesh_cfg`` mesh when more than one device is present."""
    from mmer_tpu.core.mesh import replicate
    from mmer_tpu.train.fused import (attach_soft_targets,
                                      build_fused_train, fused_results_rows)

    if model_cfg.norm == "batchnorm":
        raise ValueError("fused mode does not support batchnorm models; "
                         "use fused=False")
    if train_cfg.checkpoint_every:
        raise ValueError("mid-run checkpoints need the epoch loop "
                         "(fused=False): the fused run never returns to "
                         "the host between epochs")
    mesh = create_mesh(mesh_cfg)
    model = MultimodalEmotionModel(model_cfg)
    optimizer = make_optimizer(train_cfg)

    dev_data = {
        "video": jnp.asarray(data.video),
        "audio": jnp.asarray(data.audio),
        "pad_mask": jnp.asarray(data.pad_mask),
        "labels": jnp.asarray(data.labels),
    }
    attach_soft_targets(dev_data, train_cfg, soft_targets)
    class_weights = jnp.asarray(splits.class_weights)
    rng = jax.random.PRNGKey(seed)
    rng, init_key = jax.random.split(rng)
    params = model.init(
        {"params": init_key}, dev_data["video"][:2], dev_data["audio"][:2],
        dev_data["pad_mask"][:2])["params"]
    if mesh.size > 1:
        # Params placed by the tp/dp rules; the full feature dataset is
        # replicated so each chip gathers its batch shard locally (it is
        # ~140 MB — trivially affordable in 16 GB HBM and it removes every
        # gather-time collective except the grad psum).
        params = shard_params(params, mesh)
        dev_data = replicate(mesh, dev_data)
        class_weights = replicate(mesh, class_weights)
    opt_state = optimizer.init(params)

    run = build_fused_train(model, optimizer, model_cfg, train_cfg,
                            batch_size, mesh=mesh)
    t_start = time.time()
    final = run(params, opt_state, rng, dev_data,
                jnp.asarray(splits.train, jnp.int32),
                jnp.asarray(splits.val, jnp.int32),
                jnp.asarray(splits.test, jnp.int32), class_weights)
    jax.block_until_ready(final.epoch)
    elapsed = time.time() - t_start

    results = fused_results_rows(final)
    best_epoch = int(final.best_epoch)
    best_score = float(final.best_score)
    best_val_loss = (results[best_epoch - 1]["val_loss"]
                     if best_epoch > 0 else float("inf"))
    best_params = jax.device_get(final.best_params)
    final_params = jax.device_get(final.params)
    epochs_run = len(results)
    if verbose:
        if epochs_run < train_cfg.num_epochs:
            print(f"Early stopping at epoch {epochs_run}")
        if results:
            last = results[-1]
            print(f"Epoch {epochs_run}: train {last['train_loss']:.4f}, "
                  f"val {last['val_loss']:.4f}, "
                  f"test acc {last['test_acc']:.2f}%, "
                  f"test macro-F1 {last['test_macro_f1']:.4f} "
                  f"({elapsed:.1f}s total, fused)")

    hyperparameters = _build_hyperparameters(
        model_cfg, train_cfg, batch_size,
        fused_run=True, train_wall_seconds=elapsed,
        ema_decay=train_cfg.ema_decay,
        mesh=dict(zip(mesh.axis_names, mesh.devices.shape)))

    confusion = None
    if best_epoch > 0:
        confusion = np.asarray(
            jax.device_get(final.metrics["test_cm"])[best_epoch - 1])
        if verbose:
            print("Confusion matrix (rows = true, cols = pred):")
            print(confusion.astype(int))

    results_path, best_path, final_path, stats_path = _save_run_artifacts(
        data, train_cfg, batch_size, results, best_epoch, hyperparameters,
        confusion, best_params, final_params, verbose)

    return TrainOutput(
        best_params=best_params, final_params=final_params, results=results,
        best_epoch=best_epoch, best_val_loss=best_val_loss,
        best_score=best_score,
        results_path=results_path, best_model_path=best_path,
        final_model_path=final_path, hyperparameters=hyperparameters,
        confusion=confusion, norm_stats_path=stats_path)


@dataclasses.dataclass
class TrainOutput:
    best_params: Any
    final_params: Any
    results: List[dict]
    best_epoch: int
    # Actual validation LOSS at the best epoch (always a loss, regardless
    # of the selection metric — ADVICE r1: with best_metric="val_acc" the
    # tracked score is -val_acc and must not masquerade as a loss).
    best_val_loss: float
    results_path: Optional[str]
    best_model_path: Optional[str]
    final_model_path: Optional[str]
    hyperparameters: dict
    confusion: Optional[np.ndarray] = None
    norm_stats_path: Optional[str] = None
    # The tracked selection score: val loss (best_metric="val_loss") or
    # negated val accuracy (best_metric="val_acc").
    best_score: float = float("inf")


def train_model(data: DatasetArrays, splits: DataSplits,
                model_cfg: ModelConfig, train_cfg: TrainConfig,
                batch_size: int = 64,
                mesh_cfg: Optional[MeshConfig] = None,
                seed: int = 0,
                verbose: bool = True,
                resume_dir: Optional[str] = None,
                fused: bool = False,
                soft_targets=None) -> TrainOutput:
    """Full training run with reference-equivalent control flow and the
    reference's JSON results schema (train2.py:748-764).

    ``fused=True`` runs the ENTIRE multi-epoch loop (scheduler, early
    stopping, best tracking) as one on-device ``lax.while_loop``
    (train/fused.py) — one host→device call per run instead of per epoch.
    Epoch-loop mode remains for mid-run resume, per-epoch logging, and
    batch-stats (v1 batchnorm) models.
    """
    if fused:
        return _train_model_fused(data, splits, model_cfg, train_cfg,
                                  batch_size, mesh_cfg=mesh_cfg, seed=seed,
                                  verbose=verbose,
                                  soft_targets=soft_targets)
    if train_cfg.ema_decay > 0.0:
        raise ValueError("ema_decay is implemented in the fused trainer "
                         "only — pass fused=True / --fused")
    if train_cfg.mixup_alpha > 0.0 or train_cfg.modality_dropout > 0.0:
        raise ValueError("mixup/modality dropout are implemented in the "
                         "fused trainer only — pass fused=True / --fused")
    if train_cfg.distill_alpha > 0.0:
        raise ValueError("ensemble distillation is implemented in the "
                         "fused trainer only — pass fused=True / --fused")
    mesh = create_mesh(mesh_cfg)
    model = MultimodalEmotionModel(model_cfg)
    optimizer = make_optimizer(train_cfg)

    # --- device placement -------------------------------------------------
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

    # --- init -------------------------------------------------------------
    rng = jax.random.PRNGKey(seed)
    rng, init_key = jax.random.split(rng)
    sample = (dev_data["video"][:2], dev_data["audio"][:2],
              dev_data["pad_mask"][:2])
    variables = model.init({"params": init_key}, *sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if mesh.size > 1:
        params = shard_params(params, mesh)
    state = TrainState(params=params, opt_state=optimizer.init(params),
                       batch_stats=batch_stats, rng=rng,
                       step=jnp.zeros((), jnp.int32))

    scheduler = PlateauScheduler(train_cfg.scheduler_factor,
                                 train_cfg.scheduler_patience)
    lr = train_cfg.lr
    results: List[dict] = []
    best_score = float("inf")
    best_params = None
    best_batch_stats = None          # bn models: stats AT the best epoch
    best_epoch = 0
    epochs_without_improvement = 0
    previous_val_loss = float("inf")

    start_epoch = 0
    if resume_dir:
        latest = ckpt.latest_checkpoint(resume_dir)
        if latest:
            restored = ckpt.restore_loop_checkpoint(latest, state)
            state = restored.state
            start_epoch = int(
                os.path.basename(latest).split("_")[1].split(".")[0])
            if restored.loop is not None:
                # Full loop state: the resumed run continues EXACTLY where
                # the interrupted one left off (scheduler plateau counters,
                # early-stop streak, best tracking) — ADVICE r1: without
                # this, a fresh PlateauScheduler + lr=train_cfg.lr stomped
                # any plateau-reduced lr after the first resumed epoch.
                loop = restored.loop
                lr = loop["lr"]
                scheduler.best = loop["sched_best"]
                scheduler.num_bad = loop["sched_bad"]
                best_score = loop["best_score"]
                best_epoch = loop["best_epoch"]
                epochs_without_improvement = loop["no_improve"]
                previous_val_loss = loop["prev_val_loss"]
                if loop["has_best"]:
                    best_params = restored.best_params
            else:
                # Legacy checkpoint (TrainState only): seed the lr from the
                # restored optimizer state instead of train_cfg.lr.
                lr = get_learning_rate(state.opt_state)
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr))
            if verbose:
                print(f"Resumed from {latest} at epoch {start_epoch}")

    train_epoch = build_train_epoch(model, optimizer, train_cfg, batch_size,
                                    mesh=mesh)
    evaluate = build_eval(model, train_cfg, model_cfg.num_classes)

    hyperparameters = _build_hyperparameters(
        model_cfg, train_cfg, batch_size,
        mesh=dict(zip(mesh.axis_names, mesh.devices.shape)))

    t_start = time.time()
    epoch = start_epoch
    for epoch in range(start_epoch, train_cfg.num_epochs):
        state, train_loss = train_epoch(state, dev_data, train_idx,
                                        class_weights)

        val_loss_d, val_cm_d = evaluate(state.params, state.batch_stats,
                                        dev_data, val_idx, class_weights)
        val_loss = float(val_loss_d)
        val_cm = np.asarray(val_cm_d)
        val_acc = 100.0 * accuracy_from_confusion(val_cm)
        val_prf = prf_from_confusion(val_cm)

        lr = scheduler.step(val_loss, lr)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))

        # best-model selection: v2 tracks val loss (train2.py:617-620),
        # v1 tracks val accuracy (train.py:334-338).
        score = val_loss if train_cfg.best_metric == "val_loss" else -val_acc
        if score < best_score:
            best_score = score
            # Real copy: state.params buffers are donated to the next epoch.
            best_params = jax.tree_util.tree_map(jnp.copy, state.params)
            # Batchnorm (v1) models: running stats are part of the model —
            # snapshot them WITH the params, else the "best model" is
            # evaluated/saved with the final epoch's drifted stats (the
            # reference deepcopies the full state_dict, train.py:334-338).
            best_batch_stats = (jax.tree_util.tree_map(
                jnp.copy, state.batch_stats) if state.batch_stats else {})
            best_epoch = epoch + 1

        row = {
            "epoch": epoch + 1,
            "train_loss": float(train_loss),
            "val_loss": val_loss,
            "val_acc": val_acc,
            "val_macro_precision": val_prf["macro_precision"],
            "val_macro_recall": val_prf["macro_recall"],
            "val_macro_f1": val_prf["macro_f1"],
            "val_micro_precision": val_prf["micro_precision"],
            "val_micro_recall": val_prf["micro_recall"],
            "val_micro_f1": val_prf["micro_f1"],
        }
        if train_cfg.eval_test_every_epoch:
            _, test_cm_d = evaluate(state.params, state.batch_stats,
                                    dev_data, test_idx, class_weights)
            test_cm = np.asarray(test_cm_d)
            test_prf = prf_from_confusion(test_cm)
            row.update({
                "test_acc": 100.0 * accuracy_from_confusion(test_cm),
                "test_macro_precision": test_prf["macro_precision"],
                "test_macro_recall": test_prf["macro_recall"],
                "test_macro_f1": test_prf["macro_f1"],
                "test_micro_precision": test_prf["micro_precision"],
                "test_micro_recall": test_prf["micro_recall"],
                "test_micro_f1": test_prf["micro_f1"],
            })
        results.append(row)

        if verbose and (epoch % train_cfg.log_every == 0):
            msg = (f"Epoch {epoch + 1}/{train_cfg.num_epochs}, "
                   f"Train Loss: {row['train_loss']:.4f}, "
                   f"Val Loss: {val_loss:.4f}, Val Acc: {val_acc:.2f}%")
            if "test_acc" in row:
                msg += (f", Test Acc: {row['test_acc']:.2f}%, "
                        f"Test Macro F1: {row['test_macro_f1']:.4f}")
            print(msg, flush=True)

        # Early stopping on per-epoch improvement (train2.py:622-633).
        if previous_val_loss - val_loss < train_cfg.min_delta:
            epochs_without_improvement += 1
            if epochs_without_improvement >= train_cfg.patience:
                if verbose:
                    print(f"Early stopping at epoch {epoch + 1}")
                break
        else:
            epochs_without_improvement = 0
        previous_val_loss = val_loss

        # Periodic full-state checkpoint for mid-run resume (params +
        # optimizer + rng + scheduler/early-stop/best-tracking state,
        # captured AFTER this epoch's updates so a resumed run continues
        # the interrupted one exactly).
        if (train_cfg.checkpoint_every
                and (epoch + 1) % train_cfg.checkpoint_every == 0):
            ckpt_dir = os.path.join(train_cfg.output_dir, "checkpoints")
            ckpt.save_loop_checkpoint(
                ckpt_dir, state, epoch + 1, best_params,
                {"lr": lr, "sched_best": scheduler.best,
                 "sched_bad": scheduler.num_bad, "best_score": best_score,
                 "best_epoch": best_epoch,
                 "no_improve": epochs_without_improvement,
                 "prev_val_loss": previous_val_loss,
                 "has_best": best_params is not None})

    elapsed = time.time() - t_start
    hyperparameters["train_wall_seconds"] = elapsed

    # Best-model confusion matrix on test (train2.py:719-743).
    confusion = None
    if best_params is not None:
        bs = (best_batch_stats if best_batch_stats is not None
              else state.batch_stats)   # resume fallback: stats not stored
        _, cm_d = evaluate(best_params, bs, dev_data,
                           test_idx, class_weights)
        confusion = np.asarray(cm_d)
        if verbose:
            print("Confusion matrix (rows = true, cols = pred):")
            print(confusion.astype(int))

    # Artifacts with the reference's naming scheme (train2.py:748-774).
    results_path, best_path, final_path, stats_path = _save_run_artifacts(
        data, train_cfg, batch_size, results, best_epoch, hyperparameters,
        confusion, best_params, state.params, verbose,
        best_batch_stats=best_batch_stats,
        final_batch_stats=state.batch_stats)

    # On a resumed run the best epoch may predate the resume point, so its
    # row is absent from this process's `results`; with val-loss selection
    # the tracked best_score IS that epoch's val loss (restored from the
    # checkpoint), so fall back to it rather than reporting inf.
    best_val_loss = next(
        (r["val_loss"] for r in results if r["epoch"] == best_epoch),
        float(best_score) if train_cfg.best_metric == "val_loss"
        else float("inf"))
    return TrainOutput(
        best_params=best_params, final_params=state.params, results=results,
        best_epoch=best_epoch, best_val_loss=best_val_loss,
        best_score=best_score,
        results_path=results_path, best_model_path=best_path,
        final_model_path=final_path, hyperparameters=hyperparameters,
        confusion=confusion, norm_stats_path=stats_path)
