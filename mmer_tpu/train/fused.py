"""Whole-run fused training: every epoch, eval, scheduler step, early-stop
decision and best-model copy happens ON DEVICE inside one jitted
``lax.while_loop`` — a complete training run is a single host→device call.

Contrast with the reference's loop (train2.py:495-774), which crosses the
host↔device boundary per *batch* and syncs every prediction to the host
for sklearn each epoch; and with our own epoch-loop (train/loop.py), which
still pays one host round-trip per epoch (the dominant cost through a
tunneled chip: 542 ms/epoch of RTT vs ~3 ms of compute for this model).

Semantics preserved exactly (same as train/loop.py):
- Adam + L2-into-grad + global-norm clip 1.0 (train2.py:525,576);
- torch ``ReduceLROnPlateau(factor, patience, rel threshold 1e-4)`` on the
  val loss (train2.py:526), lr updated functionally in the optimizer's
  injected hyperparams;
- early stop after ``patience`` epochs with per-epoch val-loss improvement
  < ``min_delta`` (train2.py:622-633);
- best params tracked by val loss (train2.py:617-620), copied on device;
- per-epoch train/val/test losses + confusion matrices land in
  preallocated device buffers; P/R/F1 are derived on host afterwards.

Early-stopped epochs are never executed (``while_loop`` condition), so the
run costs only the epochs it actually takes.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmer_tpu.config import ModelConfig, TrainConfig
from mmer_tpu.models.fusion import MultimodalEmotionModel
from mmer_tpu.ops.losses import soft_cross_entropy
from mmer_tpu.train.loop import _loss_fn, _pad_batches
from mmer_tpu.train.metrics import confusion_matrix


class FusedCarry(NamedTuple):
    params: Any
    opt_state: Any
    rng: jax.Array
    epoch: jax.Array            # i32 — epochs completed
    done: jax.Array             # bool — early-stopped
    best_params: Any
    best_score: jax.Array  # tracked score: val loss, or -val acc (v1)
    best_epoch: jax.Array       # 1-based, 0 = none yet
    sched_best: jax.Array       # plateau scheduler state
    sched_bad: jax.Array
    prev_val_loss: jax.Array    # early-stopping state
    no_improve: jax.Array
    metrics: Dict[str, jax.Array]   # preallocated (E, ...) buffers
    ema_params: Any = None      # per-step EMA (train_cfg.ema_decay > 0)


def build_fused_train(model: MultimodalEmotionModel,
                      optimizer: optax.GradientTransformation,
                      model_cfg: ModelConfig, train_cfg: TrainConfig,
                      batch_size: int, eval_batch: int = 1024,
                      mesh=None, raw: bool = False) -> Callable:
    """→ jitted ``run(params, opt_state, rng, data, train_idx, val_idx,
    test_idx, class_weights)`` executing the whole training run.

    With a multi-device ``mesh`` every on-device-gathered minibatch (train
    AND eval) is constrained to batch-sharding over the data axis, exactly
    like the epoch-loop path (loop.py:153-158); parameters are expected to
    arrive pre-placed by parallel/sharding.py, so the whole while_loop body
    runs dp (and tp, if params are model-sharded) with XLA-inserted ICI
    collectives.

    ``raw=True`` returns the unjitted parts ``(make_carry, run_until)``
    instead — run_until(carry, until, …) advances a FusedCarry to a
    dynamic epoch bound, enabling vmap-over-seeds and epoch segmentation
    (train_many_seeds).
    """
    from mmer_tpu.parallel.sharding import batch_spec

    loss_fn = _loss_fn(train_cfg)
    num_classes = model_cfg.num_classes
    num_epochs = train_cfg.num_epochs
    shard_batches = mesh is not None and mesh.size > 1
    # Opt-in EMA: eval/selection run on a per-step exponential moving
    # average of the params (classic cheap generalization win; the raw
    # trajectory — carry.params/opt_state — is untouched, so resume and
    # reference-recipe runs are bit-identical with ema_decay=0).
    ema_decay = train_cfg.ema_decay
    use_ema = ema_decay > 0.0
    # Opt-in feature-space regularizers (defaults 0.0 keep the traced
    # train step — and therefore the RNG stream — bit-identical to the
    # reference recipe; the extra keys below are derived by fold_in from
    # the step's dropout key only when enabled).
    mixup_alpha = train_cfg.mixup_alpha
    md_rate = train_cfg.modality_dropout
    # Opt-in ensemble distillation: data["soft_targets"] (N, C) teacher
    # probs enter the loss as a temperature-scaled soft CE blended at
    # distill_alpha (ops/losses.py:soft_cross_entropy).  Gated at trace
    # time so the alpha=0 step (and its RNG stream) stays bit-identical.
    distill_alpha = train_cfg.distill_alpha
    distill_temp = train_cfg.distill_temp

    def gather(arr, idx):
        out = jnp.take(arr, idx, axis=0)
        if shard_batches:
            out = jax.lax.with_sharding_constraint(
                out, batch_spec(mesh, out.ndim))
        return out

    def train_epoch(params, opt_state, ema, rng, data, train_idx,
                    class_weights):
        n = train_idx.shape[0]
        rng, shuffle_key, epoch_key = jax.random.split(rng, 3)
        perm = jax.random.permutation(shuffle_key, n)
        batches = _pad_batches(jnp.take(train_idx, perm, axis=0), batch_size)

        def step_fn(carry, xs):
            params, opt_state, ema = carry
            idx, step_i = xs
            sw = (idx >= 0).astype(jnp.float32)
            safe = jnp.maximum(idx, 0)
            video = gather(data["video"], safe)
            audio = gather(data["audio"], safe)
            mask = gather(data["pad_mask"], safe)
            labels = gather(data["labels"], safe)
            if distill_alpha > 0.0:
                soft = gather(data["soft_targets"], safe)
            dropout_key = jax.random.fold_in(epoch_key, step_i)

            if md_rate > 0.0:
                # Per-sample modality dropout: one uniform draw picks
                # "zero audio" (u < rate/2) or "zero video" (rate/2 <= u
                # < rate); features are zero-padded so zeroing is the
                # global-mean point of the z-scored feature space.
                u = jax.random.uniform(
                    jax.random.fold_in(dropout_key, 103), (sw.shape[0],))
                keep_audio = (u >= md_rate / 2.0).astype(audio.dtype)
                keep_video = jnp.logical_or(
                    u < md_rate / 2.0, u >= md_rate).astype(video.dtype)
                audio = audio * keep_audio[:, None]
                video = video * keep_video[:, None, None]

            if mixup_alpha > 0.0:
                # Batch-scalar lambda, in-batch partner permutation.
                # Sentinel lanes (idx -1 -> sample 0, sw 0) can appear as
                # partners in the final partial batch of an epoch; they
                # carry sample 0's real features+label, so the mix stays
                # a valid (slightly sample-0-biased) mixup pair.
                lam = jax.random.beta(
                    jax.random.fold_in(dropout_key, 101),
                    mixup_alpha, mixup_alpha)
                j = jax.random.permutation(
                    jax.random.fold_in(dropout_key, 102), sw.shape[0])
                video = lam * video + (1.0 - lam) * jnp.take(video, j, 0)
                audio = lam * audio + (1.0 - lam) * jnp.take(audio, j, 0)
                # True = padded: a mixed position is real if EITHER
                # parent had a real token there (the shorter parent's
                # padding is zeros, which mixes to lam*x harmlessly).
                mask = jnp.logical_and(mask, jnp.take(mask, j, 0))
                labels_b = jnp.take(labels, j, 0)
                if distill_alpha > 0.0:
                    # Soft CE is linear in the target distribution, so
                    # mixing the teacher probs == mixing the soft losses.
                    soft = lam * soft + (1.0 - lam) * jnp.take(soft, j, 0)

            def loss_of(p):
                _, logits, _ = model.apply(
                    {"params": p}, video, audio, mask, train=True,
                    rngs={"dropout": dropout_key})
                loss = loss_fn(logits, labels, class_weights, sw)
                if mixup_alpha > 0.0:
                    loss = (lam * loss
                            + (1.0 - lam)
                            * loss_fn(logits, labels_b, class_weights, sw))
                if distill_alpha > 0.0:
                    kd = soft_cross_entropy(logits, soft, distill_temp, sw)
                    loss = (1.0 - distill_alpha) * loss + distill_alpha * kd
                return loss

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if use_ema:
                ema = jax.tree_util.tree_map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    ema, params)
            return (params, opt_state, ema), loss

        (params, opt_state, ema), losses = jax.lax.scan(
            step_fn, (params, opt_state, ema),
            (batches, jnp.arange(batches.shape[0])))
        return params, opt_state, ema, rng, jnp.mean(losses)

    def evaluate(params, data, idx, class_weights):
        batches = _pad_batches(idx, eval_batch)

        def step_fn(carry, b):
            loss_sum, w_sum, cm = carry
            sw = (b >= 0).astype(jnp.float32)
            safe = jnp.maximum(b, 0)
            video = gather(data["video"], safe)
            audio = gather(data["audio"], safe)
            mask = gather(data["pad_mask"], safe)
            labels = gather(data["labels"], safe)
            _, logits, _ = model.apply({"params": params}, video, audio,
                                       mask)
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

    def make_carry(params, opt_state, rng):
        metrics = {
            "train_loss": jnp.zeros((num_epochs,)),
            "val_loss": jnp.zeros((num_epochs,)),
            "val_cm": jnp.zeros((num_epochs, num_classes, num_classes)),
            "test_cm": jnp.zeros((num_epochs, num_classes, num_classes)),
            "lr": jnp.zeros((num_epochs,)),
        }
        return FusedCarry(
            params=params, opt_state=opt_state, rng=rng,
            epoch=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool),
            best_params=jax.tree_util.tree_map(jnp.copy, params),
            best_score=jnp.asarray(jnp.inf),
            best_epoch=jnp.zeros((), jnp.int32),
            sched_best=jnp.asarray(jnp.inf),
            sched_bad=jnp.zeros((), jnp.int32),
            prev_val_loss=jnp.asarray(jnp.inf),
            no_improve=jnp.zeros((), jnp.int32),
            metrics=metrics,
            ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                        if use_ema else None))

    def run_until(carry, until, data, train_idx, val_idx, test_idx,
                  class_weights):
        """Advance the run to epoch ``until`` (dynamic scalar) or early
        stop, whichever first — the while_loop body of the whole-run
        trainer, resumable from any FusedCarry (epoch segmentation for
        environments that bound device-program duration)."""
        until = jnp.minimum(jnp.asarray(until, jnp.int32), num_epochs)

        def cond(c: FusedCarry):
            return (c.epoch < until) & ~c.done

        def body(c: FusedCarry) -> FusedCarry:
            params, opt_state, ema, rng, train_loss = train_epoch(
                c.params, c.opt_state, c.ema_params, c.rng, data, train_idx,
                class_weights)
            # With EMA on, evaluation, scheduler/early-stop signals and
            # best-model selection all see the averaged weights.
            eval_params = ema if use_ema else params
            val_loss, val_cm = evaluate(eval_params, data, val_idx,
                                        class_weights)
            test_loss, test_cm = evaluate(eval_params, data, test_idx,
                                          class_weights)
            del test_loss

            # torch ReduceLROnPlateau (rel threshold 1e-4).
            improved = val_loss < c.sched_best * (1.0 - 1e-4)
            sched_best = jnp.where(improved, val_loss, c.sched_best)
            sched_bad = jnp.where(improved, 0, c.sched_bad + 1)
            reduce_now = sched_bad > train_cfg.scheduler_patience
            lr = opt_state.hyperparams["learning_rate"]
            proposed = lr * train_cfg.scheduler_factor
            # torch's eps=1e-8 rule: skip reductions smaller than eps.
            new_lr = jnp.where(reduce_now & (lr - proposed > 1e-8),
                               proposed, lr)
            sched_bad = jnp.where(reduce_now, 0, sched_bad)
            hyper = dict(opt_state.hyperparams)
            hyper["learning_rate"] = new_lr
            opt_state = opt_state._replace(hyperparams=hyper)

            # best-model tracking: val loss (v2, train2.py:617-620) or
            # negated val accuracy (v1, train.py:334-338).
            if train_cfg.best_metric == "val_loss":
                score = val_loss
            else:
                # -accuracy in PERCENT — the epoch-loop trainer tracks
                # -val_acc with val_acc = 100·accuracy (loop.py:565), and
                # TrainOutput.best_score must be comparable across modes.
                score = (-100.0 * jnp.trace(val_cm)
                         / jnp.maximum(jnp.sum(val_cm), 1.0))
            is_best = score < c.best_score
            best_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(is_best, new, old),
                eval_params, c.best_params)
            best_score = jnp.where(is_best, score, c.best_score)
            best_epoch = jnp.where(is_best, c.epoch + 1, c.best_epoch)

            # early stopping on per-epoch improvement.
            no_improve = jnp.where(
                c.prev_val_loss - val_loss < train_cfg.min_delta,
                c.no_improve + 1, 0)
            done = no_improve >= train_cfg.patience

            e = c.epoch
            m = c.metrics
            metrics = {
                "train_loss": m["train_loss"].at[e].set(train_loss),
                "val_loss": m["val_loss"].at[e].set(val_loss),
                "val_cm": m["val_cm"].at[e].set(val_cm),
                "test_cm": m["test_cm"].at[e].set(test_cm),
                "lr": m["lr"].at[e].set(new_lr),
            }
            return FusedCarry(
                params=params, opt_state=opt_state, rng=rng, epoch=e + 1,
                done=done, best_params=best_params,
                best_score=best_score, best_epoch=best_epoch,
                sched_best=sched_best, sched_bad=sched_bad,
                prev_val_loss=val_loss, no_improve=no_improve,
                metrics=metrics, ema_params=ema)

        return jax.lax.while_loop(cond, body, carry)

    def run(params, opt_state, rng, data, train_idx, val_idx, test_idx,
            class_weights):
        return run_until(make_carry(params, opt_state, rng), num_epochs,
                         data, train_idx, val_idx, test_idx, class_weights)

    if raw:
        return make_carry, run_until
    return jax.jit(run, donate_argnums=(0, 1))


def attach_soft_targets(dev_data: Dict[str, jax.Array],
                        train_cfg: TrainConfig, soft_targets) -> None:
    """Validate and insert ensemble-distillation teacher probs (N, C),
    row-aligned with the dataset, into a trainer's device-data dict —
    required exactly when ``train_cfg.distill_alpha > 0``
    (train/distill.py supplies them)."""
    if (soft_targets is not None) != (train_cfg.distill_alpha > 0.0):
        raise ValueError(
            "soft_targets must be supplied exactly when distill_alpha > 0 "
            f"(got soft_targets="
            f"{'set' if soft_targets is not None else 'None'}, "
            f"distill_alpha={train_cfg.distill_alpha})")
    if soft_targets is not None:
        n = dev_data["labels"].shape[0]
        if soft_targets.shape[0] != n:
            raise ValueError(f"soft_targets rows {soft_targets.shape[0]} "
                             f"!= dataset rows {n}")
        dev_data["soft_targets"] = jnp.asarray(soft_targets, jnp.float32)


def train_many_seeds(data, splits, model_cfg: ModelConfig,
                     train_cfg: TrainConfig, batch_size: int,
                     seeds, seeds_per_call: int = 4,
                     epochs_per_call: int = 100,
                     verbose: bool = True,
                     soft_targets=None) -> list:
    """Seed-parallel fused training: ``vmap`` the whole-run while_loop
    over a leading seed axis, so an N-seed statistical sweep (the
    reference runs its 16-run sweep one process at a time) shares every
    gather and GEMM as a batched dimension.

    Returns one dict per seed: ``{"seed", "results", "best_epoch",
    "best_params", "wall_seconds"}`` with per-epoch rows in the
    reference's results schema.  Each seed's init/rng stream is identical
    to ``train_model(..., fused=True, seed=s)``; JAX's while_loop
    batching freezes finished seeds' carries, so per-seed early stopping
    is preserved.

    ``seeds_per_call``/``epochs_per_call`` bound the device-program size:
    on the v5e-1 behind this environment's relay, programs past roughly
    4-seed×100-epoch (or 8×anything) fault with UNAVAILABLE — epoch
    segmentation resumes the SAME FusedCarry across bounded calls (the
    ``until`` bound is a dynamic scalar, so every segment reuses one
    compiled program).  Raise both on hardware without such limits.
    """
    import time

    import numpy as np

    from mmer_tpu.train.loop import make_optimizer

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

    def init_one(seed_key):
        rng, init_key = jax.random.split(seed_key)
        params = model.init(
            {"params": init_key}, dev_data["video"][:2],
            dev_data["audio"][:2], dev_data["pad_mask"][:2])["params"]
        return params, optimizer.init(params), rng

    init_many = jax.jit(jax.vmap(init_one))
    make_carry, run_until = build_fused_train(
        model, optimizer, model_cfg, train_cfg, batch_size, raw=True)
    carry_many = jax.jit(jax.vmap(make_carry))
    seg_many = jax.jit(
        jax.vmap(run_until,
                 in_axes=(0, None, None, None, None, None, None)),
        donate_argnums=(0,))
    train_idx = jnp.asarray(splits.train, jnp.int32)
    val_idx = jnp.asarray(splits.val, jnp.int32)
    test_idx = jnp.asarray(splits.test, jnp.int32)
    num_epochs = train_cfg.num_epochs

    outs = []
    seeds = list(seeds)
    for lo in range(0, len(seeds), seeds_per_call):
        chunk = seeds[lo:lo + seeds_per_call]
        # Uniform chunk size (pad by repeating the last seed) so every
        # call reuses ONE compiled program; padded lanes are discarded.
        padded = chunk + [chunk[-1]] * (seeds_per_call - len(chunk))
        seed_keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in padded])
        carry = carry_many(*init_many(seed_keys))
        t0 = time.time()
        until = 0
        while True:
            until = min(until + epochs_per_call, num_epochs)
            carry = seg_many(carry, until, dev_data, train_idx, val_idx,
                             test_idx, class_weights)
            # Host sync per segment: bounds device-program duration AND
            # actually surfaces async device errors (block_until_ready
            # does not reliably block through the dev relay).
            done = np.asarray(carry.done)
            if until >= num_epochs or bool(np.all(done)):
                break
        elapsed = time.time() - t0
        if verbose:
            print(f"seeds {chunk} fused ({-(-until // epochs_per_call)} "
                  f"segment calls): {elapsed:.1f}s "
                  f"({elapsed / len(chunk):.1f}s/seed amortized)",
                  flush=True)
        for i, seed in enumerate(chunk):
            final_i = jax.tree_util.tree_map(lambda x: x[i], carry)
            outs.append({
                "seed": int(seed),
                "results": fused_results_rows(final_i),
                "best_epoch": int(final_i.best_epoch),
                "best_params": jax.device_get(final_i.best_params),
                # the tracked selection score at the best epoch (val
                # loss, or -val acc for v1) — lets callers rank members
                # across seeds without re-deriving it from the rows
                # (scripts/{probe_ensemble,seed_sweep}.py).
                "best_score": float(final_i.best_score),
                "wall_seconds": elapsed,
            })
    return outs


def fused_results_rows(final: FusedCarry) -> list:
    """Device metric buffers → the reference's per-epoch results rows
    (train2.py:679-714 schema), computed on host."""
    from mmer_tpu.train.metrics import (accuracy_from_confusion,
                                        prf_from_confusion)

    epochs_run = int(final.epoch)
    rows = []
    m = jax.device_get(final.metrics)
    for e in range(epochs_run):
        val_cm = np.asarray(m["val_cm"][e])
        test_cm = np.asarray(m["test_cm"][e])
        val_prf = prf_from_confusion(val_cm)
        test_prf = prf_from_confusion(test_cm)
        rows.append({
            "epoch": e + 1,
            "train_loss": float(m["train_loss"][e]),
            "val_loss": float(m["val_loss"][e]),
            "val_acc": 100.0 * accuracy_from_confusion(val_cm),
            "val_macro_precision": val_prf["macro_precision"],
            "val_macro_recall": val_prf["macro_recall"],
            "val_macro_f1": val_prf["macro_f1"],
            "val_micro_precision": val_prf["micro_precision"],
            "val_micro_recall": val_prf["micro_recall"],
            "val_micro_f1": val_prf["micro_f1"],
            "test_acc": 100.0 * accuracy_from_confusion(test_cm),
            "test_macro_precision": test_prf["macro_precision"],
            "test_macro_recall": test_prf["macro_recall"],
            "test_macro_f1": test_prf["macro_f1"],
            "test_micro_precision": test_prf["micro_precision"],
            "test_micro_recall": test_prf["micro_recall"],
            "test_micro_f1": test_prf["micro_f1"],
            "learning_rate": float(m["lr"][e]),
        })
    return rows
