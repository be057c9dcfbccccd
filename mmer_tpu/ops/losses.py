"""Classification losses with exact reference semantics.

- :func:`weighted_cross_entropy` matches ``torch.nn.CrossEntropyLoss(weight=w)``
  (the v2 criterion, reference train2.py:523): per-sample loss is
  ``-w[y] * log_softmax(logits)[y]`` and the mean is normalized by
  ``sum(w[y])`` over the batch, not by the batch size.
- :func:`focal_loss` matches the reference ``FocalLoss`` (train2.py:40-70,
  used as the v1 criterion at train.py:251): ``(1-pt)^gamma * ce`` with
  optional per-class alpha, plain mean reduction.

Both accept a 0/1 ``sample_weight`` so that index-padded batches (the tail
batch of an epoch under fixed-shape scanning) contribute nothing — this makes
the padded-batch gradient identical to the reference's ragged final batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _per_sample_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                   label_smoothing: float = 0.0) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing > 0.0:
        # torch CrossEntropyLoss(label_smoothing=ε) semantics.
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return nll


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights: Optional[jnp.ndarray] = None,
                           sample_weight: Optional[jnp.ndarray] = None,
                           label_smoothing: float = 0.0) -> jnp.ndarray:
    ce = _per_sample_ce(logits, labels, label_smoothing)
    w = jnp.ones_like(ce) if class_weights is None else class_weights[labels]
    if sample_weight is not None:
        w = w * sample_weight
    return jnp.sum(w * ce) / jnp.maximum(jnp.sum(w), 1e-12)


def soft_cross_entropy(logits: jnp.ndarray, target_probs: jnp.ndarray,
                       temperature: float = 1.0,
                       sample_weight: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Distillation loss: cross-entropy to a soft target distribution.

    ``-sum_c q_T[c] * log_softmax(logits / T)[c]``, scaled by ``T**2``
    (Hinton et al. 2015 — keeps the gradient magnitude comparable to the
    hard loss as T varies) and averaged over ``sample_weight``-real rows.
    The teacher arrives as *probabilities* (the only thing an ensemble
    blend exposes, train/ensemble.py), so temperature sharpening recovers
    pseudo-logits via ``q_T = softmax(log(q) / T)`` — exact when the
    teacher itself is a softmax, a monotone reweighting when it is a
    probability mean.  No reference counterpart (the reference never
    distills); used by the fused trainer's ``distill_alpha`` path.
    """
    t = float(temperature)
    q = target_probs.astype(jnp.float32)
    if t != 1.0:
        q = jax.nn.softmax(jnp.log(jnp.maximum(q, 1e-12)) / t, axis=-1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32) / t, axis=-1)
    per = -jnp.sum(q * logp, axis=-1) * (t * t)
    if sample_weight is None:
        return jnp.mean(per)
    return jnp.sum(per * sample_weight) / jnp.maximum(
        jnp.sum(sample_weight), 1e-12)


def focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               gamma: float = 2.0,
               alpha: Optional[jnp.ndarray] = None,
               sample_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    ce = _per_sample_ce(logits, labels)
    pt = jnp.exp(-ce)
    fl = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        fl = alpha[labels] * fl
    if sample_weight is not None:
        return jnp.sum(fl * sample_weight) / jnp.maximum(
            jnp.sum(sample_weight), 1e-12)
    return jnp.mean(fl)
