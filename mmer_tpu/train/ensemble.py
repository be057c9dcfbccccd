"""Seed-ensemble evaluation: average the softmax probabilities of N
independently trained fusion models (different init/rng seeds, same
recipe) and score the blend.

A capability beyond the reference (its 16-run sweep only ever reports
single models, train2.py:941-994), built on what the framework already
has: ``train_many_seeds`` (train/fused.py) returns each seed's BEST
params from one vmapped device program, so an 8-way ensemble costs one
sweep plus this batched re-evaluation.  Probability averaging (not
logit averaging) matches how the serving engine exposes scores
(softmax probs, reference inference.py:493-495).

Measured on chip (artifacts/probes/r3_onchip.json): k=2 blend 0.7648
test macro-F1 vs 0.7604±0.004 single-model best-epoch mean — the README
quality-table headline.  Run: python scripts/probe_ensemble.py
(members val-ranked), or scripts/seed_sweep.py --ensemble_k 2,4,8.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ModelConfig
from mmer_tpu.models.fusion import MultimodalEmotionModel
from mmer_tpu.train.metrics import (accuracy_from_confusion,
                                    confusion_matrix, prf_from_confusion)


def ensemble_eval(model_cfg: ModelConfig, params_list: Sequence[dict],
                  data, splits, split: str = "test") -> Dict[str, float]:
    """Mean-probability ensemble of ``params_list`` on one split.

    Each entry is a bare params tree (``train_many_seeds``'s
    ``best_params``).  Probabilities are averaged on device; only the
    C^2 confusion counts cross to host (train/metrics.py discipline).
    Also returns each member's individual F1 for the uplift comparison.
    """
    model = MultimodalEmotionModel(model_cfg)
    idx = {"train": splits.train, "val": splits.val,
           "test": splits.test}[split]
    v = jnp.asarray(data.video[idx])
    a = jnp.asarray(data.audio[idx])
    m = jnp.asarray(data.pad_mask[idx])
    labels = jnp.asarray(data.labels[idx])
    n_cls = int(data.labels.max()) + 1

    @jax.jit
    def probs_of(p):
        out = model.apply({"params": p}, v, a, m)
        return out[0]                      # (N, C) softmax probs

    members: List[Dict[str, float]] = []
    mean_probs = None
    for p in params_list:
        probs = probs_of(p)
        cm = np.asarray(confusion_matrix(
            labels, jnp.argmax(probs, axis=1), n_cls))
        stats = prf_from_confusion(cm)
        members.append({"macro_f1": stats["macro_f1"],
                        "accuracy": accuracy_from_confusion(cm)})
        mean_probs = probs if mean_probs is None else mean_probs + probs
    mean_probs = mean_probs / len(params_list)

    cm = np.asarray(confusion_matrix(
        labels, jnp.argmax(mean_probs, axis=1), n_cls))
    stats = prf_from_confusion(cm)
    return {
        "n_members": len(params_list),
        "ensemble_macro_f1": stats["macro_f1"],
        "ensemble_accuracy": accuracy_from_confusion(cm),
        "member_macro_f1": [m["macro_f1"] for m in members],
        "member_mean_macro_f1": float(
            np.mean([m["macro_f1"] for m in members])),
    }
