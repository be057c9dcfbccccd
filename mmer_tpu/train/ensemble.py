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

Measured on chip: val-ranked top-4-of-8 blend 0.7640 test macro-F1 vs
0.7604±0.004 single-model best-epoch mean (artifacts/probes/
r4_ensemble.log); recipe-diverse pooled top-8-of-16 0.7677
(r4_diverse_ens.log).  Two member-selection schemes ship:

- val-loss top-k rank (``ensemble_eval`` over a ranked prefix) — the
  quality-table rows;
- greedy forward selection on the val BLEND's macro-F1
  (``greedy_select`` / ``greedy_ensemble_eval``, Caruana et al. 2004).
  Measured on the same 32-member pool (r4_greedy_ens.log): greedy with
  replacement picks k_best=10 → 0.7674 test, beating val-loss top-16
  (0.7647) on-pool; without replacement it stops at k=4 (0.7642).  All
  selection schemes land in the same 0.760–0.768 band — selection
  refinement is worth ≈+0.3 F1 at most over rank-and-average.

Run: python scripts/probe_ensemble.py (val-ranked),
scripts/probe_diverse_ensemble.py --greedy (rank vs greedy A/B), or
scripts/seed_sweep.py --ensemble_k 2,4,8 --ensemble_greedy.
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


def member_probs(model_cfg: ModelConfig, params_list: Sequence[dict],
                 data, splits, split: str) -> np.ndarray:
    """Each member's softmax probs on one split, as a host ``(M, N, C)``
    array.  One jitted forward per member; everything downstream
    (ranking, blending, greedy selection) is then pure numpy."""
    model = MultimodalEmotionModel(model_cfg)
    idx = {"train": splits.train, "val": splits.val,
           "test": splits.test}[split]
    v = jnp.asarray(data.video[idx])
    a = jnp.asarray(data.audio[idx])
    m = jnp.asarray(data.pad_mask[idx])

    @jax.jit
    def probs_of(p):
        return model.apply({"params": p}, v, a, m)[0]

    return np.stack([np.asarray(probs_of(p)) for p in params_list])


def _macro_f1_np(labels: np.ndarray, preds: np.ndarray,
                 n_cls: int) -> float:
    cm = np.zeros((n_cls, n_cls), np.int64)
    np.add.at(cm, (labels, preds), 1)
    return prf_from_confusion(cm)["macro_f1"]


def greedy_select(val_probs: np.ndarray, val_labels: np.ndarray,
                  k_max: int, replace: bool = False) -> Dict:
    """Greedy forward ensemble selection (Caruana et al. 2004) on a
    selection split — test-blind when ``val_probs`` is the val split.

    Starting from the empty ensemble, each step adds the member whose
    inclusion maximizes the BLEND's macro-F1 on the selection split
    (ties break toward the lowest member index, so the result is
    deterministic).  ``replace=True`` allows re-picking a member
    (implicit integer weighting).  Returns the pick order, the val-F1
    path, and the prefix of picks at the path's maximum (``selected``)
    — choosing the stopping k by selection-split F1 stays test-blind.

    Contrast with the val-loss top-k rank used by ``probe_ensemble``:
    rank scores members INDIVIDUALLY; greedy scores the blend, so it
    can keep a mediocre-alone but complementary member.
    """
    m, _, n_cls = val_probs.shape
    if m < 1 or k_max < 1:
        raise ValueError(f"need ≥1 member and k_max ≥ 1, got m={m}, "
                         f"k_max={k_max}")
    val_labels = np.asarray(val_labels)
    order: List[int] = []
    path: List[float] = []
    cur = np.zeros_like(val_probs[0])
    avail = set(range(m))
    for _ in range(min(k_max, m) if not replace else k_max):
        cands = sorted(avail) if not replace else range(m)
        best_i, best_f1 = -1, -1.0
        for i in cands:
            f1 = _macro_f1_np(
                val_labels, np.argmax(cur + val_probs[i], axis=1), n_cls)
            if f1 > best_f1:
                best_i, best_f1 = i, f1
        order.append(best_i)
        path.append(round(best_f1, 6))
        cur = cur + val_probs[best_i]
        if not replace:
            avail.remove(best_i)
    k_best = int(np.argmax(path)) + 1
    return {"order": order, "val_f1_path": path,
            "k_best": k_best, "selected": order[:k_best]}


def greedy_ensemble_eval(model_cfg: ModelConfig,
                         params_list: Sequence[dict], data, splits,
                         k_max: int, replace: bool = False) -> Dict:
    """Greedy-select members on the VAL split, score the blend on TEST.

    The only device work is one forward per member per split; selection
    itself is host numpy over the cached ``(M, N, C)`` probs.
    """
    val_p = member_probs(model_cfg, params_list, data, splits, "val")
    test_p = member_probs(model_cfg, params_list, data, splits, "test")
    sel = greedy_select(val_p, data.labels[splits.val], k_max,
                        replace=replace)
    n_cls = val_p.shape[-1]
    blend = test_p[sel["selected"]].mean(axis=0)
    test_f1 = _macro_f1_np(np.asarray(data.labels[splits.test]),
                           np.argmax(blend, axis=1), n_cls)
    return {**sel, "test_macro_f1": round(float(test_f1), 6),
            "n_pool": len(params_list)}


def soup_params(params_list: Sequence[dict]) -> dict:
    """Uniform model soup (Wortsman et al. 2022): element-wise mean of
    the member parameter trees.  One model at 1/M serving cost IF the
    members are linearly mode-connected — independently-seeded runs
    are NOT (different random inits land in different basins).
    MEASURED (artifacts/probes/r4_distill.log): souping the winning
    recipe's 4 seed members scores 0.4798 test macro-F1 vs 0.7601 for
    any single member — a documented negative control next to
    distillation (scripts/probe_distill.py), not a recommended path."""
    if not params_list:
        raise ValueError("need at least one member to soup")
    return jax.tree_util.tree_map(
        lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *params_list)


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
