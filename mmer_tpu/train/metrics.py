"""Classification metrics computed from an on-device confusion matrix.

The reference syncs every prediction to host and calls sklearn **twice per
epoch on the full val and test sets** (train2.py:636-677) — a GPU→CPU sync
per epoch.  Here the jitted eval accumulates a (C, C) confusion matrix on
device; only those C² scalars cross to host, and macro/micro P/R/F1 are
derived from the matrix (validated against sklearn in tests/test_metrics.py).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def confusion_matrix(labels: jnp.ndarray, preds: jnp.ndarray,
                     num_classes: int,
                     sample_weight: jnp.ndarray | None = None) -> jnp.ndarray:
    """(C, C) confusion matrix, rows = true, cols = predicted.

    Implemented as a one-hot matmul so it lowers to an MXU-friendly
    contraction instead of scatter-adds.
    """
    oh_true = jnp.asarray(labels[:, None] == jnp.arange(num_classes)[None, :],
                          jnp.float32)
    oh_pred = jnp.asarray(preds[:, None] == jnp.arange(num_classes)[None, :],
                          jnp.float32)
    if sample_weight is not None:
        oh_true = oh_true * sample_weight[:, None]
    return jnp.einsum("nc,nd->cd", oh_true, oh_pred,
                      preferred_element_type=jnp.float32)


def accuracy_from_confusion(cm: np.ndarray) -> float:
    total = cm.sum()
    return float(np.trace(cm) / total) if total > 0 else 0.0


def _safe_div(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # zero_division=0 semantics (reference passes zero_division=0 to sklearn)
    out = np.zeros_like(a, dtype=np.float64)
    nz = b != 0
    out[nz] = a[nz] / b[nz]
    return out


def prf_from_confusion(cm: np.ndarray) -> Dict[str, float]:
    """Macro and micro precision/recall/F1 from a confusion matrix —
    the same numbers sklearn's ``precision_recall_fscore_support`` returns
    for average='macro'/'micro' with zero_division=0."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    pred_pos = cm.sum(axis=0)
    true_pos = cm.sum(axis=1)

    prec = _safe_div(tp, pred_pos)
    rec = _safe_div(tp, true_pos)
    f1 = _safe_div(2 * prec * rec, prec + rec)

    micro_p = micro_r = micro_f = (
        float(tp.sum() / cm.sum()) if cm.sum() > 0 else 0.0)
    return {
        "macro_precision": float(prec.mean()),
        "macro_recall": float(rec.mean()),
        "macro_f1": float(f1.mean()),
        "micro_precision": micro_p,
        "micro_recall": micro_r,
        "micro_f1": micro_f,
    }
