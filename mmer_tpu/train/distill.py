"""Ensemble distillation: compress a seed/recipe ensemble into ONE
fusion model for single-model serving cost.

The measured quality ladder (README "Beating the reference's headline")
tops out with mean-probability ensembles in a 0.760–0.768 test macro-F1
band, but serving an ensemble runs M forward passes (one vmapped
program, serve/engine.py ``--fusion_params a,b``).  Distillation
(Hinton et al. 2015) trains a single student against the ensemble's
TRAIN-split probabilities so the deployment model keeps the blend's
decision boundary at 1/M the serving FLOPs.  No reference counterpart —
the reference's 16-run sweep (train2.py:941-994) only ever reports
single models.

Honest-evaluation discipline matches the rest of the quality table:
teacher member selection and the student's best-epoch selection both
use the VAL split only (loss); the teacher's soft targets are consumed
on TRAIN rows only (the trainer gathers ``soft_targets`` exclusively at
train indices — val/test rows are present for row alignment but never
read).

MEASURED (v5e-1, artifacts/probes/r4_distill.{log,json}): the single
student of the pooled top-8-of-16 teacher (itself 0.7677 test macro-F1)
reaches 0.7680±0.005 best-epoch / 0.7581±0.005 val-selected at
alpha=0.5 T=1 (4 seeds, winning recipe) vs 0.7601/0.7496 for the plain
single model — ensemble-band quality at 1/8 the serving FLOPs.  T=2
and alpha∈{0.8, 1.0} all measured worse (0.7606–0.7641 best-epoch);
alpha=0.5 T=1 is the recipe.

Run: python scripts/probe_distill.py  (pool → teacher → student grid)
CLI: python -m mmer_tpu.train.cli --fused --distill_from a.msgpack,b...
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ModelConfig
from mmer_tpu.models.fusion import MultimodalEmotionModel


def teacher_soft_targets(model_cfg: ModelConfig,
                         params_list: Sequence[dict], data,
                         batch: int = 512) -> np.ndarray:
    """Mean softmax probabilities of ``params_list`` over the FULL
    dataset, as a host ``(N, C)`` float32 array row-aligned with
    ``data`` — the ``soft_targets`` input of the fused trainer.

    Batched so the member forwards stay fixed-shape (padded tail batch,
    discarded rows) regardless of dataset size; probability averaging
    (not logits) matches how serving blends members (train/ensemble.py).
    """
    if not params_list:
        raise ValueError("need at least one teacher member")
    model = MultimodalEmotionModel(model_cfg)
    n = int(data.labels.shape[0])
    steps = -(-n // batch)

    v = np.asarray(data.video)
    a = np.asarray(data.audio)
    m = np.asarray(data.pad_mask)

    @jax.jit
    def probs_of(p, vb, ab, mb):
        return model.apply({"params": p}, vb, ab, mb)[0]

    total = np.zeros((n, model_cfg.num_classes), np.float32)

    for p in params_list:
        pj = jax.tree_util.tree_map(jnp.asarray, p)
        for s in range(steps):
            lo, hi = s * batch, min((s + 1) * batch, n)
            sl = slice(lo, lo + batch) if hi - lo == batch else None
            if sl is not None:
                vb, ab, mb = v[sl], a[sl], m[sl]
            else:  # padded tail: repeat the last row, discard after
                reps = batch - (hi - lo)
                vb = np.concatenate([v[lo:hi], np.repeat(v[-1:], reps, 0)])
                ab = np.concatenate([a[lo:hi], np.repeat(a[-1:], reps, 0)])
                mb = np.concatenate([m[lo:hi], np.repeat(m[-1:], reps, 0)])
            out = np.asarray(probs_of(pj, jnp.asarray(vb), jnp.asarray(ab),
                                      jnp.asarray(mb)))
            total[lo:hi] += out[:hi - lo]
    return total / len(params_list)
