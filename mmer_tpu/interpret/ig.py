"""Integrated Gradients over (video, audio) inputs — pure JAX.

Capability parity with the reference's Captum-based interpretability
(reference train2.py:776-935; serving variant
back-end/app/libs/inference.py:268-352): zeros baseline, target = predicted
class, n_steps=50, per-feature attributions, abs-sum-over-time aggregation,
per-sample CSV + global-mean JSON artifacts with the same schema
(``video_importances_{ts}.csv`` with ``video_dim_i`` columns + ``label``,
``global_importances_{ts}.json`` with ``global_video``/``global_audio``
``dim_i`` maps).

TPU-first: Captum loops the model once per integration step; here ALL steps
fold into the batch dimension of ONE jitted forward+grad — n_steps× fewer
dispatches — and the quadrature weights land in a single weighted
reduction.  No ``ModelWrapper`` adapter is needed (train2.py:28-38): JAX
grads are functional.

Quadrature matches Captum's default ``gausslegendre`` method; Riemann
variants are available via ``method=``.

Also fixed (documented): the reference runs interpretation on the *final*
epoch's weights, not the saved best model (SURVEY.md §2.3 bug note) —
callers here pass whichever params they mean, and train/cli wires the best
params.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _quadrature(n_steps: int, method: str) -> Tuple[np.ndarray, np.ndarray]:
    """→ (alphas in (0,1], weights summing to 1)."""
    if method == "gausslegendre":
        nodes, weights = np.polynomial.legendre.leggauss(n_steps)
        return (nodes + 1.0) / 2.0, weights / 2.0
    if method == "riemann_right":
        return (np.arange(1, n_steps + 1) / n_steps,
                np.full(n_steps, 1.0 / n_steps))
    if method == "riemann_middle":
        return ((np.arange(n_steps) + 0.5) / n_steps,
                np.full(n_steps, 1.0 / n_steps))
    raise ValueError(f"unknown quadrature method {method}")


def integrated_gradients_impl(apply_fn: Callable, params, video: jnp.ndarray,
                              audio: jnp.ndarray, mask: Optional[jnp.ndarray],
                              targets: jnp.ndarray, n_steps: int = 50,
                              method: str = "gausslegendre"
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IG attributions wrt a zeros baseline (unjitted body — the serving
    engine AOT-caches a closure over it, core/aot.py).

    apply_fn(params, video, audio, mask) -> logits.  All integration steps
    run as one batched forward+backward: inputs are scaled to (S·B, ...).
    """
    alphas_np, weights_np = _quadrature(n_steps, method)
    alphas = jnp.asarray(alphas_np, jnp.float32)
    weights = jnp.asarray(weights_np, jnp.float32)

    b = video.shape[0]
    v_scaled = alphas[:, None, None, None] * video[None]      # (S, B, T, D)
    a_scaled = alphas[:, None, None] * audio[None]            # (S, B, A)
    v_flat = v_scaled.reshape((-1,) + video.shape[1:])
    a_flat = a_scaled.reshape((-1,) + audio.shape[1:])
    m_flat = None if mask is None else jnp.tile(mask, (n_steps, 1))
    t_flat = jnp.tile(targets, (n_steps,))

    def target_logit_sum(v, a):
        logits = apply_fn(params, v, a, m_flat)
        return jnp.sum(jnp.take_along_axis(
            logits, t_flat[:, None], axis=-1))

    gv, ga = jax.grad(target_logit_sum, argnums=(0, 1))(v_flat, a_flat)
    gv = gv.reshape((n_steps, b) + video.shape[1:])
    ga = ga.reshape((n_steps, b) + audio.shape[1:])
    avg_v = jnp.einsum("s,s...->...", weights, gv)
    avg_a = jnp.einsum("s,s...->...", weights, ga)
    return video * avg_v, audio * avg_a


integrated_gradients = partial(
    jax.jit, static_argnames=("apply_fn", "n_steps", "method")
)(integrated_gradients_impl)


def compute_attributions(apply_fn: Callable, params, video, audio,
                         mask=None, target=None, n_steps: int = 50,
                         method: str = "gausslegendre"):
    """Reference ``compute_attributions`` semantics (train2.py:776-840):
    target defaults to the predicted class."""
    video = jnp.asarray(video, jnp.float32)
    audio = jnp.asarray(audio, jnp.float32)
    mask = None if mask is None else jnp.asarray(mask)
    if target is None:
        logits = apply_fn(params, video, audio, mask)
        target = jnp.argmax(logits, axis=-1)
    target = jnp.asarray(target, jnp.int32)
    return integrated_gradients(apply_fn, params, video, audio, mask,
                                target, n_steps, method)


def aggregate_importances(attr_video, attr_audio, abs_sum: bool = True):
    """Video: |attr| summed over time → (B, 768); audio: |attr| → (B, 1024)
    (train2.py:840-864)."""
    attr_video = jnp.asarray(attr_video)
    attr_audio = jnp.asarray(attr_audio)
    if abs_sum:
        attr_video = jnp.abs(attr_video)
        attr_audio = jnp.abs(attr_audio)
    return jnp.sum(attr_video, axis=1), attr_audio


def interpret_test_set(apply_fn: Callable, params, data, test_idx,
                       output_dir: str = "training_runs_2",
                       batch_size: int = 256, n_steps: int = 50,
                       top_k: int = 10, verbose: bool = True,
                       timestamp: Optional[str] = None) -> dict:
    """Test-set importances with the reference's artifact schema
    (train2.py:866-935).  ``data`` is a dict with video/audio/pad_mask/labels
    arrays (host or device); ``test_idx`` indexes it."""
    os.makedirs(output_dir, exist_ok=True)
    ts = timestamp or datetime.now().strftime("%Y%m%d_%H%M%S")

    test_idx = np.asarray(test_idx)
    # One device→host transfer up front — inside the loop these would
    # re-ship the FULL arrays per batch (data may be device-resident).
    all_video = np.asarray(data["video"])
    all_audio = np.asarray(data["audio"])
    all_mask = np.asarray(data["pad_mask"])
    all_labels = np.asarray(data["labels"])
    v_imp_all, a_imp_all, labels_all = [], [], []
    for start in range(0, len(test_idx), batch_size):
        idx = test_idx[start:start + batch_size]
        video = all_video[idx]
        audio = all_audio[idx]
        mask = all_mask[idx]
        labels = all_labels[idx]
        av, aa = compute_attributions(apply_fn, params, video, audio, mask,
                                      n_steps=n_steps)
        vi, ai = aggregate_importances(av, aa)
        v_imp_all.append(np.asarray(vi))
        a_imp_all.append(np.asarray(ai))
        labels_all.append(labels)

    video_imp = np.concatenate(v_imp_all)
    audio_imp = np.concatenate(a_imp_all)
    labels = np.concatenate(labels_all)

    def write_csv(path, arr, prefix):
        cols = [f"{prefix}_dim_{i}" for i in range(arr.shape[1])] + ["label"]
        with open(path, "w") as f:
            f.write(",".join(cols) + "\n")
            for row, lab in zip(arr, labels):
                f.write(",".join(f"{v:.6g}" for v in row) + f",{int(lab)}\n")

    write_csv(os.path.join(output_dir, f"video_importances_{ts}.csv"),
              video_imp, "video")
    write_csv(os.path.join(output_dir, f"audio_importances_{ts}.csv"),
              audio_imp, "audio")

    gv = video_imp.mean(axis=0)
    ga = audio_imp.mean(axis=0)
    if verbose:
        for name, g in (("Video", gv), ("Audio", ga)):
            top = np.argsort(-g)[:top_k]
            print(f"Global Top-{top_k} {name} Feature Importances:")
            for i in top:
                print(f"  Dim {i}: {g[i]:.4f}")

    global_results = {
        "global_video": {f"dim_{i}": float(gv[i]) for i in range(len(gv))},
        "global_audio": {f"dim_{i}": float(ga[i]) for i in range(len(ga))},
    }
    json_path = os.path.join(output_dir, f"global_importances_{ts}.json")
    with open(json_path, "w") as f:
        json.dump(global_results, f, indent=4)
    if verbose:
        print(f"Global importances saved to {json_path}")
    return global_results
