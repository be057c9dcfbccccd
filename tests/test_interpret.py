"""Integrated Gradients: completeness axiom, linear-model exactness,
artifact schema."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ModelConfig
from mmer_tpu.interpret import (aggregate_importances, compute_attributions,
                                integrated_gradients, interpret_test_set)
from mmer_tpu.models.fusion import MultimodalEmotionModel

CFG = ModelConfig(max_seq_len=4, fusion_layers=1, compute_dtype="float32")


def _model_and_apply():
    model = MultimodalEmotionModel(CFG)
    video = jnp.zeros((2, 3, 768))
    audio = jnp.zeros((2, 1024))
    mask = jnp.zeros((2, 3), dtype=bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, video, audio, mask)

    def apply_fn(p, v, a, m):
        _, logits, _ = model.apply(p, v, a, m)
        return logits

    return params, apply_fn


def test_linear_model_is_exact():
    """For f(v, a) = <wv, v> + <wa, a>, IG attributions are exactly the
    elementwise products regardless of quadrature."""
    rng = np.random.default_rng(0)
    wv = jnp.asarray(rng.normal(size=(3, 5)), jnp.float32)
    wa = jnp.asarray(rng.normal(size=(7,)), jnp.float32)

    def apply_fn(params, video, audio, mask):
        score = jnp.einsum("btd,td->b", video, wv) + audio @ wa
        return jnp.stack([score, -score], axis=-1)

    video = jnp.asarray(rng.normal(size=(4, 3, 5)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(4, 7)), jnp.float32)
    targets = jnp.zeros((4,), jnp.int32)
    av, aa = integrated_gradients(apply_fn, None, video, audio, None,
                                  targets, n_steps=8)
    np.testing.assert_allclose(np.asarray(av), np.asarray(video * wv[None]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(aa), np.asarray(audio * wa[None]),
                               rtol=1e-4, atol=1e-5)


def test_completeness_axiom():
    """Σ attributions ≈ f(x) - f(baseline) for a norm-free fusion model.

    Note: with LayerNorm enabled this axiom legitimately fails at a zeros
    baseline — LN is scale-invariant, so f(α·x) does not approach f(0) as
    α→0 and the straight-line path integral excludes the jump at α=0.
    Captum's IG has the same gap on this model; the axiom is therefore
    checked on the ``norm="none"`` variant where f is continuous."""
    cfg = ModelConfig(max_seq_len=4, fusion_layers=1, norm="none",
                      compute_dtype="float32")
    model = MultimodalEmotionModel(cfg)
    video0 = jnp.zeros((2, 3, 768))
    audio0 = jnp.zeros((2, 1024))
    mask = jnp.zeros((2, 3), dtype=bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, video0, audio0,
                        mask)

    def apply_fn(p, v, a, m):
        _, logits, _ = model.apply(p, v, a, m)
        return logits

    rng = np.random.default_rng(1)
    video = jnp.asarray(rng.normal(size=(2, 3, 768)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(2, 1024)), jnp.float32)
    mask = jnp.zeros((2, 3), dtype=bool)

    logits_x = apply_fn(params, video, audio, mask)
    targets = jnp.argmax(logits_x, axis=-1)
    logits_0 = apply_fn(params, jnp.zeros_like(video),
                        jnp.zeros_like(audio), mask)

    av, aa = integrated_gradients(apply_fn, params, video, audio, mask,
                                  targets, n_steps=128)
    total = np.asarray(av).sum(axis=(1, 2)) + np.asarray(aa).sum(axis=1)
    want = np.asarray(
        jnp.take_along_axis(logits_x - logits_0, targets[:, None], -1))[:, 0]
    np.testing.assert_allclose(total, want, rtol=0.05, atol=0.02)


def test_default_target_is_prediction_and_aggregation_shapes():
    params, apply_fn = _model_and_apply()
    rng = np.random.default_rng(2)
    video = rng.normal(size=(3, 3, 768)).astype(np.float32)
    audio = rng.normal(size=(3, 1024)).astype(np.float32)
    mask = np.zeros((3, 3), dtype=bool)
    av, aa = compute_attributions(apply_fn, params, video, audio, mask,
                                  n_steps=4)
    vi, ai = aggregate_importances(av, aa)
    assert vi.shape == (3, 768) and ai.shape == (3, 1024)
    assert np.all(np.asarray(vi) >= 0) and np.all(np.asarray(ai) >= 0)


def test_interpret_test_set_artifacts(tmp_path):
    params, apply_fn = _model_and_apply()
    rng = np.random.default_rng(3)
    n = 5
    data = {
        "video": rng.normal(size=(n, 3, 768)).astype(np.float32),
        "audio": rng.normal(size=(n, 1024)).astype(np.float32),
        "pad_mask": np.zeros((n, 3), dtype=bool),
        "labels": rng.integers(0, 6, size=(n,)).astype(np.int32),
    }
    out = str(tmp_path)
    res = interpret_test_set(apply_fn, params, data, np.arange(n),
                             output_dir=out, n_steps=4, verbose=False,
                             timestamp="test")
    # Reference artifact schema (train2.py:900-935).
    assert set(res) == {"global_video", "global_audio"}
    assert len(res["global_video"]) == 768
    gj = json.load(open(os.path.join(out, "global_importances_test.json")))
    assert gj["global_audio"]["dim_0"] == res["global_audio"]["dim_0"]
    header = open(os.path.join(out, "video_importances_test.csv")).readline()
    cols = header.strip().split(",")
    assert cols[0] == "video_dim_0" and cols[-1] == "label"
    assert len(cols) == 769
