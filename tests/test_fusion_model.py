"""Fusion model contract tests: shapes, masking semantics, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmer_tpu.config import ModelConfig
from mmer_tpu.models.fusion import MultimodalEmotionModel

CFG = ModelConfig(max_seq_len=6, compute_dtype="float32")


@pytest.fixture(scope="module")
def model_and_params():
    model = MultimodalEmotionModel(CFG)
    rng = jax.random.PRNGKey(0)
    video = jnp.zeros((2, 5, 768))
    audio = jnp.zeros((2, 1024))
    mask = jnp.zeros((2, 5), dtype=bool)
    params = model.init({"params": rng}, video, audio, mask)
    return model, params


def test_output_shapes_and_probs(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(3, 5, 768)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(3, 1024)), jnp.float32)
    mask = jnp.zeros((3, 5), dtype=bool)
    probs, logits, attn = model.apply(params, video, audio, mask)
    assert probs.shape == (3, 6) and logits.shape == (3, 6)
    assert attn is None
    np.testing.assert_allclose(np.sum(probs, axis=-1), 1.0, rtol=1e-5)


def test_padding_invariance(model_and_params):
    """Changing values at padded positions must not change the output —
    the core guarantee of the reference's key-padding mask + masked mean
    pooling (train2.py:163-189)."""
    model, params = model_and_params
    rng = np.random.default_rng(1)
    video = rng.normal(size=(2, 5, 768)).astype(np.float32)
    audio = rng.normal(size=(2, 1024)).astype(np.float32)
    lengths = np.array([3, 2])
    mask = np.arange(5)[None, :] >= lengths[:, None]

    _, logits_a, _ = model.apply(params, jnp.asarray(video),
                                 jnp.asarray(audio), jnp.asarray(mask))
    video_b = video.copy()
    video_b[0, 3:] = 999.0
    video_b[1, 2:] = -999.0
    _, logits_b, _ = model.apply(params, jnp.asarray(video_b),
                                 jnp.asarray(audio), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               atol=1e-4)


def test_same_padded_length_is_batch_consistent(model_and_params):
    """The audio token sits at position T_padded (after the video slots), so
    its positional embedding depends on the padded length — exactly the
    reference's semantics, where ``torch.cat([video, audio], dim=1)`` places
    audio after the batch-padded video tokens (train2.py:157,160).  Two
    samples padded to the same T must therefore be independent of what other
    samples share the batch."""
    model, params = model_and_params
    rng = np.random.default_rng(2)
    video = rng.normal(size=(2, 5, 768)).astype(np.float32)
    audio = rng.normal(size=(2, 1024)).astype(np.float32)
    lengths = np.array([3, 5])
    mask = np.arange(5)[None, :] >= lengths[:, None]

    _, logits_batch, _ = model.apply(
        params, jnp.asarray(video), jnp.asarray(audio), jnp.asarray(mask))
    _, logits_single, _ = model.apply(
        params, jnp.asarray(video[:1]), jnp.asarray(audio[:1]),
        jnp.asarray(mask[:1]))
    # Tolerance note: the math is exactly per-sample, but XLA picks different
    # fusion/vectorization for B=2 vs B=1, and the resulting float32
    # reassociation noise is amplified by the five LayerNorms in the path —
    # observed up to ~3e-3 absolute on single-CPU XLA.
    np.testing.assert_allclose(np.asarray(logits_batch[:1]),
                               np.asarray(logits_single), atol=2e-2)


def test_return_attn(model_and_params):
    model, params = model_and_params
    video = jnp.ones((2, 5, 768))
    audio = jnp.ones((2, 1024))
    mask = jnp.zeros((2, 5), dtype=bool)
    _, _, attn = model.apply(params, video, audio, mask, return_attn=True)
    assert attn.shape == (2, CFG.fusion_heads, 6, 6)
    np.testing.assert_allclose(np.sum(np.asarray(attn), axis=-1), 1.0,
                               rtol=1e-5)


def test_dropout_only_in_train_mode(model_and_params):
    model, params = model_and_params
    video = jnp.ones((2, 5, 768))
    audio = jnp.ones((2, 1024))
    mask = jnp.zeros((2, 5), dtype=bool)
    _, a, _ = model.apply(params, video, audio, mask)
    _, b, _ = model.apply(params, video, audio, mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    _, c, _ = model.apply(params, video, audio, mask, train=True,
                          rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(a), np.asarray(c))
