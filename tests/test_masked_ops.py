"""Direct tests for the mask primitives underpinning the fusion model."""

import jax.numpy as jnp
import numpy as np

from mmer_tpu.ops.masked_ops import (attention_bias_from_pad_mask,
                                     masked_mean_pool)


def test_masked_mean_pool_ignores_padding():
    x = jnp.asarray([[[1.0, 2.0], [3.0, 4.0], [100.0, 100.0]]])
    mask = jnp.asarray([[False, False, True]])
    np.testing.assert_allclose(np.asarray(masked_mean_pool(x, mask)),
                               [[2.0, 3.0]])
    # no mask = plain mean
    np.testing.assert_allclose(np.asarray(masked_mean_pool(x, None)),
                               np.asarray(x).mean(axis=1), rtol=1e-6)


def test_masked_mean_pool_all_padded_is_finite():
    x = jnp.ones((1, 2, 3))
    mask = jnp.ones((1, 2), bool)
    out = np.asarray(masked_mean_pool(x, mask))
    assert np.isfinite(out).all()


def test_attention_bias_shape_and_values():
    mask = jnp.asarray([[False, True]])
    bias = attention_bias_from_pad_mask(mask)
    assert bias.shape == (1, 1, 1, 2)
    b = np.asarray(bias)
    assert b[0, 0, 0, 0] == 0.0 and b[0, 0, 0, 1] < -1e30
    assert attention_bias_from_pad_mask(None) is None


def test_bias_zeroes_softmax_mass():
    mask = jnp.asarray([[False, False, True]])
    bias = attention_bias_from_pad_mask(mask)
    scores = jnp.zeros((1, 1, 1, 3)) + bias
    probs = np.asarray(jnp.exp(scores) / jnp.sum(jnp.exp(scores), -1,
                                                 keepdims=True))
    np.testing.assert_allclose(probs[0, 0, 0], [0.5, 0.5, 0.0], atol=1e-7)
