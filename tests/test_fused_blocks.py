"""Equivalence tests for the fused transformer-block Pallas kernels
(ops/fused_blocks.py) against the plain XLA modules, in interpret mode on
the CPU mesh.  float32 compute → tight tolerances (the kernels' only
numerical differences from the XLA path are f32-vs-compute-dtype points
that vanish at f32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmer_tpu.config import ViViTConfig
from mmer_tpu.models.vivit import ViViTFeatureExtractor
from mmer_tpu.ops.fused_blocks import fused_ffn, fused_ln_matmul

TINY = ViViTConfig(image_size=(32, 32), patch_size=(16, 16), num_frames=8,
                   tubelet_size=4, dim=64, depth=2, heads=2, dim_head=32,
                   mlp_dim=128, compute_dtype="float32")


def _ln_ref(x, scale, bias):
    import flax.linen as nn

    class LN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.LayerNorm(dtype=jnp.float32, name="ln")(x)

    params = {"params": {"ln": {"scale": scale, "bias": bias}}}
    return LN().apply(params, x)


def test_fused_ln_matmul_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 37, 64)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(64,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 192)) * 0.05, jnp.float32)

    want = _ln_ref(x, scale, bias) @ w
    got = fused_ln_matmul(x, scale, bias, w, interpret=True)
    assert got.shape == (2, 37, 192)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_fused_ffn_matches_xla():
    rng = np.random.default_rng(1)
    d, m = 64, 128
    x = jnp.asarray(rng.normal(size=(2, 37, d)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(d,)) * 0.1 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, m)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(m,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(m, d)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32)

    import flax.linen as nn
    y = _ln_ref(x, scale, bias)
    want = x + (nn.gelu(y @ w1 + b1, approximate=False) @ w2 + b2)
    got = fused_ffn(x, scale, bias, w1, b1, w2, b2, interpret=True)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_vivit_fused_blocks_match_module_path():
    """The full model with fused_blocks=True (Pallas sublayer kernels,
    interpret mode) must reproduce the plain module path — same params,
    same tree, same outputs."""
    from jax.experimental.pallas import tpu as pltpu

    model_plain = ViViTFeatureExtractor(TINY, use_flash=False,
                                        fused_blocks=False)
    model_fused = ViViTFeatureExtractor(TINY, use_flash=False,
                                        fused_blocks=True)
    rng = np.random.default_rng(2)
    video = jnp.asarray(rng.random((2, 8, 32, 32, 3)), jnp.float32)
    params = model_plain.init({"params": jax.random.PRNGKey(0)}, video)
    # Param creation is identical regardless of the flag.
    params_fused = model_fused.init({"params": jax.random.PRNGKey(0)}, video)
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), params, params_fused))
    assert chex_equal

    want = model_plain.apply(params, video)
    with pltpu.force_tpu_interpret_mode():
        got = model_fused.apply(params, video)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=5e-5)
