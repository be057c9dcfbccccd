"""Equivalence tests for the fused Wav2Vec2 conv-encoder kernels
(ops/conv_pyramid.py) against the plain-XLA ``ConvFeatureEncoder``, in
interpret mode on the CPU mesh.  float32 compute → tight tolerances; a
bfloat16 case pins the production rounding points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmer_tpu.config import Wav2Vec2Config
from mmer_tpu.models.wav2vec2 import (ConvFeatureEncoder,
                                      feat_extract_output_length)
from mmer_tpu.ops.conv_pyramid import fused_conv_encoder, supports_config

# The real layer spec (full 512-wide stack) at a short waveform keeps the
# interpret-mode kernels fast while exercising every kernel variant
# (layer-0 patch GEMM, k=3 with the cross-block tap, k=2 pure GEMM).
F32 = Wav2Vec2Config(compute_dtype="float32")
BF16 = Wav2Vec2Config(compute_dtype="bfloat16")


def _params(cfg, seed=0):
    enc = ConvFeatureEncoder(cfg)
    dummy = jnp.zeros((1, 1600), jnp.float32)
    return enc.init({"params": jax.random.PRNGKey(seed)}, dummy)


@pytest.mark.parametrize("mega", [False, True])
@pytest.mark.parametrize("length", [1600, 1923, 16000])
def test_matches_xla_f32(length, mega):
    """Odd and even conv-output lengths at every layer boundary — the
    cross-block tap (per-layer mode), tile-edge overlap (mega mode, the
    16 000 case spans multiple tiles) and the even-padding logic all get
    exercised."""
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(2, length)), jnp.float32)
    params = _params(F32)

    want = ConvFeatureEncoder(F32).apply(params, wave)
    got = fused_conv_encoder(wave, params["params"], F32, interpret=True,
                             mega=mega)
    t = feat_extract_output_length(F32, length)
    assert got.shape == (2, t, F32.conv_dims[-1]) == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("mega", [False, True])
def test_matches_xla_bf16(mega):
    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.normal(size=(2, 1600)), jnp.float32)
    params = _params(BF16)

    want = ConvFeatureEncoder(BF16).apply(params, wave)
    got = fused_conv_encoder(wave, params["params"], BF16, interpret=True,
                             mega=mega)
    assert got.dtype == jnp.bfloat16 == want.dtype
    assert got.shape == want.shape
    # bf16 rounding points mirror the XLA path op-for-op; remaining
    # differences are f32-accumulation order inside the GEMMs.
    diff = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    assert float(diff.max()) <= 0.06, float(diff.max())
    assert float(diff.mean()) <= 5e-3, float(diff.mean())


def test_module_routing_matches():
    """ConvFeatureEncoder(use_pyramid=True) routes through the kernels and
    reproduces the plain module path with the same param tree."""
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(2)
    wave = jnp.asarray(rng.normal(size=(1, 1680)), jnp.float32)
    params = _params(F32)
    params_pyr = ConvFeatureEncoder(F32, use_pyramid=True).init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 1600), jnp.float32))
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), params, params_pyr))

    want = ConvFeatureEncoder(F32).apply(params, wave)
    with pltpu.force_tpu_interpret_mode():
        got = ConvFeatureEncoder(F32, use_pyramid=True).apply(params, wave)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_supports_config_gate():
    assert supports_config(F32)
    bad = Wav2Vec2Config(conv_kernels=(10, 4, 3, 3, 3, 2, 2))
    assert not supports_config(bad)
    with pytest.raises(ValueError, match="unsupported conv stack"):
        fused_conv_encoder(jnp.zeros((1, 1600), jnp.float32),
                           _params(F32)["params"], bad, interpret=True)
