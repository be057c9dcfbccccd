"""ViViT extractor + fused attention kernel tests (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmer_tpu.config import ViViTConfig
from mmer_tpu.models.vivit import ViViTFeatureExtractor, init_vivit_params
from mmer_tpu.ops.flash_attention import flash_attention, reference_attention

TINY = ViViTConfig(image_size=(32, 32), patch_size=(16, 16), num_frames=8,
                   tubelet_size=4, dim=64, depth=2, heads=2, dim_head=32,
                   mlp_dim=128, compute_dtype="float32")


def test_flash_attention_matches_reference():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 3, 40, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, 40, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, 40, 64)), jnp.float32)
    got = flash_attention(q, k, v, interpret=True)
    want = reference_attention(q, k, v)
    assert got.shape == (2, 3, 40, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_attention_padding_is_masked():
    """S=40 pads to 128 internally; padded keys must get zero softmax mass,
    so results must be identical to an unpadded-size run."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 2, 128, 64)), jnp.float32)
    # Exact block multiple: no padding path.
    full = flash_attention(q, k, v, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(full), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_attention_head_groups_and_q_blocks():
    """Multi-head-group, multi-q-block grid (the production layout) must
    match the reference, including key-padding masking (S=40 → S_pad=128
    with block_q=64 → 2 q-blocks; H=4 with block_h=2 → 2 head groups)."""
    rng = np.random.default_rng(4)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 4, 40, 64)), jnp.float32)
               for _ in range(3))
    got = flash_attention(q, k, v, block_q=64, block_h=2, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pick_blocks_vmem_model():
    """The block picker must return dividing, VMEM-feasible blocks; at the
    ViViT production shape it picks the documented (416, 6)."""
    from mmer_tpu.ops.flash_attention import (_VMEM_BUDGET, _pick_blocks,
                                              _vmem_bytes)

    bq, bh = _pick_blocks(h=12, s_pad=1664, d=64, itemsize=2)
    assert (bq, bh) == (416, 6)
    assert 1664 % bq == 0 and 12 % bh == 0
    assert _vmem_bytes(bq, bh, 1664, 64, 2) <= _VMEM_BUDGET

    # Sweep odd shapes: blocks must always divide and fit.
    for h in (1, 2, 3, 8, 16):
        for s_pad in (128, 384, 1024, 4096, 8192):
            bq, bh = _pick_blocks(h, s_pad, 64, 2)
            assert s_pad % bq == 0 and h % bh == 0, (h, s_pad)
            assert _vmem_bytes(bq, bh, s_pad, 64, 2) <= _VMEM_BUDGET, \
                (h, s_pad, bq, bh)


def test_vivit_shapes_and_determinism():
    model, params = init_vivit_params(TINY, use_flash=False)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.random(size=(3, 8, 32, 32, 3)), jnp.float32)
    feats = model.apply(params, chunks)
    assert feats.shape == (3, TINY.dim)
    assert feats.dtype == jnp.float32

    # Same seed → same params → same features (the property the reference
    # LACKS across processes, video_extractor.py:184).
    _, params2 = init_vivit_params(TINY, use_flash=False)
    feats2 = model.apply(params2, chunks)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))


def test_vivit_flash_path_matches_xla_path():
    model_f, params = init_vivit_params(TINY, use_flash=True)
    model_x = ViViTFeatureExtractor(TINY, use_flash=False)
    rng = np.random.default_rng(2)
    chunks = jnp.asarray(rng.random(size=(2, 8, 32, 32, 3)), jnp.float32)
    a = model_f.apply(params, chunks)
    b = model_x.apply(params, chunks)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)


def test_vivit_batching_consistency():
    """Batched chunk processing (our fix for the reference's batch=1 loop,
    SURVEY.md §3.2) must agree with per-chunk processing."""
    model, params = init_vivit_params(TINY, use_flash=False)
    rng = np.random.default_rng(3)
    chunks = jnp.asarray(rng.random(size=(4, 8, 32, 32, 3)), jnp.float32)
    batched = np.asarray(model.apply(params, chunks))
    single = np.concatenate([
        np.asarray(model.apply(params, chunks[i:i + 1])) for i in range(4)])
    np.testing.assert_allclose(batched, single, atol=5e-3)


def test_tubelet_count():
    cfg = ViViTConfig()
    model = ViViTFeatureExtractor(cfg, use_flash=False)
    video = jnp.zeros((1, 32, 224, 224, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, video)
    # 8 temporal × 196 spatial + CLS = 1569 positions
    assert params["params"]["pos_embed"].shape == (1, 1569, 768)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_flash_attention_key_lens_masks_per_batch():
    """``key_lens`` must reproduce the Wav2Vec2 additive -1e9 key-bias
    semantics per batch element (models/wav2vec2.py EncoderLayer),
    including a zero-length element (uniform rows, no NaN)."""
    rng = np.random.default_rng(5)
    b, h, s, d = 3, 2, 40, 64
    q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    lens = jnp.asarray([40, 17, 0], jnp.int32)

    got = flash_attention(q, k, v, key_lens=lens, interpret=True)
    assert np.isfinite(np.asarray(got)).all()

    # Oracle: the XLA path with the same finite bias.
    key_idx = jnp.arange(s)[None, None, None, :]
    bias = jnp.where(key_idx < lens[:, None, None, None], 0.0, -1e9)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    want = jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    # Rows with at least one valid key must match the oracle tightly.
    np.testing.assert_allclose(np.asarray(got[:2]), np.asarray(want[:2]),
                               atol=1e-5, rtol=1e-5)
    # The zero-length element softmaxes to uniform.  The kernel's uniform
    # runs over its internally padded S (40→128 here, with zero-valued
    # pad keys), so it equals the oracle scaled by S/S_pad — the
    # documented, harmless divergence (those rows are dropped by the
    # length-masked pooling downstream).
    np.testing.assert_allclose(np.asarray(got[2]),
                               np.asarray(want[2]) * (40 / 128),
                               atol=1e-5, rtol=1e-5)
