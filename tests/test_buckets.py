"""Batch-dimension bucketing (core/buckets.py): the shape-set bound that
keeps serving's per-request jit/AOT compiles finite (review r3)."""

import numpy as np

from mmer_tpu.core.buckets import batch_bucket


def test_batch_bucket_values():
    assert [batch_bucket(n) for n in (1, 2, 3, 5, 8, 9, 64, 65, 127, 128)] \
        == [1, 2, 4, 8, 8, 16, 64, 128, 128, 128]
    # beyond the pow2 range: multiples of 128, padding < 128 rows
    assert batch_bucket(129) == 256
    assert batch_bucket(257) == 384
    assert batch_bucket(1000) == 1024


def test_batch_bucket_bounds_shape_family():
    # every batch size 1..500 maps into a small fixed set
    buckets = {batch_bucket(n) for n in range(1, 501)}
    assert buckets == {1, 2, 4, 8, 16, 32, 64, 128, 256, 384, 512}
    assert all(batch_bucket(n) >= n for n in range(1, 501))


def test_audio_embedder_batch_is_bucketed_and_sliced():
    """Padding rows must not leak into results: an odd batch equals its
    per-sample embeddings."""
    from mmer_tpu.config import Wav2Vec2Config
    from mmer_tpu.models.wav2vec2 import AudioEmbedder

    cfg = Wav2Vec2Config(
        hidden_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
        conv_dims=(16, 16), conv_strides=(5, 2), conv_kernels=(10, 3),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        compute_dtype="float32")
    emb = AudioEmbedder(cfg)
    rng = np.random.default_rng(0)
    waves = [rng.normal(size=(cfg.sample_rate // 2,)).astype(np.float32)
             for _ in range(3)]                    # bucket pads 3 -> 4
    batched = emb.embed_batch(waves)
    assert batched.shape == (3, cfg.hidden_dim)
    singles = np.stack([emb.embed_batch([w])[0] for w in waves])
    np.testing.assert_allclose(batched, singles, rtol=2e-5, atol=2e-5)
