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


def test_resolution_bucket_bounds_family():
    """Every upload resolution maps into the finite ladder family
    (VERDICT r4 #3): no raw (h, w) reaches the crop graph."""
    from mmer_tpu.core.buckets import RESOLUTION_LADDER, resolution_bucket

    seen = set()
    for h in range(1, 2200, 37):
        for w in range(1, 2200, 41):
            (ch, cw), scale = resolution_bucket(h, w)
            assert ch in RESOLUTION_LADDER and cw in RESOLUTION_LADDER
            assert 0 < scale <= 1.0
            # after the downscale, the frame fits inside the bucket
            assert round(h * scale) <= ch + 1 and round(w * scale) <= cw + 1
            seen.add((ch, cw))
    assert len(seen) <= len(RESOLUTION_LADDER) ** 2

    # common camera formats pad, never downscale
    for h, w in [(480, 640), (720, 1280), (1080, 1920), (300, 256),
                 (640, 480), (1920, 1080)]:
        (ch, cw), scale = resolution_bucket(h, w)
        assert scale == 1.0 and ch >= h and cw >= w

    # beyond the top rung → downscaled to fit
    (ch, cw), scale = resolution_bucket(2160, 3840)
    assert scale == 0.5 and (ch, cw) == (1280, 1920)


def test_canonicalize_frame_keeps_crops_bit_identical():
    """Edge-replication padding must leave device crops EXACTLY equal for
    in-bounds bboxes — the property that makes canonicalization free."""
    from mmer_tpu.ops.image import crop_resize_batch
    from mmer_tpu.serve.engine import canonicalize_frame

    rng = np.random.default_rng(1)
    rgb = (rng.random((48, 40, 3)) * 255).astype(np.uint8)
    # include a bbox touching the original right/bottom boundary — the
    # case where zero-padding WOULD have bled black into the crop edge
    for bbox in ([4.0, 6.0, 36.0, 44.0], [10.0, 10.0, 40.0, 48.0]):
        bb = np.asarray([bbox], np.float32)
        want = np.asarray(crop_resize_batch(rgb[None], bb, (16, 16)))
        crgb, cbb = canonicalize_frame(rgb, bb)
        assert crgb.shape == (160, 160, 3)          # ladder floor
        np.testing.assert_array_equal(cbb, bb)      # no downscale → same box
        got = np.asarray(crop_resize_batch(crgb[None], cbb, (16, 16)))
        np.testing.assert_array_equal(got, want)


def test_canonicalize_frame_downscales_oversized():
    from mmer_tpu.serve.engine import canonicalize_frame

    try:
        import cv2  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("cv2 required for the downscale branch")
    rgb = np.zeros((2160, 3840, 3), np.uint8)
    bb = np.asarray([[100.0, 200.0, 1000.0, 2000.0]], np.float32)
    crgb, cbb = canonicalize_frame(rgb, bb)
    assert crgb.shape == (1280, 1920, 3)
    np.testing.assert_allclose(cbb, bb * 0.5)


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
