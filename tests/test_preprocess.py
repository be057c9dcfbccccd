"""Preprocessing pipeline tests: chunking, on-device crop/resize, end-to-end
video feature extraction on synthetic clips."""

import os
import wave as wave_mod

import numpy as np
import pytest

from mmer_tpu.config import ViViTConfig
from mmer_tpu.preprocess.audio import (_read_wav, audio_output_name,
                                       load_waveform, resample)
from mmer_tpu.preprocess.video import (feature_output_name, frames_to_chunks,
                                       iter_video_files, load_video_chunks)


def test_frames_to_chunks_pads_with_last_frame():
    frames = np.arange(5)[:, None, None, None] * np.ones((5, 4, 4, 3))
    chunks = frames_to_chunks(frames.astype(np.uint8), chunk_size=4)
    assert chunks.shape == (2, 4, 4, 4, 3)
    # Second chunk: frame 4 then three repeats of it (video_extractor.py:134-138
    # semantics, minus its channel-scrambling view() bug).
    np.testing.assert_allclose(chunks[1, 0], chunks[1, 3])
    np.testing.assert_allclose(chunks[1] * 255.0, 4.0 * np.ones((4, 4, 4, 3)))


def test_chunks_are_honestly_shaped():
    frames = (np.random.default_rng(0).random((7, 8, 8, 3)) * 255).astype(np.uint8)
    chunks = frames_to_chunks(frames, chunk_size=4)
    np.testing.assert_allclose(chunks[0, 2], frames[2] / 255.0, atol=1e-6)


@pytest.fixture(scope="module")
def synthetic_video_dir(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(0)
    paths = []
    for name, n_frames in (("a_faces.mp4", 9), ("b_faces.mp4", 4)):
        path = str(root / name)
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                            30.0, (32, 32))
        if not w.isOpened():
            pytest.skip("no mp4 encoder available")
        for _ in range(n_frames):
            w.write((rng.random((32, 32, 3)) * 255).astype(np.uint8))
        w.release()
        paths.append(path)
    return str(root), paths


def test_load_video_chunks(synthetic_video_dir):
    root, paths = synthetic_video_dir
    chunks = load_video_chunks(paths[0], chunk_size=8, size=(32, 32))
    assert chunks.shape == (2, 8, 32, 32, 3)
    assert chunks.dtype == np.float32
    assert 0.0 <= chunks.min() and chunks.max() <= 1.0
    assert sorted(os.path.basename(p)
                  for p in iter_video_files(root)) == ["a_faces.mp4",
                                                       "b_faces.mp4"]


def test_extract_video_folder_end_to_end(synthetic_video_dir, tmp_path):
    from mmer_tpu.preprocess.extract import (VideoFeatureExtractor,
                                             extract_video_folder)

    root, _ = synthetic_video_dir
    tiny = ViViTConfig(image_size=(32, 32), patch_size=(16, 16), num_frames=8,
                       tubelet_size=4, dim=768, depth=1, heads=2, dim_head=32,
                       mlp_dim=64, compute_dtype="float32")
    extractor = VideoFeatureExtractor(tiny, device_batch=2, use_flash=False)
    out_dir = str(tmp_path / "features")
    n = extract_video_folder(root, out_dir, extractor, chunk_size=8,
                             verbose=False)
    assert n == 2
    a = np.load(os.path.join(out_dir, "a_faces_mp4_features.npy"))
    b = np.load(os.path.join(out_dir, "b_faces_mp4_features.npy"))
    assert a.shape == (2, 768) and a.dtype == np.float32  # 9 frames → 2 chunks
    assert b.shape == (1, 768)                            # 4 frames → 1 chunk
    # Cross-video batching must not leak chunks between videos: re-embedding
    # video b alone gives the same row.
    solo = extractor.embed_chunks(load_video_chunks(
        os.path.join(root, "b_faces.mp4"), chunk_size=8, size=(32, 32)))
    np.testing.assert_allclose(b, solo, atol=1e-4)


def test_embed_cropped_frames_matches_split_path():
    """The fused on-device serve path (crop→chunk→embed without host
    round-trips) must reproduce the former split pipeline: host crop,
    uint8 quantize, frames_to_chunks, embed_chunks."""
    from mmer_tpu.ops.image import crop_resize_batch
    from mmer_tpu.preprocess.extract import VideoFeatureExtractor
    from mmer_tpu.preprocess.video import frames_to_chunks

    tiny = ViViTConfig(image_size=(32, 32), patch_size=(16, 16), num_frames=8,
                       tubelet_size=4, dim=64, depth=1, heads=2, dim_head=32,
                       mlp_dim=64, compute_dtype="float32")
    extractor = VideoFeatureExtractor(tiny, device_batch=2, use_flash=False)
    rng = np.random.default_rng(5)
    n, sub = 11, 4                      # pads 11 → 12 frames, 3 subchunks
    frames = (rng.random((n, 40, 52, 3)) * 255).astype(np.uint8)
    bboxes = np.stack([
        np.asarray([4 + i % 3, 2, 36 + i % 3, 38], np.float32)
        for i in range(n)])

    fused = extractor.embed_cropped_frames(frames, bboxes, sub)

    crops = np.asarray(crop_resize_batch(
        frames.astype(np.float32), bboxes, out_hw=(32, 32)))
    chunks = frames_to_chunks(np.clip(crops, 0, 255).astype(np.uint8), sub,
                              dtype="uint8")
    split = extractor.embed_chunks(chunks)

    assert fused.shape == (3, 64)
    np.testing.assert_allclose(fused, split, atol=1e-4)


def test_feature_output_name_matches_reference_contract():
    # video_extractor.py:173-174: path separators and dots → underscores.
    assert feature_output_name("/data/x/clip.flv", "/data") == \
        "x_clip_flv_features.npy"


def test_crop_resize_batch_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from mmer_tpu.ops.image import crop_resize_batch

    rng = np.random.default_rng(1)
    frames = (rng.random((2, 48, 64, 3)) * 255).astype(np.float32)
    bboxes = np.asarray([[8, 4, 40, 44], [0, 0, 64, 48]], np.float32)
    got = np.asarray(crop_resize_batch(frames, bboxes, out_hw=(16, 16)))
    for i in range(2):
        x1, y1, x2, y2 = bboxes[i].astype(int)
        want = cv2.resize(frames[i, y1:y2, x1:x2], (16, 16),
                          interpolation=cv2.INTER_LINEAR)
        assert np.mean(np.abs(got[i] - want)) < 2.0   # interp conventions differ at borders
        corr = np.corrcoef(got[i].ravel(), want.ravel())[0, 1]
        assert corr > 0.99


def test_wav_roundtrip_and_resample(tmp_path):
    sr = 8000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = str(tmp_path / "tone.wav")
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((tone * 32767).astype(np.int16).tobytes())

    wave = load_waveform(path, sample_rate=16000)
    assert wave is not None
    assert abs(len(wave) - 16000) <= 1   # resampled 8k → 16k
    # Spectral peak survives resampling.
    spec = np.abs(np.fft.rfft(wave))
    assert abs(np.argmax(spec) - 440) <= 2
