"""Data-pipeline tests: normalization, padding, splits, class weights."""

import os

import numpy as np
import pytest

from mmer_tpu.config import DataConfig
from mmer_tpu.data.pipeline import (
    balanced_class_weights, load_dataset, normalize_global, pad_videos,
    stratified_splits)


def test_normalize_global_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    videos = [rng.normal(size=(t, 8)).astype(np.float32) for t in (2, 3, 5)]
    audios = rng.normal(size=(3, 4)).astype(np.float32)
    out_v, out_a, stats = normalize_global(videos, audios)

    tv = [torch.tensor(v) for v in videos]
    ta = torch.tensor(audios)
    all_video = torch.cat(tv, dim=0)
    v_mean, v_std = all_video.mean(dim=0), all_video.std(dim=0) + 1e-6
    a_mean, a_std = ta.mean(dim=0), ta.std(dim=0) + 1e-6
    for ours, theirs in zip(out_v, tv):
        np.testing.assert_allclose(
            ours, ((theirs - v_mean) / v_std).numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        out_a, ((ta - a_mean) / a_std).numpy(), rtol=1e-4, atol=1e-5)


def test_pad_videos_mask_convention():
    videos = [np.ones((2, 4), np.float32), np.ones((5, 4), np.float32)]
    padded, mask, lengths = pad_videos(videos)
    assert padded.shape == (2, 5, 4)
    assert list(lengths) == [2, 5]
    # True = padded (reference collate_fn convention, train2.py:439-441)
    assert mask[0].tolist() == [False, False, True, True, True]
    assert mask[1].tolist() == [False] * 5
    assert np.all(padded[0, 2:] == 0.0)


def test_stratified_splits_80_10_10():
    labels = np.repeat(np.arange(6), 100)
    tr, va, te = stratified_splits(labels, seed=42)
    assert len(tr) == 480 and len(va) == 60 and len(te) == 60
    assert set(tr) | set(va) | set(te) == set(range(600))
    for split in (tr, va, te):
        counts = np.bincount(labels[split], minlength=6)
        assert counts.min() == counts.max()  # perfectly stratified here


def test_splits_match_sklearn_reference_exactly():
    """Same two-stage split as reference train2.py:400-413."""
    from sklearn.model_selection import train_test_split
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 6, size=500)
    tr, va, te = stratified_splits(labels, seed=42)
    idx = list(range(500))
    rtr, rtemp = train_test_split(idx, test_size=0.2, random_state=42,
                                  stratify=labels)
    rva, rte = train_test_split(rtemp, test_size=0.5, random_state=42,
                                stratify=[labels[i] for i in rtemp])
    assert list(tr) == list(rtr) and list(va) == list(rva) and list(te) == list(rte)


def test_class_weights_balanced_with_boost():
    from sklearn.utils.class_weight import compute_class_weight
    labels = np.array([0] * 50 + [1] * 100 + [2] * 100 + [3] * 100 +
                      [4] * 100 + [5] * 100)
    ours = balanced_class_weights(labels)
    ref = compute_class_weight("balanced", classes=np.arange(6), y=labels)
    ref[4] *= 1.2
    ref[5] *= 1.2
    np.testing.assert_allclose(ours, ref.astype(np.float32), rtol=1e-6)


def test_load_dataset_end_to_end(synthetic_feature_dirs):
    vdir, adir = synthetic_feature_dirs
    cfg = DataConfig(video_feat_dir=vdir, audio_feat_dir=adir, batch_size=8)
    data, splits = load_dataset(cfg)
    n = data.num_samples
    assert n == 78
    assert data.video.shape == (n, data.max_chunks, 768)
    assert data.audio.shape == (n, 1024)
    assert data.pad_mask.shape == (n, data.max_chunks)
    assert data.labels.shape == (n,)
    assert len(splits.train) + len(splits.val) + len(splits.test) == n
    assert splits.class_weights.shape == (6,)
    # padded positions are zero and masked
    for i in range(n):
        t = data.lengths[i]
        assert np.all(data.video[i, t:] == 0.0)
        assert np.all(data.pad_mask[i, t:])
        assert not np.any(data.pad_mask[i, :t])


def test_extract_dataset_arrays_matches_disk_path(tmp_path):
    """The HBM-resident extract→train path (extract_dataset_arrays) must
    produce the SAME DatasetArrays/DataSplits as extract→.npy→load_dataset
    — including the audio float16 quantization the npy contract imposes
    (reference voice_extractor.py:95)."""
    import wave as wave_mod

    import cv2

    from mmer_tpu.config import ViViTConfig, Wav2Vec2Config
    from mmer_tpu.preprocess.extract import (VideoFeatureExtractor,
                                             extract_audio_folder,
                                             extract_dataset_arrays,
                                             extract_video_folder)

    emotions = ["NEU", "HAP", "SAD", "ANG", "FEA", "DIS"]
    vdir, adir = str(tmp_path / "videos"), str(tmp_path / "audio")
    os.makedirs(vdir)
    os.makedirs(adir)
    rng = np.random.default_rng(0)
    sr = 16000
    for actor in range(1001, 1011):
        for emo in emotions:
            key = f"{actor}_IEO_{emo}_XX"
            w = cv2.VideoWriter(os.path.join(vdir, f"{key}_faces.mp4"),
                                cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                                (32, 32))
            for _ in range(8):
                w.write(rng.integers(0, 255, (32, 32, 3), np.uint8))
            w.release()
            tone = (0.3 * np.sin(2 * np.pi * (200 + 50 * emotions.index(emo))
                                 * np.arange(4800) / sr)).astype(np.float32)
            with wave_mod.open(os.path.join(adir, f"{key}.wav"), "wb") as f:
                f.setnchannels(1)
                f.setsampwidth(2)
                f.setframerate(sr)
                f.writeframes((tone * 32767).astype(np.int16).tobytes())

    tiny_v = ViViTConfig(image_size=(32, 32), patch_size=(16, 16),
                         num_frames=8, tubelet_size=4, dim=768, depth=1,
                         heads=2, dim_head=32, mlp_dim=64,
                         compute_dtype="float32")
    tiny_a = Wav2Vec2Config(hidden_dim=1024, num_layers=1, num_heads=2,
                            ffn_dim=64, conv_dims=(16, 16),
                            conv_strides=(5, 2), conv_kernels=(10, 3),
                            num_conv_pos_embeddings=16,
                            num_conv_pos_embedding_groups=4,
                            compute_dtype="float32")
    ex = VideoFeatureExtractor(tiny_v, device_batch=4, use_flash=False)

    # Disk route: extract → npy artifacts → load_dataset.
    vfeat, afeat = str(tmp_path / "vfeat"), str(tmp_path / "afeat")
    extract_video_folder(vdir, vfeat, ex, chunk_size=8, verbose=False)
    extract_audio_folder(adir, afeat, tiny_a, batch_size=8, verbose=False)
    disk, disk_splits = load_dataset(
        DataConfig(video_feat_dir=vfeat, audio_feat_dir=afeat))

    # HBM route: same extractor/config, same audio batching.
    mem, mem_splits = extract_dataset_arrays(
        vdir, adir, video_extractor=ex, audio_cfg=tiny_a, audio_batch=8,
        chunk_size=8, verbose=False)

    assert mem.keys == disk.keys
    np.testing.assert_array_equal(mem.labels, disk.labels)
    np.testing.assert_allclose(mem.audio, disk.audio, atol=1e-6)
    np.testing.assert_allclose(mem.video, disk.video, atol=1e-5)
    np.testing.assert_array_equal(mem.pad_mask, disk.pad_mask)
    np.testing.assert_array_equal(mem_splits.train, disk_splits.train)
    np.testing.assert_array_equal(mem_splits.test, disk_splits.test)
    np.testing.assert_allclose(mem_splits.class_weights,
                               disk_splits.class_weights)


def test_pad_videos_caller_cap_clamps_lengths():
    """A caller-passed max_chunks truncates clips; lengths must describe
    the PADDED array, not the pre-truncation clip (review r3)."""
    videos = [np.ones((2, 4), np.float32), np.ones((5, 4), np.float32)]
    padded, mask, lengths = pad_videos(videos, max_chunks=3)
    assert padded.shape == (2, 3, 4)
    assert list(lengths) == [2, 3]
    assert mask[0].tolist() == [False, False, True]
    assert mask[1].tolist() == [False, False, False]
    # and a cap ABOVE the longest clip widens the padding
    padded, _, lengths = pad_videos(videos[:1], max_chunks=6)
    assert padded.shape == (1, 6, 4)
    assert list(lengths) == [2]


def test_oversample_neutral_derives_majority_from_data():
    """With no explicit target the NEU class is raised to THIS dataset's
    majority count — the reference hardcodes its own dataset's 1170
    (train.py:199-211 'From your counter'), which would explode a small
    dataset's NEU class 200x (review r3)."""
    from mmer_tpu.data.pipeline import oversample_neutral
    labels = np.array([0] * 5 + [1] * 40 + [2] * 30)
    out = oversample_neutral(np.arange(len(labels)), labels)
    counts = np.bincount(labels[out])
    assert counts[0] == 40           # the data's majority, not 1170
    assert counts[1] == 40 and counts[2] == 30
    # explicit target keeps the bit-level v1 replica available
    out_ref = oversample_neutral(np.arange(len(labels)), labels,
                                 target_count=10)
    assert np.bincount(labels[out_ref])[0] == 10


def test_dataset_max_chunks_is_the_padded_width(synthetic_feature_dirs):
    """DatasetArrays.max_chunks must equal video.shape[1] even when a
    caller cap truncates or widens — downstream ModelConfig.max_seq_len =
    max_chunks + 1 must match the real data width (review r3)."""
    vdir, adir = synthetic_feature_dirs
    cfg = DataConfig(video_feat_dir=vdir, audio_feat_dir=adir, batch_size=8)
    base, _ = load_dataset(cfg)
    for cap in (base.max_chunks + 2, max(1, base.max_chunks - 1)):
        data, _ = load_dataset(cfg, max_chunks=cap)
        assert data.video.shape[1] == cap
        assert data.max_chunks == cap
        assert data.pad_mask.shape[1] == cap
        assert int(data.lengths.max()) <= cap
