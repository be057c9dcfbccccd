"""Test configuration: emulate an 8-device TPU mesh on CPU.

Must set XLA flags before the first jax import — the TPU-native analog of
"test multi-node without a cluster" (SURVEY.md §4).
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the (single,
# serialized) TPU tunnel; tests must run on the virtual 8-device CPU mesh.
# The heavy lifting (re-exec with a scrubbed env when the tunnel's
# sitecustomize got there first) happens in tests/force_cpu.py, loaded as an
# early ``-p`` plugin via pyproject addopts.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: this box has ONE host CPU, so every XLA
# compile is ~1-10s; caching across test runs turns the suite from ~10min
# cold to seconds warm.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE_DIR)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


REFERENCE_VIDEO_DIR = "/root/reference/video_features"
REFERENCE_AUDIO_DIR = "/root/reference/audio_features"


def has_reference_features() -> bool:
    return os.path.isdir(REFERENCE_VIDEO_DIR) and os.path.isdir(REFERENCE_AUDIO_DIR)


requires_reference_data = pytest.mark.skipif(
    not has_reference_features(), reason="reference feature artifacts not present")


def make_tiny_dataset(seed: int = 0, n: int = 96, t: int = 3,
                      separable: bool = False):
    """In-memory (DatasetArrays, DataSplits) pair for trainer tests.

    ``separable=True`` plants a label-proportional signal in feature dim 0
    of both modalities so losses actually move.
    """
    from mmer_tpu.data.pipeline import (DataSplits, DatasetArrays,
                                        balanced_class_weights,
                                        stratified_splits)

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 6, size=(n,)).astype(np.int32)
    lengths = rng.integers(1, t + 1, size=(n,)).astype(np.int32)
    video = rng.normal(size=(n, t, 768)).astype(np.float32)
    audio = rng.normal(size=(n, 1024)).astype(np.float32)
    if separable:
        video[:, :, 0] += labels[:, None] * 2.0
        audio[:, 0] += labels * 2.0
    data = DatasetArrays(
        video=video, audio=audio,
        pad_mask=np.arange(t)[None, :] >= lengths[:, None],
        labels=labels, lengths=lengths,
        keys=[str(i) for i in range(n)], max_chunks=t)
    tr, va, te = stratified_splits(labels, seed=42)
    splits = DataSplits(tr, va, te, balanced_class_weights(labels[tr]))
    return data, splits


@pytest.fixture(scope="session")
def synthetic_feature_dirs(tmp_path_factory):
    """A tiny on-disk feature dataset following the reference artifact
    contract, with both CREMA-D and RAVDESS naming."""
    root = tmp_path_factory.mktemp("features")
    vdir = root / "video_features"
    adir = root / "audio_features"
    vdir.mkdir()
    adir.mkdir()
    rng = np.random.default_rng(0)

    emotions = ["NEU", "HAP", "SAD", "ANG", "FEA", "DIS"]
    keys = []
    for actor in (1001, 1002, 1003, 1004, 1005, 1006):
        for emo in emotions:
            for rep in ("A", "B"):
                keys.append(f"{actor}_IE{rep}_{emo}_XX")
    # A few RAVDESS clips (emotion codes 01..07 incl. dropped 02).
    for code in ("01", "02", "03", "04", "05", "06", "07"):
        keys.append(f"Video_Speech_Actor_01_01-01-{code}-01-01-01-01")

    for key in keys:
        t = int(rng.integers(1, 6))
        np.save(vdir / f"{key}_faces_mp4_features.npy",
                rng.normal(size=(t, 768)).astype(np.float32))
        emb = rng.normal(size=(1024,)).astype(np.float32)
        emb /= np.linalg.norm(emb)
        np.save(adir / f"{key}_voice_mp4_features.npy", emb.astype(np.float16))
    # One unpaired audio file (mimics the reference's extra file).
    np.save(adir / "9999_ZZZ_SAD_XX_voice_mp4_features.npy",
            rng.normal(size=(1024,)).astype(np.float16))
    return str(vdir), str(adir)
