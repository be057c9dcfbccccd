"""Multi-chip extraction fan-out: the ViViT chunk batch sharded over the
data axis of an 8-device CPU mesh must produce the same embeddings as the
single-device extractor (VERDICT r1 #5 — the reference's batch-1 hot loop,
video_extractor.py:152-156, fanned out over ICI)."""

import jax
import numpy as np
import pytest

from mmer_tpu.config import MeshConfig, ViViTConfig
from mmer_tpu.core.mesh import create_mesh
from mmer_tpu.preprocess.extract import VideoFeatureExtractor

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

TINY = ViViTConfig(image_size=(32, 32), patch_size=(16, 16), num_frames=8,
                   tubelet_size=4, dim=64, depth=2, heads=2, dim_head=32,
                   mlp_dim=128, compute_dtype="float32")


def test_sharded_extraction_matches_single_device():
    mesh = create_mesh(MeshConfig())   # 8-way data axis
    # flash attention runs in interpret mode only per-device on CPU; use
    # the plain XLA path for the mesh test.
    single = VideoFeatureExtractor(TINY, device_batch=8, use_flash=False)
    sharded = VideoFeatureExtractor(TINY, device_batch=8, use_flash=False,
                                    mesh=mesh)
    assert sharded.device_batch == 8   # already a multiple of 8

    rng = np.random.default_rng(0)
    chunks = (rng.random((13, 8, 32, 32, 3)) * 255).astype(np.uint8)
    want = single.embed_chunks(chunks)
    got = sharded.embed_chunks(chunks)
    assert got.shape == (13, 64)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_global_batch_rounds_up_to_mesh_multiple():
    mesh = create_mesh(MeshConfig())
    ex = VideoFeatureExtractor(TINY, device_batch=6, use_flash=False,
                               mesh=mesh)
    assert ex.device_batch == 8
    rng = np.random.default_rng(1)
    chunks = rng.random((3, 8, 32, 32, 3)).astype(np.float32)
    out = ex.embed_chunks(chunks)
    assert out.shape == (3, 64)
    assert np.all(np.isfinite(out))


AUDIO_TINY_KW = dict(hidden_dim=64, num_layers=2, num_heads=2, ffn_dim=128,
                     conv_dims=(32,) * 7, num_conv_pos_embeddings=16,
                     num_conv_pos_embedding_groups=4,
                     compute_dtype="float32")


def test_sharded_audio_matches_single_device():
    """The Wav2Vec2 fan-out (VERDICT r2 #1): waveform batches sharded over
    the data axis must reproduce the single-device embeddings, including
    the round-up padding path for batches not divisible by the mesh."""
    from mmer_tpu.config import Wav2Vec2Config
    from mmer_tpu.models.wav2vec2 import AudioEmbedder

    cfg = Wav2Vec2Config(**AUDIO_TINY_KW)
    mesh = create_mesh(MeshConfig())
    single = AudioEmbedder(cfg)
    sharded = AudioEmbedder(cfg, mesh=mesh)
    rng = np.random.default_rng(0)
    # 13 waveforms: not a mesh multiple -> exercises the pad+slice path.
    waves = [rng.normal(size=(8000 + 321 * i,)).astype(np.float32)
             for i in range(13)]
    want = single.embed_batch(waves)
    got = sharded.embed_batch(waves)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_measure_extract_scaling_smoke():
    """The dryrun/bench scaling probe must run end-to-end on the virtual
    mesh, assert sharded==single internally, and report efficiencies."""
    from mmer_tpu.parallel.scaling import measure_extract_scaling

    sc = measure_extract_scaling(8, reps=1, per_device_batch=1)
    assert sc["n_devices"] == 8
    for modality in ("video", "audio"):
        assert sc[modality]["max_abs_err"] < 1e-5
        assert sc[modality]["efficiency"] > 0


def test_pipeline_false_matches_pipelined():
    """embed_chunks' serial fetch-then-stage loop (pipeline=False, the
    default — the double buffer measured 0.92x through this host's relay,
    artifacts/probes/r4_onchip2.json) and the two-deep double buffer
    (pipeline=True, the PCIe-hardware opt-in) are pure loop-shape
    variants of the same computation and must agree bit-exactly."""
    single = VideoFeatureExtractor(TINY, device_batch=4, use_flash=False)
    rng = np.random.default_rng(3)
    chunks = (rng.random((11, 8, 32, 32, 3)) * 255).astype(np.uint8)
    a = single.embed_chunks(chunks, pipeline=True)
    b = single.embed_chunks(chunks, pipeline=False)
    np.testing.assert_array_equal(a, b)


def test_sharded_extraction_programs_have_no_collectives():
    """The pod story rests on the extraction fan-out being embarrassingly
    parallel — replicated params, batch-sharded IO, ZERO collectives in
    the partitioned HLO.  This held for ViViT from the start but NOT for
    Wav2Vec2: XLA's SPMD partitioner cannot batch-partition a
    feature_group_count>1 conv and silently all-gathered the batch to run
    the grouped positional conv replicated (3 all-gathers, 0.85-0.88
    efficiency — VERDICT r3 #8).  _SplitGroupedConv fixed it; this pins
    the collective-free property for BOTH extractors' partitioned HLO so
    a future partitioner/model change cannot silently reintroduce one."""
    import re

    from mmer_tpu.config import Wav2Vec2Config
    from mmer_tpu.models.wav2vec2 import (AudioEmbedder,
                                          feat_extract_output_length)

    mesh = create_mesh(MeshConfig())
    coll_re = re.compile(r"\b(all-reduce|all-gather|reduce-scatter|"
                         r"collective-permute|all-to-all)\b")

    vex = VideoFeatureExtractor(TINY, device_batch=8, use_flash=False,
                                mesh=mesh)
    import jax.numpy as jnp
    chunks = jnp.zeros((8, 8, 32, 32, 3), jnp.uint8)
    hlo_v = vex._apply.lower(vex.params, chunks).compile().as_text()
    assert not coll_re.search(hlo_v), coll_re.findall(hlo_v)

    cfg = Wav2Vec2Config(**AUDIO_TINY_KW)
    aem = AudioEmbedder(cfg, mesh=mesh)
    n = aem._bucket_len(3200)
    t = feat_extract_output_length(cfg, n)
    waves = jnp.zeros((8, n), jnp.float32)
    masks = jnp.zeros((8, t), bool)
    hlo_a = aem._apply_pool.lower(aem.params, waves, masks
                                  ).compile().as_text()
    assert not coll_re.search(hlo_a), coll_re.findall(hlo_a)
