"""int8 quantization primitives + quantized ViViT/W2V2 agreement with
the float path (ops/quant.py, models/{vivit,wav2vec2}_quant.py).

The quant modules are kept as DOCUMENTED NEGATIVE RESULTS: on chip they
measured 0.80× bf16 (ViViT; XLA-attn variant 0.64×) and 0.70× (W2V2),
with rel-l2 ≈ 0.02 vs bf16 — at the feature-noise level that collapses
downstream F1 (artifacts/probes/r3_onchip.json).  Their user-facing
routing (extractor ``precision=`` kwargs, serving/CLI flags) was removed
in r4; these tests pin the modules' numerical contract directly."""

import jax.numpy as jnp
import numpy as np
import pytest

from mmer_tpu.config import ViViTConfig
from mmer_tpu.models.vivit import init_vivit_params
from mmer_tpu.models.vivit_quant import (quant_vivit_apply,
                                         quantize_vivit_params)
from mmer_tpu.ops.quant import (qdot, qdot_u8, quantize_weight,
                                u8_correction)


def test_quantize_weight_round_trip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    wq, ws = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8
    deq = np.asarray(wq, np.float32) * np.asarray(ws)
    # absmax symmetric: max per-column error is half a quant step
    step = np.asarray(ws)[0]
    assert np.all(np.abs(deq - w) <= step / 2 + 1e-7)


def test_qdot_matches_float_within_quant_error():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    w = rng.normal(size=(64, 32)).astype(np.float32)
    wq, ws = quantize_weight(jnp.asarray(w))
    got = np.asarray(qdot(jnp.asarray(x), wq, ws))
    want = x @ w
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_qdot_u8_pixel_path_is_exact_in_activations():
    """The uint8 patchify path has NO activation quantization: with an
    exactly-representable weight matrix the result is exact."""
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, size=(4, 96), dtype=np.uint8)
    # weights already on the int8 grid → dequantization is exact
    wq = rng.integers(-127, 128, size=(96, 16), dtype=np.int8)
    ws = jnp.full((1, 16), 0.01, jnp.float32)
    corr = u8_correction(jnp.asarray(wq))
    got = np.asarray(qdot_u8(jnp.asarray(x), jnp.asarray(wq), ws, corr))
    want = (x.astype(np.float64) / 255.0) @ (wq.astype(np.float64) * 0.01)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def small_vivit():
    cfg = ViViTConfig(num_frames=8, image_size=(32, 32), depth=2, dim=64,
                      heads=4, dim_head=16, mlp_dim=128)
    model, params = init_vivit_params(cfg, use_flash=False)
    return cfg, model, params


def test_quant_vivit_agrees_with_float_path(small_vivit):
    cfg, model, params = small_vivit
    rng = np.random.default_rng(0)
    x_u8 = (rng.random((2, 8, 32, 32, 3)) * 255).astype(np.uint8)

    ref = np.asarray(model.apply(
        params, jnp.asarray(x_u8).astype(jnp.float32) / 255.0))
    q = quantize_vivit_params(params)
    got = np.asarray(quant_vivit_apply(q, jnp.asarray(x_u8), cfg,
                                       use_flash=False))
    cos = np.sum(ref * got, axis=1) / (
        np.linalg.norm(ref, axis=1) * np.linalg.norm(got, axis=1))
    assert np.all(cos > 0.999), cos
    rel = (np.linalg.norm(ref - got, axis=1)
           / np.linalg.norm(ref, axis=1))
    assert np.all(rel < 0.05), rel


def test_quant_vivit_deterministic(small_vivit):
    cfg, _, params = small_vivit
    rng = np.random.default_rng(3)
    x_u8 = (rng.random((1, 8, 32, 32, 3)) * 255).astype(np.uint8)
    q = quantize_vivit_params(params)
    a = np.asarray(quant_vivit_apply(q, jnp.asarray(x_u8), cfg,
                                     use_flash=False))
    b = np.asarray(quant_vivit_apply(q, jnp.asarray(x_u8), cfg,
                                     use_flash=False))
    np.testing.assert_array_equal(a, b)


def test_quant_vivit_agrees_with_production_extractor(tmp_path):
    """The quantized forward agrees with the PRODUCTION bf16 extractor
    on the same persisted params (the comparison the removed
    ``precision='int8'`` routing used to make), and float input
    re-quantized to uint8 matches the raw-uint8 result exactly."""
    from mmer_tpu.preprocess.extract import VideoFeatureExtractor

    cfg = ViViTConfig(num_frames=8, image_size=(32, 32), depth=2, dim=64,
                      heads=4, dim_head=16, mlp_dim=128,
                      compute_dtype="float32")
    path = str(tmp_path / "vivit.msgpack")
    ex_f = VideoFeatureExtractor(cfg, device_batch=2, params_path=path,
                                 use_flash=False)

    rng = np.random.default_rng(5)
    vid_u8 = rng.integers(0, 256, size=(3, 8, 32, 32, 3), dtype=np.uint8)

    f = ex_f.embed_chunks(vid_u8)
    qp = quantize_vivit_params(ex_f.params)
    q = np.asarray(quant_vivit_apply(qp, jnp.asarray(vid_u8), cfg,
                                     use_flash=False))
    assert f.shape == q.shape == (3, 64)
    cos = np.sum(f * q, axis=1) / (
        np.linalg.norm(f, axis=1) * np.linalg.norm(q, axis=1))
    assert np.all(cos > 0.999), cos

    # float input re-quantizes to the same uint8 → identical features
    x = jnp.asarray(vid_u8.astype(np.float32) / 255.0)
    x_u8 = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.uint8)
    q2 = np.asarray(quant_vivit_apply(qp, x_u8, cfg, use_flash=False))
    np.testing.assert_allclose(q2, q, atol=1e-6)


# ---------------------------------------------------------------------------
# Wav2Vec2 int8 (models/wav2vec2_quant.py)
# ---------------------------------------------------------------------------

W2V2_TINY = None  # built lazily (imports torch-free config only)


def _w2v2_tiny():
    from mmer_tpu.config import Wav2Vec2Config
    return Wav2Vec2Config(
        hidden_dim=32, num_layers=2, num_heads=2, ffn_dim=64,
        conv_dims=(16, 16), conv_strides=(5, 2), conv_kernels=(10, 3),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        compute_dtype="float32")


def test_quant_w2v2_agrees_with_float_path():
    import jax

    from mmer_tpu.models.wav2vec2 import (Wav2Vec2Encoder,
                                          feat_extract_output_length)
    from mmer_tpu.models.wav2vec2_quant import (quant_w2v2_apply,
                                                quantize_w2v2_params)

    cfg = _w2v2_tiny()
    rng = np.random.default_rng(11)
    wave = jnp.asarray(rng.normal(size=(3, 3200)), jnp.float32)
    t = feat_extract_output_length(cfg, 3200)
    pad = jnp.zeros((3, t), bool).at[2, t // 2:].set(True)

    model = Wav2Vec2Encoder(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, wave)
    want = np.asarray(model.apply(params, wave, pad))

    q = quantize_w2v2_params(params)
    got = np.asarray(quant_w2v2_apply(q, params, wave, pad, cfg))

    assert got.shape == want.shape
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.05, rel
    # padded frames must agree exactly in masking behavior: the pooled
    # embedding downstream only reads unmasked rows, but check rows are
    # finite everywhere (fully-masked-row -1e9 semantics preserved)
    assert np.all(np.isfinite(got))


def test_quant_w2v2_pooled_embedding_agrees_with_embedder():
    """Quantized transformer + the production masked-mean-pool/L2 tail
    agrees with the float AudioEmbedder on the same params (the
    comparison the removed ``precision='int8'`` routing used to make)."""
    from mmer_tpu.models.wav2vec2 import (AudioEmbedder,
                                          feat_extract_output_length)
    from mmer_tpu.models.wav2vec2_quant import (quant_w2v2_apply,
                                                quantize_w2v2_params)

    cfg = _w2v2_tiny()
    emb_f = AudioEmbedder(cfg, use_pallas=False)

    rng = np.random.default_rng(12)
    n_samp = 3200
    waves = [rng.normal(size=(n_samp,)).astype(np.float32)
             for _ in range(3)]
    f = emb_f.embed_batch(waves)

    # Same preprocessing the embedder applies: per-utterance z-score.
    stack = np.stack(waves)
    norm = ((stack - stack.mean(1, keepdims=True))
            / np.sqrt(stack.var(1) + 1e-7)[:, None])
    t = feat_extract_output_length(cfg, n_samp)
    pad = jnp.zeros((3, t), bool)
    qp = quantize_w2v2_params(emb_f.params)
    hidden = quant_w2v2_apply(qp, emb_f.params, jnp.asarray(norm), pad, cfg)
    emb = np.asarray(hidden).mean(axis=1)
    q = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    assert f.shape == q.shape == (3, cfg.hidden_dim)
    cos = np.sum(f * q, axis=1)        # both rows are L2-normalized
    assert np.all(cos > 0.995), cos
