"""int8-GEMM variant of the Wav2Vec2 transformer encoder.

Quantizes the encoder's MXU-bound GEMMs — the feature projection, the
per-layer q/k/v (fused to one (d, 3d) GEMM, mirroring
``EncoderLayer.use_fused_qkv``), attention-out and both FFN matmuls —
with the ops/quant.py scheme: per-output-channel absmax int8 weights
(prepared once, outside jit) × per-token dynamic activation scales,
int32 accumulation.  Everything else stays on the float path and REUSES
the flax modules (``ConvFeatureEncoder`` — optionally the fused Pallas
conv pyramid — and ``PosConvEmbed`` applied standalone on their param
subtrees), so conv semantics can never drift from models/wav2vec2.py.

Unlike the ViViT (a fixed random projection, models/vivit_quant.py),
these weights DO carry trained information once the real checkpoint is
ported (reference voice_extractor.py:16), so the routing bar is higher:
W8A8 per-token/per-channel is the standard accuracy-preserving recipe,
the embeddings are mean-pooled + L2-normalized downstream (softening
per-frame error), and the CPU agreement tests (tests/test_quant.py)
quantify the deviation — but the default stays bf16 until an on-chip
win AND the agreement numbers justify it (scripts/probe_int8_w2v2.py).

Reference behavior mirrored: voice_extractor.py:37-50 (the embedding
contract); the transformer math matches models/wav2vec2.py exactly at
f32, modulo quantization error.

MEASURED NEGATIVE — NOT ROUTED (scripts/probe_int8_w2v2, v5e-1, B=64):
int8 fused 142.0 ms / 450.8 clips/s vs bf16 fused 99.6 ms / 642.3
clips/s (0.70×), embedding cosine ≥ 0.99986.  Same root cause as the
ViViT probe (see models/vivit_quant.py): the dynamic per-token
quantize/dequantize VPU epilogues between GEMMs cost more than the 2×
int8 MXU rate saves.  Default stays bf16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mmer_tpu.config import Wav2Vec2Config
from mmer_tpu.models.wav2vec2 import ConvFeatureEncoder, PosConvEmbed
from mmer_tpu.ops.quant import qdot, quantize_weight


def quantize_w2v2_params(params) -> dict:
    """Float param tree (models/wav2vec2.py layout) → int8 side table.

    The conv feature encoder, positional conv, all LayerNorms and all
    biases stay in the float tree; only the transformer GEMM kernels are
    quantized (~1.2 GB f32 → ~300 MB int8 for the large model)."""
    p = params["params"]
    q: dict = {"layers": []}
    q["proj_q"], q["proj_s"] = quantize_weight(p["proj"]["kernel"])
    i = 0
    while f"layer_{i}" in p:
        lp = p[f"layer_{i}"]
        d = lp["out"]["bias"].shape[0]
        wqkv = jnp.concatenate(
            [lp[n]["kernel"].reshape(d, d) for n in ("q", "k", "v")],
            axis=1)
        ql: dict = {}
        ql["qkv_q"], ql["qkv_s"] = quantize_weight(wqkv)
        ql["qkv_b"] = jnp.concatenate(
            [lp[n]["bias"].reshape(d) for n in ("q", "k", "v")])
        ql["out_q"], ql["out_s"] = quantize_weight(
            lp["out"]["kernel"].reshape(d, d))
        ql["fi_q"], ql["fi_s"] = quantize_weight(lp["ffn_in"]["kernel"])
        ql["fo_q"], ql["fo_s"] = quantize_weight(lp["ffn_out"]["kernel"])
        q["layers"].append(ql)
        i += 1
    return q


def _layernorm(x, scale, bias):
    # eps 1e-6: flax nn.LayerNorm's default, which every norm in the
    # float model uses — the agreement numbers must contain only
    # quantization error.
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def quant_w2v2_apply(qparams: dict, params: dict, wave: jnp.ndarray,
                     frame_pad_mask: Optional[jnp.ndarray] = None,
                     cfg: Optional[Wav2Vec2Config] = None,
                     use_pyramid: bool = False) -> jnp.ndarray:
    """Waveform (B, T) → per-frame hidden states (B, T', d), int8 GEMMs.

    Mirrors ``Wav2Vec2Encoder.__call__`` exactly (stable-layer-norm
    variant: pre-norm layers, padded frames zeroed before the positional
    conv, -1e9 finite mask bias, final LayerNorm)."""
    cfg = cfg or Wav2Vec2Config()
    p = params["params"]
    h, d = cfg.num_heads, cfg.hidden_dim
    hd = d // h

    feats = ConvFeatureEncoder(cfg, use_pyramid=use_pyramid).apply(
        {"params": p["feature_encoder"]}, wave)
    x = _layernorm(feats, p["proj_norm"]["scale"], p["proj_norm"]["bias"])
    x = qdot(x, qparams["proj_q"], qparams["proj_s"]) + p["proj"]["bias"]

    if frame_pad_mask is not None:
        x = jnp.where(frame_pad_mask[:, :, None], 0.0, x)
    x = x + PosConvEmbed(cfg).apply(
        {"params": p["pos_conv"]}, x).astype(x.dtype)

    mask_bias = None
    if frame_pad_mask is not None:
        # Finite large-negative bias — same fully-masked-row semantics
        # as the float path (models/wav2vec2.py:_xla_attention).
        mask_bias = jnp.where(frame_pad_mask[:, None, None, :], -1e9, 0.0)

    b, s = x.shape[0], x.shape[1]
    for i, ql in enumerate(qparams["layers"]):
        lp = p[f"layer_{i}"]
        y = _layernorm(x, lp["norm_attn"]["scale"], lp["norm_attn"]["bias"])
        qkv = qdot(y, ql["qkv_q"], ql["qkv_s"]) + ql["qkv_b"]
        qv, kv, vv = (t.reshape(b, s, h, hd)
                      for t in jnp.split(qkv, 3, axis=-1))
        scores = jnp.einsum("bqhd,bkhd->bhqk", qv, kv,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vv,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(b, s, d)
        x = x + qdot(attn, ql["out_q"], ql["out_s"]) + lp["out"]["bias"]
        y = _layernorm(x, lp["norm_ffn"]["scale"], lp["norm_ffn"]["bias"])
        hdn = qdot(y, ql["fi_q"], ql["fi_s"]) + lp["ffn_in"]["bias"]
        hdn = jax.nn.gelu(hdn, approximate=False)
        x = x + qdot(hdn, ql["fo_q"], ql["fo_s"]) + lp["ffn_out"]["bias"]

    return _layernorm(x, p["final_norm"]["scale"], p["final_norm"]["bias"])
