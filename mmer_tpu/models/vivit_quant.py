"""int8-GEMM variant of the ViViT feature extractor.

Semantics argument: the reference's ViViT is a FIXED RANDOM projection —
weights are freshly randomized per process and never trained or loaded
(reference video_extractor.py:184); its only contract is that the same
embedding function is used consistently.  This framework already replaces
"random per process" with "one seeded init" (models/vivit.py); quantizing
that projection to int8 is the same kind of substitution — a
different-but-equally-valid embedding function — provided extract and
serve agree on it, which they do by construction (both route through
``precision=`` on their shared extractor classes).

What is quantized (ops/quant.py): the patchify projection (uint8 pixel
path — exact, zero activation error), QKV / attention-out and both FFN
GEMMs (per-token dynamic activation scales × per-out-channel weight
scales, int32 accumulation).  LayerNorm, GELU, softmax/attention and
residuals stay in bf16/f32.  Agreement with the float path on random
uint8 video: cosine ≥ 0.9999, rel-L2 ≈ 1% (tests/test_quant.py; the
bf16 production path itself sits ~0.3% from f32).

The apply function consumes the SAME param tree as the float model (the
int8 copies are prepared once by :func:`quantize_vivit_params`), so the
persisted seeded checkpoint stays the single source of truth.

MEASURED NEGATIVE — NOT ROUTED (scripts/probe_int8_vivit, v5e-1, B=16):
int8 + Pallas attn 118.7 ms vs bf16 fused 95.0 ms (0.80×); int8 + XLA
attn 149.2 ms (0.64×, killing the Mosaic-free serving idea too).  The
dynamic per-token quantize/dequantize epilogues are VPU passes over the
full activation tensor between every GEMM, and XLA does not fuse them
into the surrounding Pallas custom calls — they cost more than the 2×
MXU rate saves at these (25k × 768-3072) shapes.  Quality gate failed
independently: probe_feature_noise_quality measured rel=0.01 feature
noise dropping train F1 0.76→0.52 (int8's rel-L2 is ~0.02 → ~0.48), so
a default flip would also need retraining evidence.  Kept as a tested
oracle + the int8-GEMM pattern library; don't re-route without a
weight-static (no dynamic activation scale) scheme measured faster.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mmer_tpu.config import ViViTConfig
from mmer_tpu.ops.quant import qdot, qdot_u8, quantize_weight, u8_correction


def quantize_vivit_params(params) -> dict:
    """Float param tree (models/vivit.py layout) → int8 side table.

    Computed once per process (outside jit); ~25 MB of int8 vs ~100 MB
    f32 — also 4× less weight traffic per GEMM."""
    p = params["params"]
    q: dict = {"blocks": []}
    q["proj_q"], q["proj_s"] = quantize_weight(p["embed"]["proj"]["kernel"])
    q["proj_corr"] = u8_correction(q["proj_q"])
    q["proj_b"] = p["embed"]["proj"]["bias"]
    q["cls"] = p["cls_token"]
    q["pos"] = p["pos_embed"]
    i = 0
    while f"block_{i}" in p:
        b = p[f"block_{i}"]
        qb = {
            "ln1_s": b["norm1"]["scale"], "ln1_b": b["norm1"]["bias"],
            "ln2_s": b["norm2"]["scale"], "ln2_b": b["norm2"]["bias"],
            "ffn_in_b": b["ffn_in"]["bias"],
            "ffn_out_b": b["ffn_out"]["bias"],
        }
        qb["qkv_q"], qb["qkv_s"] = quantize_weight(b["to_qkv"]["kernel"])
        qb["out_q"], qb["out_s"] = quantize_weight(b["to_out"]["kernel"])
        qb["fi_q"], qb["fi_s"] = quantize_weight(b["ffn_in"]["kernel"])
        qb["fo_q"], qb["fo_s"] = quantize_weight(b["ffn_out"]["kernel"])
        q["blocks"].append(qb)
        i += 1
    return q


def _layernorm(x, scale, bias):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + 1e-6) * scale + bias


def quant_vivit_apply(qparams: dict, video_u8: jnp.ndarray,
                      cfg: Optional[ViViTConfig] = None,
                      use_flash: Optional[bool] = None) -> jnp.ndarray:
    """(B, F, H, W, C) uint8 → (B, 768) f32 features, int8 GEMMs.

    Mirrors ViViTFeatureExtractor's forward exactly (tubelet patchify →
    CLS+pos → pre-norm blocks → CLS pool); attention runs the Pallas
    flash kernel on TPU and the XLA reference path elsewhere."""
    cfg = cfg or ViViTConfig()
    if use_flash is None:
        use_flash = jax.default_backend() == "tpu"
    from mmer_tpu.ops.flash_attention import (flash_attention,
                                              reference_attention)

    b, f, hh, ww, c = video_u8.shape
    t, (ph, pw) = cfg.tubelet_size, cfg.patch_size
    ft, hp, wp = f // t, hh // ph, ww // pw
    x = video_u8.reshape(b, ft, t, hp, ph, wp, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, ft * hp * wp, t * ph * pw * c)
    tok = qdot_u8(x, qparams["proj_q"], qparams["proj_s"],
                  qparams["proj_corr"]) + qparams["proj_b"]

    heads, hd = cfg.heads, cfg.dim_head
    if cfg.pool == "cls":
        cls = jnp.broadcast_to(qparams["cls"],
                               (b, 1, cfg.dim)).astype(jnp.float32)
        tok = jnp.concatenate([cls, tok], axis=1)
    n = tok.shape[1]
    x = tok + qparams["pos"][:, :n, :]

    def heads_first(z):
        return z.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

    for qb in qparams["blocks"]:
        y = _layernorm(x, qb["ln1_s"], qb["ln1_b"])
        qkv = qdot(y, qb["qkv_q"], qb["qkv_s"]).astype(jnp.bfloat16)
        qv, kv, vv = jnp.split(qkv, 3, axis=-1)
        attend = flash_attention if use_flash else reference_attention
        attn = attend(heads_first(qv), heads_first(kv), heads_first(vv))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, heads * hd)
        x = x + qdot(attn, qb["out_q"], qb["out_s"])
        y = _layernorm(x, qb["ln2_s"], qb["ln2_b"])
        h = qdot(y, qb["fi_q"], qb["fi_s"]) + qb["ffn_in_b"]
        h = jax.nn.gelu(h, approximate=False)
        x = x + qdot(h, qb["fo_q"], qb["fo_s"]) + qb["ffn_out_b"]

    feats = x[:, 0] if cfg.pool == "cls" else jnp.mean(x, axis=1)
    return feats.astype(jnp.float32)
