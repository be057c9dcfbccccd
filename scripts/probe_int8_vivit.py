"""Probe: end-to-end int8-GEMM ViViT vs the production bf16 path.

v5e's MXU does int8 at 2x its bf16 rate (394.7 vs 197 TOPS) and the
model-with-attention-removed already runs at 40.7% bf16 MFU (README MFU
table) — i.e. most of the non-attention time is MXU-bound GEMMs that int8
could halve.  The ViViT is a FIXED RANDOM projection (reference
video_extractor.py:184 — weights are never trained or loaded), so a
quantized extractor is a different-but-equally-valid embedding function;
the accept/reject test is downstream: train the fusion model on
quantized features and compare macro-F1 (the same argument used for the
seeded-init substitution, SURVEY.md §7 "hard parts").

Quantization scheme (all exact-math int8, f32 accumulate via int32):
  - patchify: uint8 pixels are shifted to int8 exactly (x-128) and the
    /255 normalize + 128-shift correction folds into the per-channel
    dequant scale — the pixel path has ZERO activation quant error;
  - QKV / out-proj / FFN GEMMs: per-token (row) dynamic absmax
    activation scales x per-out-channel weight scales;
  - LN, GELU, softmax/attention (flash kernel), residuals stay bf16/f32.

Prints: time + chunks/s + feature cosine agreement vs the production
path, plus a GEMM-only ablation (quantize cost without int8 speedup
would show up as dynq overhead).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ViViTConfig
from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.ops.flash_attention import (flash_attention,
                                          reference_attention)

B = 16


def _attend(q, k, v):
    if jax.default_backend() == "tpu":
        return flash_attention(q, k, v)
    return reference_attention(q, k, v)  # CPU smoke-test path


def quantize_weight(w):
    """(K, N) f32 → int8 + (1, N) f32 per-out-channel scale."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True), 1e-12) / 127.0
    return jnp.round(w / s).astype(jnp.int8), s


def qdot(x, wq, ws):
    """f32/bf16 (..., K) × int8 (K, N) → f32, dynamic per-row activation
    quantization."""
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8).astype(jnp.float32) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws


def build_qparams(params):
    p = params["params"]
    q = {"blocks": []}
    q["proj_q"], q["proj_s"] = quantize_weight(p["embed"]["proj"]["kernel"])
    q["proj_corr"] = 128 * jnp.sum(q["proj_q"].astype(jnp.int32), axis=0)
    q["proj_b"] = p["embed"]["proj"]["bias"]
    q["cls"] = p["cls_token"]
    q["pos"] = p["pos_embed"]
    i = 0
    while f"block_{i}" in p:
        b = p[f"block_{i}"]
        qb = {
            "ln1_s": b["norm1"]["scale"], "ln1_b": b["norm1"]["bias"],
            "ln2_s": b["norm2"]["scale"], "ln2_b": b["norm2"]["bias"],
            "ffn_in_b": b["ffn_in"]["bias"], "ffn_out_b": b["ffn_out"]["bias"],
        }
        qb["qkv_q"], qb["qkv_s"] = quantize_weight(b["to_qkv"]["kernel"])
        qb["out_q"], qb["out_s"] = quantize_weight(b["to_out"]["kernel"])
        qb["fi_q"], qb["fi_s"] = quantize_weight(b["ffn_in"]["kernel"])
        qb["fo_q"], qb["fo_s"] = quantize_weight(b["ffn_out"]["kernel"])
        q["blocks"].append(qb)
        i += 1
    return q


def ln(x, scale, bias):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + 1e-6) * scale + bias


def qforward(q, video_u8, cfg):
    b, f, hh, ww, c = video_u8.shape
    t, (ph, pw) = cfg.tubelet_size, cfg.patch_size
    ft, hp, wp = f // t, hh // ph, ww // pw
    x = video_u8.reshape(b, ft, t, hp, ph, wp, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, ft * hp * wp, t * ph * pw * c)
    # Exact int8 pixel path: (u8 - 128) ∈ [-128, 127]; /255 and the shift
    # correction fold into the dequant epilogue.
    x8 = (x.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = jax.lax.dot_general(x8, q["proj_q"], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    tok = ((acc + q["proj_corr"]).astype(jnp.float32) * q["proj_s"] / 255.0
           + q["proj_b"])

    heads, hd = cfg.heads, cfg.dim_head
    cls = jnp.broadcast_to(q["cls"], (b, 1, cfg.dim)).astype(jnp.float32)
    x = jnp.concatenate([cls, tok], axis=1)
    n = x.shape[1]
    x = x + q["pos"][:, :n, :]

    for qb in q["blocks"]:
        y = ln(x, qb["ln1_s"], qb["ln1_b"])
        qkv = qdot(y, qb["qkv_q"], qb["qkv_s"])
        qv, kv, vv = jnp.split(qkv.astype(jnp.bfloat16), 3, axis=-1)

        def hf(z):
            return z.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

        attn = _attend(hf(qv), hf(kv), hf(vv))
        attn = attn.transpose(0, 2, 1, 3).reshape(b, n, heads * hd)
        x = x + qdot(attn, qb["out_q"], qb["out_s"])
        y = ln(x, qb["ln2_s"], qb["ln2_b"])
        h = qdot(y, qb["fi_q"], qb["fi_s"]) + qb["ffn_in_b"]
        h = jax.nn.gelu(h, approximate=False)
        x = x + qdot(h, qb["fo_q"], qb["fo_s"]) + qb["ffn_out_b"]
    return x[:, 0].astype(jnp.float32)


def timed(fn, inputs, n_chain=4, reps=3):
    outs = fn(inputs[-1])
    jax.block_until_ready(outs)
    best = float("inf")
    for r in range(reps):
        chain = inputs[(r * n_chain) % len(inputs):][:n_chain]
        t0 = time.time()
        outs = [fn(x) for x in chain]
        jax.block_until_ready(outs)
        np.asarray(outs[-1].ravel()[:1])
        best = min(best, (time.time() - t0) / n_chain)
    return best


def main():
    enable_persistent_cache()
    from mmer_tpu.preprocess.extract import VideoFeatureExtractor

    cfg = ViViTConfig()
    ex = VideoFeatureExtractor(cfg, device_batch=B, use_flash=True)
    rng = np.random.default_rng(0)
    batches = [jax.device_put(
        (rng.random((B, 32, 224, 224, 3)) * 255).astype(np.uint8))
        for _ in range(9)]
    jax.block_until_ready(batches)

    t_bf16 = timed(lambda x: ex._apply(ex.params, x), batches)
    print(f"bf16 fused path : {t_bf16 * 1e3:7.1f} ms  "
          f"{B / t_bf16:6.1f} chunks/s", flush=True)

    q = jax.tree_util.tree_map(jnp.asarray, build_qparams(ex.params))
    q = jax.block_until_ready(q)
    qf = jax.jit(lambda qq, x: qforward(qq, x, cfg))
    t_q = timed(lambda x: qf(q, x), batches)
    print(f"int8 GEMM path  : {t_q * 1e3:7.1f} ms  "
          f"{B / t_q:6.1f} chunks/s  speedup {t_bf16 / t_q:4.2f}x",
          flush=True)

    a = np.asarray(ex._apply(ex.params, batches[0]))
    bq = np.asarray(qf(q, batches[0]))
    cos = np.sum(a * bq, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(bq, axis=1) + 1e-12)
    rel = np.linalg.norm(a - bq, axis=1) / (np.linalg.norm(a, axis=1) + 1e-12)
    print(f"agreement: cos {cos.min():.5f}..{cos.max():.5f}  "
          f"rel-l2 {rel.mean():.4f}", flush=True)


if __name__ == "__main__":
    main()
