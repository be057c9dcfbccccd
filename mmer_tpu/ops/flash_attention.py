"""Fused multi-head attention as a Pallas TPU kernel.

Used by the ViViT extractor (models/vivit.py), whose sequence length is
S = 8·196 + 1 = 1569 tokens per 32-frame chunk (reference
video_extractor.py:14,82-104).  XLA's stock lowering materializes the
(B, H, S, S) score tensor in HBM — ~118 MB fp32 per chunk at H=12 — so the
attention becomes HBM-bandwidth-bound.  This kernel keeps each q-block's
score row entirely in VMEM: per grid program it computes
``softmax(q_blk @ K^T / sqrt(d)) @ V`` with fp32 accumulation and only the
(BQ, D) output block ever returns to HBM.

Layout: grid = (B, H, S_pad/BQ); K/V for one (batch, head) live fully in
VMEM (S≈1.6k · 64 · 2 B ≈ 200 KB in bf16 — far under the ~16 MB budget),
q is tiled in BQ=128 rows to align with the 128-lane MXU.

Sequence padding: callers pad S up to a multiple of BQ with zeros and pass
the true length as ``seq_len``; padded KEY positions are masked to -inf
before the softmax (padded QUERY rows compute garbage and are sliced off by
the caller).  ``seq_len`` is static, so the mask folds into the compiled
kernel.

Inference-only: the ViViT extractor is never trained (its weights are a
fixed seeded random projection, SURVEY.md §7 "hard parts"), so no backward
kernel is defined — differentiating through this op raises, and training
paths use the jnp reference implementation below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int):
    q = q_ref[0, 0]                      # (BQ, D)
    k = k_ref[0, 0]                      # (S_pad, D)
    v = v_ref[0, 0]                      # (S_pad, D)

    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BQ, S_pad)
    scores = scores * scale

    s_pad = scores.shape[-1]
    if seq_len < s_pad:
        key_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(key_idx < seq_len, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BQ, D)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 128,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Fused attention over (B, H, S, D) tensors, full (unmasked) attention.

    Pads S to a multiple of ``block_q`` internally; returns (B, H, S, D).
    """
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    s_pad = _round_up(s, block_q)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (b, h, s_pad // block_q)
    kv_spec = pl.BlockSpec((1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, seq_len=s),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda bi, hi, qi: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d,
            bytes_accessed=(2 * b * h * s_pad * d * q.dtype.itemsize * 2
                            + b * h * s_pad * d * q.dtype.itemsize),
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    if s_pad != s:
        out = out[:, :, :s, :]
    return out


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                        ) -> jnp.ndarray:
    """Plain-XLA attention over (B, H, S, D); numerics oracle for the kernel
    and the differentiable fallback for any training path."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
