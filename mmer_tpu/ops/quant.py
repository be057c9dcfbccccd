"""int8 GEMM primitives for inference-time quantization.

v5e's MXU executes int8×int8→int32 at 2× its bf16 rate (394.7 vs
197 TOPS), so MXU-bound inference GEMMs can halve their time if the
quantize/dequantize epilogues stay cheap (they are VPU elementwise work
that XLA fuses into the surrounding ops).  Scheme:

- weights: symmetric per-output-channel absmax int8 (computed once,
  outside jit);
- activations: symmetric per-row (per-token) dynamic absmax int8;
- accumulation: int32, dequantized to f32 by the separable
  row-scale × column-scale product.

No reference counterpart (the reference runs f32 torch end-to-end);
introduced for the fixed-random-projection ViViT extractor where the
"weights" carry no trained information to damage (see
models/vivit_quant.py for the argument and the routing decision).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(K, N) float → (int8 (K, N), f32 (1, N) per-out-channel scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                    1e-12).astype(jnp.float32) / 127.0
    return jnp.round(w / s).astype(jnp.int8), s


def qdot(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray) -> jnp.ndarray:
    """float (..., K) × int8 (K, N) → f32 (..., N) with dynamic per-row
    activation quantization."""
    xs = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True),
                     1e-8).astype(jnp.float32) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs * ws


def qdot_u8(x_u8: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
            corr: jnp.ndarray, denom: float = 255.0) -> jnp.ndarray:
    """uint8 (..., K) × int8 (K, N) → f32, computing
    ``(x/denom) @ dequant(wq)`` with ZERO activation quantization error:
    ``x - 128`` fits int8 exactly, and the 128-shift correction
    ``corr = 128 · Σ_K wq`` plus the ``/denom`` normalize fold into the
    dequant epilogue.  This is the pixel→patchify path."""
    x8 = (x_u8.astype(jnp.int32) - 128).astype(jnp.int8)
    acc = jax.lax.dot_general(x8, wq, (((x_u8.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc + corr).astype(jnp.float32) * ws / denom


def u8_correction(wq: jnp.ndarray) -> jnp.ndarray:
    """The per-out-channel 128-shift correction term for :func:`qdot_u8`."""
    return 128 * jnp.sum(wq.astype(jnp.int32), axis=0)
