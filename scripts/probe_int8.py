"""Probe: does v5e int8 MXU throughput (394.7 TOPS peak, 2x bf16) hold
through XLA at the ViViT extraction GEMM shapes?

The ViViT extractor is a FIXED RANDOM projection (reference
video_extractor.py:184 — weights are never trained or loaded), so an
int8-quantized extraction mode is semantically a different-but-equally-
valid embedding function; quality is validated downstream by training on
the quantized features (see scripts/quality_sweep.py pattern).  Before
building that mode, this probe measures the raw ceiling:

  - bf16 x bf16 -> f32 matmul at the model's GEMM shapes
  - int8 x int8 -> int32 matmul at the same shapes
  - a dynamic-quantize epilogue (f32 row-scale) to see the realistic cost

Timing discipline per CLAUDE.md: distinct pre-staged device inputs,
chained calls, one final sync + tiny transfer.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from scripts._probe_util import timed

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.core.cache import enable_persistent_cache

PEAK_BF16 = 197e12
PEAK_INT8 = 394.7e12




def bench_shape(m, k, n, tag):
    rng = np.random.default_rng(0)
    flops = 2 * m * k * n

    a16 = [jax.device_put(rng.normal(size=(m, k)).astype(jnp.bfloat16))
           for _ in range(8)]
    b16 = jax.device_put(rng.normal(size=(k, n)).astype(jnp.bfloat16))

    @jax.jit
    def mm_bf16(a):
        return jax.lax.dot_general(a, b16, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    t = timed(lambda a: mm_bf16(a), [(a,) for a in a16])
    print(f"{tag} ({m}x{k}x{n}) bf16: {t * 1e3:7.3f} ms  "
          f"{flops / t / 1e12:6.1f} TF/s  MFU {flops / t / PEAK_BF16:5.1%}")

    a8 = [jax.device_put(rng.integers(-127, 128, size=(m, k),
                                      dtype=np.int8)) for _ in range(8)]
    b8 = jax.device_put(rng.integers(-127, 128, size=(k, n), dtype=np.int8))

    @jax.jit
    def mm_int8(a):
        return jax.lax.dot_general(a, b8, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    t8 = timed(lambda a: mm_int8(a), [(a,) for a in a8])
    print(f"{tag} ({m}x{k}x{n}) int8: {t8 * 1e3:7.3f} ms  "
          f"{flops / t8 / 1e12:6.1f} TOP/s  of-peak "
          f"{flops / t8 / PEAK_INT8:5.1%}  speedup {t / t8:4.2f}x")

    # Realistic path: f32 activations -> dynamic per-row quantize -> int8
    # GEMM -> dequant epilogue (per-row x per-col scales).
    bscale = jax.device_put(rng.random((1, n)).astype(np.float32) + 0.5)
    af = [jax.device_put(rng.normal(size=(m, k)).astype(np.float32))
          for _ in range(8)]

    @jax.jit
    def mm_dynq(a):
        s = jnp.max(jnp.abs(a), axis=1, keepdims=True) / 127.0
        q = jnp.round(a / s).astype(jnp.int8)
        acc = jax.lax.dot_general(q, b8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * s * bscale

    tq = timed(lambda a: mm_dynq(a), [(a,) for a in af])
    print(f"{tag} ({m}x{k}x{n}) dynq: {tq * 1e3:7.3f} ms  "
          f"{flops / tq / 1e12:6.1f} TF/s-equiv  speedup vs bf16 "
          f"{t / tq:4.2f}x")
    return t, t8, tq


def main():
    enable_persistent_cache()
    print(f"devices: {jax.devices()}")
    # ViViT B=16 shapes: tokens = 16 x 1569 ~ 25104 (use 25088 = 196*128)
    M = 25088
    bench_shape(M, 768, 3072, "ffn1 ")
    bench_shape(M, 3072, 768, "ffn2 ")
    bench_shape(M, 768, 2304, "qkv  ")
    bench_shape(M, 768, 768, "outp ")
    bench_shape(16 * 1568, 3072, 768, "patch")
    # Wav2Vec2 B=64 transformer shapes: tokens = 64*199 ~ 12736
    bench_shape(12736, 1024, 4096, "w2v2-ffn1")


if __name__ == "__main__":
    main()
