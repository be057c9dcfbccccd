"""Kernel-level A/B: fused_blocks Pallas kernels vs their XLA equivalents
at the ViViT-B production shape (B=16, S=1569, D=768, M=3072, bf16).

Tunnel-safe timing (CLAUDE.md): distinct pre-staged device inputs, chained
calls, one sync.  Roofline references (v5e): 197 TFLOP/s bf16, ~820 GB/s.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.ops.fused_blocks import fused_ffn, fused_ln_matmul

B, S, D, M, N_QKV = 16, 1569, 768, 3072, 2304
PEAK = 197e12


def timed(fn, inputs, reps=2, chain=4):
    out = fn(*inputs[-1])
    jax.block_until_ready(out)
    best = float("inf")
    for r in range(reps):
        batch = inputs[r * chain:(r + 1) * chain]
        t0 = time.time()
        outs = [fn(*args) for args in batch]
        jax.block_until_ready(outs)
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][0, :1])
        best = min(best, (time.time() - t0) / chain)
    return best


def report(name, t, flops):
    print(f"{name:28s} {t*1e3:8.2f} ms  {flops/t/1e12:6.1f} TF/s "
          f"MFU={flops/t/PEAK*100:5.1f}%", flush=True)


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}", flush=True)

    xs = [jax.device_put(jnp.asarray(
        rng.normal(size=(B, S, D)), jnp.bfloat16)) for _ in range(9)]
    scale = jnp.asarray(rng.normal(size=(D,)) * 0.1 + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    w_qkv = jnp.asarray(rng.normal(size=(D, N_QKV)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(D, M)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(size=(M,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(M, D)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
    jax.block_until_ready([xs, w_qkv, w1, w2])

    # Each timed call runs a DEPTH-layer chain inside ONE jit: a single
    # dispatch through this environment's relay costs ~15-20 ms, which
    # would swamp a sub-ms kernel timed per-call (measured: the same
    # LN+QKV GEMM reads 19 ms standalone but the whole 12-layer
    # non-attention model is 56 ms).  Reported numbers are per layer.
    DEPTH = 12

    def ln(x32):
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(jnp.mean(x32 * x32, -1, keepdims=True) - mu * mu, 0)
        return (x32 - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias

    # ---- LN + QKV GEMM (chained via a cheap slice back to D) -----------
    @jax.jit
    def qkv_xla(x):
        for _ in range(DEPTH):
            y = ln(x.astype(jnp.float32)).astype(jnp.bfloat16)
            x = (y @ w_qkv)[:, :, :D]
        return x

    @jax.jit
    def qkv_fused(x):
        for _ in range(DEPTH):
            x = fused_ln_matmul(x, scale, bias, w_qkv)[:, :, :D]
        return x

    fl = 2 * B * S * D * N_QKV * DEPTH
    report("LN+QKV xla", timed(qkv_xla, [(x,) for x in xs]) / DEPTH,
           fl / DEPTH)
    report("LN+QKV fused", timed(qkv_fused, [(x,) for x in xs]) / DEPTH,
           fl / DEPTH)

    # ---- FFN sublayer (shape-preserving, chains directly) --------------
    @jax.jit
    def ffn_xla(x):
        for _ in range(DEPTH):
            y = ln(x.astype(jnp.float32)).astype(jnp.bfloat16)
            h = y @ w1 + b1.astype(jnp.bfloat16)
            h = jax.nn.gelu(h, approximate=False)
            x = x + (h @ w2 + b2.astype(jnp.bfloat16)).astype(x.dtype)
        return x

    @jax.jit
    def ffn_fused(x):
        for _ in range(DEPTH):
            x = fused_ffn(x, scale, bias, w1, b1, w2, b2)
        return x

    fl = 4 * B * S * D * M * DEPTH
    report("FFN xla", timed(ffn_xla, [(x,) for x in xs]) / DEPTH, fl / DEPTH)
    report("FFN fused", timed(ffn_fused, [(x,) for x in xs]) / DEPTH,
           fl / DEPTH)


if __name__ == "__main__":
    main()
