"""Where does the ViViT flash-attention kernel's time go?  (probe)

Times ablated variants of ops/flash_attention.py at the ViViT shape
(B=16, H=12, S=1569→1664, D=64, bf16) on the real chip, all through the
same harness so the numbers are self-consistent:

  full        — the production kernel (mask + max + exp + normalize)
  nomask      — seq_len == s_pad (drops the per-head iota/where pass)
  noexp       — exp replaced by identity (numerics-invalid; isolates the
                transcendental cost)
  nosoftmax   — two matmuls only (numerics-invalid; the MXU floor)
  mxumask     — mask folded into the QK^T matmul via an appended bias
                column on q/k (candidate optimisation: the MXU pays the
                65th contraction lane, the VPU saves a full where pass)

The gap full→nosoftmax is the total VPU/softmax overhead; noexp places
exp within it; mxumask tests whether MXU-side masking is free.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.ops.flash_attention import (_pick_blocks, _round_up,
                                          flash_attention)

PEAK = 197e12
B, H, S, D = 16, 12, 1569, 64


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, heads, mode):
    s_pad = k_ref.shape[2]
    key_mask = None
    if mode in ("full",) and seq_len < s_pad:
        key_idx = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[2], s_pad), 1)
        key_mask = key_idx < seq_len

    def body(hh, _):
        q = q_ref[0, hh] * scale
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q.astype(k.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if key_mask is not None:
            scores = jnp.where(key_mask, scores, -jnp.inf)
        if mode == "nosoftmax":
            p = scores
        elif mode == "noexp":
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = scores - m
        else:
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
        v_ext = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        out_ext = jax.lax.dot_general(
            p.astype(v.dtype), v_ext,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, hh] = (out_ext[:, :D] / out_ext[:, D:]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, body, 0)


def _kernel_kt(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, heads,
               softmax=True):
    """K arrives pre-transposed (D, S_pad): QK^T needs no in-kernel
    relayout and the RHS minor dim is S_pad (full 128-lane tiles)."""
    s_pad = k_ref.shape[3]
    key_mask = None
    if softmax and seq_len < s_pad:
        key_idx = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[2], s_pad), 1)
        key_mask = key_idx < seq_len

    def body(hh, _):
        q = q_ref[0, hh] * scale
        kt = k_ref[0, hh]                        # (D, S_pad)
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q.astype(kt.dtype), kt,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if softmax:
            if key_mask is not None:
                scores = jnp.where(key_mask, scores, -jnp.inf)
            m = jnp.max(scores, axis=-1, keepdims=True)
            p = jnp.exp(scores - m)
        else:
            p = scores
        v_ext = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        out_ext = jax.lax.dot_general(
            p.astype(v.dtype), v_ext,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, hh] = (out_ext[:, :D] / out_ext[:, D:]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, body, 0)


def _kernel_mxumask(q_ref, k_ref, v_ref, o_ref, *, heads):
    """q/k arrive with an appended 65th column: q[..., -1] = 1,
    k[..., -1] = 0 (valid) / -1e9 (padded); scale pre-folded into q."""

    def body(hh, _):
        q = q_ref[0, hh]
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        v_ext = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        out_ext = jax.lax.dot_general(
            p.astype(v.dtype), v_ext,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0, hh] = (out_ext[:, :D] / out_ext[:, D:]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, body, 0)


def run_variant(q, k, v, mode):
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    s_pad = _round_up(s, 128)
    block_q, block_h = _pick_blocks(h, s_pad, d, q.dtype.itemsize)
    s_pad = _round_up(s_pad, block_q)
    pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
    q = jnp.pad(q, pad)
    k = jnp.pad(k, pad)
    v = jnp.pad(v, pad)

    if mode in ("kt", "kt_nosoftmax"):
        kt = jnp.swapaxes(k, 2, 3)               # (B, H, D, S_pad)
        kern = functools.partial(_kernel_kt, scale=scale, seq_len=s,
                                 heads=block_h,
                                 softmax=(mode == "kt"))
        grid = (b, h // block_h, s_pad // block_q)
        k_spec = pl.BlockSpec((1, block_h, d, s_pad),
                              lambda bi, hi, qi: (bi, hi, 0, 0),
                              memory_space=pltpu.VMEM)
        v_spec = pl.BlockSpec((1, block_h, s_pad, d),
                              lambda bi, hi, qi: (bi, hi, 0, 0),
                              memory_space=pltpu.VMEM)
        q_spec = pl.BlockSpec((1, block_h, block_q, d),
                              lambda bi, hi, qi: (bi, hi, qi, 0),
                              memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, k_spec, v_spec],
            out_specs=q_spec,
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * s_pad * s_pad * d,
                bytes_accessed=4 * b * h * s_pad * d * 2,
                transcendentals=b * h * s_pad * s_pad),
        )(q, kt, v)
        return out[:, :, :s, :]

    if mode == "mxumask":
        ones = jnp.ones((b, h, s_pad, 1), q.dtype)
        bias = jnp.where(
            (jnp.arange(s_pad) < s)[None, None, :, None], 0.0, -1e9
        ).astype(q.dtype) * jnp.ones((b, h, 1, 1), q.dtype)
        q = jnp.concatenate([q * scale, ones], axis=-1)
        k = jnp.concatenate([k, bias], axis=-1)
        d_qk = d + 1
        kern = functools.partial(_kernel_mxumask, heads=block_h)
    else:
        d_qk = d
        kern = functools.partial(_kernel, scale=scale, seq_len=s,
                                 heads=block_h, mode=mode)

    grid = (b, h // block_h, s_pad // block_q)
    k_spec = pl.BlockSpec((1, block_h, s_pad, d_qk),
                          lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_h, s_pad, d),
                          lambda bi, hi, qi: (bi, hi, 0, 0),
                          memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, block_h, block_q, d_qk),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, block_h, block_q, d),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=o_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * d,
            bytes_accessed=4 * b * h * s_pad * d * 2,
            transcendentals=b * h * s_pad * s_pad),
    )(q, k, v)
    return out[:, :, :s, :]


def timed(fn, inputs, n_chain=4, reps=3):
    outs = fn(*inputs[-1])
    jax.block_until_ready(outs)
    best = float("inf")
    for r in range(reps):
        chain = inputs[(r * n_chain) % len(inputs):][:n_chain]
        t0 = time.time()
        outs = [fn(*args) for args in chain]
        jax.block_until_ready(outs)
        best = min(best, (time.time() - t0) / n_chain)
    return best


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}  B={B} H={H} S={S} D={D}")
    qkvs = [tuple(jax.device_put(
        rng.normal(size=(B, H, S, D)).astype(jnp.bfloat16))
        for _ in range(3)) for _ in range(12)]
    fl = 4 * B * H * S * S * D

    ref = None
    for mode in ("full", "nomask", "noexp", "nosoftmax", "mxumask",
                 "kt", "kt_nosoftmax"):
        fn = jax.jit(functools.partial(run_variant, mode=mode))
        t = timed(fn, qkvs)
        note = ""
        if mode in ("full", "nomask", "mxumask", "kt"):
            got = np.asarray(fn(*qkvs[0])[0, 0, :8, :8], np.float32)
            if ref is None:
                ref = np.asarray(
                    jax.jit(flash_attention)(*qkvs[0])[0, 0, :8, :8],
                    np.float32)
            err = float(np.abs(got - ref).max())
            note = f" max|Δ|={err:.2e}"
        print(f"{mode:10s} {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s "
              f"MFU={fl/t/PEAK*100:5.1f}%{note}")


if __name__ == "__main__":
    main()
