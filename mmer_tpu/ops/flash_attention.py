"""Fused multi-head attention as a Pallas TPU kernel.

Used by the ViViT extractor (models/vivit.py), whose sequence length is
S = 8·196 + 1 = 1569 tokens per 32-frame chunk (reference
video_extractor.py:14,82-104).  XLA's stock lowering materializes the
(B, H, S, S) score tensor in HBM — ~118 MB fp32 per chunk at H=12 — so the
attention becomes HBM-bandwidth-bound.  This kernel keeps each q-block's
score row entirely in VMEM: per grid program it computes
``softmax(q_blk @ K^T / sqrt(d)) @ V`` with fp32 accumulation and only the
(BQ, D) output block ever returns to HBM.

Layout: grid = (B, H/BH, S_pad/BQ) with BH heads processed inside one
program by a ``fori_loop`` (one scores buffer live at a time).  K/V for
the program's head group live fully in VMEM and are revisited across the
q-block axis, so they re-DMA only when (batch, head-group) changes.
Block sizes are chosen by an explicit VMEM model (``_pick_blocks``):
BQ=416, BH=6 at the ViViT shape (S_pad=1664, D=64, bf16).

Why this shape: head_dim 64 halves MXU utilisation on both matmuls no
matter the tiling (the contraction/output lane dim is 64 of 128), so the
lever that actually pays is per-program arithmetic intensity.  A
(B, H, S/128) grid runs 2,496 programs per layer with only ~55 MFLOP
each — grid/DMA overhead dominated and measured at ~12% MFU in-model.
Head-group fusion and 3.25× larger q-blocks give 128 programs of
~1.1 GFLOP, and the softmax normalisation is applied to the (BQ, 64)
output instead of the (BQ, S) probability matrix (26× less VPU divide
traffic).

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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int,
                 heads: int):
    s_pad = k_ref.shape[2]
    key_mask = None
    if seq_len < s_pad:
        key_idx = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[2], s_pad), 1)
        key_mask = key_idx < seq_len

    def body(hh, _):
        # fori_loop (not a Python unroll): one scores/p buffer is live at
        # a time, keeping the kernel inside the ~16 MB VMEM budget.
        # Scale is folded into q — a (BQ, D) pass, not (BQ, S_pad).
        q = q_ref[0, hh] * scale                  # (BQ, D)
        k = k_ref[0, hh]                          # (S_pad, D)
        v = v_ref[0, hh]                          # (S_pad, D)

        scores = jax.lax.dot_general(
            q.astype(k.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # (BQ, S_pad)
        if key_mask is not None:
            scores = jnp.where(key_mask, scores, -jnp.inf)

        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        # Softmax denominator rides the second matmul: a ones column
        # appended to V lands in the same 128-lane MXU tile that N=D=64
        # already half-fills, so sum(p) costs zero extra MXU time and
        # saves a full (BQ, S_pad) VPU reduction pass.
        v_ext = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        out_ext = jax.lax.dot_general(
            p.astype(v.dtype), v_ext,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (BQ, D + 1)
        d = v.shape[1]
        # Normalise on the (BQ, D) output, not the (BQ, S_pad) matrix.
        o_ref[0, hh] = (out_ext[:, :d] / out_ext[:, d:]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, body, 0)


def _attn_kernel_varlen(len_ref, q_ref, k_ref, v_ref, o_ref, *,
                        scale: float, heads: int):
    """Per-batch dynamic key-length masking (Wav2Vec2: clips shorter than
    the padded batch length attend to their own frames only).

    Padded keys get a large-negative FINITE additive bias, not -inf,
    mirroring models/wav2vec2.py EncoderLayer: a zero-length clip's rows
    softmax to uniform instead of NaN (they are dropped later by the
    length-masked pooling).  For rows with any valid key the padded keys
    still round to exactly 0 probability.  The only divergence from the
    XLA path: a fully-masked row averages over s_pad zero-padded values
    instead of seq_len — harmless, those rows are never consumed.

    vmap note: ``len_ref[pl.program_id(0)]`` hard-codes grid dim 0 as
    the kernel's batch axis.  Pallas's batching rule prepends a grid
    dimension under ``jax.vmap`` BUT records it in
    ``GridMapping.vmapped_dims``, and ``program_id`` lowering skips
    vmapped dims — so axis 0 keeps meaning this kernel's own batch axis
    and vmapping the varlen path is safe (verified empirically:
    tests/test_flash_varlen.py::test_varlen_vmap_matches_stacked).
    """
    s_pad = k_ref.shape[2]
    # len_ref is the FULL (B,) vector in SMEM (Pallas TPU rejects rank-1
    # blocks that are neither full-size nor a 128-multiple); pick this
    # program's batch element by grid position.
    kl = len_ref[pl.program_id(0)]
    key_idx = jax.lax.broadcasted_iota(
        jnp.int32, (q_ref.shape[2], s_pad), 1)
    bias = jnp.where(key_idx < kl, 0.0, -1e9).astype(jnp.float32)

    def body(hh, _):
        q = q_ref[0, hh] * scale
        k = k_ref[0, hh]
        v = v_ref[0, hh]
        scores = jax.lax.dot_general(
            q.astype(k.dtype), k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        v_ext = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1)
        out_ext = jax.lax.dot_general(
            p.astype(v.dtype), v_ext,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = v.shape[1]
        o_ref[0, hh] = (out_ext[:, :d] / out_ext[:, d:]).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, body, 0)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pick_block_q(s_pad: int, cap: int = 512, step: int = 8) -> int:
    """Largest divisor of ``s_pad`` that is ≤ cap and a ``step`` multiple.

    ``step`` is the sublane tile height for the input dtype: 8 rows for
    4-byte elements, 16 for 2-byte (bf16) — a bf16 block_q that is a
    multiple of 8 but not 16 can fail to lower in Mosaic on odd shapes.
    ``s_pad`` is always a 128 multiple (flash_attention pads S), so a
    ``step``-multiple divisor always exists.
    """
    best = step
    for bq in range(step, cap + 1, step):
        if s_pad % bq == 0:
            best = bq
    return best


_VMEM_BUDGET = 14 * 1024 * 1024     # leave slack under the 16 MB scope


def _vmem_bytes(block_q: int, block_h: int, s_pad: int, d: int,
                itemsize: int, varlen: bool = False) -> int:
    """Worst-case VMEM for one program incl. Mosaic double-buffering:
    2×(q+out) blocks, 2×2 K/V blocks, one f32 scores + one f32 p buffer.
    The varlen kernel additionally materializes an f32 bias (plus its
    int32 iota) at (block_q, s_pad) outside the head loop — two more
    4-byte planes."""
    q_out = 2 * 2 * block_h * block_q * d * itemsize
    kv = 2 * 2 * block_h * s_pad * d * itemsize
    scores = 2 * block_q * s_pad * 4
    if varlen:
        scores += 2 * block_q * s_pad * 4
    return q_out + kv + scores


def _pick_blocks(h: int, s_pad: int, d: int, itemsize: int,
                 varlen: bool = False) -> tuple[int, int]:
    """(block_q, block_h) maximizing per-program work within VMEM."""
    step = 16 if itemsize == 2 else 8
    block_q = _pick_block_q(s_pad, step=step)
    while True:
        for block_h in range(h, 0, -1):
            if h % block_h:
                continue
            if _vmem_bytes(block_q, block_h, s_pad, d,
                           itemsize, varlen=varlen) <= _VMEM_BUDGET:
                return block_q, block_h
        smaller = _pick_block_q(s_pad, cap=block_q - step, step=step)
        if smaller == block_q:
            return block_q, 1           # give up; let Mosaic try
        block_q = smaller


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_lens: jnp.ndarray | None = None,
                    block_q: int | None = None,
                    block_h: int | None = None,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Fused attention over (B, H, S, D) tensors.

    Pads S up to a 128 multiple internally; returns (B, H, S, D).
    ``key_lens`` (optional, ``(B,)`` int32) masks keys at or beyond each
    batch element's valid length with a finite -1e9 additive bias — the
    Wav2Vec2 frame-padding semantics (models/wav2vec2.py EncoderLayer);
    without it, attention is full (unmasked) over the true S.
    ``block_q``/``block_h`` override the VMEM-model block picker (tests;
    a manual ``block_q`` alone implies single-head programs).
    """
    b, h, s, d = q.shape
    scale = 1.0 / (d ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    s_pad = _round_up(s, 128)
    if block_q is None:
        block_q, auto_h = _pick_blocks(h, s_pad, d, q.dtype.itemsize,
                                       varlen=key_lens is not None)
        block_h = auto_h if block_h is None else block_h
    elif block_h is None:
        block_h = 1
    s_pad = _round_up(s_pad, block_q)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (b, h // block_h, s_pad // block_q)
    kv_spec = pl.BlockSpec((1, block_h, s_pad, d),
                           lambda bi, hi, qi: (bi, hi, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, block_h, block_q, d),
                          lambda bi, hi, qi: (bi, hi, qi, 0),
                          memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=4 * b * h * s_pad * s_pad * d,
        bytes_accessed=(2 * b * h * s_pad * d * q.dtype.itemsize * 2
                        + b * h * s_pad * d * q.dtype.itemsize),
        transcendentals=b * h * s_pad * s_pad,
    )
    if key_lens is not None:
        # Dynamic per-batch lengths ride SMEM; the static tail (s..s_pad)
        # is covered by the same bias since key_lens <= s.
        lens = jnp.minimum(key_lens.astype(jnp.int32).reshape(b), s)
        # Full-size rank-1 SMEM block: a (1,) block over a (b,) array
        # fails Mosaic lowering ("multiple of the tiling size (128)");
        # the kernel indexes by pl.program_id(0) instead.
        len_spec = pl.BlockSpec((b,), lambda bi, hi, qi: (0,),
                                memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            functools.partial(_attn_kernel_varlen, scale=scale,
                              heads=block_h),
            out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            grid=grid,
            in_specs=[len_spec, q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            cost_estimate=cost,
            interpret=interpret,
        )(lens, q, k, v)
    else:
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale, seq_len=s,
                              heads=block_h),
            out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            cost_estimate=cost,
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
