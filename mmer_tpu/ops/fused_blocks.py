"""Fused transformer-block Pallas kernels for the ViViT hot path.

VERDICT r2 #3: the ViViT forward sits at 27.6% MFU against its own 35.8%
attention-free ceiling; the remaining non-attention cost is LayerNorm/GELU
VPU passes between GEMMs and the HBM round trips of their intermediates.
These kernels fuse each pre-norm sublayer into ONE VMEM-resident program:

- :func:`fused_ffn` — ``x + GELU(LN(x) @ W1 + b1) @ W2 + b2`` — ROUTED
  (models/vivit.py): in the XLA path the (B, S, mlp_dim) hidden tensor is
  written and re-read around the GELU (2 × 154 MB per layer at B=16 for
  ViViT-B); here it lives and dies in VMEM.  LayerNorm, exact-erf GELU
  (torch parity, reference video_extractor.py:75) and the residual add
  all ride the same program.  Measured 3.20 vs XLA's 3.73 ms/layer at the
  production shape (scripts/profile_fused_blocks.py).
- :func:`fused_ln_matmul` — ``LN(x) @ W`` — NOT routed (recorded negative
  result): measured 1.80 vs XLA's 1.44 ms/layer for the QKV projection;
  XLA already pipelines the LayerNorm into the GEMM well at this shape.
  Kept with its equivalence test as the baseline for future fusion work.

Semantics matched against the XLA modules (models/vivit.py PreNormBlock):
LayerNorm in float32 with flax's ``var = max(0, E[x²] − E[x]²)`` and
eps 1e-6; GEMMs on the weight's dtype (bf16 in production) with float32
accumulation; GELU and the residual add in float32.  Equivalence is
tolerance-tested in tests/test_fused_blocks.py (exact in float32 mode).

Weights are replicated to every grid step via constant index maps — Mosaic
fetches them once and keeps them VMEM-resident across the token-block grid.
Token blocks that do not evenly divide S are handled by Pallas edge
masking (garbage rows compute garbage and are dropped on the masked
write; no row mixes with another).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """float32 erf for Mosaic (no erf primitive in the Pallas TPU lowering):
    Abramowitz & Stegun 7.1.26, max abs error 1.5e-7 — below f32 GELU
    round-off for the activations that reach it.  Used in interpret mode
    too, so the CPU equivalence tests exercise the exact production
    formula."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ln_rows(x32: jnp.ndarray, scale: jnp.ndarray,
             bias: jnp.ndarray) -> jnp.ndarray:
    """flax.linen.LayerNorm semantics on float32 rows."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    mean2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    y = (x32 - mean) * jax.lax.rsqrt(var + 1e-6)
    return y * scale + bias


def _pick_block_t(s: int, d: int, n_inner: int, itemsize: int,
                  weight_bytes: int) -> int:
    """Largest token block (multiple of 8, ≤512) fitting the VMEM model:
    2×(x + out) double-buffered blocks + resident weights + the f32
    intermediate."""
    for bt in (512, 384, 256, 192, 128, 64, 32, 16, 8):
        io = 2 * 2 * bt * (d + n_inner) * itemsize
        inter = bt * n_inner * 4 + bt * d * 4
        if weight_bytes + io + inter <= _VMEM_BUDGET:
            return bt
    return 8


def _ln_matmul_kernel(x_ref, s_ref, b_ref, w_ref, o_ref):
    x32 = x_ref[0].astype(jnp.float32)
    y = _ln_rows(x32, s_ref[0], b_ref[0]).astype(w_ref.dtype)
    o_ref[0] = jnp.dot(y, w_ref[:],
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_ln_matmul(x, scale, bias, w, interpret):
    b, s, d = x.shape
    n = w.shape[1]
    bt = _pick_block_t(s, d, n, max(x.dtype.itemsize, w.dtype.itemsize),
                       w.size * w.dtype.itemsize)
    grid = (b, pl.cdiv(s, bt))
    return pl.pallas_call(
        _ln_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda i, t: (i, t, 0)),
            pl.BlockSpec((1, d), lambda i, t: (0, 0)),
            pl.BlockSpec((1, d), lambda i, t: (0, 0)),
            pl.BlockSpec((d, n), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, n), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, n), w.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s * d * n,
            bytes_accessed=(x.size * x.dtype.itemsize + w.size * w.dtype.itemsize
                            + b * s * n * w.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x, scale.reshape(1, d), bias.reshape(1, d), w)


def fused_ln_matmul(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    w: jnp.ndarray, interpret: bool | None = None
                    ) -> jnp.ndarray:
    """``LayerNorm(x) @ w`` with the LN output never materialized in HBM.

    x: (B, S, D); scale/bias: (D,) float32 LN params; w: (D, N) in the
    compute dtype.  Returns (B, S, N) in ``w.dtype``.
    """
    if interpret is None:
        interpret = _interpret_default()
    return _fused_ln_matmul(x, scale, bias, w, interpret)


def _ffn_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                y_ref, acc_ref):
    """One (batch, token-block) tile of the FFN, hidden dim chunked over
    the LAST grid axis so W1/W2 stream through VMEM one (D, MC)/(MC, D)
    slab at a time while the token block, the LN output (y_ref scratch)
    and the f32 accumulator stay resident.  TPU grids execute sequentially
    on the core, so scratch carries state across the mc steps.

    Measured variants at the ViViT-B shape (scripts/profile_fused_blocks,
    B=16, S=1569): this layout (bt=512, mc=768) 3.20 ms/layer; recomputing
    LN per mc step to afford bt=768/mc=512 was WORSE (3.57) — the extra
    VPU passes cost more than the saved weight-slab refetches; XLA's
    unfused sublayer is 3.73."""
    mc = pl.program_id(2)

    @pl.when(mc == 0)
    def _():
        x32 = x_ref[0].astype(jnp.float32)
        y_ref[:] = _ln_rows(x32, s_ref[0], b_ref[0])
        acc_ref[:] = jnp.zeros_like(acc_ref)

    y = y_ref[:].astype(w1_ref.dtype)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0]
    # Exact-erf GELU (torch parity; reference video_extractor.py:75).
    h = 0.5 * h * (1.0 + _erf(h * (1.0 / math.sqrt(2.0))))
    h = h.astype(w2_ref.dtype)
    acc_ref[:] += jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(mc == pl.num_programs(2) - 1)
    def _():
        o = x_ref[0].astype(jnp.float32) + acc_ref[:] + b2_ref[0]
        o_ref[0] = o.astype(o_ref.dtype)


def _pick_ffn_blocks(d: int, m: int, x_itemsize: int,
                     w_itemsize: int) -> tuple[int, int]:
    """(block_t, m_chunk) under the VMEM model: double-buffered weight
    slabs + x/out blocks + f32 LN-output scratch, accumulator and h
    value.  The stream and weight itemsizes are separate — the Wav2Vec2
    encoder keeps an f32 residual stream over bf16 weights, and lumping
    them (max) halves the affordable token block for no reason."""
    for bt in (512, 384, 256, 128, 64):
        for mcs in (1024, 768, 512, 256):
            if m % mcs:
                continue
            weights = 2 * (d * mcs + mcs * d) * w_itemsize
            io = 2 * 2 * bt * d * x_itemsize
            scratch = 2 * bt * d * 4 + bt * mcs * 4
            if weights + io + scratch <= _VMEM_BUDGET:
                return bt, mcs
    # Fallback MUST still divide m — the grid uses m // m_chunk, so a
    # non-divisor would silently drop the hidden-dim tail (e.g. m=384
    # with chunk 256 computes only 256 units).  Take the largest
    # divisor ≤ 256; worst case degenerates to small chunks, never to
    # wrong results.
    for mcs in range(min(256, m), 0, -1):
        if m % mcs == 0:
            return 64, mcs
    return 64, m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_ffn(x, scale, bias, w1, b1, w2, b2, interpret):
    b0, s0, d = x.shape
    # The FFN is token-wise, so batch×tokens flatten into ONE grid axis:
    # fewer ragged tail blocks (at ViViT-B's S=1569, per-batch bt=512
    # blocks pad 1569→2048 rows — 23% masked garbage compute) and ~B×
    # fewer weight-slab streaming sweeps.
    x = x.reshape(1, b0 * s0, d)
    b, s = 1, b0 * s0
    m = w1.shape[1]
    bt, mcs = _pick_ffn_blocks(d, m, x.dtype.itemsize, w1.dtype.itemsize)
    assert m % mcs == 0, (m, mcs)
    grid = (b, pl.cdiv(s, bt), m // mcs)
    return pl.pallas_call(
        _ffn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bt, d), lambda i, t, mc: (i, t, 0)),
            pl.BlockSpec((1, d), lambda i, t, mc: (0, 0)),
            pl.BlockSpec((1, d), lambda i, t, mc: (0, 0)),
            pl.BlockSpec((d, mcs), lambda i, t, mc: (0, mc)),
            pl.BlockSpec((1, mcs), lambda i, t, mc: (0, mc)),
            pl.BlockSpec((mcs, d), lambda i, t, mc: (mc, 0)),
            pl.BlockSpec((1, d), lambda i, t, mc: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, d), lambda i, t, mc: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, d), jnp.float32),      # LN output
            pltpu.VMEM((bt, d), jnp.float32),      # f32 accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * d * m,
            bytes_accessed=(2 * x.size * x.dtype.itemsize
                            + (w1.size + w2.size) * w1.dtype.itemsize),
            transcendentals=b * s * m),
        interpret=interpret,
    )(x, scale.reshape(1, d), bias.reshape(1, d), w1, b1.reshape(1, m),
      w2, b2.reshape(1, d)).reshape(b0, s0, d)


def fused_ffn(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
              w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
              b2: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """``x + GELU(LN(x) @ w1 + b1) @ w2 + b2`` — the whole pre-norm FFN
    sublayer in one VMEM-resident program (the (B, S, mlp_dim) hidden
    tensor never touches HBM).

    x: (B, S, D); scale/bias: (D,) float32; w1: (D, M), b1: (M,),
    w2: (M, D), b2: (D,) in the compute dtype.  Returns (B, S, D) in
    ``x.dtype``.
    """
    if interpret is None:
        interpret = _interpret_default()
    return _fused_ffn(x, scale, bias, w1, b1, w2, b2, interpret)
