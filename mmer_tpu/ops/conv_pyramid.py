"""Fused conv→LayerNorm→GELU Pallas kernels for the Wav2Vec2 feature encoder.

The reference runs the HF Wav2Vec2 conv feature encoder as seven torch
``Conv1d`` layers (reference voice_extractor.py:37-50 via
``transformers.Wav2Vec2Model``); the XLA port (models/wav2vec2.py
``ConvFeatureEncoder``) profiled at 19% MFU with the LayerNorm/GELU
between convs costing extra HBM round trips (VERDICT r2 weak #4, r2→r3
open thread).  Per-layer *im2col in HBM* was a measured negative result
(models/wav2vec2.py:102-117) — the patch materialization traffic beat the
GEMM win.  These kernels take the other route: keep XLA's conv data
layout in HBM, but run each layer as ONE Pallas program that does the
conv *as a GEMM from a stride-merged view*, adds the bias, and applies
LayerNorm + exact-erf GELU before anything returns to HBM — the
inter-layer traffic drops to exactly one bf16 activation write+read per
layer and all VPU epilogue work rides the GEMM's program.

The stride-2 trick that makes the GEMM contiguous: a row-major
``(B, T, C)`` activation reinterpreted as ``(B, T/2, 2C)`` is the SAME
BYTES (a free XLA bitcast — no relayout, unlike doing the reshape inside
a kernel, where it is a Mosaic tile shuffle).  On the merged view a
kernel-size-2 stride-2 conv is a single ``(bt, 2C) × (2C, C)`` matmul,
and a kernel-size-3 stride-2 conv adds one more ``(bt, C) × (C, C)``
matmul whose operand is the merged block shifted up by one row — the row
that falls off the block end is fetched through a second, single-row
BlockSpec on the *same* array pointed at the next block (overlapping
reads expressed at block granularity, no carries, no reverse sweeps).
Outputs are padded to even length so the next layer's merged view is
again a pure bitcast; pad rows never reach real output rows (a
kernel-size-k stride-2 conv's row t reads rows 2t..2t+k-1, so row
``t_out`` onward is the only consumer of pad data).

Layer 0 (kernel 10, stride 5, 1 input channel) contracts over only 10
taps — its patches are built host-side with the contiguous stride-block
construction of ``models/wav2vec2._im2col_conv`` (≈26 MB for a B=64×4 s
batch, noise next to the 840 MB layer-0 output) and fed to the same
GEMM+LN+GELU kernel.

Measured on the v5e-1 at the extraction shape (B=64 × 4 s,
scripts/profile_conv_pyramid.py): XLA conv encoder 35.7 ms (17.9% MFU),
per-layer fused kernels 39.0 ms (slower — the six extra program
launches and per-layer HBM round trips eat the fusion win; kept as the
interpret-testable oracle between the XLA module and the mega kernel),
whole-pyramid ``mega`` kernel 31.6 ms (20.1% MFU) — full Wav2Vec2 model
525→535 clips/s.  A no-phase-selection floor probe measured 23.0 ms,
bounding what any further tap-gathering cleverness could recover.

Numerics mirror the XLA module operation-for-operation: f32 GEMM
accumulation rounded to the compute dtype, bias added in the compute
dtype, LayerNorm in f32 (flax semantics, eps 1e-6), the LN result
rounded to the compute dtype before the exact-erf GELU.  Equivalence vs
``ConvFeatureEncoder`` is tested in tests/test_conv_pyramid.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from mmer_tpu.ops.fused_blocks import _erf, _interpret_default, _ln_rows

__all__ = ["fused_conv_encoder", "supports_config"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_config(cfg) -> bool:
    """The kernels cover the HF Wav2Vec2 feature-encoder family: layer-norm
    variant, any first layer, then stride-2 layers with kernel 2 or 3."""
    return (cfg.feat_extract_norm == "layer"
            and all(s == 2 and k in (2, 3)
                    for k, s in zip(cfg.conv_kernels[1:], cfg.conv_strides[1:])))


def _epilogue(y32: jnp.ndarray, cb: jnp.ndarray, scale: jnp.ndarray,
              bias: jnp.ndarray, dt) -> jnp.ndarray:
    """bias-add → LayerNorm → exact-erf GELU, with the XLA path's exact
    rounding points (conv output and LN output rounded to ``dt``)."""
    y = y32.astype(dt) + cb.astype(dt)
    ln = _ln_rows(y.astype(jnp.float32), scale, bias).astype(dt)
    g32 = ln.astype(jnp.float32)
    g32 = 0.5 * g32 * (1.0 + _erf(g32 * (1.0 / math.sqrt(2.0))))
    return g32.astype(dt)


def _gemm_kernel(x_ref, w_ref, cb_ref, s_ref, b_ref, o_ref):
    """Layer-0 patches OR a kernel-2 stride-2 merged block: one matmul."""
    y32 = jnp.dot(x_ref[0], w_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = _epilogue(y32, cb_ref[0], s_ref[0], b_ref[0], o_ref.dtype)


def _k3_kernel(xm_ref, xn_ref, w01_ref, w2_ref, cb_ref, s_ref, b_ref, o_ref,
               *, bt: int, th: int):
    """Kernel-3 stride-2 conv on the merged view: row t is
    ``xm[t] @ [W0;W1] + xm[t+1, :C] @ W2`` — the shifted operand's last
    row comes from ``xn``, an 8-row spec on the same array holding the
    next block's first row (clamped so the final block picks up the
    merged array's last real frame; Mosaic requires ≥8-row blocks, so
    the row is selected dynamically inside the aligned 8-row window)."""
    c = w2_ref.shape[0]
    t = pl.program_id(1)
    # Global row needed, and the 8-aligned window _xn_index (below) chose:
    # their difference is the in-window offset (0 when unclamped).
    row = jnp.minimum(bt * (t + 1), th - 1)
    start = 8 * jnp.minimum((bt // 8) * (t + 1), (th - 1) // 8)
    xm = xm_ref[0]
    y32 = jnp.dot(xm, w01_ref[:], preferred_element_type=jnp.float32)
    # Mosaic cannot load one dynamically-indexed sublane row; select it
    # with a one-hot mask + sum instead (exact — a single nonzero row).
    window = xn_ref[0][:, :c]
    sel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == (row - start)
    nxt = jnp.sum(jnp.where(sel, window, jnp.zeros_like(window)),
                  axis=0, keepdims=True)
    a2 = jnp.concatenate([xm[1:, :c], nxt], axis=0)
    y32 = y32 + jnp.dot(a2, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[0] = _epilogue(y32, cb_ref[0], s_ref[0], b_ref[0], o_ref.dtype)


def _pick_bt(t_out: int) -> int:
    return min(512, _round_up(t_out, 8))


@functools.partial(jax.jit, static_argnames=("t_out", "t_pad", "interpret"))
def _call_gemm(x, w, cb, scale, bias, t_out, t_pad, interpret):
    """x: (B, T_blocks, K) patches or merged rows; one GEMM per block."""
    bsz, _, kdim = x.shape
    c = w.shape[1]
    bt = _pick_bt(t_out)
    nb = pl.cdiv(t_pad, bt)
    return pl.pallas_call(
        _gemm_kernel,
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, bt, kdim), lambda i, t: (i, t, 0)),
            pl.BlockSpec((kdim, c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t_pad * kdim * c,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + w.size * w.dtype.itemsize
                            + bsz * t_pad * c * x.dtype.itemsize),
            transcendentals=bsz * t_pad * c),
        interpret=interpret,
    )(x, w, cb.reshape(1, c), scale.reshape(1, c), bias.reshape(1, c))


@functools.partial(jax.jit, static_argnames=("t_out", "t_pad", "interpret"))
def _call_k3(xm, w01, w2, cb, scale, bias, t_out, t_pad, interpret):
    bsz, th, c2 = xm.shape
    c = w2.shape[0]
    bt = _pick_bt(t_out)
    nb = pl.cdiv(t_pad, bt)
    return pl.pallas_call(
        functools.partial(_k3_kernel, bt=bt, th=th),
        grid=(bsz, nb),
        in_specs=[
            pl.BlockSpec((1, bt, c2), lambda i, t: (i, t, 0)),
            # 8-row window whose first row is merged row bt*(t+1) — tap 2
            # of the block's last output row.  Clamped to the array's last
            # 8-row window, whose final row (because the input is padded
            # to even length) holds the last real frame in its first C
            # lanes — exactly the tap the final real output row needs
            # when T_in is odd; the kernel picks the row within the
            # window.  Both clamps engage together: bt*(t+1) > th-1 ⟺
            # (bt/8)*(t+1) > (th-1)/8 up to integer floors.
            pl.BlockSpec((1, 8, c2),
                         lambda i, t: (i,
                                       jnp.minimum((bt // 8) * (t + 1),
                                                   (th - 1) // 8),
                                       0)),
            pl.BlockSpec((c2, c), lambda i, t: (0, 0)),
            pl.BlockSpec((c, c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
            pl.BlockSpec((1, c), lambda i, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, c), xm.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * t_pad * (c2 + c) * c,
            bytes_accessed=(xm.size * xm.dtype.itemsize
                            + (w01.size + w2.size) * w01.dtype.itemsize
                            + bsz * t_pad * c * xm.dtype.itemsize),
            transcendentals=bsz * t_pad * c),
        interpret=interpret,
    )(xm, xm, w01, w2, cb.reshape(1, c), scale.reshape(1, c),
      bias.reshape(1, c))


def _l0_patches(wave: jnp.ndarray, k: int, s: int, t_pad: int,
                dt) -> jnp.ndarray:
    """(B, t_pad, round_up(k, 8)) patches via the contiguous stride-block
    construction (models/wav2vec2._im2col_conv, documented there): frames
    start on stride boundaries, so each is ceil(k/s) CONSECUTIVE blocks of
    the (B, L/s, s) reshape — no strided gathers."""
    bsz, length = wave.shape
    nb = -(-k // s)
    n_blocks = t_pad + nb - 1
    need = n_blocks * s
    if need > length:
        wave = jnp.pad(wave, ((0, 0), (0, need - length)))
    xb = wave[:, :need].reshape(bsz, n_blocks, s)
    parts = []
    for j in range(nb):
        take = min(s, k - j * s)
        parts.append(xb[:, j:j + t_pad, :take])
    p = jnp.concatenate(parts, axis=-1)
    k_pad = _round_up(k, 8)
    if k_pad > k:
        p = jnp.pad(p, ((0, 0), (0, 0), (0, k_pad - k)))
    return p.astype(dt)


# ---------------------------------------------------------------------------
# Whole-pyramid variant: all layers in ONE Pallas program, phase-split
# ---------------------------------------------------------------------------
#
# The per-layer kernels above still pay one bf16 activation write+read per
# layer boundary (~2.5 GB per B=64×4 s batch) plus six extra custom-call
# launches inside the program.  This variant tiles the FINAL output
# (_PHASE_P finals per grid step) and runs the whole seven-layer pyramid
# on that tile's receptive span without leaving VMEM: the only HBM
# traffic is the layer-0 patch tiles in (~56 MB) and the final frames out.
#
# Doing the stride-2 pair-merge between layers as an in-kernel reshape
# was a MEASURED DEAD END: Mosaic lowers (2T, C)→(T, 2C) as a sublane
# de-interleave relayout that cost ~13 ms of a 31.6 ms kernel at the
# B=64×4 s shape (variant scan in the r3 working notes) — the relayout,
# not the GEMMs (~9 ms) or the LN/GELU epilogue (~9 ms), dominated.  The
# fix is to never materialize time-adjacent frames in adjacent rows:
# activations live PHASE-SPLIT, ordered by (t mod m, t div m) with
# m = 2^(remaining stride-2 layers) and a fixed _PHASE_P entries per
# phase.  A stride-2 conv then reads its taps as whole-phase BLOCKS —
# x[2t] = the even-phase block, x[2t+1] = the odd-phase block, and the
# kernel-size-3 tap x[2t+2] = the even blocks shifted one phase (plus a
# P-row wrap for the last phase) — all tile-aligned VMEM block copies
# with zero sublane shuffling, and the output comes out phase-split for
# the next layer by construction.  The initial 64-way phase split is done
# on the HOST side on the layer-0 patches (an XLA transpose in HBM).
#
# Tile geometry is exact: with P = 16 entries/phase a tile holds
# m0·P = 1024 layer-0 frames, adjacent tiles overlap by 64 (the stride-64
# receptive footprint of one final frame is 79 layer-0 frames), each tile
# yields 15 real finals (row 16 of the output reads past the tile span
# and is sliced off on the host), and every intermediate row is real —
# the per-phase entry count is invariant under the stride-2 layers, so
# no slack rows exist to audit.

_PHASE_P = 16         # entries per phase = output rows per grid step


def _phase_plan(cfg):
    """(m0, finals_per_tile): the initial phase count and how many real
    final frames one m0·P-frame tile yields (receptive-chain count)."""
    ks = cfg.conv_kernels[1:]
    m0 = 2 ** len(ks)
    span = m0 * _PHASE_P
    # Largest f with layer-0 need (f-1)·m0 + footprint ≤ span.
    need = 1
    for k in reversed(ks):
        need = (need - 1) * 2 + k
    f = (span - need) // m0 + 1
    if f < 1:
        raise ValueError("phase tile plan underflow")
    return m0, min(f, _PHASE_P)


def _mega_kernel(*refs, ks, dims, P):
    p_ref = refs[0]
    n_w = 1 + sum(2 if k == 3 else 1 for k in ks)
    w_refs = refs[1:1 + n_w]
    cb_ref, ls_ref, lb_ref = refs[1 + n_w:4 + n_w]
    o_ref = refs[4 + n_w]
    dt = o_ref.dtype

    y = jnp.dot(p_ref[0, 0], w_refs[0][:], preferred_element_type=jnp.float32)
    a = _epilogue(y, cb_ref[0], ls_ref[0], lb_ref[0], dt)
    m = 2 ** len(ks)
    wi = 1
    for i, k in enumerate(ks, start=1):
        c_in = dims[i - 1]
        half = a.shape[0] // 2
        x2 = a.reshape(m // 2, 2 * P, c_in)
        ev = x2[:, :P].reshape(half, c_in)     # phases 0,2,4,… = x[2t]
        od = x2[:, P:].reshape(half, c_in)     # phases 1,3,5,… = x[2t+1]
        w = w_refs[wi][:]
        wi += 1
        y = jnp.dot(ev, w[:c_in], preferred_element_type=jnp.float32) \
            + jnp.dot(od, w[c_in:], preferred_element_type=jnp.float32)
        if k == 3:
            # x[2t+2] = even phases shifted one phase block; the last
            # output phase wraps to phase 0 shifted one ENTRY (its final
            # row is junk only for the tile's discarded 16th final).
            t2 = jnp.concatenate([ev[P:], ev[1:P], ev[:1]], axis=0)
            y = y + jnp.dot(t2, w_refs[wi][:],
                            preferred_element_type=jnp.float32)
            wi += 1
        a = _epilogue(y, cb_ref[i], ls_ref[i], lb_ref[i], dt)
        m //= 2
    o_ref[0, 0] = a


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _mega_call(wave, params, cfg, interpret):
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    bsz, length = wave.shape
    dims = cfg.conv_dims
    ks = list(cfg.conv_kernels[1:])
    k0, s0 = cfg.conv_kernels[0], cfg.conv_strides[0]
    kp = _round_up(k0, 8)
    P = _PHASE_P
    m0, ft = _phase_plan(cfg)
    span, step0 = m0 * P, m0 * ft

    t_final, fl = length, 0
    for i, (k, s) in enumerate(zip(cfg.conv_kernels, cfg.conv_strides)):
        t_final = (t_final - k) // s + 1
        fl += 2 * t_final * k * (1 if i == 0 else dims[i - 1]) * dims[i]
    n_tiles = pl.cdiv(t_final, ft)

    p = _l0_patches(wave, k0, s0, step0 * n_tiles + span, dt)
    main = p[:, :step0 * n_tiles].reshape(bsz, n_tiles, step0, kp)
    extra = p[:, step0:step0 * (n_tiles + 1)] \
        .reshape(bsz, n_tiles, step0, kp)[:, :, :span - step0]
    tiles = jnp.concatenate([main, extra], axis=2)
    # Frame order → phase-major (t mod m0, t div m0): one HBM transpose.
    tiles = tiles.reshape(bsz, n_tiles, P, m0, kp).transpose(0, 1, 3, 2, 4) \
        .reshape(bsz, n_tiles, span, kp)

    weights = []
    w0 = params["conv_0"]["kernel"].reshape(k0, dims[0])
    if kp > k0:
        w0 = jnp.pad(w0, ((0, kp - k0), (0, 0)))
    weights.append(w0.astype(dt))
    for i, k in enumerate(ks, start=1):
        w = params[f"conv_{i}"]["kernel"].astype(dt)
        weights.append(w[:2].reshape(2 * dims[i - 1], dims[i]))
        if k == 3:
            weights.append(w[2])
    c = dims[-1]
    cb = jnp.stack([params[f"conv_{i}"]["bias"] for i in range(len(dims))])
    ls = jnp.stack([params[f"conv_ln_{i}"]["scale"]
                    for i in range(len(dims))])
    lb = jnp.stack([params[f"conv_ln_{i}"]["bias"] for i in range(len(dims))])

    const = pl.BlockSpec  # noqa: N806 — brevity below
    out = pl.pallas_call(
        functools.partial(_mega_kernel, ks=tuple(ks), dims=tuple(dims), P=P),
        grid=(bsz, n_tiles),
        in_specs=[const((1, 1, span, kp), lambda i, t: (i, t, 0, 0))]
        + [const(w.shape, lambda i, t: (0, 0)) for w in weights]
        + [const(a.shape, lambda i, t: (0, 0)) for a in (cb, ls, lb)],
        out_specs=const((1, 1, P, c), lambda i, t: (i, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles, P, c), dt),
        cost_estimate=pl.CostEstimate(
            flops=bsz * fl,
            bytes_accessed=(tiles.size * tiles.dtype.itemsize
                            + sum(w.size * w.dtype.itemsize for w in weights)
                            + bsz * n_tiles * P * c * 2),
            transcendentals=2 * bsz * n_tiles * span * c),
        interpret=interpret,
    )(tiles, *weights, cb, ls, lb)
    return out[:, :, :ft].reshape(bsz, n_tiles * ft, c)[:, :t_final]


def fused_conv_encoder(wave: jnp.ndarray, params: dict, cfg,
                       interpret: bool | None = None,
                       mega: bool = True) -> jnp.ndarray:
    """Waveform (B, L) float32 → frame features (B, T, conv_dims[-1]) in
    the compute dtype — the whole ``ConvFeatureEncoder`` stack as one
    Pallas program (``mega=True``, default) or one program per layer.

    ``params`` is the ``ConvFeatureEncoder`` param subtree
    (``conv_{i}/kernel``, ``conv_{i}/bias``, ``conv_ln_{i}/scale``,
    ``conv_ln_{i}/bias``).
    """
    if interpret is None:
        interpret = _interpret_default()
    if not supports_config(cfg):
        raise ValueError("fused_conv_encoder: unsupported conv stack "
                         f"(kernels {cfg.conv_kernels}, strides "
                         f"{cfg.conv_strides}, norm {cfg.feat_extract_norm})")
    if mega:
        return _mega_call(wave, params, cfg, interpret)
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    bsz, length = wave.shape

    k0, s0 = cfg.conv_kernels[0], cfg.conv_strides[0]
    t = (length - k0) // s0 + 1
    t_pad = _round_up(t, 2)
    patches = _l0_patches(wave, k0, s0, t_pad, dt)
    w0 = params["conv_0"]["kernel"].reshape(k0, cfg.conv_dims[0])
    k_pad = _round_up(k0, 8)
    if k_pad > k0:
        w0 = jnp.pad(w0, ((0, k_pad - k0), (0, 0)))
    a = _call_gemm(patches, w0.astype(dt), params["conv_0"]["bias"],
                   params["conv_ln_0"]["scale"], params["conv_ln_0"]["bias"],
                   t, t_pad, interpret)

    for i in range(1, len(cfg.conv_dims)):
        c_in, c = cfg.conv_dims[i - 1], cfg.conv_dims[i]
        k = cfg.conv_kernels[i]
        t_in, t = t, (t - k) // 2 + 1
        t_pad = _round_up(t, 2)
        xm = a.reshape(bsz, a.shape[1] // 2, 2 * c_in)   # free bitcast
        w = params[f"conv_{i}"]["kernel"].astype(dt)      # (k, c_in, c)
        cb = params[f"conv_{i}"]["bias"]
        ls = params[f"conv_ln_{i}"]["scale"]
        lb = params[f"conv_ln_{i}"]["bias"]
        if k == 2:
            a = _call_gemm(xm, w.reshape(2 * c_in, c), cb, ls, lb,
                           t, t_pad, interpret)
        else:
            a = _call_k3(xm, w[:2].reshape(2 * c_in, c), w[2], cb, ls, lb,
                         t, t_pad, interpret)
    return a[:, :t, :]
