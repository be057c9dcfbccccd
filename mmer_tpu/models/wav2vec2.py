"""Wav2Vec2-large (robust variant) audio encoder in JAX/Flax.

Capability target: the reference's audio embedding path
(reference voice_extractor.py:16,37-50): HF
``audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim`` →
``last_hidden_state`` mean-pool → L2-normalize → (1024,) vector.

Architecture (HF Wav2Vec2 "robust" config: ``do_stable_layer_norm=True``,
``feat_extract_norm="layer"``, ``conv_bias=True``):

- **Feature encoder**: 7 temporal convolutions (dims 512, kernels
  10/3/3/3/3/2/2, strides 5/2/2/2/2/2/2), each followed by a per-frame
  LayerNorm and GELU.  Implemented as ``lax.conv_general_dilated`` over an
  NLC layout — XLA lowers these to MXU contractions.
- **Feature projection**: LayerNorm(512) → Dense(1024).
- **Positional convolution**: grouped Conv1d (kernel 128, groups 16) with
  the weight-norm parameterization *pre-folded* at conversion time, one
  trailing timestep trimmed (even kernel), GELU, residual add.
- **Transformer encoder** (stable-layer-norm variant): per layer
  ``x = x + Attn(LN(x)); x = x + FFN(LN(x))`` with biased projections,
  16 heads, FFN 4096 GELU; one final LayerNorm after the stack.

Weights port from any HF torch ``Wav2Vec2Model`` via
:func:`convert_hf_state` — numeric parity is tested against the torch
implementation on a tiny random config in tests/test_wav2vec2.py, so the
same mapping applied to the real checkpoint reproduces the reference's
embeddings (bf16 tolerance) without needing network access here.

Defects fixed relative to the reference (documented, not replicated):
- it feeds native-sample-rate audio to a 16 kHz model without resampling
  (voice_extractor.py:66 loads at source rate; preprocess/audio.py here
  resamples properly);
- it mean-pools over *padded* positions when batching variable-length
  clips (voice_extractor.py:39-48 builds a padded batch and never passes an
  attention mask); here pooling is length-masked.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import Wav2Vec2Config


def _dtype(cfg: Wav2Vec2Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def _im2col_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                 stride: int, dt) -> jnp.ndarray:
    """VALID 1-D conv as an explicit im2col GEMM.

    The same algebraic move as the ViViT tubelet patchify
    (models/vivit.py:51-75): lay the taps out tap-major and contract in
    ONE (B·T_out, k·C_in)×(k·C_in, C_out) matmul — a pure MXU
    dot_general instead of a strided convolution (VERDICT r2 #3: the
    conv encoder profiled at 19% MFU as lax.conv_general_dilated; the
    k=10/s=5 first layer with in_channels=1 maps especially badly).

    Patch construction uses only CONTIGUOUS ops: because every output
    frame starts on a ``stride`` boundary, reshaping to stride-blocks
    ``(B, L/s, s·C)`` turns each frame into ceil(k/s) CONSECUTIVE blocks
    — so patches are a concat of unit-stride shifted views.  (A first
    attempt gathered the k taps with stride-s lane slices; TPU relayouts
    made that 4.6× SLOWER than the conv it replaced — strided access on
    the minor axes defeats the (8, 128) tiling.)
    """
    k, c_in, c_out = kernel.shape
    b, length, _ = x.shape
    t_out = (length - k) // stride + 1
    nb = -(-k // stride)                        # blocks one frame spans
    n_blocks = t_out + nb - 1
    need = n_blocks * stride
    if need > length:
        # The last frame's final partial block may straddle the input end;
        # zero-pad to the block boundary.  Padded elements sit at global
        # positions ≥ (t_out-1)·stride + k, beyond every frame's last tap,
        # so the ``:take`` slices below can never select them.
        x = jnp.pad(x, ((0, 0), (0, need - length), (0, 0)))
    xb = x[:, :need, :].reshape(b, n_blocks, stride * c_in)
    parts = []
    for j in range(nb):
        take = min(stride, k - j * stride) * c_in
        parts.append(xb[:, j:j + t_out, :take])
    patches = jnp.concatenate(parts, axis=-1).astype(dt)  # (B,T_out,k*C_in)
    w = kernel.reshape(k * c_in, c_out).astype(dt)
    return patches @ w + bias.astype(dt)


class ConvFeatureEncoder(nn.Module):
    """Raw waveform (B, L) → frame features (B, T, conv_dims[-1]).

    Param creation (init) goes through nn.Conv so the tree, names, and
    seeded values are unchanged regardless of ``im2col_layers`` routing.
    """

    cfg: Wav2Vec2Config
    # Which layers route through the im2col GEMM at apply time.  Default
    # NONE — a measured negative result on the v5e (VERDICT r2 #3 asked
    # for the tubelet-style im2col move here; it loses in every variant):
    # all-layers im2col regressed the encoder 33→53 ms at B=64×4 s (the
    # 1.5× patch duplication's HBM writes cost more than the conv's
    # layout overhead), and even layer-0-only (k=10/s=5, in_channels=1,
    # the worst conv shape) measured 37.7 ms vs lax.conv's ~33 ms, and the
    # k=2/s=2 layers (a FREE reshape + GEMM, zero duplication) 35.3 ms —
    # noise-level at best.  XLA's own conv lowering implicitly im2cols
    # with better layouts and no materialized patches.  Kept (with
    # equivalence tests) as the documented baseline.
    im2col_layers: tuple = ()
    # Route the whole stack through the per-layer fused conv→LN→GELU
    # Pallas kernels (ops/conv_pyramid.py) — the r3 answer to the HBM
    # round trips that im2col-in-HBM couldn't fix (patches stay in VMEM,
    # the stride-2 merge is a free HBM bitcast between kernels).
    use_pyramid: bool = False

    @nn.compact
    def __call__(self, wave: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = _dtype(cfg)
        init = self.is_initializing()
        if self.use_pyramid and not init:
            from mmer_tpu.ops.conv_pyramid import fused_conv_encoder
            return fused_conv_encoder(wave, self.variables["params"], cfg)
        x = wave[:, :, None].astype(dt)           # (B, L, 1)
        for i, (dim, kernel, stride) in enumerate(
                zip(cfg.conv_dims, cfg.conv_kernels, cfg.conv_strides)):
            if i in self.im2col_layers and not init:
                p = self.variables["params"][f"conv_{i}"]
                x = _im2col_conv(x, p["kernel"], p["bias"], stride, dt)
            else:
                x = nn.Conv(dim, kernel_size=(kernel,), strides=(stride,),
                            padding="VALID", use_bias=True, dtype=dt,
                            param_dtype=jnp.float32, name=f"conv_{i}")(x)
            if cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(dtype=jnp.float32,
                                 name=f"conv_ln_{i}")(x).astype(dt)
            x = nn.gelu(x, approximate=False)
        return x


class _SplitGroupedConv(nn.Module):
    """Grouped 1-D conv computed as ``groups`` ordinary convs.

    Same param layout as the ``nn.Conv(feature_group_count=groups)`` it
    replaces — kernel ``(k, C//g, C)``, bias ``(C,)``, identical names and
    path-derived init draws — and mathematically the same op (grouped conv
    IS g independent convs over channel slices).  Exists because XLA's
    SPMD partitioner cannot batch-partition a ``feature_group_count > 1``
    convolution: it ALL-GATHERS the batch-sharded activations and runs the
    full-batch grouped conv replicated on every device (measured on the
    8-device mesh: 3 all-gathers, audio fan-out efficiency 0.85-0.88,
    `scripts/probe_audio_fanout_eff.py` — VERDICT r3 #8).  The split form
    partitions cleanly (zero collectives)."""

    features: int
    kernel_size: int
    groups: int
    pad: int
    dtype: object

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C, g, k = self.features, self.groups, self.kernel_size
        cg = C // g
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, cg, C), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        kb = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        outs = []
        for i in range(g):
            outs.append(jax.lax.conv_general_dilated(
                x[:, :, i * cg:(i + 1) * cg],
                kb[:, :, i * cg:(i + 1) * cg],
                (1,), [(self.pad, self.pad)],
                dimension_numbers=("NHC", "HIO", "NHC")))
        return jnp.concatenate(outs, axis=-1) + bias.astype(self.dtype)


class PosConvEmbed(nn.Module):
    """Grouped positional convolution (weight-norm folded into the kernel).

    ``split_groups`` routes the partitioner-friendly :class:`_SplitGroupedConv`
    (same params, same math) — set on the mesh fan-out path where the
    grouped form costs an all-gather + replicated compute."""

    cfg: Wav2Vec2Config
    split_groups: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = _dtype(cfg)
        k = cfg.num_conv_pos_embeddings
        pad = k // 2
        if self.split_groups:
            y = _SplitGroupedConv(
                cfg.hidden_dim, k, cfg.num_conv_pos_embedding_groups,
                pad, dt, name="conv")(x)
        else:
            y = nn.Conv(cfg.hidden_dim, kernel_size=(k,),
                        padding=[(pad, pad)],
                        feature_group_count=cfg.num_conv_pos_embedding_groups,
                        use_bias=True, dtype=dt, param_dtype=jnp.float32,
                        name="conv")(x.astype(dt))
        if k % 2 == 0:
            y = y[:, :-1, :]
        return nn.gelu(y, approximate=False)


class EncoderLayer(nn.Module):
    """Stable-layer-norm transformer layer (pre-norm, biased projections)."""

    cfg: Wav2Vec2Config
    # Run the FFN sublayer through the shared fused Pallas kernel
    # (ops/fused_blocks.fused_ffn, the one measured faster for ViViT):
    # the (tokens, ffn_dim) hidden tensor never touches HBM.  The f32
    # residual stream and bf16 weights are passed as-is.
    use_fused_ffn: bool = False
    # Run attention through ops/flash_attention (per-batch key-length
    # masking): XLA materializes the (B, H, S, S) f32 score tensor in HBM
    # — ~162 MB/layer at B=64, S=199 — so the sublayer is bandwidth-bound
    # despite the tiny FLOP count.  Inference-only (no backward kernel);
    # the extractor never trains.
    use_flash_attn: bool = False
    # Compute q/k/v with ONE (d, 3d) GEMM over apply-time-concatenated
    # kernels instead of three (d, d) GEMMs: the separate projections each
    # re-read the (B·S, d) activations from HBM (~26 MB/layer at B=64),
    # one GEMM reads them once.  Params stay in the per-projection HF
    # layout so ``convert_hf_state`` is untouched; numerics are identical
    # (same K dim, concatenation only widens N).  XLA-level, no Pallas.
    use_fused_qkv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        dt = _dtype(cfg)
        h = cfg.num_heads
        d = cfg.hidden_dim
        hd = d // h

        y = nn.LayerNorm(dtype=jnp.float32, name="norm_attn")(x)
        yd = y.astype(dt)

        if self.use_fused_qkv and not self.is_initializing():
            p = self.variables["params"]
            w = jnp.concatenate(
                [p[n]["kernel"].reshape(d, d) for n in ("q", "k", "v")],
                axis=1).astype(dt)
            b = jnp.concatenate(
                [p[n]["bias"].reshape(d) for n in ("q", "k", "v")]
            ).astype(dt)
            qkv = yd @ w + b
            q, k, v = (t.reshape(*t.shape[:-1], h, hd)
                       for t in jnp.split(qkv, 3, axis=-1))
        else:
            def proj(name):
                return nn.DenseGeneral((h, hd), axis=-1, dtype=dt,
                                       param_dtype=jnp.float32,
                                       name=name)(yd)

            q, k, v = proj("q"), proj("k"), proj("v")
        if self.use_flash_attn and not self.is_initializing():
            from mmer_tpu.ops.flash_attention import flash_attention
            key_lens = None
            if pad_mask is not None:
                # Frame pads are suffix-contiguous (conv-stack output
                # lengths), so a per-batch count is a complete mask.
                key_lens = jnp.sum(~pad_mask, axis=1).astype(jnp.int32)
            attn = flash_attention(
                jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2), key_lens=key_lens)
            attn = jnp.swapaxes(attn, 1, 2)            # (B, S, H, hd)
        else:
            attn = self._xla_attention(q, k, v, pad_mask, hd)
        attn = nn.DenseGeneral(d, axis=(-2, -1), dtype=dt,
                               param_dtype=jnp.float32,
                               name="out")(attn.astype(dt))
        x = x + attn.astype(x.dtype)

        if self.use_fused_ffn and not self.is_initializing():
            from mmer_tpu.ops.fused_blocks import fused_ffn
            p = self.variables["params"]
            return fused_ffn(x, p["norm_ffn"]["scale"],
                             p["norm_ffn"]["bias"],
                             p["ffn_in"]["kernel"].astype(dt),
                             p["ffn_in"]["bias"].astype(dt),
                             p["ffn_out"]["kernel"].astype(dt),
                             p["ffn_out"]["bias"].astype(dt))

        y = nn.LayerNorm(dtype=jnp.float32, name="norm_ffn")(x)
        y = nn.Dense(cfg.ffn_dim, dtype=dt, param_dtype=jnp.float32,
                     name="ffn_in")(y.astype(dt))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=dt, param_dtype=jnp.float32, name="ffn_out")(y)
        return x + y.astype(x.dtype)

    def _xla_attention(self, q, k, v, pad_mask, hd):
        dt = _dtype(self.cfg)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        if pad_mask is not None:
            # Large-negative FINITE bias, not -inf: a clip shorter than the
            # conv stack's ~400-sample receptive field has 0 output frames,
            # so every attention row is fully masked — with -inf that row
            # softmaxes to NaN and poisons the pooled embedding (ADVICE r1).
            # With -1e9 it softmaxes to uniform; real keys still get exact
            # 0 probability for padded keys, and the fully-masked case is
            # dropped by the length-masked pooling (→ zero embedding, the
            # reference's no-audio fallback).
            bias = jnp.where(pad_mask[:, None, None, :], -1e9, 0.0)
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dt), v,
                          preferred_element_type=jnp.float32)


class Wav2Vec2Encoder(nn.Module):
    """Full model: waveform → per-frame hidden states (B, T, 1024)."""

    cfg: Wav2Vec2Config
    # Fused Pallas kernels: conv encoder (ops/conv_pyramid.py), the
    # transformer FFN sublayers (ops/fused_blocks.fused_ffn) and flash
    # attention with per-batch key lengths (ops/flash_attention.py).
    use_pallas: bool = False
    # None → follow use_pallas; explicit False keeps the measured-win
    # conv/FFN fusions while attention stays on XLA.
    use_flash_attn: Optional[bool] = None
    # One-GEMM q/k/v projection (see EncoderLayer.use_fused_qkv).  OFF:
    # scripts/probe_w2v2_qkv.py measured it LOSING on chip (v5e-1,
    # B=64: 567.5 vs 656.5 clips/s, bit-identical outputs) — the
    # per-call (d, 3d) weight concat costs more than the saved
    # activation re-reads.  Don't re-probe without materializing the
    # concatenated weight once outside the step.
    use_fused_qkv: bool = False
    # Positional conv as g ordinary convs (see _SplitGroupedConv): set on
    # the mesh fan-out path, where XLA's SPMD partitioner would otherwise
    # all-gather the batch and run the grouped conv replicated.
    split_pos_conv: bool = False

    @nn.compact
    def __call__(self, wave: jnp.ndarray,
                 frame_pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        feats = ConvFeatureEncoder(cfg, use_pyramid=self.use_pallas,
                                   name="feature_encoder")(wave)
        x = nn.LayerNorm(dtype=jnp.float32, name="proj_norm")(feats)
        x = nn.Dense(cfg.hidden_dim, dtype=_dtype(cfg),
                     param_dtype=jnp.float32, name="proj")(x)
        x = x.astype(jnp.float32)

        # Stable-layer-norm encoder: zero padded frames before the (full
        # context) positional conv, residual add, layers, final LN.
        if frame_pad_mask is not None:
            x = jnp.where(frame_pad_mask[:, :, None], 0.0, x)
        x = x + PosConvEmbed(cfg, split_groups=self.split_pos_conv,
                             name="pos_conv")(x).astype(x.dtype)
        flash = (self.use_pallas if self.use_flash_attn is None
                 else self.use_flash_attn)
        for i in range(cfg.num_layers):
            x = EncoderLayer(cfg, use_fused_ffn=self.use_pallas,
                             use_flash_attn=flash,
                             use_fused_qkv=self.use_fused_qkv,
                             name=f"layer_{i}")(x, frame_pad_mask)
        x = nn.LayerNorm(dtype=jnp.float32, name="final_norm")(x)
        return x


def feat_extract_output_length(cfg: Wav2Vec2Config, input_length: int) -> int:
    """Conv-stack output length for a given waveform length (matches the
    torch feature encoder's VALID-conv arithmetic)."""
    length = input_length
    for kernel, stride in zip(cfg.conv_kernels, cfg.conv_strides):
        length = (length - kernel) // stride + 1
    return max(length, 0)


# ---------------------------------------------------------------------------
# HF torch → flax parameter conversion
# ---------------------------------------------------------------------------

def convert_hf_state(hf_model: Any, cfg: Wav2Vec2Config) -> dict:
    """Convert a torch ``transformers.Wav2Vec2Model`` to this module's
    parameter pytree.  Weight-norm on the positional conv is folded by
    reading the materialized ``.weight`` property."""
    import torch

    def t2j(t: "torch.Tensor") -> jnp.ndarray:
        return jnp.asarray(t.detach().cpu().numpy())

    params: dict = {}

    fe = hf_model.feature_extractor
    enc_feats: dict = {}
    for i, layer in enumerate(fe.conv_layers):
        # torch Conv1d weight (out, in, k) → flax (k, in, out)
        enc_feats[f"conv_{i}"] = {
            "kernel": t2j(layer.conv.weight).transpose(2, 1, 0),
            "bias": t2j(layer.conv.bias),
        }
        if cfg.feat_extract_norm == "layer":
            enc_feats[f"conv_ln_{i}"] = {
                "scale": t2j(layer.layer_norm.weight),
                "bias": t2j(layer.layer_norm.bias),
            }
    params["feature_encoder"] = enc_feats

    fp = hf_model.feature_projection
    params["proj_norm"] = {"scale": t2j(fp.layer_norm.weight),
                           "bias": t2j(fp.layer_norm.bias)}
    params["proj"] = {"kernel": t2j(fp.projection.weight).T,
                      "bias": t2j(fp.projection.bias)}

    pos = hf_model.encoder.pos_conv_embed.conv
    # .weight materializes the weight-norm parameterization; grouped torch
    # Conv1d weight (out, in/groups, k) → flax (k, in/groups, out).
    with torch.no_grad():
        pos_w = pos.weight
    params["pos_conv"] = {"conv": {
        "kernel": t2j(pos_w).transpose(2, 1, 0),
        "bias": t2j(pos.bias),
    }}

    h, d = cfg.num_heads, cfg.hidden_dim
    hd = d // h
    layers = {}
    for i, layer in enumerate(hf_model.encoder.layers):
        att = layer.attention
        def qkv(lin):
            return {"kernel": t2j(lin.weight).T.reshape(d, h, hd),
                    "bias": t2j(lin.bias).reshape(h, hd)}
        layers[f"layer_{i}"] = {
            "norm_attn": {"scale": t2j(layer.layer_norm.weight),
                          "bias": t2j(layer.layer_norm.bias)},
            "q": qkv(att.q_proj), "k": qkv(att.k_proj), "v": qkv(att.v_proj),
            "out": {"kernel": t2j(att.out_proj.weight).T.reshape(h, hd, d),
                    "bias": t2j(att.out_proj.bias)},
            "norm_ffn": {"scale": t2j(layer.final_layer_norm.weight),
                         "bias": t2j(layer.final_layer_norm.bias)},
            "ffn_in": {"kernel": t2j(layer.feed_forward.intermediate_dense.weight).T,
                       "bias": t2j(layer.feed_forward.intermediate_dense.bias)},
            "ffn_out": {"kernel": t2j(layer.feed_forward.output_dense.weight).T,
                        "bias": t2j(layer.feed_forward.output_dense.bias)},
        }
    params.update(layers)
    params["final_norm"] = {"scale": t2j(hf_model.encoder.layer_norm.weight),
                            "bias": t2j(hf_model.encoder.layer_norm.bias)}
    return {"params": params}


# ---------------------------------------------------------------------------
# Embedding front-end (the voice_extractor capability)
# ---------------------------------------------------------------------------

class AudioEmbedder:
    """Batched waveform → L2-normalized (1024,) embeddings.

    Waveforms are zero-mean/unit-var normalized per utterance (HF
    ``do_normalize``), padded to 1 s buckets (bounded retraces on TPU), and
    mean-pooled with a true length mask.  Clips longer than
    ``cfg.chunk_duration_s`` are split, embedded, mean-pooled and
    re-normalized (reference voice_extractor.py:72-95 semantics).
    """

    def __init__(self, cfg: Optional[Wav2Vec2Config] = None,
                 params: Optional[dict] = None,
                 params_path: Optional[str] = None,
                 mesh=None,
                 use_pallas: Optional[bool] = None,
                 use_fused_qkv: bool = False):
        cfg = cfg or Wav2Vec2Config()
        self.cfg = cfg
        # None → fused Pallas kernels on TPU (measured faster,
        # scripts/profile_conv_pyramid.py), plain XLA elsewhere (CPU tests
        # and the virtual-mesh dryrun keep the portable path; serving
        # passes an explicit value — Mosaic compile-cache keys are
        # process-unstable, see serve/engine.py).
        if use_pallas is None:
            from mmer_tpu.ops.conv_pyramid import supports_config
            use_pallas = (jax.default_backend() == "tpu"
                          and supports_config(cfg))
        # Flash attention stays OFF: the on-chip A/B (artifacts/probes/
        # r4_onchip.json, probe_w2v2_flash) measured the Pallas varlen
        # kernel at 510-513 clips/s vs 651-658 for XLA attention at the
        # production shape (B=64, S≈199) — XLA wins by 1.28×, decided.
        # use_fused_qkv: one-GEMM q/k/v projections — measured 0.86× on
        # chip (probe_w2v2_qkv, r3_onchip.json), kept OFF, decided.
        # On the mesh fan-out path the grouped positional conv is computed
        # as g ordinary convs (_SplitGroupedConv, same params): the SPMD
        # partitioner cannot batch-partition a grouped conv and would
        # all-gather + replicate it (measured: weak eff 0.85 → see
        # scripts/probe_audio_fanout_eff.py, VERDICT r3 #8).
        on_mesh = mesh is not None and getattr(mesh, "size", 1) > 1
        self.model = Wav2Vec2Encoder(cfg, use_pallas=use_pallas,
                                     use_flash_attn=False,
                                     use_fused_qkv=use_fused_qkv,
                                     split_pos_conv=on_mesh)
        if params is None and params_path:
            from mmer_tpu.train.checkpoint import load_params_msgpack
            target = self._seeded_params()
            params = load_params_msgpack(params_path, target)
        if params is None:
            params = self._seeded_params()
        self.params = params

        # bf16 only: the int8-GEMM variant (models/wav2vec2_quant.py)
        # measured 0.70× bf16 on chip (450.8 vs 642.3 clips/s,
        # probe_int8_w2v2) — its routing hook was removed; see the r4
        # notes in wav2vec2_quant.py and artifacts/probes/r3_onchip.json.
        self._run_params = self.params

        def forward(rp, waves, frame_mask):
            return self.model.apply(rp, waves, frame_mask)

        def apply_pool(p, waves, frame_mask):
            """Full model + masked mean-pool + L2 norm ON DEVICE — only the
            (B, 1024) embeddings ever cross to host (pooling on host would
            ship the entire (B, T, 1024) hidden tensor per batch)."""
            hidden = forward(p, waves, frame_mask)
            keep = (~frame_mask)[:, :, None].astype(hidden.dtype)
            summed = jnp.sum(hidden * keep, axis=1)
            emb = summed / jnp.maximum(jnp.sum(keep, axis=1), 1.0)
            norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
            return emb / jnp.maximum(norm, 1e-12)

        # Multi-chip fan-out, mirroring VideoFeatureExtractor: waveform
        # batches sharded over the mesh's data axis, params replicated —
        # embarrassingly parallel, zero collectives in the partitioned HLO
        # once the positional conv is in split form (grouped convs get
        # all-gathered by the partitioner — probe_audio_fanout_eff.py).
        # The reference embeds batch-8 on one GPU (voice_extractor.py:18).
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            from mmer_tpu.core.mesh import data_sharding, replicated_sharding
            self._n_data = self.mesh.devices.shape[0]
            self.params = jax.device_put(self.params,
                                         replicated_sharding(self.mesh))
            self._run_params = self.params
            self._apply_pool = jax.jit(
                apply_pool,
                in_shardings=(replicated_sharding(self.mesh),
                              data_sharding(self.mesh, 2),
                              data_sharding(self.mesh, 2)),
                out_shardings=data_sharding(self.mesh, 2))
        else:
            from mmer_tpu.core.aot import AotJit
            self._n_data = 1
            # AOT-cached on TPU: the conv-pyramid/fused-FFN Mosaic custom
            # calls make the XLA persistent-cache key process-unstable, so
            # a serialized executable is the only restart-proof cache for
            # the Pallas path (core/aot.py; plain jit on CPU).
            self._apply_pool = AotJit(
                apply_pool, key="w2v2-embed-bf16-"
                f"{'pallas' if use_pallas else 'xla'}")

    def _seeded_params(self) -> dict:
        # Jitted: eager init dispatches hundreds of param ops one by one
        # (93 s for the large model through this environment's relay);
        # one compiled program generates all params on device (~3 s warm)
        # and persists in the XLA compile cache across processes.
        dummy = jnp.zeros((1, self.cfg.sample_rate), jnp.float32)
        return jax.jit(lambda k: self.model.init({"params": k}, dummy))(
            jax.random.PRNGKey(self.cfg.param_seed))

    def _bucket_len(self, n: int) -> int:
        step = self.cfg.sample_rate  # 1 s buckets
        return max(step, -(-n // step) * step)

    def _embed_padded(self, waves: np.ndarray, lengths: np.ndarray
                      ) -> np.ndarray:
        cfg = self.cfg
        t_out = feat_extract_output_length(cfg, waves.shape[1])
        frame_lens = np.asarray(
            [feat_extract_output_length(cfg, int(l)) for l in lengths])
        mask = np.arange(t_out)[None, :] >= frame_lens[:, None]
        n = waves.shape[0]
        # Batch-dim bucketing (core/buckets.py): serving feeds one piece
        # per sliding window, so a raw n would track upload length and
        # compile a fresh program (plus a persistent AOT cache entry) for
        # every new video; bucketing bounds the shape family.  The mesh
        # path additionally rounds to a per-chip-equal block.
        from mmer_tpu.core.buckets import batch_bucket
        n_pad = -(-batch_bucket(n) // self._n_data) * self._n_data
        if n_pad > n:
            # Padding rows are sliced away below.
            waves = np.concatenate(
                [waves, np.repeat(waves[-1:], n_pad - n, axis=0)])
            mask = np.concatenate(
                [mask, np.repeat(mask[-1:], n_pad - n, axis=0)])
        emb = self._apply_pool(self._run_params, jnp.asarray(waves),
                               jnp.asarray(mask))
        return np.asarray(emb, np.float32)[:n]

    def embed_batch(self, waveforms: Sequence[np.ndarray]) -> np.ndarray:
        """list of 1-D float waveforms (16 kHz) → (B, 1024) float32."""
        cfg = self.cfg
        chunk_samples = int(cfg.chunk_duration_s * cfg.sample_rate)

        # Expand long clips into chunks, remembering ownership.
        pieces: List[np.ndarray] = []
        owners: List[int] = []
        for bi, wave in enumerate(waveforms):
            wave = np.asarray(wave, np.float32)
            wave = (wave - wave.mean()) / np.sqrt(wave.var() + 1e-7)
            for start in range(0, max(len(wave), 1), chunk_samples):
                piece = wave[start:start + chunk_samples]
                if len(piece) == 0:
                    piece = np.zeros(1, np.float32)
                pieces.append(piece)
                owners.append(bi)

        max_len = self._bucket_len(max(len(p) for p in pieces))
        batch = np.zeros((len(pieces), max_len), np.float32)
        lengths = np.zeros(len(pieces), np.int64)
        for i, p in enumerate(pieces):
            batch[i, :len(p)] = p
            lengths[i] = len(p)
        piece_embs = self._embed_padded(batch, lengths)

        out = np.zeros((len(waveforms), cfg.hidden_dim), np.float32)
        for bi in range(len(waveforms)):
            mine = piece_embs[[i for i, o in enumerate(owners) if o == bi]]
            emb = mine.mean(axis=0)
            out[bi] = emb / np.maximum(np.linalg.norm(emb), 1e-12)
        return out
