"""ViViT video feature extractor, TPU-native.

Capability parity with the reference's from-scratch ViViT
(reference video_extractor.py:7-104): tubelet patchify (tubelet 4, patch
16×16 over 32-frame 224² chunks → 8·196 = 1568 tokens), pre-norm
transformer (depth 12, heads 12, dim 768, head_dim 64, GELU FFN 3072, no
biases on qkv/out projections, no final LayerNorm), CLS pooling → one 768-d
vector per chunk.

TPU-first design decisions:
- The Conv3d patchify (video_extractor.py:16) is algebraically a
  block-reshape followed by ONE (B·N, 3072)×(3072, 768) matmul — expressed
  exactly that way here so it lands on the MXU as a single large GEMM
  instead of a strided convolution.
- Attention over S=1569 tokens runs through the fused Pallas kernel
  (ops/flash_attention.py) that never materializes the (B, H, S, S) score
  tensor in HBM; set ``use_flash=False`` for the differentiable XLA path.
- Chunks are processed **batched** — the reference runs batch=1 per chunk
  under no_grad (video_extractor.py:152-156), its #1 throughput sin
  (SURVEY.md §3.2).
- bf16 compute / f32 params & softmax.

Weight semantics: the reference never loads trained ViViT weights — each
process uses a fresh random init as a fixed random projection
(video_extractor.py:184; its extract- and serve-time embeddings therefore
*disagree*).  Here params come from one seeded init (``init_vivit_params``)
persisted via train/checkpoint.py so extract and serve agree by
construction (SURVEY.md §7 "hard parts").

The reference's pos_embed/cls_token use torch.randn — i.e. N(0, 1), not the
usual N(0, 0.02) — matched here for behavioral parity
(video_extractor.py:88-89).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmer_tpu.config import ViViTConfig
from mmer_tpu.ops.flash_attention import flash_attention, reference_attention


def _dtype(cfg: ViViTConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class TubeletEmbed(nn.Module):
    """Non-overlapping tubelet patchify as reshape + one MXU matmul.

    Input  (B, F, H, W, C) → tokens (B, (F/t)·(H/p)·(W/p), dim), token
    order (t', h', w') row-major — the same flatten order as the
    reference's Conv3d + ``flatten(2)`` (video_extractor.py:20-23).
    """

    cfg: ViViTConfig

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, f, hh, ww, c = video.shape
        t = cfg.tubelet_size
        ph, pw = cfg.patch_size
        ft, hp, wp = f // t, hh // ph, ww // pw

        x = video.reshape(b, ft, t, hp, ph, wp, pw, c)
        # → (B, t', h', w', t, ph, pw, C): group the within-tubelet axes last.
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, ft * hp * wp, t * ph * pw * c)
        x = nn.Dense(cfg.dim, dtype=_dtype(cfg), param_dtype=jnp.float32,
                     name="proj")(x.astype(_dtype(cfg)))
        return x


class PreNormBlock(nn.Module):
    """x = x + Attn(LN(x)); x = x + FFN(LN(x)) (video_extractor.py:66-80).

    ``fused_blocks`` routes the two sublayers through the Pallas kernels in
    ops/fused_blocks.py (LN fused into the QKV GEMM; the whole
    LN→GEMM→GELU→GEMM→residual FFN in one VMEM-resident program — the
    (B, S, mlp_dim) hidden tensor never touches HBM).  Param creation
    always runs the module path, so the param tree, init rngs, and
    persisted checkpoints are identical for both routes.
    """

    cfg: ViViTConfig
    use_flash: bool = True
    fused_blocks: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dt = _dtype(cfg)
        h, hd = cfg.heads, cfg.dim_head
        inner = h * hd

        fused = self.fused_blocks and not self.is_initializing()

        def heads_first(z):
            b, s, _ = z.shape
            return z.reshape(b, s, h, hd).transpose(0, 2, 1, 3)

        # LN+QKV stays on the XLA path in BOTH routes: a Pallas LN→GEMM
        # kernel (ops/fused_blocks.fused_ln_matmul) measured 1.80 ms/layer
        # vs XLA's 1.44 at the production shape — XLA already fuses the
        # normalize into the GEMM pipeline here (scripts/
        # profile_fused_blocks.py; negative result, kept for the record).
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=dt,
                       param_dtype=jnp.float32, name="to_qkv")(y.astype(dt))
        q, k, v = jnp.split(qkv, 3, axis=-1)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        attn = flash_attention(q, k, v) if self.use_flash else \
            reference_attention(q, k, v)
        b, _, s, _ = attn.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, inner)
        attn = nn.Dense(cfg.dim, use_bias=False, dtype=dt,
                        param_dtype=jnp.float32, name="to_out")(attn)
        x = x + attn.astype(x.dtype)

        if fused:
            # The FFN sublayer is where the Pallas kernel wins (3.20 vs
            # 3.73 ms/layer): the (B, S, mlp_dim) hidden tensor never
            # touches HBM.
            from mmer_tpu.ops.fused_blocks import fused_ffn

            p = self.variables["params"]
            return fused_ffn(x, p["norm2"]["scale"], p["norm2"]["bias"],
                             p["ffn_in"]["kernel"].astype(dt),
                             p["ffn_in"]["bias"],
                             p["ffn_out"]["kernel"].astype(dt),
                             p["ffn_out"]["bias"])

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(cfg.mlp_dim, dtype=dt, param_dtype=jnp.float32,
                     name="ffn_in")(y.astype(dt))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.dim, dtype=dt, param_dtype=jnp.float32,
                     name="ffn_out")(y)
        return x + y.astype(x.dtype)


class ViViTFeatureExtractor(nn.Module):
    """Batched chunk embedder: (B, 32, 224, 224, 3) → (B, 768).

    ``remat`` re-checkpoints each block for a differentiated path.  The
    framework itself never differentiates ViViT — it is a fixed random
    projection (training consumes precomputed features; IG attributes the
    fusion model's *inputs*, not ViViT internals) — so the default is
    off: under forward-only jit, remat only adds optimization barriers
    (XLA already frees forward intermediates as it schedules).
    """

    cfg: ViViTConfig
    use_flash: bool = True
    remat: bool = False
    # None → follow use_flash (both are the production TPU path; CPU tests
    # exercise the kernels via interpret mode explicitly).
    fused_blocks: Optional[bool] = None

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = TubeletEmbed(cfg, name="embed")(video)
        b, n, d = x.shape

        if cfg.pool == "cls":
            cls = self.param("cls_token", nn.initializers.normal(stddev=1.0),
                             (1, 1, d), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, d)), x], axis=1)
            n = n + 1
        # pos_embed sized for the configured max chunk (num_frames); shorter
        # chunks slice it — the reference's ``pos_embedding[:, :x.shape[1]]``
        # semantics (video_extractor.py:98), which lets serving use smaller
        # subchunk_size values than the extraction default.
        max_tokens = ((cfg.num_frames // cfg.tubelet_size)
                      * (cfg.image_size[0] // cfg.patch_size[0])
                      * (cfg.image_size[1] // cfg.patch_size[1])
                      + (1 if cfg.pool == "cls" else 0))
        if n > max_tokens:
            raise ValueError(f"chunk produces {n} tokens > configured "
                             f"maximum {max_tokens}")
        pos = self.param("pos_embed", nn.initializers.normal(stddev=1.0),
                         (1, max_tokens, d), jnp.float32)
        x = x + pos[:, :n, :].astype(x.dtype)

        fused = self.use_flash if self.fused_blocks is None \
            else self.fused_blocks
        block = nn.remat(PreNormBlock) \
            if self.remat and not self.is_initializing() else PreNormBlock
        for i in range(cfg.depth):
            x = block(cfg, use_flash=self.use_flash, fused_blocks=fused,
                      name=f"block_{i}")(x)

        if cfg.pool == "cls":
            feats = x[:, 0]
        else:
            feats = jnp.mean(x, axis=1)
        return feats.astype(jnp.float32)


def init_vivit_params(cfg: Optional[ViViTConfig] = None,
                      use_flash: bool = True):
    """The framework's single seeded ViViT init (cfg.param_seed) — the fixed
    random projection both extract and serve share."""
    cfg = cfg or ViViTConfig()
    model = ViViTFeatureExtractor(cfg, use_flash=use_flash)
    dummy = jnp.zeros((1, cfg.num_frames, *cfg.image_size, cfg.in_channels),
                      jnp.float32)
    # Jitted init: one compiled (and persistently cached) program instead
    # of eager per-op dispatch — a large cold-start cut through a
    # high-RTT device link.
    params = jax.jit(lambda k: model.init({"params": k}, dummy))(
        jax.random.PRNGKey(cfg.param_seed))
    return model, params
