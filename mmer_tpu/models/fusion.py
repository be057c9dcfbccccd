"""CrossModalFusion + EmotionClassifier — the flagship model, in Flax.

One definition shared by training, serving, and interpretability — the
reference defines this model four separate times (train.py:39, train2.py:77,
back-end/app/libs/model.py:6, back-end/app/libs/train2_model.py:5).

Behavioral contract (reference train2.py:77-292):
- video (B, T, 768) → Dense(512) → LayerNorm;  audio (B, 1024) → Dense(512)
  → LayerNorm → 1 token; concat to a (B, T+1, 512) token sequence;
- learned positional embedding, init N(0, 0.02) (train2.py:108-109);
- post-norm transformer encoder (d=512, 8 heads, ffn 2048, ReLU, dropout),
  the exact layer semantics of ``torch.nn.TransformerEncoderLayer`` with
  ``norm_first=False``;
- key-padding mask with the audio token never masked (train2.py:163-176);
- masked mean pooling + output LayerNorm (train2.py:183-191);
- classifier MLP 512→512→512→6 with LayerNorm+ReLU+Dropout (train2.py:196-238);
- ``__call__`` returns (probs, logits, attn) like the reference forward
  (train2.py:281-292).  Unlike the reference — whose ``attn_weights`` is a
  permanent ``None`` stub (train2.py:179) — ``return_attn=True`` here returns
  the final layer's real attention probabilities.

TPU notes: matmuls run in bfloat16 on the MXU with float32 params and
float32 layer norms; the sequence is tiny (≤ 6 tokens for the shipped data,
57 at serve time) so attention stays as fused XLA einsums — a Pallas kernel
only pays off in the ViViT extractor where S=785 (see models/vivit.py).
Tensor-parallel sharding rules for the head and FFN dimensions live in
parallel/sharding.py.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmer_tpu.config import ModelConfig
from mmer_tpu.ops.masked_ops import attention_bias_from_pad_mask, masked_mean_pool


def _dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class TokenNorm(nn.Module):
    """LayerNorm (v2) or feature BatchNorm (v1, reference train.py:50-51)."""

    kind: str = "layernorm"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.kind == "layernorm":
            return nn.LayerNorm(dtype=jnp.float32)(x)
        if self.kind == "batchnorm":
            shape = x.shape
            flat = x.reshape(-1, shape[-1])
            out = nn.BatchNorm(use_running_average=not train,
                               dtype=jnp.float32)(flat)
            return out.reshape(shape)
        if self.kind == "none":
            return x
        raise ValueError(f"unknown norm kind {self.kind}")


class MultiHeadSelfAttention(nn.Module):
    """Masked multi-head self-attention with bf16 MXU matmuls."""

    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attn_bias: Optional[jnp.ndarray] = None,
                 deterministic: bool = True,
                 dropout_rate: float = 0.0,
                 return_attn: bool = False):
        b, s, d = x.shape
        h = self.num_heads
        hd = d // h
        dense = lambda name: nn.DenseGeneral(  # noqa: E731
            features=(h, hd), axis=-1, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        if attn_bias is not None:
            scores = scores + attn_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        if dropout_rate > 0.0:
            probs = nn.Dropout(rate=dropout_rate)(
                probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(self.dtype), v,
                         preferred_element_type=jnp.float32)
        out = nn.DenseGeneral(features=d, axis=(-2, -1), dtype=self.dtype,
                              param_dtype=jnp.float32, name="out")(out)
        if return_attn:
            return out, probs
        return out, None


class PostNormEncoderLayer(nn.Module):
    """torch ``TransformerEncoderLayer(norm_first=False)`` semantics:
    ``x = LN(x + Drop(SA(x))); x = LN(x + Drop(FFN(x)))`` with
    ``FFN = W2(Drop(relu(W1 x)))``."""

    num_heads: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, attn_bias=None, deterministic: bool = True,
                 return_attn: bool = False):
        attn_out, attn_probs = MultiHeadSelfAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn")(
                x, attn_bias, deterministic=deterministic,
                dropout_rate=self.dropout, return_attn=return_attn)
        x = x + nn.Dropout(rate=self.dropout)(
            attn_out.astype(x.dtype), deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)

        hdim = x.shape[-1]
        y = nn.Dense(self.ffn_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ffn_in")(x)
        y = nn.relu(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(hdim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ffn_out")(y)
        x = x + nn.Dropout(rate=self.dropout)(
            y.astype(x.dtype), deterministic=deterministic)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        return x, attn_probs


class CrossModalFusion(nn.Module):
    """Fuse a video token sequence with a single audio token."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, video_feats: jnp.ndarray, audio_feats: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None,
                 train: bool = False, return_attn: bool = False):
        cfg = self.cfg
        dt = _dtype(cfg)
        b, t, _ = video_feats.shape

        video = nn.Dense(cfg.fused_dim, dtype=dt, param_dtype=jnp.float32,
                         name="video_proj")(video_feats.astype(dt))
        video = TokenNorm(cfg.norm, name="norm_video")(video, train=train)

        audio = nn.Dense(cfg.fused_dim, dtype=dt, param_dtype=jnp.float32,
                         name="audio_proj")(audio_feats.astype(dt))
        audio = TokenNorm(cfg.norm, name="norm_audio")(audio, train=train)
        audio = audio[:, None, :]                       # (B, 1, F)

        combined = jnp.concatenate(
            [video.astype(jnp.float32), audio.astype(jnp.float32)], axis=1)

        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(stddev=0.02),
            (1, cfg.max_seq_len, cfg.fused_dim), jnp.float32)
        combined = combined + pos_embed[:, : t + 1, :]
        combined = nn.Dropout(rate=cfg.fusion_dropout)(
            combined, deterministic=not train)

        # Audio token is never masked (reference train2.py:163-176).
        if pad_mask is not None:
            audio_pad = jnp.zeros((b, 1), dtype=bool)
            full_mask = jnp.concatenate([pad_mask, audio_pad], axis=1)
        else:
            full_mask = None
        bias = attention_bias_from_pad_mask(full_mask)

        x = combined
        attn_probs = None
        for i in range(cfg.fusion_layers):
            x, layer_attn = PostNormEncoderLayer(
                num_heads=cfg.fusion_heads, ffn_dim=cfg.fusion_ffn_dim,
                dropout=cfg.fusion_dropout, dtype=dt, name=f"layer_{i}")(
                    x, bias, deterministic=not train,
                    return_attn=return_attn and i == cfg.fusion_layers - 1)
            if layer_attn is not None:
                attn_probs = layer_attn

        fused = masked_mean_pool(x, full_mask)
        fused = TokenNorm(cfg.norm, name="out_norm")(fused, train=train)
        return fused, attn_probs


class EmotionClassifier(nn.Module):
    """MLP head: Dense→Norm→ReLU→Dropout ×2 → Dense(num_classes)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, fused: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        dt = _dtype(cfg)
        hidden = cfg.classifier_hidden_dim or cfg.fused_dim // 2
        x = fused.astype(dt)
        for i in range(2):
            x = nn.Dense(hidden, dtype=dt, param_dtype=jnp.float32,
                         name=f"hidden_{i}")(x)
            x = TokenNorm(cfg.norm, name=f"norm_{i}")(x, train=train)
            x = nn.relu(x)
            x = nn.Dropout(rate=cfg.classifier_dropout)(
                x, deterministic=not train)
            x = x.astype(dt)
        logits = nn.Dense(cfg.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="out")(x)
        return logits


class MultimodalEmotionModel(nn.Module):
    """Fusion + classifier; returns (probs, logits, attn) like the reference
    ``MultimodalEmotionModel.forward`` (train2.py:281-292)."""

    cfg: ModelConfig

    def setup(self):
        self.fusion = CrossModalFusion(self.cfg)
        self.classifier = EmotionClassifier(self.cfg)

    def __call__(self, video_feats, audio_feats, pad_mask=None,
                 train: bool = False, return_attn: bool = False):
        fused, attn = self.fusion(video_feats, audio_feats, pad_mask,
                                  train=train, return_attn=return_attn)
        logits = self.classifier(fused, train=train)
        probs = jax.nn.softmax(logits, axis=-1)
        return probs, logits, attn
