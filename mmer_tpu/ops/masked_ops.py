"""Mask-aware sequence ops shared by the fusion model and extractors."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def masked_mean_pool(x: jnp.ndarray, pad_mask: Optional[jnp.ndarray]
                     ) -> jnp.ndarray:
    """Mean over sequence positions, ignoring padded ones.

    ``pad_mask``: (B, S) bool, True = padded (reference convention,
    train2.py:183-189).  Denominator clamped at 1e-6 like the reference.
    """
    if pad_mask is None:
        return jnp.mean(x, axis=1)
    keep = (~pad_mask).astype(x.dtype)[..., None]     # (B, S, 1)
    total = jnp.sum(x * keep, axis=1)
    count = jnp.clip(jnp.sum(keep, axis=1), 1e-6, None)
    return total / count


def attention_bias_from_pad_mask(pad_mask: Optional[jnp.ndarray],
                                 dtype=jnp.float32) -> Optional[jnp.ndarray]:
    """(B, S) True-for-pad mask → (B, 1, 1, S) additive attention bias."""
    if pad_mask is None:
        return None
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=dtype)
    return jnp.where(pad_mask[:, None, None, :], neg, jnp.zeros((), dtype))
