"""On-device image ops: batched bbox crop + bilinear resize.

The reference crops faces per frame with OpenCV on the host, one frame at a
time inside a Python loop (reference cremad_bbox_converter.py:11-61,
back-end/app/libs/inference.py:104-144).  Here cropping is a *gather* and
resizing a pair of small matmuls, so an entire frame batch is processed in
one jitted call on device — the fused crop/resize preprocessing the
BASELINE.json north star asks for.

Bilinear resize as matmuls: resize(I) = R_h @ I @ R_w^T where R_h (out_h,
in_h) and R_w (out_w, in_w) hold the interpolation weights.  For a dynamic
crop the weight matrices are built from the (runtime) bbox coordinates with
broadcasted iota — everything stays static-shaped and jit-friendly, and the
per-channel contraction lands on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_weights(start: jnp.ndarray, stop: jnp.ndarray, out_size: int,
                  in_size: int) -> jnp.ndarray:
    """(out_size, in_size) bilinear sampling matrix for the half-open crop
    window [start, stop) of an axis of length in_size.  start/stop are
    runtime scalars (float)."""
    span = jnp.maximum(stop - start, 1.0)
    scale = span / out_size
    # Pixel-center sampling (align_corners=False convention, matching
    # cv2.resize's default used by the reference converters).
    out_idx = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 0)
    in_idx = jax.lax.broadcasted_iota(jnp.float32, (out_size, in_size), 1)
    src = start + (out_idx + 0.5) * scale - 0.5
    d = jnp.abs(in_idx - jnp.clip(src, 0.0, in_size - 1.0))
    w = jnp.maximum(0.0, 1.0 - d)
    # Normalize so rows sum to 1 even at clipped borders.
    return w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-6)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_resize_batch(frames: jnp.ndarray, bboxes: jnp.ndarray,
                      out_hw: tuple = (224, 224)) -> jnp.ndarray:
    """Crop each frame to its bbox and bilinearly resize to ``out_hw``.

    frames: (N, H, W, C) float32/uint8; bboxes: (N, 4) float32 as
    (x1, y1, x2, y2) in pixels.  Returns (N, out_h, out_w, C) float32.
    """
    frames = frames.astype(jnp.float32)
    out_h, out_w = out_hw
    _, h, w, _ = frames.shape

    def one(frame, bbox):
        x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
        rh = _axis_weights(y1, y2, out_h, h)          # (out_h, H)
        rw = _axis_weights(x1, x2, out_w, w)          # (out_w, W)
        # (out_h, H) @ (H, W, C) over H, then (out_w, W) @ ... over W.
        tmp = jnp.einsum("oh,hwc->owc", rh, frame)
        return jnp.einsum("pw,owc->opc", rw, tmp)

    return jax.vmap(one)(frames, bboxes.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_batch(frames: jnp.ndarray, out_hw: tuple = (224, 224)) -> jnp.ndarray:
    """Full-frame batched bilinear resize to ``out_hw``."""
    n, h, w, _ = frames.shape
    full = jnp.tile(jnp.asarray([0.0, 0.0, float(w), float(h)],
                                jnp.float32), (n, 1))
    return crop_resize_batch(frames, full, out_hw)
