"""Batch-dimension shape bucketing.

Under jit every distinct input shape compiles a fresh executable, and the
AOT executable cache (core/aot.py) persists one entry per signature.  Any
code path whose batch size tracks *request content* — serving's sliding
windows group by per-video window count (serve/engine.py), the audio
embedder batches one piece per window — would therefore compile (and cache)
an unbounded family of programs as uploads of new lengths arrive.  Rounding
the batch dimension up to a small fixed set of sizes bounds the shape
family; padding rows are computed and sliced away (≤2× waste, amortized by
never recompiling).

The reference has no analogue: torch executes eagerly, so shape variety
costs it nothing (back-end/app/libs/inference.py:482-499 runs per-window
python loops).  This is a TPU/XLA-specific obligation.
"""

from __future__ import annotations


def batch_bucket(n: int, max_pow2: int = 128) -> int:
    """Round batch size ``n`` up to a bounded shape set: powers of two up
    to ``max_pow2``, then multiples of ``max_pow2`` (so huge batches pad by
    at most ``max_pow2 - 1`` rows instead of doubling)."""
    if n <= 1:
        return 1
    if n >= max_pow2:
        return -(-n // max_pow2) * max_pow2
    return 1 << (n - 1).bit_length()
