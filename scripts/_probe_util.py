"""Shared chained-dispatch timing helper for the on-chip probe scripts.

One owner of the tunneled-chip timing discipline (CLAUDE.md): every
repetition dispatches a CHAIN of calls on DISTINCT pre-staged inputs and
syncs once at the end — single-call ``block_until_ready`` does not
actually block through the relay, and repeated identical calls can be
deduplicated and time absurdly fast.  A tiny slice of the final output
is materialized to force the chain.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def timed(fn, inputs, n_chain: int = 4, reps: int = 3) -> float:
    """Best per-call seconds for ``fn(*args)`` over chains of distinct
    ``inputs`` (a list of argument tuples)."""
    outs = fn(*inputs[-1])
    jax.block_until_ready(outs)
    best = float("inf")
    for r in range(reps):
        chain = inputs[(r * n_chain) % len(inputs):][:n_chain]
        t0 = time.time()
        outs = [fn(*args) for args in chain]
        jax.block_until_ready(outs)
        last = outs[-1]
        while isinstance(last, (tuple, list)):
            last = last[0]
        np.asarray(last.ravel()[:1])
        best = min(best, (time.time() - t0) / len(chain))
    return best
