"""Probe: does the AOT executable cache (core/aot.py) round-trip through
the axon PJRT plugin — i.e. can a LATER process load a compiled
(Pallas/Mosaic) executable from disk and skip compilation entirely?

Motivation (README "Where a server restart's wall-clock goes"): the
Pallas ViViT's Mosaic custom-call makes the XLA persistent-cache key
process-unstable, so every serving restart re-pays a 131-700 s compile —
which is why serving defaults to the slower pure-XLA ViViT.  If the
round-trip works, AotJit (already wired into VideoFeatureExtractor /
AudioEmbedder) removes that tax and serving can default to the fast path.

  python scripts/probe_aot.py save   # compile + serialize + run
  python scripts/probe_aot.py load   # later process: load, NO compile
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

CACHE = "/tmp/aot_probe_cache"


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    t0 = time.time()

    from mmer_tpu.core.aot import aot_cached_compile
    from mmer_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    shape = (2, 12, 1569, 64)
    args = tuple(jax.device_put(rng.normal(size=shape).astype(jnp.bfloat16))
                 for _ in range(3))
    jax.block_until_ready(args)
    print(f"[{time.time() - t0:7.1f}s] inputs staged on "
          f"{jax.devices()[0].platform} (mode={mode})", flush=True)

    import logging
    logging.basicConfig(level=logging.INFO)

    t1 = time.time()
    compiled = aot_cached_compile(lambda q, k, v: flash_attention(q, k, v),
                                  args, key="probe-flash", cache_dir=CACHE)
    print(f"[{time.time() - t0:7.1f}s] aot_cached_compile took "
          f"{time.time() - t1:.1f}s", flush=True)

    out = compiled(*args)
    jax.block_until_ready(out)
    t2 = time.time()
    out2 = compiled(*args)
    jax.block_until_ready(out2)
    np.asarray(out2.ravel()[:4])
    print(f"[{time.time() - t0:7.1f}s] ran; repeat call "
          f"{(time.time() - t2) * 1e3:.1f} ms; out[:2]="
          f"{np.asarray(out.ravel()[:2])}", flush=True)
    import os
    arts = os.listdir(CACHE) if os.path.isdir(CACHE) else []
    print(f"cache dir: {arts}", flush=True)


if __name__ == "__main__":
    main()
