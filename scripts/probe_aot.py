"""Probe: can a compiled (Pallas/Mosaic) executable be serialized to disk
and loaded by a LATER process, bypassing compilation entirely?

Motivation (README "Where a server restart's wall-clock goes"): the
Pallas ViViT's Mosaic custom-call makes the XLA persistent-cache key
process-unstable, so every serving restart re-pays a 131-700 s compile —
which is why serving defaults to the slower pure-XLA ViViT.  If
jax.experimental.serialize_executable round-trips through the axon PJRT
plugin, an explicit AOT executable cache with OUR OWN stable key removes
that tax and lets serving default to the fast path.

  python scripts/probe_aot.py save   # compile + serialize + run
  python scripts/probe_aot.py load   # deserialize + run, NO compile
"""

from __future__ import annotations

import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

PATH = "/tmp/aot_probe.bin"


def build():
    from mmer_tpu.ops.flash_attention import flash_attention

    def fn(q, k, v):
        return flash_attention(q, k, v)

    rng = np.random.default_rng(0)
    shape = (2, 12, 1569, 64)
    args = tuple(jax.device_put(rng.normal(size=shape).astype(jnp.bfloat16))
                 for _ in range(3))
    return fn, args


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    t0 = time.time()
    fn, args = build()
    print(f"[{time.time() - t0:7.1f}s] inputs staged on "
          f"{jax.devices()[0].platform}", flush=True)

    if mode == "save":
        lowered = jax.jit(fn).lower(*args)
        compiled = lowered.compile()
        print(f"[{time.time() - t0:7.1f}s] compiled", flush=True)
        payload = jax.experimental.serialize_executable.serialize(compiled)
        with open(PATH, "wb") as f:
            pickle.dump(payload, f)
        import os
        print(f"[{time.time() - t0:7.1f}s] serialized "
              f"{os.path.getsize(PATH)} bytes", flush=True)
    else:
        with open(PATH, "rb") as f:
            payload = pickle.load(f)
        compiled = jax.experimental.serialize_executable.deserialize_and_load(
            *payload)
        print(f"[{time.time() - t0:7.1f}s] deserialized", flush=True)

    out = compiled(*args)
    jax.block_until_ready(out)
    t1 = time.time()
    out2 = compiled(*args)
    jax.block_until_ready(out2)
    np.asarray(out2.ravel()[:4])
    print(f"[{time.time() - t0:7.1f}s] ran; second call "
          f"{(time.time() - t1) * 1e3:.1f} ms; out[0,0,0,:2]="
          f"{np.asarray(out.ravel()[:2])}", flush=True)


if __name__ == "__main__":
    import jax.experimental.serialize_executable  # noqa: F401  (register)
    main()
