"""Device probe (the reference's CUDA smoke check, check.py:1-7, TPU-native).

Run: ``python -m mmer_tpu.core.check``
"""

from __future__ import annotations

import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"jax {jax.__version__}")
    devices = jax.devices()
    print(f"devices: {[str(d) for d in devices]}")
    print(f"default backend: {jax.default_backend()}")

    import numpy as np

    reps = 10

    # One jitted program of `reps` chained matmuls reduced to a scalar; the
    # scalar's host transfer forces a true sync (block_until_ready over a
    # tunneled device can report before execution completes).
    @jax.jit
    def chained(x):
        y = x
        for _ in range(reps):
            y = y @ x
        return jnp.sum(y)

    x = jnp.ones((4096, 4096), jnp.bfloat16) * 0.0001
    float(chained(x))                    # compile + warm
    t0 = time.perf_counter()
    np.asarray(chained(x))
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * 4096 ** 3
    print(f"bf16 4096^3 matmul: {dt * 1e3:.2f} ms  "
          f"({flops / dt / 1e12:.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
