"""ViViT batch-size A/B on the real chip: B=16 (production) vs B=32.

Larger batches change nothing inside the Pallas attention programs (the
batch is a pure grid axis) but double the number of programs per launch
and halve per-launch overhead amortization — worth one measurement after
the FFN-fusion changes.  Uses profile_vivit.py's timing discipline.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ViViTConfig
from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.models.vivit import ViViTFeatureExtractor

PEAK = 197e12
S, H, D, DEPTH = 1569, 12, 64, 12


def timed(fn, inputs, n_chain=4, reps=2):
    outs = fn(*inputs[-1])
    jax.block_until_ready(outs)
    best = float("inf")
    for r in range(reps):
        chain = inputs[r * n_chain:(r + 1) * n_chain]
        t0 = time.time()
        outs = [fn(*args) for args in chain]
        jax.block_until_ready(outs)
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][0, :1])
        best = min(best, (time.time() - t0) / n_chain)
    return best


def model_flops(b):
    per_layer = (4 * 768 * 768 + 2 * 768 * 3072) * S * 2
    attn = 4 * S * S * D * H
    patch = 1568 * 3072 * 768 * 2
    return b * (patch + DEPTH * (per_layer + attn))


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")
    cfg = ViViTConfig()
    model = ViViTFeatureExtractor(cfg, use_flash=True)
    dummy = jnp.zeros((1, 32, 224, 224, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, dummy)
    apply = jax.jit(model.apply)
    for b in (16, 32):
        ins = [(params, jax.device_put(
            rng.normal(size=(b, 32, 224, 224, 3)).astype(np.float32)),)
            for _ in range(9)]
        t = timed(lambda p, v: apply(p, v), ins)
        fl = model_flops(b)
        print(f"B={b:2d}: {t*1e3:7.1f} ms {b/t:7.1f} chunks/s "
              f"{fl/t/1e12:6.1f} TF/s MFU={fl/t/PEAK*100:4.1f}%", flush=True)


if __name__ == "__main__":
    main()
