"""Component-level ViViT throughput profile on the real chip.

Times (tunnel-safe: distinct pre-staged inputs, chained calls, one sync —
CLAUDE.md timing discipline):
  1. full model fwd (flash)             — the production path
  2. full model fwd (XLA attention)     — is the Pallas kernel even winning?
  3. flash_attention alone at the model's shape (B·depth calls equivalent)
  4. reference_attention alone
  5. model with attention replaced by identity — everything-but-attention
Derives achieved TFLOP/s + MFU per component.  v5e bf16 peak: 197 TFLOP/s.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ViViTConfig
from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.models.vivit import ViViTFeatureExtractor
from mmer_tpu.ops.flash_attention import flash_attention, reference_attention

PEAK = 197e12
B = 16
S = 1569
H, D = 12, 64
DEPTH = 12


def timed(fn, inputs, n_chain=4, reps=2):
    """Best wall time for one call, from chains of distinct inputs."""
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
    tokens = S
    per_layer = (4 * 768 * 768 + 2 * 768 * 3072) * tokens * 2
    attn = 4 * S * S * D * H
    patch = 1568 * 3072 * 768 * 2
    return b * (patch + DEPTH * (per_layer + attn))


def attn_flops(b):
    return b * H * 4 * S * S * D


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()}")

    # ---- full model ------------------------------------------------------
    cfg = ViViTConfig()
    for use_flash in (True, False):
        model = ViViTFeatureExtractor(cfg, use_flash=use_flash)
        dummy = jnp.zeros((1, 32, 224, 224, 3), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0)}, dummy)
        apply = jax.jit(model.apply)
        ins = [(params, jax.device_put(
            rng.normal(size=(B, 32, 224, 224, 3)).astype(np.float32)),)
            for _ in range(9)]
        t = timed(lambda p, v: apply(p, v), ins)
        fl = model_flops(B)
        print(f"model fwd  flash={use_flash}: {t*1e3:7.1f} ms "
              f"{B/t:7.1f} chunks/s  {fl/t/1e12:6.1f} TF/s "
              f"MFU={fl/t/PEAK*100:4.1f}%")

    # ---- attention alone -------------------------------------------------
    def make_qkv():
        return tuple(jax.device_put(
            rng.normal(size=(B, H, S, D)).astype(jnp.bfloat16))
            for _ in range(3))

    qkvs = [make_qkv() for _ in range(9)]
    for name, fn in (("pallas", jax.jit(flash_attention)),
                     ("xla   ", jax.jit(reference_attention))):
        t = timed(fn, qkvs)
        fl = attn_flops(B)
        print(f"attn {name} (B={B},H={H},S={S},D={D}): {t*1e3:7.1f} ms "
              f"{fl/t/1e12:6.1f} TF/s MFU={fl/t/PEAK*100:4.1f}% "
              f"(x{DEPTH} layers = {DEPTH*t*1e3:.1f} ms/model)")

    # ---- everything-but-attention ---------------------------------------
    import mmer_tpu.models.vivit as vv
    orig = vv.flash_attention
    vv.flash_attention = lambda q, k, v: v
    try:
        model = ViViTFeatureExtractor(cfg, use_flash=True)
        dummy = jnp.zeros((1, 32, 224, 224, 3), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0)}, dummy)
        apply = jax.jit(model.apply)
        ins = [(params, jax.device_put(
            rng.normal(size=(B, 32, 224, 224, 3)).astype(np.float32)),)
            for _ in range(9)]
        t = timed(lambda p, v: apply(p, v), ins)
        fl = model_flops(B) - DEPTH * attn_flops(B)
        print(f"model minus attention: {t*1e3:7.1f} ms  "
              f"{fl/t/1e12:6.1f} TF/s MFU={fl/t/PEAK*100:4.1f}%")
    finally:
        vv.flash_attention = orig


if __name__ == "__main__":
    main()
