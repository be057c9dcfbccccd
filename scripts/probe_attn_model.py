"""In-model A/B of flash-attention block configs (ViViT fwd, real chip).

Standalone attention timings through the axon relay are unreliable
(CLAUDE.md; scripts/probe_attn.py showed ablation-invariant ~8 ms with a
bogus 0.04 ms dedup for the production config).  The number that matters
is the full ViViT forward, timed with the discipline profile_vivit.py
uses (distinct pre-staged inputs, chained calls, small-slice sync).

Sweeps (block_q, block_h) of ops/flash_attention.py inside the model.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ViViTConfig
from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.models import vivit as vv
from mmer_tpu.models.vivit import ViViTFeatureExtractor
from mmer_tpu.ops.flash_attention import flash_attention

PEAK = 197e12
B, S, H, D, DEPTH = 16, 1569, 12, 64, 12


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
    dummy = jnp.zeros((1, 32, 224, 224, 3), jnp.float32)
    ins = None
    params = None
    orig = vv.flash_attention

    configs = [
        ("current (auto 416/6)", None, None),
        ("bq416 bh3", 416, 3),
        ("bq416 bh12", 416, 12),
        ("bq208 bh12", 208, 12),
        ("bq208 bh6", 208, 6),
    ]
    for name, bq, bh in configs:
        if bq is None:
            vv.flash_attention = orig
        else:
            vv.flash_attention = partial(flash_attention,
                                         block_q=bq, block_h=bh)
        try:
            model = ViViTFeatureExtractor(cfg, use_flash=True)
            if params is None:
                params = model.init({"params": jax.random.PRNGKey(0)},
                                    dummy)
                ins = [(params, jax.device_put(
                    rng.normal(size=(B, 32, 224, 224, 3)).astype(
                        np.float32)),) for _ in range(9)]
            apply = jax.jit(model.apply)
            t = timed(lambda p, v: apply(p, v), ins)
            fl = model_flops(B)
            print(f"{name:22s} {t*1e3:7.1f} ms {B/t:7.1f} chunks/s "
                  f"{fl/t/1e12:6.1f} TF/s MFU={fl/t/PEAK*100:4.1f}%",
                  flush=True)
        except Exception as e:  # VMEM overflow configs just report
            print(f"{name:22s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            vv.flash_attention = orig


if __name__ == "__main__":
    main()
