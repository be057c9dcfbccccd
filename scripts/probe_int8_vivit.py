"""Probe: end-to-end int8-GEMM ViViT vs the production bf16 path.

DECIDED (ran on chip 2026-08-19, artifacts/probes/r3_onchip.json):
int8 measured 0.80× bf16 (118.7 vs 95.0 ms; XLA-attn variant 0.64×)
with rel-l2 ≈ 0.02 — the feature-noise level that collapses downstream
F1 (probe_feature_noise_quality).  The ``precision='int8'`` routing was
removed in r4; this probe keeps the direct quant-apply measurement for
reproducibility.  Hypothesis for the loss: the per-token quant/dequant
epilogues are bandwidth-bound VPU work that XLA cannot fuse into the
Mosaic GEMMs, and v5e's 2× int8 MXU rate never shows at these
arithmetic intensities.

Prints: time + chunks/s for (a) the production bf16 fused path (also
exercising the AotJit wiring on TPU), (b) the int8 path with Pallas
attention, (c) the int8 path with XLA attention (Mosaic-free), plus
feature cosine agreement vs (a).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from scripts._probe_util import timed

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.config import ViViTConfig
from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.models.vivit_quant import (quant_vivit_apply,
                                         quantize_vivit_params)

B = 16




def main():
    enable_persistent_cache()
    from mmer_tpu.preprocess.extract import VideoFeatureExtractor

    cfg = ViViTConfig()
    ex = VideoFeatureExtractor(cfg, device_batch=B, use_flash=True)
    rng = np.random.default_rng(0)
    batches = [jax.device_put(
        (rng.random((B, 32, 224, 224, 3)) * 255).astype(np.uint8))
        for _ in range(9)]
    jax.block_until_ready(batches)

    t_bf16 = timed(lambda x: ex._apply(ex.params, x),
                   [(b,) for b in batches])
    print(f"bf16 fused path      : {t_bf16 * 1e3:7.1f} ms  "
          f"{B / t_bf16:6.1f} chunks/s", flush=True)

    q = jax.block_until_ready(
        jax.tree_util.tree_map(jnp.asarray, quantize_vivit_params(ex.params)))

    for flash, tag in ((True, "int8 + Pallas attn  "),
                       (False, "int8 + XLA attn     ")):
        qf = jax.jit(lambda qq, x, fl=flash: quant_vivit_apply(
            qq, x, cfg, use_flash=fl))
        t_q = timed(lambda x: qf(q, x), [(b,) for b in batches])
        print(f"{tag} : {t_q * 1e3:7.1f} ms  {B / t_q:6.1f} chunks/s  "
              f"speedup {t_bf16 / t_q:4.2f}x", flush=True)
        a = np.asarray(ex._apply(ex.params, batches[0]))
        bq = np.asarray(qf(q, batches[0]))
        cos = np.sum(a * bq, axis=1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(bq, axis=1) + 1e-12)
        rel = np.linalg.norm(a - bq, axis=1) / (
            np.linalg.norm(a, axis=1) + 1e-12)
        print(f"   agreement vs bf16: cos {cos.min():.5f}..{cos.max():.5f} "
              f"rel-l2 {rel.mean():.4f}", flush=True)

    # (the former leg (d) exercised VideoFeatureExtractor(precision=
    # "int8") — that routing hook was removed in r4 after this probe
    # measured the int8 path slower; legs (b)/(c) above still measure
    # the quantized forward directly.)


if __name__ == "__main__":
    main()
