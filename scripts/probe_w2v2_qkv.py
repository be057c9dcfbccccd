"""A/B the Wav2Vec2 q/k/v projection layout on the real chip.

Times the FULL encoder (B=64, 3.2 s clips, the production extraction
shape) with the three separate (d, d) projections vs the one-GEMM
``use_fused_qkv`` path (EncoderLayer, models/wav2vec2.py), both on top
of the measured-win fused conv-pyramid + fused-FFN paths with XLA
attention (the current production default).

Decides the ``use_fused_qkv`` default: the separate projections re-read
the (B*S, d) bf16 activations (~26 MB) three times per layer x 24
layers; the fused form reads them once, at the cost of concatenating
the (d, 3d) weight per call.  Numerics are identical (CPU-tested in
tests/test_wav2vec2.py::test_fused_qkv_matches_separate_projections).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.models.wav2vec2 import (Wav2Vec2Config, Wav2Vec2Encoder,
                                      feat_extract_output_length)
from scripts._probe_util import timed

PEAK = 197e12
B, SAMPLES = 64, 64000




def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    cfg = Wav2Vec2Config()
    t_frames = feat_extract_output_length(cfg, SAMPLES)
    print(f"backend={jax.default_backend()}  B={B}  frames={t_frames}")

    waves = [jax.device_put(
        rng.normal(size=(B, SAMPLES)).astype(np.float32))
        for _ in range(12)]
    pad = np.zeros((B, t_frames), bool)
    pad[:B // 4, (3 * t_frames) // 4:] = True
    pad = jnp.asarray(pad)

    outs = {}
    for name, fused in (("separate-qkv", False), ("fused-qkv   ", True)):
        model = Wav2Vec2Encoder(cfg, use_pallas=True, use_flash_attn=False,
                                use_fused_qkv=fused)
        dummy = jnp.zeros((1, 3200), jnp.float32)
        params = model.init({"params": jax.random.PRNGKey(0)}, dummy)
        apply = jax.jit(lambda p, w, m=model: m.apply(p, w, pad))
        t = timed(apply, [(params, w) for w in waves])
        outs[name] = np.asarray(apply(params, waves[0])[:, :4, :8],
                                np.float32)
        print(f"{name}: {t*1e3:6.1f} ms  {B/t:6.1f} clips/s", flush=True)

    err = float(np.abs(outs["separate-qkv"] - outs["fused-qkv   "]).max())
    print(f"max|delta| (sampled rows): {err:.2e}")


if __name__ == "__main__":
    main()
