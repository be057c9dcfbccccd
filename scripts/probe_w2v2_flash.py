"""A/B the Wav2Vec2 attention path on the real chip: XLA vs flash kernel.

Times the FULL AudioEmbedder model (B=64, 3.2 s clips, the production
extraction shape) with attention on the XLA einsum path vs the
ops/flash_attention key_lens kernel, both on top of the measured-win
fused conv-pyramid + fused-FFN paths.  Also checks output agreement.

Decides the `use_flash_attn` default in AudioEmbedder (models/wav2vec2.py):
the XLA path materializes a (64, 16, 199, 199) f32 score tensor per layer
(~162 MB x 24 layers of HBM traffic); the kernel keeps score rows in VMEM.
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




def model_flops(cfg, t):
    d, m, L = cfg.hidden_dim, cfg.ffn_dim, cfg.num_layers
    per_layer = (4 * d * d + 2 * d * m) * t * 2
    attn = 4 * t * t * (d // cfg.num_heads) * cfg.num_heads
    conv = 0
    length = SAMPLES
    in_ch = 1
    for ch, k, s in zip(cfg.conv_dims, cfg.conv_kernels, cfg.conv_strides):
        length = (length - k) // s + 1
        conv += 2 * length * ch * in_ch * k
        in_ch = ch
    return B * (conv + L * (per_layer + attn))


def main():
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    cfg = Wav2Vec2Config()
    t_frames = feat_extract_output_length(cfg, SAMPLES)
    print(f"backend={jax.default_backend()}  B={B}  frames={t_frames}")

    waves = [jax.device_put(
        rng.normal(size=(B, SAMPLES)).astype(np.float32))
        for _ in range(12)]
    # Production uses a frame mask (1 s padding buckets) — include one so
    # the A/B covers the key_lens path, with 1/4 of the batch short.
    pad = np.zeros((B, t_frames), bool)
    pad[:B // 4, (3 * t_frames) // 4:] = True
    pad = jnp.asarray(pad)

    fl = model_flops(cfg, t_frames)
    outs = {}
    for name, flash in (("xla-attn  ", False), ("flash-attn", True)):
        model = Wav2Vec2Encoder(cfg, use_pallas=True, use_flash_attn=flash)
        params = None
        if params is None:
            # init once per variant (same seed → identical params)
            dummy = jnp.zeros((1, 3200), jnp.float32)
            params = model.init({"params": jax.random.PRNGKey(0)}, dummy)
        apply = jax.jit(lambda p, w: model.apply(p, w, pad))
        t = timed(apply, [(params, w) for w in waves])
        outs[name] = np.asarray(apply(params, waves[0])[:, :4, :8],
                                np.float32)
        print(f"{name}: {t*1e3:6.1f} ms  {B/t:6.1f} clips/s  "
              f"{fl/t/1e12:5.1f} TF/s  MFU={fl/t/PEAK*100:4.1f}%",
              flush=True)

    err = float(np.abs(outs["xla-attn  "] - outs["flash-attn"]).max())
    print(f"max|Δ| (sampled rows): {err:.2e}")


if __name__ == "__main__":
    main()
