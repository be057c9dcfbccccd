"""A/B the fused conv-encoder kernels (ops/conv_pyramid.py) against the
XLA ``lax.conv`` path on the real chip, at the extraction shape
(B=64 × 3.2 s clips padded to the 4 s bucket), plus the full-model effect.

Timing discipline per CLAUDE.md: distinct pre-staged device inputs,
chained calls, one sync, small outputs.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12
B = 64
CLIP_S = 3.2


def timed(fn, inputs, n_chain=4, reps=3):
    outs = fn(*inputs[-1])
    jax.block_until_ready(outs)
    best = float("inf")
    for r in range(reps):
        chain = [inputs[(r * n_chain + i) % len(inputs)]
                 for i in range(n_chain)]
        t0 = time.time()
        outs = [fn(*args) for args in chain]
        jax.block_until_ready(outs)
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0].ravel()[:1])
        best = min(best, (time.time() - t0) / n_chain)
    return best


def conv_flops(cfg, n_samples):
    fl, length, in_ch = 0, n_samples, 1
    for dim, k, s in zip(cfg.conv_dims, cfg.conv_kernels, cfg.conv_strides):
        length = (length - k) // s + 1
        fl += 2 * length * dim * k * in_ch
        in_ch = dim
    return fl, length


def main():
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    from mmer_tpu.config import Wav2Vec2Config
    from mmer_tpu.models.wav2vec2 import AudioEmbedder, ConvFeatureEncoder
    from mmer_tpu.ops.conv_pyramid import fused_conv_encoder

    cfg = Wav2Vec2Config()
    rng = np.random.default_rng(0)
    n = int(16000 * CLIP_S)
    emb = AudioEmbedder(cfg, use_pallas=False)
    n_pad = emb._bucket_len(n)
    print(f"backend={jax.default_backend()}  B={B}  samples={n_pad}")

    waves = [jax.device_put(np.pad(
        rng.normal(size=(B, n)).astype(np.float32),
        ((0, 0), (0, n_pad - n)))) for _ in range(12)]
    jax.block_until_ready(waves)

    c_fl, t_frames = conv_flops(cfg, n_pad)
    fl = B * c_fl
    conv_params = {"params": emb.params["params"]["feature_encoder"]}

    xla_apply = jax.jit(ConvFeatureEncoder(cfg).apply)
    t = timed(lambda w: xla_apply(conv_params, w), [(w,) for w in waves])
    print(f"conv encoder XLA   : {t*1e3:6.1f} ms  {fl/t/1e12:5.1f} TF/s  "
          f"MFU={fl/t/PEAK*100:4.1f}%")

    ref = np.asarray(xla_apply(conv_params, waves[0])[:2, :64], np.float32)
    for name, mega in (("layers", False), ("mega", True)):
        fused = jax.jit(lambda p, w, m=mega: fused_conv_encoder(
            w, p["params"], cfg, interpret=False, mega=m))
        got = np.asarray(fused(conv_params, waves[0])[:2, :64], np.float32)
        err = np.abs(ref - got).max()
        t = timed(lambda w: fused(conv_params, w), [(w,) for w in waves])
        print(f"conv encoder fused/{name:6s}: {t*1e3:6.1f} ms  "
              f"{fl/t/1e12:5.1f} TF/s  MFU={fl/t/PEAK*100:4.1f}%  "
              f"max|Δ|={err:.4f}", flush=True)

    # Full-model effect (embed path, device-fed)
    for name, flag in (("xla", False), ("pyramid", True)):
        e = AudioEmbedder(cfg, use_pallas=flag)
        t_out = t_frames
        mask = jax.device_put(np.zeros((B, t_out), bool))
        t = timed(lambda w: e._apply_pool(e.params, w, mask),
                  [(w,) for w in waves])
        print(f"full model ({name:7s}): {t*1e3:6.1f} ms  "
              f"{B/t:6.1f} clips/s")


if __name__ == "__main__":
    main()
