"""Component-level performance detail (complements the driver's bench.py).

Measures, on the current device:
- ViViT chunk-embedding throughput (full-size model, Pallas attention),
  with the uint8 device-normalized transfer path;
- Wav2Vec2-large audio embedding throughput (3 s clips, device pooling);
- Viola-Jones detector latency on a 224² frame;
- fusion-model inference throughput at serving shapes.

Run: python scripts/bench_extract.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timed(fn) -> float:
    """Wall seconds for one call of ``fn``."""
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax

    from mmer_tpu.config import ModelConfig, ViViTConfig, Wav2Vec2Config
    from mmer_tpu.models.wav2vec2 import AudioEmbedder
    from mmer_tpu.preprocess.extract import VideoFeatureExtractor

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")

    # -- ViViT ----------------------------------------------------------
    ex = VideoFeatureExtractor(ViViTConfig(), device_batch=16)
    chunks = (rng.random((32, 32, 224, 224, 3)) * 255).astype(np.uint8)
    ex.embed_chunks(chunks)                    # warm
    best = min(_timed(lambda: ex.embed_chunks(chunks)) for _ in range(3))
    print(f"vivit embed (uint8, B=16): {32 / best:.1f} chunks/s "
          f"({32 * 32 / best:.0f} frames/s)")

    # -- Wav2Vec2 ---------------------------------------------------------
    emb = AudioEmbedder(Wav2Vec2Config())
    waves = [rng.normal(size=(48000,)).astype(np.float32) for _ in range(16)]
    emb.embed_batch(waves)                     # warm
    best = min(_timed(lambda: emb.embed_batch(waves)) for _ in range(3))
    print(f"wav2vec2-large embed: {16 / best:.1f} x 3s clips/s")

    # -- detector ---------------------------------------------------------
    from mmer_tpu.preprocess.faces import HaarFaceDetector

    det = HaarFaceDetector()
    frame = (rng.random((224, 224, 3)) * 255).astype(np.uint8)
    det.detect(frame)
    t0 = time.time()
    for _ in range(10):
        det.detect(frame)
    print(f"viola-jones 224^2: {(time.time() - t0) / 10 * 1e3:.0f} ms/frame")

    # -- fusion inference -------------------------------------------------
    import jax.numpy as jnp

    from mmer_tpu.models.fusion import MultimodalEmotionModel

    cfg = ModelConfig(max_seq_len=6)
    model = MultimodalEmotionModel(cfg)
    video = jnp.asarray(rng.normal(size=(256, 5, 768)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(256, 1024)), jnp.float32)
    mask = jnp.zeros((256, 5), bool)
    params = model.init({"params": jax.random.PRNGKey(0)}, video, audio,
                        mask)
    f = jax.jit(lambda p, v, a, m: model.apply(p, v, a, m)[1])
    np.asarray(f(params, video, audio, mask))
    best = min(_timed(lambda: np.asarray(f(params, video, audio, mask)))
               for _ in range(3))
    print(f"fusion inference: {256 / best:.0f} windows/s (B=256)")


if __name__ == "__main__":
    main()
