"""Probe: int8-GEMM Wav2Vec2 transformer vs the production bf16 path.

Times the full AudioEmbedder pooled forward (B=64, 3.2 s clips — the
production extraction shape) for (a) the bf16 fused-Pallas path (conv
pyramid + fused FFN), (b) the int8 path on the same fused conv pyramid
(models/wav2vec2_quant.py: transformer GEMMs int8, conv/LN/attention
float), plus embedding cosine agreement.

Decision input for ``AudioEmbedder(precision=...)``: the transformer is
~70% of W2V2 time at 45-49% bf16 MFU (README MFU table), v5e int8 peak
is 2x bf16 — but unlike the ViViT these weights carry trained
information once the real checkpoint lands, so a win must also show
cosine agreement tight enough to not move the downstream classifier
(tests/test_quant.py quantifies on CPU; threshold discussion in
models/wav2vec2_quant.py docstring).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from scripts._probe_util import timed

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.models.wav2vec2 import (AudioEmbedder, Wav2Vec2Config,
                                      feat_extract_output_length)

B, SAMPLES = 64, 64000




def main():
    enable_persistent_cache()
    cfg = Wav2Vec2Config()
    rng = np.random.default_rng(0)
    n_pad = -(-SAMPLES // cfg.sample_rate) * cfg.sample_rate
    t_out = feat_extract_output_length(cfg, n_pad)
    frame_len = feat_extract_output_length(cfg, SAMPLES)
    mask = jax.device_put(np.broadcast_to(
        np.arange(t_out) >= frame_len, (B, t_out)).copy())
    waves = [jax.device_put(np.pad(
        rng.normal(size=(B, SAMPLES)).astype(np.float32),
        ((0, 0), (0, n_pad - SAMPLES)))) for _ in range(12)]
    jax.block_until_ready(waves)
    print(f"backend={jax.default_backend()}  B={B}  frames={t_out}",
          flush=True)

    emb_f = AudioEmbedder(cfg, use_pallas=True)
    emb_q = AudioEmbedder(cfg, use_pallas=True, precision="int8",
                          params=emb_f.params)

    outs = {}
    for name, emb in (("bf16 fused  ", emb_f), ("int8 fused  ", emb_q)):
        t = timed(lambda w, e=emb: e._apply_pool(e._run_params, w, mask),
                  [(w,) for w in waves])
        outs[name] = np.asarray(
            emb._apply_pool(emb._run_params, waves[0], mask), np.float32)
        print(f"{name}: {t*1e3:6.1f} ms  {B/t:6.1f} clips/s", flush=True)

    a, bq = outs["bf16 fused  "], outs["int8 fused  "]
    cos = np.sum(a * bq, axis=1)      # rows are L2-normalized
    print(f"embedding cosine vs bf16: min {cos.min():.5f} "
          f"mean {cos.mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
