"""Probe: int8-GEMM Wav2Vec2 transformer vs the production bf16 path.

Times the full AudioEmbedder pooled forward (B=64, 3.2 s clips — the
production extraction shape) for (a) the bf16 fused-Pallas path (conv
pyramid + fused FFN), (b) the int8 path on the same fused conv pyramid
(models/wav2vec2_quant.py: transformer GEMMs int8, conv/LN/attention
float), plus embedding cosine agreement.

DECIDED (ran on chip 2026-08-19, artifacts/probes/r3_onchip.json):
int8 measured 0.70× bf16 (450.8 vs 642.3 clips/s) — the per-token
quant/dequant epilogues cost more than the int8 MXU rate saves at this
shape.  The ``AudioEmbedder(precision=...)`` routing it was the decision
input for was removed in r4; this probe now builds the quantized forward
directly and is kept for reproducibility.
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
    # int8 forward built directly (the embedder's precision= routing was
    # removed in r4 after this probe measured it slower): quantized
    # transformer GEMMs + the same masked-mean-pool/L2 tail on device.
    from mmer_tpu.models.wav2vec2_quant import (quant_w2v2_apply,
                                                quantize_w2v2_params)
    qp = jax.block_until_ready(jax.tree_util.tree_map(
        jnp.asarray, quantize_w2v2_params(emb_f.params)))

    @jax.jit
    def q_pool(q, p, w, m):
        hidden = quant_w2v2_apply(q, p, w, m, cfg, use_pyramid=True)
        keep = (~m)[:, :, None].astype(hidden.dtype)
        summed = jnp.sum(hidden * keep, axis=1)
        emb = summed / jnp.maximum(jnp.sum(keep, axis=1), 1.0)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)

    outs = {}
    for name, fn in (
            ("bf16 fused  ",
             lambda w: emb_f._apply_pool(emb_f.params, w, mask)),
            ("int8 fused  ",
             lambda w: q_pool(qp, emb_f.params, w, mask))):
        t = timed(lambda w, f=fn: f(w), [(w,) for w in waves])
        outs[name] = np.asarray(fn(waves[0]), np.float32)
        print(f"{name}: {t*1e3:6.1f} ms  {B/t:6.1f} clips/s", flush=True)

    a, bq = outs["bf16 fused  "], outs["int8 fused  "]
    cos = np.sum(a * bq, axis=1)      # rows are L2-normalized
    print(f"embedding cosine vs bf16: min {cos.min():.5f} "
          f"mean {cos.mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
