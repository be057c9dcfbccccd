"""Per-layer timing of the fused conv-encoder kernels vs the XLA convs —
where the 36 ms actually goes (diagnostic for ops/conv_pyramid.py)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B = 64
N_PAD = 64000
PEAK = 197e12


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
        np.asarray(outs[-1].ravel()[:1])
        best = min(best, (time.time() - t0) / n_chain)
    return best


def main():
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    from mmer_tpu.config import Wav2Vec2Config
    from mmer_tpu.models.wav2vec2 import AudioEmbedder
    from mmer_tpu.ops import conv_pyramid as cp

    cfg = Wav2Vec2Config()
    emb = AudioEmbedder(cfg, use_pallas=False)
    params = emb.params["params"]["feature_encoder"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # Layer 0
    k0, s0 = cfg.conv_kernels[0], cfg.conv_strides[0]
    t = (N_PAD - k0) // s0 + 1
    t_pad = cp._round_up(t, 2)
    w0 = params["conv_0"]["kernel"].reshape(k0, 512)
    w0 = jnp.pad(w0, ((0, 6), (0, 0))).astype(dt)
    # Generate inputs ON DEVICE — staging (B, 6400, 1024) batches
    # through this environment's ~27 MB/s relay costs minutes each.
    gen = jax.jit(lambda k, s=(B, t_pad, 16): jax.random.normal(k, s, dt))
    patches = [gen(jax.random.PRNGKey(i)) for i in range(6)]
    fl = 2 * B * t_pad * 16 * 512
    tt = timed(lambda p: cp._call_gemm(p, w0, params["conv_0"]["bias"],
                                       params["conv_ln_0"]["scale"],
                                       params["conv_ln_0"]["bias"],
                                       t, t_pad, False),
               [(p,) for p in patches])
    print(f"L0 (k10): t={t_pad:6d}  {tt*1e3:6.2f} ms  {fl/tt/1e12:5.1f} TF/s", flush=True)

    for i in range(1, 7):
        k = cfg.conv_kernels[i]
        t_in, t = t, (t - k) // 2 + 1
        t_in_pad, t_pad = t_pad, cp._round_up(t, 2)
        gen = jax.jit(lambda k, s=(B, t_in_pad // 2, 1024):
                      jax.random.normal(k, s, dt))
        xms = [gen(jax.random.PRNGKey(100 + i)) for i in range(6)]
        w = params[f"conv_{i}"]["kernel"].astype(dt)
        cb = params[f"conv_{i}"]["bias"]
        ls = params[f"conv_ln_{i}"]["scale"]
        lb = params[f"conv_ln_{i}"]["bias"]
        fl = 2 * B * t_pad * k * 512 * 512
        if k == 2:
            tt = timed(lambda xm, w2d=w.reshape(1024, 512), cb=cb, ls=ls,
                       lb=lb, t=t, tp=t_pad:
                       cp._call_gemm(xm, w2d, cb, ls, lb, t, tp, False),
                       [(x,) for x in xms])
        else:
            tt = timed(lambda xm, w01=w[:2].reshape(1024, 512), w2=w[2],
                       cb=cb, ls=ls, lb=lb, t=t, tp=t_pad:
                       cp._call_k3(xm, w01, w2, cb, ls, lb, t, tp, False),
                       [(x,) for x in xms])
        print(f"L{i} (k{k}) : t={t_pad:6d}  {tt*1e3:6.2f} ms  "
              f"{fl/tt/1e12:5.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
