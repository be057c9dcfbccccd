"""Locate the audio fan-out's partition overhead (VERDICT r3 #8).

r3's bench measured the sharded Wav2Vec2 embed program at ~0.87-0.85x the
single-device time on the virtual CPU mesh, vs ~1.0 for the ViViT leg.
This probe decomposes the gap on the same mesh:

  (a) input placement: unsharded device-0 inputs force a reshard inside
      the timed call (bench/scaling.py time it this way) vs inputs
      device_put with the target NamedSharding up front;
  (b) collectives: dump the partitioned HLO and count collective ops
      (expected zero: batch-sharded IO, replicated params);
  (c) per-shard compute: single-device program at the per-shard batch.

Run (CPU virtual mesh):
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/probe_audio_fanout_eff.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_best(fn, reps=5):
    import jax
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax

    from mmer_tpu.config import MeshConfig, Wav2Vec2Config
    from mmer_tpu.core.mesh import (create_mesh, data_sharding,
                                    replicated_sharding)
    from mmer_tpu.models.wav2vec2 import (AudioEmbedder,
                                          feat_extract_output_length)
    from mmer_tpu.parallel.scaling import _W2V2_KW

    n = 8
    mesh = create_mesh(MeshConfig(), devices=jax.devices()[:n])
    acfg = Wav2Vec2Config(**_W2V2_KW)
    single = AudioEmbedder(acfg)
    sharded = AudioEmbedder(acfg, mesh=mesh)

    pdb = 16
    G = pdb * n
    rng = np.random.default_rng(0)
    n_pad = single._bucket_len(2 * acfg.sample_rate)
    t_out = feat_extract_output_length(acfg, n_pad)
    waves = rng.normal(size=(G, n_pad)).astype(np.float32)
    mask = np.zeros((G, t_out), bool)

    dev0_w = jax.device_put(waves)
    dev0_m = jax.device_put(mask)
    sh_w = jax.device_put(waves, data_sharding(mesh, 2))
    sh_m = jax.device_put(mask, data_sharding(mesh, 2))

    t_single = _time_best(lambda: single._apply_pool(
        single.params, dev0_w, dev0_m))
    t_shard_dev0 = _time_best(lambda: sharded._apply_pool(
        sharded.params, dev0_w, dev0_m))
    t_shard_presh = _time_best(lambda: sharded._apply_pool(
        sharded.params, sh_w, sh_m))
    pd_w = jax.device_put(waves[:pdb])
    pd_m = jax.device_put(mask[:pdb])
    t_single_pd = _time_best(lambda: single._apply_pool(
        single.params, pd_w, pd_m))

    print(f"single G={G}:            {t_single*1e3:8.1f} ms")
    print(f"single per-shard B={pdb}: {t_single_pd*1e3:8.1f} ms "
          f"(x{n} = {n*t_single_pd*1e3:.1f})")
    print(f"sharded, dev0 inputs:    {t_shard_dev0*1e3:8.1f} ms "
          f"(strong eff {t_single/t_shard_dev0:.3f}, "
          f"weak {n*t_single_pd/t_shard_dev0:.3f})")
    print(f"sharded, presharded:     {t_shard_presh*1e3:8.1f} ms "
          f"(strong eff {t_single/t_shard_presh:.3f}, "
          f"weak {n*t_single_pd/t_shard_presh:.3f})")

    # Compiled HLO of the actual partitioned program:
    compiled = sharded._apply_pool.lower(
        sharded.params, sh_w, sh_m).compile()
    hlo = compiled.as_text()
    colls = re.findall(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\b", hlo)
    from collections import Counter
    print(f"partitioned-HLO collectives: {dict(Counter(colls)) or 'NONE'}")


if __name__ == "__main__":
    main()
