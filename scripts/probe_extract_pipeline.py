"""A/B: double-buffered vs serial block loop in VideoFeatureExtractor.

``embed_chunks`` pipelines multi-block calls two deep (VERDICT r3 #6):
block i+1's host staging + H2D enqueue happens BEFORE block i's result
is fetched, so the device never idles between blocks.  This probe
measures what that overlap is worth on the real chip by timing the same
host-resident uint8 workload through both loop shapes (the serial shape
is ``embed_chunks(..., pipeline=False)`` — fetch block i, then stage
block i+1), mirroring the reference's serial per-chunk GPU loop
(/root/reference/video_extractor.py:152-156).

Caveat for THIS environment: host→device goes through the ~27 MB/s axon
relay, so staging dominates compute and the overlap shows as a large
win here; on real hardware (PCIe ~10+ GB/s) the expected win is the
smaller of staging and compute time per block.  Both numbers + the
implied staging/compute split are printed.
"""

from __future__ import annotations

import time

import numpy as np

from mmer_tpu.config import ViViTConfig
from mmer_tpu.core.cache import enable_persistent_cache
from mmer_tpu.preprocess.extract import VideoFeatureExtractor


def main():
    import jax

    enable_persistent_cache()
    cfg = ViViTConfig()                      # production 32×224² chunks
    B = 16
    n_blocks = 6
    ex = VideoFeatureExtractor(cfg, device_batch=B, use_flash=True)

    rng = np.random.default_rng(0)
    clips = rng.integers(0, 256, size=(n_blocks * B, cfg.num_frames,
                                       *cfg.image_size, 3), dtype=np.uint8)
    mb = clips.nbytes / 1e6
    print(f"workload: {n_blocks} blocks × B={B} "
          f"({clips.shape[0]} chunks, {mb:.0f} MB uint8)", flush=True)

    # Warm both the compile cache and the relay session.
    ex.embed_chunks(clips[:B])

    def timed(pipeline: bool, reps: int = 2) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = ex.embed_chunks(clips, pipeline=pipeline)
            best = min(best, time.time() - t0)
            assert out.shape == (clips.shape[0], cfg.dim)
        return best

    t_serial = timed(pipeline=False)
    t_pipe = timed(pipeline=True)
    n = clips.shape[0]
    print(f"serial   : {t_serial:7.3f} s  {n / t_serial:6.1f} chunks/s",
          flush=True)
    print(f"pipelined: {t_pipe:7.3f} s  {n / t_pipe:6.1f} chunks/s  "
          f"speedup {t_serial / t_pipe:4.2f}x", flush=True)

    # Implied split: serial ≈ n·(stage + compute), pipelined ≈
    # n·max(stage, compute) (+ one pipeline-fill term).
    overlap = t_serial - t_pipe
    print(f"overlap reclaimed: {overlap:.3f} s "
          f"({overlap / t_serial * 100:.0f}% of serial)", flush=True)


if __name__ == "__main__":
    main()
