"""A/B: double-buffered vs serial block loop in VideoFeatureExtractor.

``embed_chunks(pipeline=True)`` double-buffers multi-block calls
(VERDICT r3 #6): block i+1's host staging + H2D enqueue happens BEFORE
block i's result is fetched.  This probe times the same host-resident
uint8 workload through both loop shapes; the serial shape
(``pipeline=False``) mirrors the reference's per-chunk GPU loop
(/root/reference/video_extractor.py:152-156).

MEASURED (artifacts/probes/r4_onchip2.json): 0.92x — a LOSS in this
environment.  Host→device rides the ~27 MB/s axon relay, so staging IS
the wall-clock and two in-flight ~77 MB blocks contend on the relay
instead of overlapping.  ``pipeline=False`` is therefore the default; on
PCIe-attached hardware (~10+ GB/s) the overlap is the standard win with
expected gain min(staging, compute) per block — re-run this probe there
before flipping the default.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
