"""One-process runner for the round-4 follow-up on-chip queue.

Same discipline as scripts/r3_onchip.py (one process amortizes the
130-860 s relay session-open tax; each stage isolated by try/except;
resume with ``--from STAGE``):

  1. probe_vivit_b32        — B=16 vs B=32 with the r3 kernels (the r2
     "146.5 chunks/s saturation at B=32" number predates the fused-FFN
     sublayer kernel — VERDICT r3 #6)
  2. probe_extract_pipeline — double-buffered vs serial block loop in
     VideoFeatureExtractor.embed_chunks (VERDICT r3 #6)
  3. noise_ctrl             — feature-noise control at rel=0.005, both
     modalities (VERDICT r3 #4: cliff audit)
  4. noise_video            — rel=0.01 noise on the VIDEO features only
  5. noise_audio            — rel=0.01 noise on the AUDIO features only

Results land in the captured stdout; parse into
artifacts/probes/r4_onchip2.{log,json} afterwards.

Run:  timeout 5400 python scripts/r4_onchip2.py 2>&1 | tee /tmp/r4_onchip2.log
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


_SKIP: set = set()


def stage(name, fn):
    key = name.split()[0]
    if key in _SKIP:
        print(f"\n======== {name} ======== SKIPPED (--from)", flush=True)
        return
    print(f"\n======== {name} ========", flush=True)
    t0 = time.time()
    try:
        fn()
        print(f"-------- {name} done in {time.time() - t0:.1f}s",
              flush=True)
    except Exception:
        traceback.print_exc()
        print(f"-------- {name} FAILED after {time.time() - t0:.1f}s",
              flush=True)


ORDER = ["probe_vivit_b32", "probe_extract_pipeline", "noise_ctrl",
         "noise_video", "noise_audio"]


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--from":
        start = sys.argv[2]
        if start not in ORDER:
            raise SystemExit(f"unknown stage {start!r}; one of {ORDER}")
        _SKIP.update(ORDER[:ORDER.index(start)])

    import scripts.probe_vivit_b32 as b32
    import scripts.probe_extract_pipeline as pipe
    import scripts.probe_feature_noise_quality as nq

    stage("probe_vivit_b32", b32.main)
    stage("probe_extract_pipeline", pipe.main)

    sys.argv = ["probe_feature_noise_quality.py", "--levels", "0.005",
                "--seeds", "2", "--epochs", "400", "--modality", "both"]
    stage("noise_ctrl rel=0.005 both", nq.main)
    sys.argv = ["probe_feature_noise_quality.py", "--levels", "0.01",
                "--seeds", "2", "--epochs", "400", "--modality", "video"]
    stage("noise_video rel=0.01", nq.main)
    sys.argv = ["probe_feature_noise_quality.py", "--levels", "0.01",
                "--seeds", "2", "--epochs", "400", "--modality", "audio"]
    stage("noise_audio rel=0.01", nq.main)


if __name__ == "__main__":
    main()
