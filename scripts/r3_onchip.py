"""One-process runner for the round-3 on-chip experiment queue.

This environment charges a 130-860 s (sometimes hours, during relay
outages) per-process device-session tax, so every pending measurement
runs in ONE process, each stage isolated by try/except:

  1. probe_aot save      — AOT executable serialization viability (axon)
  2. probe_int8          — raw int8 vs bf16 GEMM throughput
  3. probe_int8_vivit    — full quantized ViViT vs production path
                           (also exercises the AotJit extractor wiring)
  4. probe_w2v2_flash    — Wav2Vec2 attention XLA vs flash A/B
  5. probe_w2v2_qkv      — separate vs one-GEMM q/k/v projections
  6. probe_int8_w2v2     — int8 vs bf16 Wav2Vec2 transformer
  7. probe_feature_noise_quality — F1 sensitivity at quantization-error
     noise levels (gates the int8 default flip)
  8. probe_ensemble      — seed-ensemble quality headline (beyond-
     reference capability, train/ensemble.py)
  9. probe_mixup_quality — mixup / modality-dropout recipe A/B (gates
     the fused-trainer regularizer defaults)

Resume a partial run with ``--from STAGE`` (names as in ORDER below).
The cross-process AOT *load* leg must run as a separate process:
    python scripts/probe_aot.py load
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


ORDER = ["probe_aot", "probe_int8", "probe_int8_vivit", "probe_w2v2_flash",
         "probe_w2v2_qkv", "probe_int8_w2v2", "probe_feature_noise_quality",
         "probe_ensemble", "probe_mixup_quality"]


def main():
    # --from STAGE: resume the queue mid-way after a partial/crashed run
    # (each new process pays the relay session-open tax once; resuming
    # avoids re-paying for stages that already produced results).
    if len(sys.argv) >= 3 and sys.argv[1] == "--from":
        start = sys.argv[2]
        if start not in ORDER:
            raise SystemExit(f"unknown stage {start!r}; one of {ORDER}")
        _SKIP.update(ORDER[:ORDER.index(start)])

    import scripts.probe_aot as aot
    import scripts.probe_int8 as p8
    import scripts.probe_int8_vivit as p8v
    import scripts.probe_w2v2_flash as w2f
    import scripts.probe_w2v2_qkv as w2q
    import scripts.probe_int8_w2v2 as p8w

    sys.argv = ["probe_aot.py", "save"]
    stage("probe_aot save", aot.main)
    stage("probe_int8 raw GEMMs", p8.main)
    stage("probe_int8_vivit", p8v.main)
    stage("probe_w2v2_flash", w2f.main)
    stage("probe_w2v2_qkv", w2q.main)
    stage("probe_int8_w2v2", p8w.main)

    import scripts.probe_feature_noise_quality as nq
    sys.argv = ["probe_feature_noise_quality.py",
                "--levels", "0,0.01,0.02", "--seeds", "2",
                "--epochs", "400"]
    stage("probe_feature_noise_quality", nq.main)

    import scripts.probe_ensemble as ens
    sys.argv = ["probe_ensemble.py", "--seeds", "8", "--epochs", "400"]
    stage("probe_ensemble", ens.main)

    import scripts.probe_mixup_quality as mx
    sys.argv = ["probe_mixup_quality.py", "--seeds", "4",
                "--epochs", "400", "--out", "/tmp/mixup_quality.json"]
    stage("probe_mixup_quality", mx.main)


if __name__ == "__main__":
    main()
