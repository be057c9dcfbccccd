"""Quality sensitivity of the fusion model to extractor quantization noise.

int8 extraction (models/{vivit,wav2vec2}_quant.py — routing removed in
r4 after it also measured SLOWER on chip) changes the embedding
functions by a measured relative error (ViViT rel-l2 ~2% vs bf16, cos
>= 0.9999; Wav2Vec2 per the on-chip probe).  Raw data is not shipped
here, so the
end-to-end "extract int8 -> train -> F1" check cannot run — instead this
probe injects noise OF THAT MAGNITUDE into the reference's own shipped
features BEFORE dataset normalization (exactly where quantization error
would enter) and retrains the winning recipe:

    per sample s:  f_s <- f_s + rel * ||f_s|| * g / ||g||,  g ~ N(0, I)

If F1 at rel = the measured quantization error matches rel = 0 within
seed noise, the int8 flip is quality-safe; the README band for the
winning recipe is 0.7587 +/- 0.005 best-epoch (3+ seeds).

MECHANICS AUDIT (r4, per VERDICT r3 #4 — the on-chip cliff 0.76 -> 0.52
at rel=0.01 looked too severe to trust unexamined):
  - noise IS frozen: sampled once per (level, fixed seed 1234) into the
    feature arrays themselves, before ``dataset_from_features``; the
    trainer never resamples it (train/val/test all see one realization,
    like a changed embedding function would produce);
  - noise IS pre-normalization: z-score stats are computed from the
    NOISED train split inside ``dataset_from_features``, matching where
    extractor-numerics error enters production;
  - all three splits are noised consistently (one pass over the full
    catalog before splitting).
So the mechanics are sound.  The severity mechanism is normalization
amplification: features are z-scored PER DIMENSION, so isotropic noise
at 1% of a sample's overall L2 norm lands with amplitude 1/sigma_d in
trained-model space for every low-variance dimension d — the model
reads those dimensions at full gain.  Deterministic int8 error has the
same per-tensor-scale structure (error magnitude set by the absmax
scale, not by sigma_d), so the amplification applies to it too; the
probe is a fair severity model, and ``--modality`` + the rel=0.005
control (r4 runs, artifacts/probes/) locate where the sensitivity
lives.

Run: python scripts/probe_feature_noise_quality.py \
        [--levels 0,0.005,0.01,0.02] [--seeds 2] [--epochs 400] \
        [--modality both|video|audio]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _noised(arrs, rel: float, rng) -> list:
    if rel <= 0:
        return arrs
    out = []
    for a in arrs:
        g = rng.standard_normal(a.shape).astype(a.dtype)
        gn = float((g ** 2).sum()) ** 0.5
        an = float((a ** 2).sum()) ** 0.5
        out.append(a + (rel * an / max(gn, 1e-12)) * g)
    return out


def main() -> None:
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--levels", default="0,0.01,0.02,0.05",
                        help="comma-separated relative-L2 noise levels")
    parser.add_argument("--seeds", type=int, default=2)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--epochs_per_call", type=int, default=100)
    parser.add_argument("--modality", choices=("both", "video", "audio"),
                        default="both",
                        help="which modality receives the noise (locates "
                             "the sensitivity; VERDICT r3 #4)")
    args = parser.parse_args()
    levels = [float(x) for x in args.levels.split(",")]

    import numpy as np

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.catalog import build_catalog
    from mmer_tpu.data.pipeline import (dataset_from_features,
                                        load_feature_arrays)
    from mmer_tpu.train.fused import train_many_seeds

    cfg = DataConfig()
    catalog = build_catalog(cfg.video_feat_dir, cfg.audio_feat_dir,
                            cfg.pairing)
    videos0, audios0 = load_feature_arrays(catalog)
    labels = np.asarray([e.label for e in catalog], dtype=np.int32)

    summary = {"modality": args.modality}
    for rel in levels:
        nrng = np.random.default_rng(1234)
        rel_v = rel if args.modality in ("both", "video") else 0.0
        rel_a = rel if args.modality in ("both", "audio") else 0.0
        videos = _noised(videos0, rel_v, nrng)
        audios = np.stack(_noised(list(audios0), rel_a, nrng)) \
            if rel_a > 0 else audios0
        data, splits = dataset_from_features(
            videos, audios, labels,
            [e.key for e in catalog], cfg)

        model_cfg = ModelConfig(max_seq_len=data.max_chunks + 1,
                                fusion_dropout=0.2, classifier_dropout=0.2)
        train_cfg = TrainConfig(num_epochs=args.epochs, lr=1e-5,
                                weight_decay=5e-3, label_smoothing=0.1,
                                save_checkpoints=False,
                                output_dir="/tmp/noise_probe")
        outs = train_many_seeds(data, splits, model_cfg, train_cfg,
                                batch_size=64,
                                seeds=list(range(args.seeds)),
                                seeds_per_call=min(args.seeds, 4),
                                epochs_per_call=args.epochs_per_call)
        best = [max(o["results"], key=lambda r: r["test_macro_f1"])
                ["test_macro_f1"] for o in outs]
        sel = [min(o["results"], key=lambda r: r["val_loss"])
               ["test_macro_f1"] for o in outs]
        summary[rel] = {"best_epoch_f1": [round(b, 4) for b in best],
                        "val_selected_f1": [round(s, 4) for s in sel]}
        print(f"rel={rel}: best-epoch F1 {np.mean(best):.4f}"
              f"+/-{np.std(best):.4f}  val-selected {np.mean(sel):.4f}"
              f"+/-{np.std(sel):.4f}", flush=True)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
