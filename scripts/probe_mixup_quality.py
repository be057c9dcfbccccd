"""Quality A/B for the feature-space regularizers: mixup + modality
dropout on top of the winning recipe (wd 5e-3, dropout 0.2, ls 0.1).

Both knobs are opt-in additions beyond the reference (which has no
feature-space augmentation — train2.py consumes the extracted .npy
features verbatim); they only flip into any recommended recipe on a
measured multi-seed win here.  Uses the seed-parallel fused trainer so
each arm costs ~1 sequential run.

Run: python scripts/probe_mixup_quality.py [--seeds 4] [--epochs 400]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--seeds", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--seeds_per_call", type=int, default=4)
    parser.add_argument("--epochs_per_call", type=int, default=100)
    parser.add_argument("--arms", default=None,
                        help="comma list of arm tags to run (default all)")
    parser.add_argument("--out", default=None, help="summary JSON path")
    args = parser.parse_args()

    import numpy as np

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.pipeline import load_dataset
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = load_dataset(DataConfig())
    model_cfg = ModelConfig(max_seq_len=data.max_chunks + 1,
                            fusion_dropout=0.2, classifier_dropout=0.2)

    def cfg(**kw):
        return TrainConfig(num_epochs=args.epochs, lr=1e-5,
                           weight_decay=5e-3, label_smoothing=0.1,
                           save_checkpoints=False,
                           output_dir="/tmp/mixup_probe", **kw)

    arms = [
        ("baseline", cfg()),
        ("mixup0.2", cfg(mixup_alpha=0.2)),
        ("mixup0.4", cfg(mixup_alpha=0.4)),
        ("mdrop0.2", cfg(modality_dropout=0.2)),
        ("mixup0.2+mdrop0.2", cfg(mixup_alpha=0.2, modality_dropout=0.2)),
    ]
    if args.arms:
        keep = set(args.arms.split(","))
        arms = [a for a in arms if a[0] in keep]

    summary = {}
    for tag, train_cfg in arms:
        outs = train_many_seeds(data, splits, model_cfg, train_cfg,
                                batch_size=64,
                                seeds=list(range(args.seeds)),
                                seeds_per_call=args.seeds_per_call,
                                epochs_per_call=args.epochs_per_call)
        best_f1, val_f1 = [], []
        for o in outs:
            rows = o["results"]
            best = max(rows, key=lambda r: r["test_macro_f1"])
            sel = min(rows, key=lambda r: r["val_loss"])
            best_f1.append(best["test_macro_f1"])
            val_f1.append(sel["test_macro_f1"])
        summary[tag] = {
            "best_epoch_f1_mean": round(float(np.mean(best_f1)), 4),
            "best_epoch_f1_std": round(float(np.std(best_f1)), 4),
            "val_selected_f1_mean": round(float(np.mean(val_f1)), 4),
            "val_selected_f1_std": round(float(np.std(val_f1)), 4),
        }
        print(f"{tag}: best {summary[tag]['best_epoch_f1_mean']:.4f}"
              f"±{summary[tag]['best_epoch_f1_std']:.4f}  val-sel "
              f"{summary[tag]['val_selected_f1_mean']:.4f}"
              f"±{summary[tag]['val_selected_f1_std']:.4f}", flush=True)

    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
