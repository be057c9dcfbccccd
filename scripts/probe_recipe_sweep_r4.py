"""r4 quality sweep: 4-seed A/Bs around the WINNING recipe.

The winning recipe (wd 5e-3, dropout 0.2, label smoothing 0.1, bs 64,
lr 1e-5) measures 0.7604±0.004 best-epoch test macro-F1 over 8 seeds
(artifacts/seed_sweep/).  Earlier sweeps were single-seed
(scripts/quality_sweep.py) or tested additive regularizers
(mixup/modality-dropout — measured no-win, r3_onchip).  This one
perturbs each axis of the winning recipe itself with 4 seeds per
config via the vmapped seed-parallel trainer (~26 s/seed amortized),
so a result is a measured distribution, not a point.

Run: python scripts/probe_recipe_sweep_r4.py [--seeds 4] [--epochs 400]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--seeds", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--seeds_per_call", type=int, default=4)
    parser.add_argument("--epochs_per_call", type=int, default=100)
    parser.add_argument("--only", default="",
                        help="comma-separated tags to run (default all)")
    args = parser.parse_args()

    import numpy as np

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.pipeline import load_dataset
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = load_dataset(DataConfig())
    base_m = dict(max_seq_len=data.max_chunks + 1,
                  fusion_dropout=0.2, classifier_dropout=0.2)
    base_t = dict(num_epochs=args.epochs, lr=1e-5, weight_decay=5e-3,
                  label_smoothing=0.1, save_checkpoints=False,
                  output_dir="/tmp/recipe_sweep_r4")

    # (tag, model overrides, train overrides, batch size)
    configs = [
        ("baseline", {}, {}, 64),
        ("wd8e-3", {}, {"weight_decay": 8e-3}, 64),
        ("wd3e-3", {}, {"weight_decay": 3e-3}, 64),
        ("drop0.25", {"fusion_dropout": 0.25, "classifier_dropout": 0.25},
         {}, 64),
        ("drop0.15", {"fusion_dropout": 0.15, "classifier_dropout": 0.15},
         {}, 64),
        ("ls0.15", {}, {"label_smoothing": 0.15}, 64),
        ("lr2e-5", {}, {"lr": 2e-5}, 64),
        ("bs32", {}, {}, 32),
        ("3layers", {"fusion_layers": 3}, {}, 64),
    ]
    only = set(filter(None, args.only.split(",")))

    board = []
    for tag, m_over, t_over, bs in configs:
        if only and tag not in only:
            continue
        model_cfg = ModelConfig(**{**base_m, **m_over})
        train_cfg = TrainConfig(**{**base_t, **t_over})
        outs = train_many_seeds(data, splits, model_cfg, train_cfg,
                                batch_size=bs,
                                seeds=list(range(args.seeds)),
                                seeds_per_call=args.seeds_per_call,
                                epochs_per_call=args.epochs_per_call,
                                verbose=False)
        best = [max(o["results"], key=lambda r: r["test_macro_f1"])
                ["test_macro_f1"] for o in outs]
        sel = [min(o["results"], key=lambda r: r["val_loss"])
               ["test_macro_f1"] for o in outs]
        row = {"tag": tag, "batch_size": bs, "seeds": args.seeds,
               "best_epoch_f1_mean": round(float(np.mean(best)), 4),
               "best_epoch_f1_std": round(float(np.std(best)), 4),
               "val_selected_f1_mean": round(float(np.mean(sel)), 4),
               "val_selected_f1_std": round(float(np.std(sel)), 4)}
        board.append(row)
        print(f"{tag:12s} best {row['best_epoch_f1_mean']:.4f}"
              f"±{row['best_epoch_f1_std']:.4f}  "
              f"val-sel {row['val_selected_f1_mean']:.4f}"
              f"±{row['val_selected_f1_std']:.4f}", flush=True)

    board.sort(key=lambda r: -r["best_epoch_f1_mean"])
    print(json.dumps(board))


if __name__ == "__main__":
    main()
