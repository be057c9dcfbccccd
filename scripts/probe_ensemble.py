"""On-chip: seed-ensemble quality on the real features.

Trains the winning recipe for N seeds with the vmapped fused trainer
and scores the mean-probability ensemble of the per-seed BEST params
(train/ensemble.py) against the single-model band (README: 0.7587
+/- 0.005 best-epoch, 0.7541 +/- 0.004 val-selected; reference best
0.6900).  Val-selected members only — the ensemble must not peek at
test.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--seeds", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--seeds_per_call", type=int, default=4)
    parser.add_argument("--epochs_per_call", type=int, default=100)
    args = parser.parse_args()

    import numpy as np

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.pipeline import load_dataset
    from mmer_tpu.train.ensemble import ensemble_eval
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = load_dataset(DataConfig())
    model_cfg = ModelConfig(max_seq_len=data.max_chunks + 1,
                            fusion_dropout=0.2, classifier_dropout=0.2)
    train_cfg = TrainConfig(num_epochs=args.epochs, lr=1e-5,
                            weight_decay=5e-3, label_smoothing=0.1,
                            save_checkpoints=False,
                            output_dir="/tmp/ensemble_probe")
    outs = train_many_seeds(data, splits, model_cfg, train_cfg,
                            batch_size=64, seeds=list(range(args.seeds)),
                            seeds_per_call=args.seeds_per_call,
                            epochs_per_call=args.epochs_per_call)

    # Rank members by VAL loss at their best epoch (each member's params
    # are already val-selected within its run; ranking the subset by val
    # keeps the k-member pick test-blind too).  The r3 measurement took
    # the first k seeds in order — k=2 0.7648; val-ranked is the
    # methodologically honest variant the README quotes.
    order = np.argsort([float(o["best_score"]) for o in outs])
    params = [outs[i]["best_params"] for i in order]
    singles = [max(o["results"], key=lambda r: r["test_macro_f1"])
               ["test_macro_f1"] for o in outs]
    print(f"single-model best-epoch F1: {np.mean(singles):.4f}"
          f"+/-{np.std(singles):.4f}", flush=True)

    for k in (2, 4, len(params)):
        if k > len(params):
            break
        res = ensemble_eval(model_cfg, params[:k], data, splits, "test")
        print(f"ensemble k={k}: macro-F1 {res['ensemble_macro_f1']:.4f} "
              f"acc {res['ensemble_accuracy']:.4f} "
              f"(member mean {res['member_mean_macro_f1']:.4f})",
              flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
