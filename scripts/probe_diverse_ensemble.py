"""Recipe-diverse seed ensemble vs same-recipe ensemble.

The same-recipe 8-seed ensemble gains +0.4 F1 over its single-model mean
(val-ranked k=4 0.7640 vs 0.7604 — artifacts/probes/r4_ensemble.log).
Ensemble theory says member DIVERSITY drives the gain; seeds only vary
init/batch order.  The r4 recipe sweep (probe_recipe_sweep_r4.py) found
three perturbations statistically tied with the winning recipe —
ls 0.15, wd 3e-3, dropout 0.25 — i.e. equally-strong but differently-
regularized models.  This probe trains 4 recipes × N seeds and compares:

  a. same-recipe ensembles (k members, val-ranked within the recipe),
  b. the cross-recipe blend (best-val member of EACH recipe),
  c. the val-ranked top-k over the pooled 4N-member population.

All blends are mean-probability (train/ensemble.py), members val-ranked
— test-blind selection throughout.

Run: python scripts/probe_diverse_ensemble.py [--seeds 4] [--epochs 400]

MEASURED (v5e-1, artifacts/probes/r4_diverse_ens.log): pooled val-ranked
top-8-of-16 = 0.7677 test macro-F1 — the best test-blind number, +0.5 F1
over the same-recipe k=8 blend (0.7627).  The mechanism is pool size +
take-the-top-half, NOT diversity: cross-recipe best-of-each k=4 scores
0.7593 and pooled top-4 (0.7573) is worse than same-recipe k=4 blends
(winning 0.7631, wd3e-3 0.7663) — val-loss ranking across recipes is
noisy at small k.

32-member follow-up (--seeds 8, r4_diverse_ens32.log): no further gain
(top-16-of-32 0.7647) — ≥8-member blends land in a 0.760–0.768 band.
--greedy A/B (r4_greedy_ens.log): greedy+replacement is the best
on-pool selector (k_best=10, 0.7674 vs top-16's 0.7647) but stays
in-band; no-replacement overfits the val split (k=4, 0.7642).
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
    parser.add_argument("--seeds", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=400)
    parser.add_argument("--seeds_per_call", type=int, default=4)
    parser.add_argument("--epochs_per_call", type=int, default=100)
    parser.add_argument("--greedy", action="store_true",
                        help="also run Caruana-style greedy forward "
                             "selection (val-blend F1) over the pooled "
                             "members, vs the val-loss top-k rank")
    args = parser.parse_args()

    import numpy as np

    from mmer_tpu.config import DataConfig, ModelConfig, TrainConfig
    from mmer_tpu.data.pipeline import load_dataset
    from mmer_tpu.train.ensemble import ensemble_eval
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = load_dataset(DataConfig())
    base_m = dict(max_seq_len=data.max_chunks + 1,
                  fusion_dropout=0.2, classifier_dropout=0.2)
    base_t = dict(num_epochs=args.epochs, lr=1e-5, weight_decay=5e-3,
                  label_smoothing=0.1, save_checkpoints=False,
                  output_dir="/tmp/diverse_ensemble")
    recipes = [
        ("winning", {}, {}),
        ("ls0.15", {}, {"label_smoothing": 0.15}),
        ("wd3e-3", {}, {"weight_decay": 3e-3}),
        ("drop0.25", {"fusion_dropout": 0.25, "classifier_dropout": 0.25},
         {}),
    ]

    # NOTE: the same model_cfg (architecture) across recipes — required
    # for ensemble_eval's single vmapped program; regularizer knobs only.
    model_cfg = ModelConfig(**base_m)
    per_recipe = {}          # tag -> list of (best_score, best_params)
    for tag, m_over, t_over in recipes:
        mc = ModelConfig(**{**base_m, **m_over})
        tc = TrainConfig(**{**base_t, **t_over})
        outs = train_many_seeds(data, splits, mc, tc, batch_size=64,
                                seeds=list(range(args.seeds)),
                                seeds_per_call=args.seeds_per_call,
                                epochs_per_call=args.epochs_per_call,
                                verbose=False)
        members = sorted(((o["best_score"], o["best_params"])
                          for o in outs), key=lambda t: t[0])
        per_recipe[tag] = members
        singles = [max(o["results"], key=lambda r: r["test_macro_f1"])
                   ["test_macro_f1"] for o in outs]
        print(f"{tag:10s} singles best-epoch {np.mean(singles):.4f}"
              f"±{np.std(singles):.4f}", flush=True)

    summary = {}
    # (a) same-recipe val-ranked k=4 (dropout at inference is off, so a
    # member's recipe only shaped its weights — blends are exchangeable).
    for tag, members in per_recipe.items():
        res = ensemble_eval(model_cfg, [p for _, p in members],
                            data, splits, "test")
        summary[f"same:{tag}:k{len(members)}"] = round(
            res["ensemble_macro_f1"], 4)
        print(f"same-recipe {tag} k={len(members)}: "
              f"{res['ensemble_macro_f1']:.4f}", flush=True)

    # (b) cross-recipe: the best-val member of each recipe.
    cross = [members[0][1] for members in per_recipe.values()]
    res = ensemble_eval(model_cfg, cross, data, splits, "test")
    summary["cross:best-of-each:k4"] = round(res["ensemble_macro_f1"], 4)
    print(f"cross-recipe best-of-each k=4: "
          f"{res['ensemble_macro_f1']:.4f}", flush=True)

    # (c) pooled val-ranked top-k over all 4N members.  k scales with the
    # pool: the 16-member run measured top-half (k=8, 0.7677) > sharp
    # top-4 (0.7573), so larger pools probe top-half and full-pool too.
    pooled = sorted(((s, p) for tag, ms in per_recipe.items()
                     for s, p in ms), key=lambda t: t[0])
    for k in sorted({4, 8, len(pooled) // 2, len(pooled)}):
        if k > len(pooled) or k < 1:
            continue
        res = ensemble_eval(model_cfg, [p for _, p in pooled[:k]],
                            data, splits, "test")
        summary[f"pooled:top{k}"] = round(res["ensemble_macro_f1"], 4)
        print(f"pooled val-ranked top-{k}: "
              f"{res['ensemble_macro_f1']:.4f}", flush=True)

    # (d) greedy forward selection on the val blend (train/ensemble.py):
    # rank scores members individually; greedy scores the BLEND, so it
    # can keep a weak-alone but complementary member.  Pool is passed in
    # val-ranked order so greedy's lowest-index tie-break prefers
    # better-val members.
    if args.greedy:
        from mmer_tpu.train.ensemble import greedy_ensemble_eval
        pool_params = [p for _, p in pooled]
        for replace in (False, True):
            res = greedy_ensemble_eval(model_cfg, pool_params, data,
                                       splits, k_max=min(16, len(pooled)),
                                       replace=replace)
            tag = "greedy+rep" if replace else "greedy"
            summary[f"{tag}:k{res['k_best']}"] = res["test_macro_f1"]
            print(f"{tag}: k_best={res['k_best']} "
                  f"val-blend {max(res['val_f1_path']):.4f} "
                  f"test {res['test_macro_f1']:.4f} "
                  f"order {res['order']}", flush=True)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
