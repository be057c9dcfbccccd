"""Seed-ensemble evaluation (train/ensemble.py): mean-probability blend
of per-seed best params, built on train_many_seeds."""

import numpy as np

from conftest import make_tiny_dataset
from mmer_tpu.config import ModelConfig, TrainConfig

CFG = ModelConfig(max_seq_len=4, fusion_layers=1, compute_dtype="float32")


def test_ensemble_eval_fields_and_degenerate_case():
    """An ensemble of N copies of the SAME params must score exactly the
    single model, and the result schema must carry member stats."""
    from mmer_tpu.train.ensemble import ensemble_eval
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = make_tiny_dataset(seed=0, separable=True)
    tcfg = TrainConfig(num_epochs=4, lr=1e-3, save_checkpoints=False,
                       patience=10 ** 9, output_dir="/tmp/ens_test")
    outs = train_many_seeds(data, splits, CFG, tcfg, batch_size=32,
                            seeds=[0, 1], seeds_per_call=2,
                            epochs_per_call=4, verbose=False)
    params = [o["best_params"] for o in outs]

    same = ensemble_eval(CFG, [params[0], params[0]], data, splits)
    assert same["n_members"] == 2
    assert same["ensemble_macro_f1"] == same["member_macro_f1"][0]
    assert same["member_macro_f1"][0] == same["member_macro_f1"][1]

    blend = ensemble_eval(CFG, params, data, splits)
    assert blend["n_members"] == 2
    assert 0.0 <= blend["ensemble_macro_f1"] <= 1.0
    assert len(blend["member_macro_f1"]) == 2
    # mean-prob blend of two models is not either member's prediction
    # function; just require a sane value relative to members
    assert blend["ensemble_macro_f1"] >= min(blend["member_macro_f1"]) - 0.2
