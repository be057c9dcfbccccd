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


def test_greedy_select_finds_complementary_blend():
    """Three synthetic 'experts' (member i is right only on class i):
    any 2-blend is perfect, so greedy must reach val-F1 1.0 at k=2 and
    stop there (k_best=2); alone each member is weak.  Tie-break is to
    the lowest index, so the run is deterministic."""
    from mmer_tpu.train.ensemble import greedy_select

    n_per, n_cls = 4, 3
    labels = np.repeat(np.arange(n_cls), n_per)
    n = len(labels)
    probs = np.zeros((n_cls, n, n_cls))
    for i in range(n_cls):                      # member i
        for s, y in enumerate(labels):
            if y == i:
                probs[i, s] = 0.1
                probs[i, s, y] = 0.8
            else:
                probs[i, s] = 0.2
                probs[i, s, i] = 0.45            # confidently wrong
                probs[i, s, y] = 0.35
    sel = greedy_select(probs, labels, k_max=3)
    assert sel["val_f1_path"][0] < 1.0           # no single member is perfect
    assert sel["val_f1_path"][1] == 1.0          # any pair is
    assert sel["k_best"] == 2
    assert sel["selected"] == sel["order"][:2]
    assert sel["order"][0] == 0                  # symmetric members: tie-break

    # replace=True may re-pick members; the path still reaches 1.0
    rep = greedy_select(probs, labels, k_max=4, replace=True)
    assert len(rep["order"]) == 4
    assert max(rep["val_f1_path"]) == 1.0


def test_greedy_select_validates_inputs():
    import pytest

    from mmer_tpu.train.ensemble import greedy_select

    with pytest.raises(ValueError):
        greedy_select(np.zeros((0, 4, 3)), np.zeros(4, np.int64), k_max=2)
    with pytest.raises(ValueError):
        greedy_select(np.zeros((2, 4, 3)), np.zeros(4, np.int64), k_max=0)


def test_greedy_ensemble_eval_end_to_end():
    """Selection on val, scoring on test, over really-trained members;
    the selected blend's VAL path must be >= the best single member's
    val F1 (greedy's first pick IS the best single member)."""
    from mmer_tpu.train.ensemble import (greedy_ensemble_eval,
                                         member_probs)
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = make_tiny_dataset(seed=0, separable=True)
    tcfg = TrainConfig(num_epochs=4, lr=1e-3, save_checkpoints=False,
                       patience=10 ** 9, output_dir="/tmp/ens_test")
    outs = train_many_seeds(data, splits, CFG, tcfg, batch_size=32,
                            seeds=[0, 1, 2], seeds_per_call=3,
                            epochs_per_call=4, verbose=False)
    params = [o["best_params"] for o in outs]

    res = greedy_ensemble_eval(CFG, params, data, splits, k_max=3)
    assert res["n_pool"] == 3
    assert 1 <= res["k_best"] <= 3
    assert res["selected"] == res["order"][:res["k_best"]]
    assert 0.0 <= res["test_macro_f1"] <= 1.0
    assert res["val_f1_path"][res["k_best"] - 1] == max(res["val_f1_path"])

    # member_probs shape contract: (M, N_split, C)
    vp = member_probs(CFG, params, data, splits, "val")
    assert vp.shape == (3, len(splits.val), int(data.labels.max()) + 1)
    np.testing.assert_allclose(vp.sum(-1), 1.0, atol=1e-4)
