"""Fused whole-run-on-device training: correctness of control flow
(early stop, best tracking, scheduler) and artifact parity with the
epoch-loop trainer."""

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig, TrainConfig
from mmer_tpu.train.loop import train_model

CFG = ModelConfig(max_seq_len=4, fusion_layers=1, compute_dtype="float32")


@pytest.fixture(scope="module")
def tiny_dataset():
    from conftest import make_tiny_dataset
    return make_tiny_dataset(seed=0, separable=True)


def _run(tiny_dataset, fused, **kw):
    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=6, lr=1e-3, save_checkpoints=False,
                      patience=10 ** 9, **kw)
    return train_model(data, splits, CFG, cfg, batch_size=32,
                       verbose=False, fused=fused)


@pytest.fixture(scope="module")
def plain_fused_run(tiny_dataset):
    """The default-config fused run, shared by every test that compares a
    knob against the plain trajectory (one whole-run compile instead of
    four on the single-CPU test host)."""
    return _run(tiny_dataset, fused=True)


def test_fused_matches_loop_schema_and_quality(tiny_dataset, plain_fused_run):
    out_loop = _run(tiny_dataset, fused=False)
    out_fused = plain_fused_run

    assert len(out_fused.results) == len(out_loop.results) == 6
    assert set(out_fused.results[0]) >= set(out_loop.results[0])
    # Same data/model/optimizer: both must learn the separable signal.
    assert out_fused.results[-1]["train_loss"] < out_fused.results[0]["train_loss"]
    assert abs(out_fused.results[-1]["train_loss"]
               - out_loop.results[-1]["train_loss"]) < 0.5
    assert out_fused.best_epoch >= 1
    # best epoch is the val-loss argmin of its own trace
    vals = [r["val_loss"] for r in out_fused.results]
    assert out_fused.best_epoch == int(np.argmin(vals)) + 1


def test_fused_early_stopping(tiny_dataset):
    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=50, lr=0.0, save_checkpoints=False,
                      patience=3, min_delta=1e-4)
    out = train_model(data, splits, CFG, cfg, batch_size=32, verbose=False,
                      fused=True)
    # lr=0 → no improvement ever.  Epoch 1 always counts as improved (prev
    # loss starts at inf, same as the loop/reference semantics), so the run
    # stops after 1 + patience epochs.
    assert len(out.results) == 4


def test_ema_near_zero_decay_matches_plain_run(tiny_dataset, plain_fused_run):
    """With decay ε→0 the EMA tracks the raw params almost exactly, so the
    whole metric trajectory must match the EMA-off run to float tolerance —
    anchors the EMA plumbing (eval/selection on the averaged tree) to the
    plain path."""
    out_plain = plain_fused_run
    out_ema = _run(tiny_dataset, fused=True, ema_decay=1e-9)
    for a, b in zip(out_plain.results, out_ema.results):
        assert abs(a["val_loss"] - b["val_loss"]) < 1e-4
        assert abs(a["train_loss"] - b["train_loss"]) < 1e-4


def test_ema_heavy_decay_lags_and_selects_averaged_params(tiny_dataset, plain_fused_run):
    import jax

    out = _run(tiny_dataset, fused=True, ema_decay=0.95)
    plain = plain_fused_run
    assert len(out.results) == 6
    assert np.isfinite([r["val_loss"] for r in out.results]).all()
    # Same seed ⇒ identical raw param trajectories, so any val-loss
    # difference comes from evaluating the averaged tree (observed: the
    # EMA smooths an early overshoot, so it can be better OR worse —
    # assert only that it is genuinely different).
    assert abs(out.results[0]["val_loss"]
               - plain.results[0]["val_loss"]) > 1e-3
    # And the selected best params are the EMA tree — different leaves
    # than any raw-trajectory selection.
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        out.best_params, plain.best_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6


def test_train_many_seeds_matches_individual_runs(tiny_dataset):
    """Seed-parallel (vmapped while_loop) training must reproduce each
    single-seed run's rng streams and control flow.  Numerics: vmap
    batches the GEMMs over seeds, reordering f32 accumulation, and SGD
    amplifies that chaotically over epochs — so the FIRST epoch must agree
    tightly and later epochs only qualitatively (both converge on the
    separable signal)."""
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=6, lr=1e-3, save_checkpoints=False,
                      patience=10 ** 9)
    multi = train_many_seeds(data, splits, CFG, cfg, batch_size=32,
                             seeds=[0, 3], verbose=False)
    assert len(multi) == 2
    for out in multi:
        # best_score: the val-loss tracked at the best epoch — finite and
        # consistent with the recorded rows (ensemble member ranking in
        # scripts/{probe_ensemble,seed_sweep}.py depends on it).
        assert np.isfinite(out["best_score"])
        assert abs(out["best_score"]
                   - min(r["val_loss"] for r in out["results"])) < 1e-5
        single = train_model(data, splits, CFG, cfg, batch_size=32,
                             verbose=False, fused=True, seed=out["seed"])
        assert len(out["results"]) == len(single.results)
        a0, b0 = out["results"][0], single.results[0]
        assert abs(a0["val_loss"] - b0["val_loss"]) < 5e-3, out["seed"]
        assert abs(a0["train_loss"] - b0["train_loss"]) < 5e-3
        # Both trajectories learn the same separable signal.
        assert out["results"][-1]["train_loss"] < a0["train_loss"]
        assert abs(out["results"][-1]["val_loss"]
                   - single.results[-1]["val_loss"]) < 0.2


def test_train_many_seeds_chunks_and_padding(tiny_dataset):
    """3 seeds at seeds_per_call=2 → two calls, the second padded with a
    repeated seed lane that must be discarded; chunked results must match
    one-call results."""
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=3, lr=1e-3, save_checkpoints=False,
                      patience=10 ** 9)
    chunked = train_many_seeds(data, splits, CFG, cfg, batch_size=32,
                               seeds=[0, 1, 2], seeds_per_call=2,
                               verbose=False)
    whole = train_many_seeds(data, splits, CFG, cfg, batch_size=32,
                             seeds=[0, 1, 2], seeds_per_call=3,
                             verbose=False)
    assert [o["seed"] for o in chunked] == [0, 1, 2]
    for a, b in zip(chunked, whole):
        assert len(a["results"]) == len(b["results"])
        assert abs(a["results"][0]["val_loss"]
                   - b["results"][0]["val_loss"]) < 5e-3


def test_train_many_seeds_early_stop_per_seed(tiny_dataset):
    """With lr=0 every seed stops at 1+patience epochs; the vmapped loop
    must report that per seed (not run to num_epochs)."""
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=50, lr=0.0, save_checkpoints=False,
                      patience=3, min_delta=1e-4)
    multi = train_many_seeds(data, splits, CFG, cfg, batch_size=32,
                             seeds=[1, 2], verbose=False)
    for out in multi:
        assert len(out["results"]) == 4


def test_ema_requires_fused(tiny_dataset):
    with pytest.raises(ValueError, match="fused"):
        _run(tiny_dataset, fused=False, ema_decay=0.9)


def test_mixup_trains_and_differs_from_plain(tiny_dataset, plain_fused_run):
    """mixup_alpha>0 must (a) run to completion with finite metrics,
    (b) produce a genuinely different trajectory than the plain run
    (the mixed features/labels change every step), and (c) still learn
    the separable signal — mixup regularizes, it must not destroy."""
    plain = plain_fused_run
    out = _run(tiny_dataset, fused=True, mixup_alpha=0.4)
    assert len(out.results) == 6
    assert np.isfinite([r["val_loss"] for r in out.results]).all()
    assert abs(out.results[0]["train_loss"]
               - plain.results[0]["train_loss"]) > 1e-4
    assert out.results[-1]["train_loss"] < out.results[0]["train_loss"]


def test_modality_dropout_trains_and_differs_from_plain(tiny_dataset, plain_fused_run):
    """modality_dropout>0: same contract as mixup — runs, differs,
    still learns.  rate=0.5 → 25% audio-zeroed + 25% video-zeroed
    samples per step."""
    plain = plain_fused_run
    out = _run(tiny_dataset, fused=True, modality_dropout=0.5)
    assert len(out.results) == 6
    assert np.isfinite([r["val_loss"] for r in out.results]).all()
    assert abs(out.results[0]["train_loss"]
               - plain.results[0]["train_loss"]) > 1e-4
    assert out.results[-1]["train_loss"] < out.results[0]["train_loss"]


def test_mixup_modality_dropout_require_fused(tiny_dataset):
    with pytest.raises(ValueError, match="fused"):
        _run(tiny_dataset, fused=False, mixup_alpha=0.2)
    with pytest.raises(ValueError, match="fused"):
        _run(tiny_dataset, fused=False, modality_dropout=0.2)


def test_fused_artifacts(tiny_dataset, tmp_path):
    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=2, lr=1e-3, patience=10 ** 9,
                      output_dir=str(tmp_path))
    out = train_model(data, splits, CFG, cfg, batch_size=32, verbose=False,
                      fused=True)
    import json
    blob = json.load(open(out.results_path))
    assert blob["hyperparameters"]["fused_run"] is True
    assert len(blob["training_progress"]) == 2
    assert out.best_model_path and out.confusion is not None


def test_val_acc_best_score_scale_matches_loop(tiny_dataset):
    """With best_metric='val_acc' both trainers must report best_score as
    -accuracy in PERCENT — the fused path tracked a fraction, a silent
    100x scale skew for any cross-mode run selection (review r3)."""
    out_loop = _run(tiny_dataset, fused=False, best_metric="val_acc")
    out_fused = _run(tiny_dataset, fused=True, best_metric="val_acc")
    best_acc_loop = max(r["val_acc"] for r in out_loop.results)
    best_acc_fused = max(r["val_acc"] for r in out_fused.results)
    assert out_loop.best_score == pytest.approx(-best_acc_loop, abs=1e-3)
    assert out_fused.best_score == pytest.approx(-best_acc_fused, abs=1e-3)


def test_train_many_seeds_with_mixup_and_modality_dropout(tiny_dataset):
    """The on-chip quality probe (scripts/probe_mixup_quality.py) runs the
    regularizers THROUGH train_many_seeds — the vmapped-seed path must
    (a) run them to completion with finite metrics, (b) give different
    seeds different trajectories (per-seed rng streams reach the mixup
    lambda/permutation draws), and (c) match the single-seed fused run's
    first epoch (the vmap adds a batching dim, not different math)."""
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = tiny_dataset
    cfg = TrainConfig(num_epochs=4, lr=1e-3, save_checkpoints=False,
                      patience=10 ** 9, mixup_alpha=0.3,
                      modality_dropout=0.4)
    multi = train_many_seeds(data, splits, CFG, cfg, batch_size=32,
                             seeds=[0, 3], verbose=False)
    assert len(multi) == 2
    for out in multi:
        assert len(out["results"]) == 4
        assert np.isfinite([r["val_loss"] for r in out["results"]]).all()
    assert abs(multi[0]["results"][1]["train_loss"]
               - multi[1]["results"][1]["train_loss"]) > 1e-5
    single = train_model(data, splits, CFG, cfg, batch_size=32,
                         verbose=False, fused=True, seed=0)
    assert abs(multi[0]["results"][0]["train_loss"]
               - single.results[0]["train_loss"]) < 5e-3
