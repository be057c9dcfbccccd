"""Ensemble distillation (train/distill.py + fused-trainer soft-target
path) and the model-soup control (train/ensemble.py:soup_params).

No reference counterpart (the reference never distills); the contract
under test is the framework's own: soft CE math, bit-identical alpha=0
behavior, row-aligned teacher targets, and honest validation errors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_tiny_dataset
from mmer_tpu.config import ModelConfig, TrainConfig

CFG = ModelConfig(max_seq_len=4, fusion_layers=1, compute_dtype="float32")


def test_soft_cross_entropy_math():
    """T=1 soft CE against hard one-hot targets must equal plain CE;
    temperature scaling must apply the T^2 factor on logits/T CE."""
    from mmer_tpu.ops.losses import soft_cross_entropy, weighted_cross_entropy

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=6))
    onehot = jax.nn.one_hot(labels, 4)

    got = soft_cross_entropy(logits, onehot, temperature=1.0)
    want = weighted_cross_entropy(logits, labels)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # uniform targets, any T: loss = T^2 * mean(-mean_c log_softmax(z/T))
    uni = jnp.full((6, 4), 0.25)
    t = 2.0
    got = soft_cross_entropy(logits, uni, temperature=t)
    want = t * t * jnp.mean(
        -jnp.mean(jax.nn.log_softmax(logits / t, axis=-1), axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # sample weights: zero-weight rows contribute nothing
    sw = jnp.asarray([1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    got = soft_cross_entropy(logits, onehot, 1.0, sw)
    want = weighted_cross_entropy(logits[:2], labels[:2])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # temperature sharpening of teacher PROBS recovers softmax(log(q)/T)
    q = jax.nn.softmax(jnp.asarray(rng.normal(size=(6, 4)), jnp.float32))
    t = 4.0
    q_t = jax.nn.softmax(jnp.log(q) / t, axis=-1)
    got = soft_cross_entropy(logits, q, temperature=t)
    want = t * t * jnp.mean(
        -jnp.sum(q_t * jax.nn.log_softmax(logits / t, axis=-1), axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_teacher_soft_targets_shape_and_blend():
    """teacher_soft_targets must return row-aligned (N, C) probs equal to
    the mean of per-member full-dataset forwards (batched == one-shot),
    for a batch size that does NOT divide N (padded-tail path)."""
    from mmer_tpu.models.fusion import MultimodalEmotionModel
    from mmer_tpu.train.distill import teacher_soft_targets
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = make_tiny_dataset(seed=0, separable=True)
    tcfg = TrainConfig(num_epochs=2, lr=1e-3, save_checkpoints=False,
                       patience=10 ** 9, output_dir="/tmp/distill_test")
    outs = train_many_seeds(data, splits, CFG, tcfg, batch_size=32,
                            seeds=[0, 1], seeds_per_call=2,
                            epochs_per_call=2, verbose=False)
    members = [o["best_params"] for o in outs]

    n = data.labels.shape[0]
    batch = (n // 2) + 1                       # forces a padded tail batch
    soft = teacher_soft_targets(CFG, members, data, batch=batch)
    assert soft.shape == (n, CFG.num_classes)
    np.testing.assert_allclose(soft.sum(axis=1), 1.0, rtol=1e-4)

    model = MultimodalEmotionModel(CFG)
    want = np.mean(
        [np.asarray(model.apply({"params": p}, jnp.asarray(data.video),
                                jnp.asarray(data.audio),
                                jnp.asarray(data.pad_mask))[0])
         for p in members], axis=0)
    np.testing.assert_allclose(soft, want, atol=1e-5)

    with pytest.raises(ValueError):
        teacher_soft_targets(CFG, [], data)


def test_distillation_trains_and_validates():
    """A distilled run must train (finite losses, usable best params);
    supplying soft targets with alpha=0 — or alpha>0 without targets, or
    misaligned rows — must raise."""
    from mmer_tpu.train.distill import teacher_soft_targets
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = make_tiny_dataset(seed=0, separable=True)
    base = dict(num_epochs=3, lr=1e-3, save_checkpoints=False,
                patience=10 ** 9, output_dir="/tmp/distill_test")

    teach_outs = train_many_seeds(data, splits, CFG, TrainConfig(**base),
                                  batch_size=32, seeds=[0],
                                  seeds_per_call=1, epochs_per_call=3,
                                  verbose=False)
    soft = teacher_soft_targets(
        CFG, [teach_outs[0]["best_params"]], data)

    dcfg = TrainConfig(**base, distill_alpha=0.7, distill_temp=2.0)
    outs = train_many_seeds(data, splits, CFG, dcfg, batch_size=32,
                            seeds=[7], seeds_per_call=1, epochs_per_call=3,
                            verbose=False, soft_targets=soft)
    rows = outs[0]["results"]
    assert len(rows) == 3
    assert all(np.isfinite(r["train_loss"]) for r in rows)
    assert outs[0]["best_params"] is not None

    with pytest.raises(ValueError):  # targets without alpha
        train_many_seeds(data, splits, CFG, TrainConfig(**base),
                         batch_size=32, seeds=[0], seeds_per_call=1,
                         epochs_per_call=3, verbose=False,
                         soft_targets=soft)
    with pytest.raises(ValueError):  # alpha without targets
        train_many_seeds(data, splits, CFG, dcfg, batch_size=32,
                         seeds=[0], seeds_per_call=1, epochs_per_call=3,
                         verbose=False)
    with pytest.raises(ValueError):  # misaligned rows
        train_many_seeds(data, splits, CFG, dcfg, batch_size=32,
                         seeds=[0], seeds_per_call=1, epochs_per_call=3,
                         verbose=False, soft_targets=soft[:-1])


def test_distill_alpha_one_ignores_hard_labels():
    """With alpha=1.0 the hard labels must not reach the gradient: two
    runs whose hard labels differ but whose soft targets match produce
    bit-identical trained params.  One epoch, so best-params selection
    (which evaluates val loss on the HARD labels) cannot diverge."""
    from mmer_tpu.train.distill import teacher_soft_targets
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = make_tiny_dataset(seed=0, separable=True)
    base = dict(num_epochs=1, lr=1e-3, save_checkpoints=False,
                patience=10 ** 9, output_dir="/tmp/distill_test")
    t_outs = train_many_seeds(data, splits, CFG, TrainConfig(**base),
                              batch_size=32, seeds=[0], seeds_per_call=1,
                              epochs_per_call=1, verbose=False)
    soft = teacher_soft_targets(CFG, [t_outs[0]["best_params"]], data)

    dcfg = TrainConfig(**base, distill_alpha=1.0)

    def run(dataset):
        return train_many_seeds(dataset, splits, CFG, dcfg, batch_size=32,
                                seeds=[3], seeds_per_call=1,
                                epochs_per_call=1, verbose=False,
                                soft_targets=soft)[0]

    a = run(data)
    scrambled = data.__class__(**{
        **{f: getattr(data, f) for f in data.__dataclass_fields__},
        "labels": (data.labels + 1) % CFG.num_classes})
    b = run(scrambled)
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        a["best_params"], b["best_params"])


def test_soup_params_mean_and_degenerate():
    """soup_params averages trees; souping N copies of one model is that
    model, and the souped tree evaluates through ensemble_eval's member
    path without error."""
    from mmer_tpu.train.ensemble import ensemble_eval, soup_params
    from mmer_tpu.train.fused import train_many_seeds

    data, splits = make_tiny_dataset(seed=0, separable=True)
    tcfg = TrainConfig(num_epochs=2, lr=1e-3, save_checkpoints=False,
                       patience=10 ** 9, output_dir="/tmp/distill_test")
    outs = train_many_seeds(data, splits, CFG, tcfg, batch_size=32,
                            seeds=[0, 1], seeds_per_call=2,
                            epochs_per_call=2, verbose=False)
    p0, p1 = outs[0]["best_params"], outs[1]["best_params"]

    same = soup_params([p0, p0])
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x),
                                                np.asarray(y), rtol=1e-7),
        same, p0)

    mixed = soup_params([p0, p1])
    leaf_m = jax.tree_util.tree_leaves(mixed)[0]
    leaf_0 = jax.tree_util.tree_leaves(p0)[0]
    leaf_1 = jax.tree_util.tree_leaves(p1)[0]
    np.testing.assert_allclose(np.asarray(leaf_m),
                               (np.asarray(leaf_0) + np.asarray(leaf_1)) / 2,
                               rtol=1e-6)

    res = ensemble_eval(CFG, [mixed], data, splits)
    assert 0.0 <= res["ensemble_macro_f1"] <= 1.0

    with pytest.raises(ValueError):
        soup_params([])
