"""Multi-chip semantics on the virtual 8-device CPU mesh: dp/tp sharded
execution must match single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mmer_tpu.config import MeshConfig, ModelConfig, TrainConfig
from mmer_tpu.core.mesh import create_mesh, data_sharding
from mmer_tpu.models.fusion import MultimodalEmotionModel
from mmer_tpu.ops.losses import weighted_cross_entropy
from mmer_tpu.parallel.sharding import batch_spec, param_shardings
from mmer_tpu.train.loop import make_optimizer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = ModelConfig(max_seq_len=6, compute_dtype="float32")


def _setup():
    model = MultimodalEmotionModel(CFG)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(16, 5, 768)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(16, 1024)), jnp.float32)
    mask = jnp.zeros((16, 5), dtype=bool)
    labels = jnp.asarray(rng.integers(0, 6, size=(16,)), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, video, audio,
                        mask)
    return model, params, (video, audio, mask, labels)


def test_dp_tp_forward_matches_single_device():
    model, params, (video, audio, mask, _) = _setup()
    _, want, _ = model.apply(params, video, audio, mask)

    mesh = create_mesh(MeshConfig(model_parallel=2))
    p_shard = param_shardings(params["params"], mesh)
    sharded_params = {"params": jax.tree_util.tree_map(
        jax.device_put, params["params"], p_shard)}
    b3 = batch_spec(mesh, 3)
    b2 = batch_spec(mesh, 2)
    with mesh:
        f = jax.jit(lambda p, v, a, m: model.apply(p, v, a, m)[1],
                    in_shardings=({"params": p_shard}, b3, b2, b2))
        got = f(sharded_params, jax.device_put(video, b3),
                jax.device_put(audio, b2), jax.device_put(mask, b2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2)


def test_dp_tp_train_step_matches_single_device():
    model, params, (video, audio, mask, labels) = _setup()
    optimizer = make_optimizer(TrainConfig(lr=1e-3))
    cw = jnp.ones((6,), jnp.float32)
    sw = jnp.ones((16,), jnp.float32)

    def step(p, opt_state, v, a, m, y):
        def loss_of(pp):
            _, logits, _ = model.apply({"params": pp}, v, a, m)
            return weighted_cross_entropy(logits, y, cw, sw)

        loss, grads = jax.value_and_grad(loss_of)(p)
        updates, opt_state = optimizer.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p0 = params["params"]
    opt0 = optimizer.init(p0)
    p_ref, _, loss_ref = jax.jit(step)(p0, opt0, video, audio, mask, labels)

    mesh = create_mesh(MeshConfig(model_parallel=2))
    p_shard = param_shardings(p0, mesh)
    sp = jax.tree_util.tree_map(jax.device_put, p0, p_shard)
    b3, b2, b1 = batch_spec(mesh, 3), batch_spec(mesh, 2), batch_spec(mesh, 1)
    with mesh:
        sharded_step = jax.jit(
            step,
            in_shardings=(p_shard, None, b3, b2, b2, b1),
            out_shardings=(p_shard, None, NamedSharding(mesh, P())))
        p_got, _, loss_got = sharded_step(
            sp, optimizer.init(sp), jax.device_put(video, b3),
            jax.device_put(audio, b2), jax.device_put(mask, b2),
            jax.device_put(labels, b1))

    np.testing.assert_allclose(float(loss_got), float(loss_ref), rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_got = jax.tree_util.tree_leaves(p_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-3)


def test_batch_sharding_layout():
    mesh = create_mesh(MeshConfig())
    x = np.zeros((16, 5, 768), np.float32)
    placed = jax.device_put(x, data_sharding(mesh, 3))
    # batch dim split over all 8 devices on the data axis
    assert placed.sharding.shard_shape(placed.shape)[0] == 2
