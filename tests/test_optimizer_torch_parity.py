"""Optimizer chain parity: clip(1.0) → L2-into-grad → Adam must reproduce
the reference's ``clip_grad_norm_`` + ``torch.optim.Adam(weight_decay=…)``
trajectory exactly (reference train2.py:525,576)."""

import numpy as np
import pytest

from mmer_tpu.config import TrainConfig
from mmer_tpu.train.loop import make_optimizer

torch = pytest.importorskip("torch")


def test_update_trajectory_matches_torch():
    import jax
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    y = rng.normal(size=(16, 3)).astype(np.float32)
    lr, wd, steps = 1e-2, 1e-3, 25

    # ---- torch reference --------------------------------------------------
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, weight_decay=wd)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)
    for _ in range(steps):
        opt.zero_grad()
        loss = ((xt @ wt - yt) ** 2).mean()
        loss.backward()
        torch.nn.utils.clip_grad_norm_([wt], 1.0)
        opt.step()
    want = wt.detach().numpy()

    # ---- ours --------------------------------------------------------------
    optimizer = make_optimizer(TrainConfig(lr=lr, weight_decay=wd,
                                           clip_norm=1.0))
    params = jnp.asarray(w0)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(p, s):
        g = jax.grad(lambda w: jnp.mean((x @ w - y) ** 2))(p)
        updates, s = optimizer.update(g, s, p)
        return optax.apply_updates(p, updates), s

    for _ in range(steps):
        params, opt_state = step(params, opt_state)

    np.testing.assert_allclose(np.asarray(params), want, atol=1e-5,
                               rtol=1e-4)
