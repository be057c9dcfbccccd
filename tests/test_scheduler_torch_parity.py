"""PlateauScheduler vs torch.optim.lr_scheduler.ReduceLROnPlateau: the lr
trajectory must match the reference's scheduler exactly over arbitrary
val-loss sequences (reference train2.py:526 uses factor=0.3, patience=20,
default rel threshold 1e-4)."""

import numpy as np
import pytest

from mmer_tpu.train.loop import PlateauScheduler

torch = pytest.importorskip("torch")


def _torch_lr_trajectory(losses, lr0, factor, patience):
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience)
    out = []
    for loss in losses:
        sched.step(loss)
        out.append(opt.param_groups[0]["lr"])
    return out


def _ours_lr_trajectory(losses, lr0, factor, patience):
    sched = PlateauScheduler(factor, patience)
    lr = lr0
    out = []
    for loss in losses:
        lr = sched.step(float(loss), lr)
        out.append(lr)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("factor,patience", [(0.3, 20), (0.5, 3), (0.1, 0)])
def test_lr_trajectory_matches_torch(seed, factor, patience):
    rng = np.random.default_rng(seed)
    # random walk with plateaus — exercises improve/stall/reduce paths
    losses = np.abs(np.cumsum(rng.normal(0, 0.05, 200)) + 2.0)
    losses[50:80] = losses[49]          # hard plateau
    losses[120:160] = losses[119] * 0.99999  # sub-threshold improvement

    want = _torch_lr_trajectory(losses, 1e-3, factor, patience)
    got = _ours_lr_trajectory(losses, 1e-3, factor, patience)
    np.testing.assert_allclose(got, want, rtol=1e-12)
