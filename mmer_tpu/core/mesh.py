"""Device mesh and sharding helpers.

The reference framework is single-process single-GPU (SURVEY.md §2.7, no
``torch.distributed`` call sites).  Here distribution is first-class: a
(data, model) :class:`jax.sharding.Mesh`, batch sharding over the ``data``
axis, optional tensor parallelism over ``model``.  XLA inserts the ICI
collectives (psum for grad reduction, all-gathers for tp) automatically from
the sharding annotations — there is no hand-written NCCL analog.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmer_tpu.config import MeshConfig


def create_mesh(cfg: Optional[MeshConfig] = None,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a (data, model) mesh over the available devices.

    ``cfg.data_parallel == -1`` uses every device on the data axis after
    reserving ``cfg.model_parallel`` for tensor parallelism.
    """
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    if n % mp != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={mp}")
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs more than {n} devices")
    dev_array = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard dimension ``batch_axis`` over the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with leading-dim batch sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
