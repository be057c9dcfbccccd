"""Parameter and activation sharding rules (dp + tp).

The reference has no distributed layer at all (SURVEY.md §2.7) — this module
IS the framework's communication backend: sharding annotations over a
(data, model) mesh; XLA lowers them to ICI collectives (psum for the
data-parallel gradient reduction, all-gather/reduce-scatter around the
tensor-parallel FFN and attention-head matmuls).

Tensor-parallel layout (Megatron-style pairing, expressed purely as
PartitionSpecs):
- attention q/k/v DenseGeneral kernels (d, h, hd): heads sharded → P(None, 'model', None)
- attention out kernel (h, hd, d): heads sharded on input → P('model', None, None)
- FFN in kernel (d, ffn): P(None, 'model'); FFN out kernel (ffn, d): P('model', None)
This keeps the pair's collective to a single psum on the second matmul's
output, which XLA inserts automatically.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _path_names(path) -> list:
    names = []
    for p in path:
        if hasattr(p, "key"):
            names.append(str(p.key))
        elif hasattr(p, "name"):
            names.append(str(p.name))
        else:
            names.append(str(p))
    return names


def fusion_param_spec(path, leaf, model_axis: str = "model") -> P:
    """PartitionSpec for one fusion-model parameter leaf."""
    names = _path_names(path)
    joined = "/".join(names)
    ndim = getattr(leaf, "ndim", 0)

    if "self_attn" in joined and names[-1] == "kernel":
        if any(n in ("query", "key", "value") for n in names) and ndim == 3:
            return P(None, model_axis, None)
        if "out" in names and ndim == 3:
            return P(model_axis, None, None)
    if names[-1] == "kernel" and ndim == 2:
        if "ffn_in" in names:
            return P(None, model_axis)
        if "ffn_out" in names:
            return P(model_axis, None)
    if names[-1] == "bias" and "ffn_in" in names and ndim == 1:
        return P(model_axis)
    return P()


def shard_params(params: Any, mesh: Mesh, spec_fn=fusion_param_spec):
    """Device-put a parameter pytree with per-leaf NamedShardings."""
    model_axis = mesh.axis_names[-1]

    def place(path, leaf):
        spec = spec_fn(path, leaf, model_axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params: Any, mesh: Mesh, spec_fn=fusion_param_spec):
    """The NamedSharding pytree (for jit in_shardings/out_shardings)."""
    model_axis = mesh.axis_names[-1]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_fn(path, leaf, model_axis)),
        params)


def batch_spec(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0], *([None] * (ndim - 1))))
