"""Checkpointing: best/final model artifacts + full-state resume.

The reference saves best/final ``state_dict`` ``.pth`` files per run with
hyperparameter-stamped names (train2.py:766-774) but never saves optimizer
state and cannot resume mid-run (SURVEY.md §5).  Here:

- best/final params are saved as flax msgpack with the same naming scheme
  (``best_model_bs{b}_ep{e}_lr{lr}_{ts}.msgpack``), keeping the reference's
  artifact contract;
- the full train state (params + optimizer state + epoch + scheduler state)
  is checkpointed through orbax when available (msgpack fallback), enabling
  mid-run resume — the realistic failure-recovery mode the reference lacks.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def save_params_msgpack(path: str, params: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params_msgpack(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_train_state(ckpt_dir: str, state: Any, step: int) -> str:
    """Full-state checkpoint for resume.  Orbax if available, msgpack
    fallback (both store the same pytree)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"state_{step:06d}")
    host_state = jax.device_get(state)
    try:
        import orbax.checkpoint as ocp

        ckpointer = ocp.PyTreeCheckpointer()
        ckpointer.save(os.path.abspath(path), host_state, force=True)
        return path
    except Exception:
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(host_state))
        return path + ".msgpack"


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    entries = [e for e in os.listdir(ckpt_dir) if e.startswith("state_")]
    if not entries:
        return None
    entries.sort()
    return os.path.join(ckpt_dir, entries[-1])


def restore_train_state(path: str, target: Any) -> Any:
    if path.endswith(".msgpack"):
        with open(path, "rb") as f:
            return serialization.from_bytes(target, f.read())
    import orbax.checkpoint as ocp

    ckpointer = ocp.PyTreeCheckpointer()
    restored = ckpointer.restore(os.path.abspath(path), item=jax.device_get(target))
    return restored
