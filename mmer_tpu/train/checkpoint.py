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

import json
import os
from typing import Any, NamedTuple, Optional

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


class RestoredLoop(NamedTuple):
    state: Any
    best_params: Optional[Any]
    loop: Optional[dict]   # scheduler/early-stop/best scalars; None = legacy


def save_loop_checkpoint(ckpt_dir: str, state: Any, step: int,
                         best_params: Optional[Any], loop: dict) -> str:
    """Full-resume checkpoint: TrainState + best params + the host-side
    loop scalars (lr, plateau-scheduler counters, early-stop streak, best
    tracking).  ADVICE r1: without these, a resumed run re-seeded
    lr=train_cfg.lr and fresh scheduler counters, diverging from the
    uninterrupted run."""
    payload = {"state": state,
               "best_params": best_params
               if best_params is not None else state.params}
    path = save_train_state(ckpt_dir, payload, step)
    loop_path = os.path.join(ckpt_dir, f"loop_{step:06d}.json")
    with open(loop_path, "w") as f:
        json.dump(loop, f)
    return path


def restore_loop_checkpoint(path: str, state_target: Any) -> RestoredLoop:
    """Restore a ``save_loop_checkpoint`` artifact; falls back to legacy
    plain-TrainState checkpoints (loop=None)."""
    step = os.path.basename(path).split(".")[0].split("_")[1]
    loop_path = os.path.join(os.path.dirname(path), f"loop_{step}.json")
    if not os.path.exists(loop_path):
        return RestoredLoop(restore_train_state(path, state_target),
                            None, None)
    target = {"state": state_target, "best_params": state_target.params}
    restored = restore_train_state(path, target)
    with open(loop_path) as f:
        loop = json.load(f)
    loop["sched_bad"] = int(loop["sched_bad"])
    loop["best_epoch"] = int(loop["best_epoch"])
    loop["no_improve"] = int(loop["no_improve"])
    loop["has_best"] = bool(loop["has_best"])
    return RestoredLoop(restored["state"], restored["best_params"], loop)
