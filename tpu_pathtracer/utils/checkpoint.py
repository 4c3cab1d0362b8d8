"""Checkpoint / resume for progressive renders and inverse-rendering runs.

The reference's only persistent state is the in-GPU accumulation buffer +
iteration counter, lost on exit (SURVEY.md §5 "Checkpoint/resume: none on
disk; there is no image save at all"). Here both long-running workloads
snapshot to disk via orbax:

  - progressive rendering: AccumulatorState (radiance sum + iteration) —
    every frame is a valid partial result (the running-mean property,
    reference pathtracer.cu:104-109), so a resumed render continues
    exactly where it stopped, bit-for-bit (counter-based RNG keys off the
    iteration number);
  - inverse rendering: TrainState (params + optimizer state + step).

Multi-host preemption recovery = resume-from-snapshot (SURVEY.md §5
failure-detection plan: fail fast per step, recover by restore).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_state(directory: str, step: int, state: Any,
               max_to_keep: int = 3) -> None:
    """Snapshot any pytree (AccumulatorState / TrainState) at `step`."""
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_state(directory: str, template: Any, step: int | None = None) -> Any:
    """Restore a pytree saved by save_state; `template` supplies the
    structure/shapes/dtypes (e.g. a freshly-initialized state)."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint in {directory}")
    out = mgr.restore(
        step,
        args=ocp.args.StandardRestore(jax.tree.map(lambda x: x, template)),
    )
    mgr.close()
    return out
