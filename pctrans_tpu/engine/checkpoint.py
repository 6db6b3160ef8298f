"""Orbax checkpointing with the reference's iteration-numbered layout.

The reference saves ``checkpoint_%06d.pth.tar`` dicts of
{iteration, state_dict, optimizer, lr_scheduler} every ITERATION_SAVE
(engine/trainer.py:598-614) and sweeps them at eval time
(scripts/eval.py:98-115).  Here each checkpoint is an orbax directory
``checkpoint_%06d`` holding the full TrainState PyTree, so the same sweep
semantics (numbered, resumable, partial-load tolerant) are preserved.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState

_FMT = "checkpoint_%06d"
_RE = re.compile(r"checkpoint_(\d{6})$")


def save_checkpoint(output_dir: str, state: TrainState, iteration: int, is_best: bool = False):
    os.makedirs(output_dir, exist_ok=True)
    name = "checkpoint_best" if is_best else _FMT % iteration
    path = os.path.abspath(os.path.join(output_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    """Restore into the structure of ``target`` (shapes must match)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def list_checkpoints(output_dir: str) -> List[str]:
    if not os.path.isdir(output_dir):
        return []
    out = []
    for d in sorted(os.listdir(output_dir)):
        if _RE.match(d):
            out.append(os.path.join(output_dir, d))
    return out


def latest_checkpoint(output_dir: str) -> Optional[str]:
    cps = list_checkpoints(output_dir)
    return cps[-1] if cps else None


def checkpoint_iteration(path: str) -> int:
    m = _RE.search(os.path.basename(os.path.normpath(path)))
    return int(m.group(1)) if m else -1
