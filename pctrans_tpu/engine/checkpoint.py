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
# \d{6,}: %06d zero-pads but does NOT truncate — iteration >= 1e6 writes 7+
# digits, which must stay visible to list/latest/iteration parsing
_RE = re.compile(r"checkpoint_(\d{6,})$")


def save_checkpoint(output_dir: str, state: TrainState, iteration: int,
                    is_best: bool = False, name: Optional[str] = None):
    os.makedirs(output_dir, exist_ok=True)
    if name is None:
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


def restore_partial(path: str, target: TrainState, verbose: bool = True) -> TrainState:
    """Key-filtered, shape-checked partial restore (finetune load).

    Equivalent of the reference ``update_checkpoint``'s pretrained-dict
    filtering (engine/trainer.py:616-652): every leaf whose path exists in
    the checkpoint with a matching shape is taken from the checkpoint;
    everything else (new heads, changed widths, missing optimizer state)
    keeps the freshly initialized value.  ``step``/``opt_state`` are only
    adopted when the whole params tree matched (otherwise optimizer moments
    would be misaligned with the mixed parameters).
    """
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))  # structure-free pytree of arrays

    def flatten(tree, prefix=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(flatten(v, prefix + (str(k),)))
        else:
            out[prefix] = tree
        return out

    raw_flat = flatten(jax.device_get(raw))
    n_loaded = n_skipped = 0
    all_params_matched = True

    def merge(name, target_tree):
        nonlocal n_loaded, n_skipped, all_params_matched
        flat_t, treedef = jax.tree_util.tree_flatten_with_path(target_tree)
        new_leaves = []
        for path_t, leaf in flat_t:
            keys = (name,) + tuple(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path_t
            )
            src = raw_flat.get(keys)
            if src is not None and tuple(src.shape) == tuple(leaf.shape):
                arr = jax.numpy.asarray(src, leaf.dtype)
                # keep the target leaf's placement: the trainer replicates
                # the state over the mesh BEFORE a partial restore, and a
                # default-device array mixed into a sharded PyTree breaks
                # the pjit'd step in multi-process runs
                if hasattr(leaf, "sharding"):
                    arr = jax.device_put(arr, leaf.sharding)
                new_leaves.append(arr)
                n_loaded += 1
            else:
                new_leaves.append(leaf)
                n_skipped += 1
                if name == "params":
                    all_params_matched = False
                if verbose and src is not None:
                    print(f"[checkpoint] shape mismatch, keeping init: "
                          f"{'/'.join(keys)} {tuple(src.shape)} vs {tuple(leaf.shape)}")
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    state = target.replace(
        params=merge("params", target.params),
        frozen=merge("frozen", target.frozen),
        batch_stats=merge("batch_stats", target.batch_stats),
    )
    if all_params_matched and ("opt_state",) in {k[:1] for k in raw_flat}:
        try:
            full = ckptr.restore(os.path.abspath(path), target=target)
            state = state.replace(step=full.step, opt_state=full.opt_state)
        except Exception:
            pass
    if verbose:
        print(f"[checkpoint] partial restore from {path}: "
              f"{n_loaded} leaves loaded, {n_skipped} kept from init")
    return state


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
