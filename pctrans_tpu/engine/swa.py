"""Stochastic weight averaging.

Equivalent of the reference's SWA support (engine/solver/build.py:315-328,
trainer.py:666-693): maintain a running average of parameters from
``START_ITER`` every ``MERGE_ITER`` steps, checkpoint it separately.  In the
functional setup this is a pure fold over param PyTrees.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp


class SWAState:
    def __init__(self, params: Optional[Any] = None, count: int = 0):
        self.params = params
        self.count = count

    def update(self, params: Any) -> "SWAState":
        if self.params is None:
            return SWAState(jax.tree_util.tree_map(jnp.asarray, params), 1)
        n = self.count
        avg = jax.tree_util.tree_map(
            lambda a, p: (a * n + p) / (n + 1), self.params, params
        )
        return SWAState(avg, n + 1)


def maybe_update_swa(swa: SWAState, params: Any, iteration: int,
                     start_iter: int, merge_iter: int) -> SWAState:
    if iteration >= start_iter and iteration % max(merge_iter, 1) == 0:
        return swa.update(params)
    return swa
