"""Training monitor: scalar logging to JSONL + optional TensorBoard.

Equivalent of the reference Monitor/Logger (connectomics/utils/monitor.py:
22-148): per-loss scalars and learning rate every N iterations, config dump
into the run directory, periodic console summaries with timing/ETA.
TensorBoard is used when available (torch ships it); the JSONL stream is the
always-on machine-readable record.

Profiling: the reference had wall-clock timing only (SURVEY.md section 5);
here :meth:`Monitor.profile_steps` captures a ``jax.profiler`` device trace
(viewable in TensorBoard / Perfetto) for a chosen iteration window, driven
by ``MONITOR.PROFILE_ITERS``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Monitor:
    def __init__(self, output_dir: str, log_every: int = 20,
                 use_tensorboard: bool = True,
                 profile_iters: Optional[tuple] = None):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.log_every = max(1, log_every)
        self.jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir=os.path.join(output_dir, "tb"))
            except Exception:
                self.tb = None
        # (start_iter, stop_iter) window for a jax.profiler trace
        self.profile_iters = tuple(profile_iters) if profile_iters else None
        self._profiling = False
        self._t0 = time.perf_counter()
        self._last = self._t0

    def profile_steps(self, iteration: int) -> None:
        """Start/stop a jax.profiler trace at the configured window; call
        once per training iteration (before the step is dispatched)."""
        if self.profile_iters is None:
            return
        import jax

        start, stop = self.profile_iters
        # >= start (not ==): a run resumed past the window's start should
        # still capture the remaining overlap instead of silently skipping
        if start <= iteration < stop and not self._profiling:
            trace_dir = os.path.join(self.output_dir, "profile")
            jax.profiler.start_trace(trace_dir)
            self._profiling = True
            print(f"[profiler] tracing iterations {start}..{stop} -> {trace_dir}")
        elif iteration >= stop and self._profiling:
            jax.profiler.stop_trace()
            self._profiling = False

    def load_info(self, cfg):
        # the config FILE is written once by save_all_cfg (trainer.py calls
        # both); here only the TensorBoard text record
        if self.tb is not None:
            self.tb.add_text("config", f"```\n{cfg.dump()}\n```")

    def update(self, iteration: int, scalars: Dict[str, float], lr: float,
               total_iters: Optional[int] = None) -> None:
        if iteration % self.log_every:
            return
        now = time.perf_counter()
        rec = {"iter": iteration, "lr": float(lr),
               **{k: float(v) for k, v in scalars.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.add_scalar("lr", lr, iteration)
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), iteration)
        # marginal rate since the previous log line: the cumulative average
        # is dominated by the initial jit compile for thousands of steps.
        # The first log line anchors to THIS iteration (a resumed run's
        # start_iter would otherwise count thousands of never-run steps and
        # print an absurd avg/ETA).
        last_iter = getattr(self, "_last_iter", None)
        d_iter = iteration - last_iter if last_iter is not None else 1
        avg = (now - self._last) / max(d_iter, 1)
        self._last_iter = iteration
        eta_h = avg * max((total_iters or 0) - iteration, 0) / 3600.0
        loss = scalars.get("loss", float("nan"))
        print(
            f"[Iteration {iteration:05d}] loss: {float(loss):.4f}, lr: {lr:.3e}, "
            f"avg iter: {avg:.3f}s, ETA: {eta_h:.2f}h",
            flush=True,
        )
        self._last = now

    def add_eval(self, iteration: int, metrics: Dict[str, float]):
        rec = {"iter": iteration, "eval": {k: float(v) for k, v in metrics.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(f"eval/{k}", float(v), iteration)

    def close(self):
        if self._profiling:  # trace window extended past the last iteration
            import jax

            jax.profiler.stop_trace()
            self._profiling = False
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def build_monitor(cfg) -> Monitor:
    log_every = cfg.MONITOR.ITERATION_NUM[0] if cfg.MONITOR.ITERATION_NUM else 20
    profile = cfg.MONITOR.get("PROFILE_ITERS", None)
    return Monitor(cfg.DATASET.OUTPUT_PATH, log_every=log_every,
                   use_tensorboard=bool(cfg.MONITOR.get("TENSORBOARD", True)),
                   profile_iters=tuple(profile) if profile else None)
