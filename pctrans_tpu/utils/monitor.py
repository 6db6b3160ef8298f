"""Training monitor: scalar logging to JSONL + optional TensorBoard.

Equivalent of the reference Monitor/Logger (connectomics/utils/monitor.py:
22-148): per-loss scalars and learning rate every N iterations, config dump
into the run directory, periodic console summaries with timing/ETA.
TensorBoard is used when available (torch ships it); the JSONL stream is the
always-on machine-readable record.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class Monitor:
    def __init__(self, output_dir: str, log_every: int = 20, use_tensorboard: bool = True):
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
        self._t0 = time.perf_counter()
        self._last = self._t0

    def load_info(self, cfg, extra: Optional[str] = None):
        with open(os.path.join(self.output_dir, "config.yaml"), "w") as f:
            f.write(cfg.dump())
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
        avg = (now - self._t0) / max(iteration, 1)
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
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def build_monitor(cfg) -> Monitor:
    log_every = cfg.MONITOR.ITERATION_NUM[0] if cfg.MONITOR.ITERATION_NUM else 20
    return Monitor(cfg.DATASET.OUTPUT_PATH, log_every=log_every)
