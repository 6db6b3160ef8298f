"""Trainer: the supervised training / evaluation driver.

Equivalent of the reference Trainer (connectomics/engine/trainer.py:29-777)
rebuilt around one jitted train step on a device mesh:

* ``train()`` — the per-iteration loop: prefetching host loader -> sharded
  device batch -> jitted step (targets, forward, matching, losses, update
  all on device) -> monitor -> periodic orbax checkpoints.
* ``validate()`` / ``eval_cvppp()`` — batched inference + host postprocess
  + SBD / |DiC| (trainer.py:398-450), results appended to ``logging.txt``.
* ``test_bbbc()`` — AJI / pixel-F1 / detection-F1 / PQ over the test set
  (trainer.py:497-573).

No ``torch.cuda.empty_cache()``-style rituals: XLA owns device memory, and
there are no per-step host syncs to paper over.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CfgNode, save_all_cfg
from ..data.build import build_dataloader
from ..engine import checkpoint as ckpt
from ..engine.solver import build_lr_schedule, build_optimizer
from ..engine.state import TrainState, init_state, make_eval_step, make_train_step
from ..inference import metrics_bbbc as mb
from ..inference import metrics_cvppp as mc
from ..inference.postprocess import instance_inference_bbbc, instance_inference_cvppp
from ..losses import build_criterion
from ..models import build_model_config
from ..parallel import create_mesh, replicate, shard_batch
from ..utils.monitor import build_monitor


class Trainer:
    def __init__(
        self,
        cfg: CfgNode,
        mode: str = "train",
        rank: Optional[int] = None,
        checkpoint: Optional[str] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.mode = mode
        self.model_config = build_model_config(cfg)
        self.criterion = build_criterion(cfg)
        self.max_instances = cfg.MODEL.MAX_INSTANCES
        self.output_dir = cfg.DATASET.OUTPUT_PATH

        n_dev = cfg.SYSTEM.NUM_DEVICES if cfg.SYSTEM.NUM_DEVICES > 0 else None
        self.mesh = mesh if mesh is not None else create_mesh(n_dev)

        params_rng = jax.random.key(0)
        self.rng = jax.random.key(int(cfg.SYSTEM.get("SEED", 42)))

        in_h, in_w = cfg.MODEL.INPUT_SIZE[-2:]
        self.lr_schedule = build_lr_schedule(cfg)

        # init params (abstractly cheap; realized on device)
        from ..models import PCTransModel

        model = PCTransModel(config=self.model_config, train=True)
        variables = jax.jit(model.init)(
            params_rng, jnp.zeros((1, in_h, in_w, 3), jnp.float32)
        )
        params = variables["params"]
        self.tx = build_optimizer(cfg, params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            frozen=variables.get("frozen", {}),
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
        )
        # pretrained backbone weights
        if cfg.MODEL.WEIGHTS and os.path.exists(cfg.MODEL.WEIGHTS):
            state = self._load_backbone_weights(state, cfg.MODEL.WEIGHTS)
        self.state = replicate(self.mesh, state)
        self.start_iter = int(cfg.MODEL.PRE_MODEL_ITER)

        if checkpoint:
            self.state = ckpt.restore_checkpoint(checkpoint, self.state)
            if not cfg.SOLVER.ITERATION_RESTART:
                self.start_iter = int(self.state.step)

        self._train_step = jax.jit(
            make_train_step(self.model_config, self.criterion, self.tx, self.max_instances)
        )
        self._eval_step = jax.jit(make_eval_step(self.model_config))

        if mode == "train":
            self.monitor = build_monitor(cfg)
            self.monitor.load_info(cfg)
            save_all_cfg(cfg, self.output_dir)
            self.train_loader = iter(
                build_dataloader(cfg, "train", n_devices=self.mesh.devices.size)
            )
        self.total_iters = cfg.SOLVER.ITERATION_TOTAL

    # ------------------------------------------------------------------
    def _load_backbone_weights(self, state: TrainState, path: str) -> TrainState:
        from ..models.resnet import convert_d2_r50_pickle

        params, frozen = convert_d2_r50_pickle(path, self.model_config.backbone_depth)
        new_params = dict(state.params)
        new_params["backbone"] = jax.tree_util.tree_map(
            lambda a, b: b.astype(a.dtype), state.params["backbone"], params
        )
        new_frozen = dict(state.frozen)
        if "backbone" in new_frozen:
            new_frozen["backbone"] = jax.tree_util.tree_map(
                lambda a, b: b.astype(a.dtype), state.frozen["backbone"], frozen
            )
        return state.replace(params=new_params, frozen=new_frozen)

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        t0 = time.perf_counter()
        for it in range(self.start_iter, self.total_iters):
            batch_np = next(self.train_loader)
            batch = shard_batch(self.mesh, {
                "image": batch_np["image"].astype(np.float32),
                "label": batch_np["label"].astype(np.int32),
            })
            self.state, metrics = self._train_step(self.state, batch, self.rng)

            if hasattr(self, "monitor"):
                lr = float(self.lr_schedule(it))
                self.monitor.update(it, {k: metrics[k] for k in ("loss",)}, lr,
                                    total_iters=self.total_iters)

            if (it + 1) % cfg.SOLVER.ITERATION_SAVE == 0 and (it + 1) >= cfg.SOLVER.START_SAVE:
                self.save_checkpoint(it)
        jax.block_until_ready(self.state.params)
        return time.perf_counter() - t0

    def save_checkpoint(self, iteration: int, is_best: bool = False) -> str:
        return ckpt.save_checkpoint(self.output_dir, self.state, iteration + 1, is_best)

    # ------------------------------------------------------------------
    def predict_probs(self, images: np.ndarray) -> np.ndarray:
        """images [B, H, W, 3] -> sigmoid mask probabilities [B, Q, H, W]."""
        return np.asarray(self._eval_step(self.state, jnp.asarray(images)))

    def eval_cvppp(self, loader=None, model_name: str = "model") -> Dict[str, float]:
        loader = loader or build_dataloader(self.cfg, "val")
        sbd_all, diff_all, n = 0.0, 0.0, 0
        for batch in loader:
            probs = self.predict_probs(batch["image"])
            for b in range(int(batch.get("_num_valid", probs.shape[0]))):
                seg = instance_inference_cvppp(probs[b]).astype(np.uint16)
                if "fg" in batch:
                    seg = seg * (batch["fg"][b] > 0).astype(np.uint16)
                gt = batch["label"][b].astype(np.uint16)
                sbd_all += mc.SymmetricBestDice(seg, gt)
                diff_all += abs(mc.DiffFGLabels(seg, gt))
                n += 1
        res = {"SBD": sbd_all / max(n, 1), "absDiffFG": diff_all / max(n, 1)}
        self._append_log(model_name, [res["SBD"], res["absDiffFG"]])
        return res

    def test_bbbc(self, loader=None, model_name: str = "model") -> Dict[str, float]:
        loader = loader or build_dataloader(self.cfg, "test")
        aji, dice, f1, pq = [], [], [], []
        for batch in loader:
            probs = self.predict_probs(batch["image"])
            for b in range(int(batch.get("_num_valid", probs.shape[0]))):
                seg = instance_inference_bbbc(probs[b])
                gt = mb.remap_label(batch["label"][b], by_size=False)
                pred = mb.remap_label(seg, by_size=False)
                aji.append(mb.agg_jc_index(gt, pred))
                dice.append(mb.pixel_f1(gt, pred))
                info = mb.get_fast_pq(gt, pred, match_iou=0.5)[0]
                f1.append(info[0])
                pq.append(info[2])
        res = {
            "AJI": float(np.mean(aji)), "AJI_std": float(np.std(aji)),
            "F1": float(np.mean(dice)), "F1_std": float(np.std(dice)),
            "detF1": float(np.mean(f1)), "detF1_std": float(np.std(f1)),
            "PQ": float(np.mean(pq)), "PQ_std": float(np.std(pq)),
        }
        self._append_log(model_name, [res["AJI"], res["F1"], res["detF1"], res["PQ"]])
        return res

    def _append_log(self, model_name: str, values):
        out = self.cfg.INFERENCE.OUTPUT_PATH
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "logging.txt"), "a") as f:
            f.write(model_name + "\n")
            f.write(" ".join(str(v) for v in values) + "\n")
