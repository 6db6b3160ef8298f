"""Legacy EM training/inference driver: legacy zoo + multi-target criterion.

Equivalent of the reference Trainer's non-MaskFormer path
(connectomics/engine/trainer.py): `train` with TARGET_OPT/WEIGHT_OPT dense
targets (trainer.py:113-202), chunked TileDataset orchestration
``run_chunk`` (trainer.py:708-741), and windowed volumetric inference
``test`` with blending + OUTPUT_ACT + h5 output (the reference's windowed
accumulation; see also SURVEY.md section 2.6).

TPU shape: one jitted train step over the data-parallel mesh — forward,
multi-target LegacyCriterion, and the optax update all live on device; the
host only assembles fixed-shape ``{image, target_i, weight_i_j}`` batches
(VolumeDataset), so XLA compiles once per run.  Models are channels-last
(MXU-friendly); the criterion consumes channels-first like the reference,
so the step transposes at the boundary — a layout change XLA folds into the
adjacent ops.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
import numpy as np

from ..config import CfgNode, save_all_cfg
from ..data.build import PrefetchLoader, batch_size_for, build_volume_dataset
from ..engine import checkpoint as ckpt
from ..engine.solver import build_lr_schedule, build_optimizer
from ..engine.state import TrainState
from ..losses.legacy import LegacyCriterion, SplitActivation, get_functional_act
from ..models import build_architecture
from ..parallel import create_mesh, replicate, shard_batch
from ..utils.monitor import build_monitor


def _to_channels_last(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, 1, -1)


def _to_channels_first(x):
    if isinstance(x, dict):  # DeepLab-style {"out", "aux"}
        return {k: jnp.moveaxis(v, -1, 1) for k, v in x.items()}
    return jnp.moveaxis(x, -1, 1)


class LegacyTrainer:
    """Train/infer any ``MODEL.ARCHITECTURE`` from the legacy zoo on
    volumetric data (DATA_TYPE ``volume``/``tile``)."""

    def __init__(self, cfg: CfgNode, mode: str = "train",
                 checkpoint: Optional[str] = None, mesh=None):
        assert mode in ("train", "test")
        from ..utils.cache import enable_compile_cache

        enable_compile_cache()
        self.cfg = cfg
        self.mode = mode
        self.output_dir = cfg.DATASET.OUTPUT_PATH
        self.model = build_architecture(cfg, train=(mode == "train"))
        self.criterion = LegacyCriterion.build_from_cfg(cfg, channel_axis=1)
        n_dev = cfg.SYSTEM.NUM_DEVICES if cfg.SYSTEM.NUM_DEVICES > 0 else None
        self.mesh = mesh if mesh is not None else create_mesh(n_dev)
        self.rng = jax.random.key(int(cfg.SYSTEM.get("SEED", 42)))

        spatial = list(cfg.MODEL.OUTPUT_SIZE if mode == "train"
                       else cfg.MODEL.INPUT_SIZE)
        if cfg.DATASET.DO_2D and len(spatial) == 3:
            spatial = spatial[-2:]
        dummy = jnp.zeros((1, *spatial, cfg.MODEL.IN_PLANES), jnp.float32)
        variables = jax.jit(self.model.init)(jax.random.key(0), dummy)
        params = variables["params"]
        self.tx = build_optimizer(cfg, params)
        self.lr_schedule = build_lr_schedule(cfg)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params, frozen={},
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params))
        self.state = replicate(self.mesh, state)
        self.start_iter = int(cfg.MODEL.PRE_MODEL_ITER)
        if checkpoint:
            self.state = ckpt.restore_checkpoint(checkpoint, self.state)
            if not cfg.SOLVER.ITERATION_RESTART:
                self.start_iter = int(self.state.step)
        self.total_iters = cfg.SOLVER.ITERATION_TOTAL

        self._n_targets = len(cfg.MODEL.TARGET_OPT)
        self._n_weights = [len(w) for w in cfg.MODEL.WEIGHT_OPT]
        self._train_step = jax.jit(self._make_train_step())
        self._fwd = jax.jit(self._make_forward())

        self.dataset = None
        if mode == "train":
            self.monitor = build_monitor(cfg)
            self.monitor.load_info(cfg)
            save_all_cfg(cfg, self.output_dir)
            if cfg.DATASET.DO_CHUNK_TITLE != 1:
                self.dataset = build_volume_dataset(cfg, "train")
                self.train_loader = iter(self._loader(self.dataset))

    # ------------------------------------------------------------------
    def _loader(self, dataset) -> PrefetchLoader:
        return PrefetchLoader(
            dataset, batch_size=batch_size_for(self.cfg, "train",
                                               self.mesh.devices.size),
            shuffle=False,  # VolumeDataset items are already random draws
            seed=int(self.cfg.SYSTEM.get("SEED", 42)),
            num_workers=max(2, self.cfg.SYSTEM.NUM_CPUS // 2),
            loop=True, drop_last=True)

    def _make_train_step(self):
        model, criterion, tx = self.model, self.criterion, self.tx
        n_t, n_w = self._n_targets, self._n_weights

        def step(state: TrainState, batch: Dict, rng):
            # per-step dropout key (same discipline as engine/state.py:70;
            # reusing one key would repeat the identical mask every step)
            rng = jax.random.fold_in(rng, state.step)
            img = _to_channels_last(batch["image"])
            targets = [batch[f"target_{i}"] for i in range(n_t)]
            weights = [[batch.get(f"weight_{i}_{j}") for j in range(n_w[i])]
                       for i in range(n_t)]

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    out, updates = model.apply(
                        variables, img, mutable=["batch_stats"],
                        rngs={"dropout": rng})
                    new_stats = updates["batch_stats"]
                else:
                    out = model.apply(variables, img, rngs={"dropout": rng})
                    new_stats = state.batch_stats
                pred = _to_channels_first(out)
                loss, vis = criterion(pred, targets, weights)
                return loss, (vis, new_stats)

            (loss, (vis, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # value: the loss, for the ReduceLROnPlateau transform (solver
            # build_optimizer wraps every tx with extra-args support)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params, value=loss)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, **vis}
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state,
                                      batch_stats=new_stats)
            return new_state, metrics

        return step

    def _make_forward(self):
        # eval-mode model regardless of the trainer's mode: BatchNorm must
        # use running averages (and not try to mutate the immutable
        # batch_stats collection) when test()/run_chunk runs mid-training
        model = (self.model if not self.model.train
                 else build_architecture(self.cfg, train=False))
        acts = list(self.cfg.INFERENCE.get("OUTPUT_ACT", ["sigmoid"]))
        # per-TARGET_OPT channel-group activations via SplitActivation
        # (reference misc.py:128-157 splits channels per target, not per
        # channel — a 3-channel target takes ONE activation)
        split_act = SplitActivation(self.cfg.MODEL.TARGET_OPT,
                                    output_act=acts, channel_axis=1)

        def forward(state: TrainState, img_cl: jnp.ndarray) -> jnp.ndarray:
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            out = model.apply(variables, img_cl)
            if isinstance(out, dict):
                out = out["out"]
            pred = _to_channels_first(out)
            if len(acts) == 1:
                return get_functional_act(acts[0])(pred)
            return jnp.concatenate(split_act(pred), axis=1)

        return forward

    # ------------------------------------------------------------------
    def train(self, num_iters: Optional[int] = None) -> None:
        end = (self.start_iter + num_iters if num_iters is not None
               else self.total_iters)
        for it in range(self.start_iter, end):
            self.monitor.profile_steps(it)
            batch_np = next(self.train_loader)
            batch = shard_batch(self.mesh, {
                k: v.astype(np.float32) for k, v in batch_np.items()
                if k != "_num_valid"})
            self.state, metrics = self._train_step(self.state, batch, self.rng)
            if it % self.monitor.log_every == 0:
                # lr float() only on log steps: it forces a device sync that
                # would otherwise serialize async dispatch every iteration
                self.monitor.update(it, metrics, float(self.lr_schedule(it)),
                                    total_iters=self.total_iters)
            if (it + 1) % self.cfg.SOLVER.ITERATION_SAVE == 0:
                ckpt.save_checkpoint(self.output_dir, self.state, it + 1)
        jax.block_until_ready(self.state.params)
        self.start_iter = end

    def close(self) -> None:
        if hasattr(self, "monitor"):
            self.monitor.close()

    # ------------------------------------------------------------------
    def test(self, dataset=None, filename: Optional[str] = None) -> np.ndarray:
        """Sliding-window inference over the test volume(s), blended
        stitching, OUTPUT_ACT applied on device, h5 written to
        INFERENCE.OUTPUT_PATH (uint8-scaled like the reference)."""
        from ..data.volume_io import writeh5
        from ..inference.sliding_window import sliding_window_inference

        cfg = self.cfg
        ds = dataset if dataset is not None else build_volume_dataset(cfg, "test")
        window = list(cfg.MODEL.INPUT_SIZE)
        stride = [s if s > 0 else w for s, w in
                  zip(cfg.INFERENCE.STRIDE, window)]

        def fwd(batch_np: np.ndarray) -> np.ndarray:
            # [B, z, y, x, C_in] -> [B, C_out, z, y, x]
            x = jnp.asarray(batch_np, jnp.float32)
            if cfg.DATASET.DO_2D and x.shape[1] == 1:
                out = self._fwd(self.state, x[:, 0])
                return np.asarray(out)[:, :, None]
            return np.asarray(self._fwd(self.state, x))

        results = []
        for vid, vol in enumerate(ds.volume):
            v = vol.astype(np.float32)
            if v.max() > 1.5:
                v = v / 255.0
            v = (v - ds.data_mean) / ds.data_std
            if v.ndim == 3:
                v = v[..., None]           # [z, y, x, 1]
            else:
                v = np.moveaxis(v, 0, -1)  # [c, z, y, x] -> [z, y, x, c]
            pred = sliding_window_inference(
                fwd, v, window, stride, out_channels=cfg.MODEL.OUT_PLANES,
                batch_size=cfg.INFERENCE.SAMPLES_PER_BATCH)
            results.append(pred)

        out = results[0] if len(results) == 1 else np.stack(results)
        name = filename or cfg.INFERENCE.OUTPUT_NAME
        os.makedirs(cfg.INFERENCE.OUTPUT_PATH, exist_ok=True)
        writeh5(os.path.join(cfg.INFERENCE.OUTPUT_PATH, name),
                (np.clip(out, 0, 1) * 255).astype(np.uint8))
        return out

    # ------------------------------------------------------------------
    def run_chunk(self, mode: str) -> None:
        """Chunk-at-a-time orchestration for TileDataset
        (reference run_chunk, engine/trainer.py:708-741): train cycles
        chunks, DATA_CHUNK_ITER iterations each; inference loads each chunk
        once and writes ``{OUTPUT_NAME}_{coord}.h5``."""
        cfg = self.cfg
        self.dataset = build_volume_dataset(cfg, mode)
        if mode == "train":
            chunk_iter = int(cfg.DATASET.DATA_CHUNK_ITER)
            num_chunk = (self.total_iters - self.start_iter) // chunk_iter
            for chunk in range(num_chunk):
                self.dataset.updatechunk()
                self.train_loader = iter(self._loader(self.dataset.dataset))
                print(f"[chunk {chunk}] {self.dataset.get_coord_name()}: "
                      f"{chunk_iter} iterations")
                self.train(num_iters=chunk_iter)
            return

        base, ext = os.path.splitext(cfg.INFERENCE.OUTPUT_NAME)
        for _ in range(len(self.dataset)):
            self.dataset.updatechunk(do_load=False)
            name = f"{base}_{self.dataset.get_coord_name()}{ext or '.h5'}"
            if os.path.exists(os.path.join(cfg.INFERENCE.OUTPUT_PATH, name)):
                continue  # resumable: skip chunks already written
            self.dataset.loadchunk()
            self.test(dataset=self.dataset.dataset, filename=name)
