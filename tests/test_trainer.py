"""Trainer integration: train loop with per-loss monitoring, in-training
validation + best checkpoint, SWA, partial restore, test_cvppp submission.

Sized to reuse the XLA programs already compiled by tests/test_train.py
(same TINY topology, batch 8 on the 8-device mesh, 32x32 inputs).
"""

import json
import os

import numpy as np
import pytest

import jax

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.engine import checkpoint as ckpt
from pctrans_tpu.engine.trainer import Trainer


def tiny_cfg(tmp_path):
    cfg = get_cfg_defaults()
    cfg.MODEL.RESNETS.DEPTH = 14
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 32
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = 8
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 10
    cfg.MODEL.MASK_FORMER.NHEADS = 4
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = 64
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = 1
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = 4
    cfg.MODEL.SEM_SEG_HEAD.NORM = "GN"
    cfg.MODEL.MASK_FORMER.TRAIN_NUM_POINTS = 256
    cfg.MODEL.MAX_INSTANCES = 8
    cfg.MODEL.INPUT_SIZE = [32, 32]
    cfg.DATASET.DATA_TYPE = "synthetic"
    cfg.DATASET.OUTPUT_PATH = str(tmp_path / "out")
    cfg.INFERENCE.OUTPUT_PATH = str(tmp_path / "test")
    cfg.INFERENCE.SAMPLES_PER_BATCH = 1
    cfg.INFERENCE.TOP_K = 4
    cfg.SOLVER.ITERATION_TOTAL = 4
    cfg.SOLVER.ITERATION_SAVE = 2
    cfg.SOLVER.START_SAVE = 0
    cfg.SOLVER.ITERATION_VAL = 2
    cfg.SOLVER.SAMPLES_PER_BATCH = 1
    cfg.MONITOR.ITERATION_NUM = [1, 200]
    # the first SummaryWriter import costs ~30+ s of torch/TF machinery on
    # this 1-CPU host; the JSONL stream is what the assertions read anyway
    cfg.MONITOR.TENSORBOARD = False
    return cfg


class TestTrainerLoop:
    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_train_validate_swa_and_logs(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        cfg.SOLVER.SWA.ENABLED = True
        cfg.SOLVER.SWA.START_ITER = 1
        cfg.SOLVER.SWA.MERGE_ITER = 1
        cfg.SOLVER.ITERATION_VAL = 4   # one in-training validation suffices
        cfg.freeze()
        trainer = Trainer(cfg, mode="train")
        trainer.train()

        # per-loss scalars in metrics.jsonl (not just the total)
        lines = [json.loads(l) for l in
                 open(os.path.join(cfg.DATASET.OUTPUT_PATH, "metrics.jsonl"))]
        train_recs = [r for r in lines if "loss" in r]
        assert train_recs, lines
        for key in ("loss", "loss_mask", "loss_dice", "loss_sem", "loss_emb",
                    "loss_reid_query", "loss_refpoints"):
            assert key in train_recs[-1], sorted(train_recs[-1])

        # in-training validation logged + best checkpoint written
        eval_recs = [r for r in lines if "eval" in r]
        assert eval_recs and "SBD" in eval_recs[-1]["eval"]
        assert os.path.isdir(os.path.join(cfg.DATASET.OUTPUT_PATH, "checkpoint_best"))

        # periodic checkpoints + SWA checkpoint
        assert ckpt.list_checkpoints(cfg.DATASET.OUTPUT_PATH)
        assert os.path.isdir(os.path.join(cfg.DATASET.OUTPUT_PATH, "checkpoint_swa"))

    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_partial_restore_and_submission(self, tmp_path):
        cfg = tiny_cfg(tmp_path)
        cfg.freeze()
        trainer = Trainer(cfg, mode="test")
        path = ckpt.save_checkpoint(cfg.DATASET.OUTPUT_PATH, trainer.state, 1)

        # strict restore round-trips
        restored = ckpt.restore_checkpoint(path, trainer.state)
        a = jax.tree_util.tree_leaves(restored.params)[0]
        b = jax.tree_util.tree_leaves(trainer.state.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # partial restore into a WIDER model keeps init for mismatched leaves
        cfg2 = tiny_cfg(tmp_path)
        cfg2.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = 12  # query_feat shape changes
        cfg2.freeze()
        trainer2 = Trainer(cfg2, mode="test")
        before = np.asarray(trainer2.state.params["predictor"]["query_feat"]).copy()
        merged = ckpt.restore_partial(path, trainer2.state, verbose=False)
        after = np.asarray(merged.params["predictor"]["query_feat"])
        np.testing.assert_array_equal(before, after)  # mismatched -> kept init
        # a matching leaf was loaded from the checkpoint
        src = np.asarray(trainer.state.params["backbone"]["stem_conv1"]["kernel"])
        dst = np.asarray(merged.params["backbone"]["stem_conv1"]["kernel"])
        np.testing.assert_array_equal(src, dst)

        # test_cvppp writes a CodaLab-layout submission.h5
        h5 = pytest.importorskip("h5py")
        sub = trainer.test_cvppp()
        with h5.File(sub, "r") as f:
            assert "A1" in f
            plants = list(f["A1"])
            assert plants
            first = f["A1"][plants[0]]["label"]
            assert first.shape == (32, 32)

    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_top_k_exact_fallback(self, tmp_path):
        """TOP_K peak filtering is lossy when > K queries clear the
        postprocess threshold (duplicate peaks, common mid-training); in
        that case predict_probs must re-run with ALL queries so no
        above-threshold instance mask is dropped (exact reference
        semantics, maskformer.py:210-219)."""
        cfg = tiny_cfg(tmp_path)  # TOP_K = 4 of 10 queries
        cfg.freeze()
        trainer = Trainer(cfg, mode="test")
        imgs = np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32)

        # near-zero threshold: every kept peak clears it -> provably lossy
        # -> fallback returns all 10 query masks
        probs = trainer.predict_probs(imgs, threshold=1e-4)
        assert probs.shape[1] == cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES

        # near-one threshold: nothing clears it -> lean K-mask path kept
        probs = trainer.predict_probs(imgs, threshold=1.0 - 1e-6)
        assert probs.shape[1] == cfg.INFERENCE.TOP_K

    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_synthetic_bbbc_validates_with_aji(self, tmp_path):
        """DATA_TYPE synthetic_bbbc routes validation through the BBBC
        protocol (test_bbbc -> AJI/F1/PQ, postprocess threshold 0.05) on
        synthetic nuclei-like data — the end-to-end chain for the second
        dataset family without data on disk."""
        cfg = tiny_cfg(tmp_path)
        cfg.DATASET.DATA_TYPE = "synthetic_bbbc"
        cfg.SOLVER.ITERATION_TOTAL = 2
        cfg.SOLVER.ITERATION_VAL = 2
        cfg.freeze()
        trainer = Trainer(cfg, mode="train")
        assert trainer._bin_threshold == pytest.approx(0.05)
        trainer.train()
        lines = [json.loads(l) for l in
                 open(os.path.join(cfg.DATASET.OUTPUT_PATH, "metrics.jsonl"))]
        eval_recs = [r for r in lines if "eval" in r]
        assert eval_recs, lines
        assert {"AJI", "PQ", "F1"} <= set(eval_recs[-1]["eval"])

    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_tta_constructed_but_not_applied_to_instances(self, tmp_path):
        """AUG_MODE builds the TestAugmentor in test mode (reference
        trainer.py:78-84) but the per-query instance chain must NOT
        ensemble over it: the reference's eval_cvppp/test_cvppp call the
        model directly, and a per-query flip ensemble averages unrelated
        instances because learned queries are not flip-equivariant
        (measured on a trained checkpoint: SBD 0.147 under mean-TTA vs
        0.666 plain — runs/tta_swa_r4/results.json)."""
        cfg = tiny_cfg(tmp_path)  # TOP_K = 4 of 10 queries
        cfg.INFERENCE.AUG_MODE = "mean"
        cfg.INFERENCE.AUG_NUM = 4
        cfg.freeze()
        trainer = Trainer(cfg, mode="test")
        assert trainer.tta is not None  # parity: built + names updated
        imgs = np.random.RandomState(1).randn(1, 32, 32, 3).astype(np.float32)
        probs = trainer.predict_probs(imgs)
        assert probs.shape[0] == 1 and probs.shape[-2:] == (32, 32)
        assert np.isfinite(probs).all()
        # bit-identical to the plain eval step: the ensemble must not run
        import jax.numpy as jnp
        plain, _ = trainer._eval_step(trainer.state, jnp.asarray(imgs))
        np.testing.assert_array_equal(probs, np.asarray(plain))
        # the full-Q lossy-TOP_K fallback still applies under AUG_MODE
        probs = trainer.predict_probs(imgs, threshold=1e-4)
        assert probs.shape[1] == cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES


class TestObservability:
    def test_visualizer_png_fallback(self, tmp_path):
        from pctrans_tpu.utils.visualizer import Visualizer

        vis = Visualizer(str(tmp_path), tb_writer=None)
        rs = np.random.RandomState(0)
        images = rs.rand(2, 16, 16, 3).astype(np.float32)
        labels = rs.randint(0, 4, (2, 16, 16))
        preds = rs.randint(0, 4, (2, 16, 16))
        vis.visualize(7, images, labels, preds)
        files = os.listdir(os.path.join(str(tmp_path), "vis"))
        assert len(files) == 2
        panel = vis.panel(images[0], labels[0], preds[0])
        assert panel.shape == (16, 48, 3)  # image | gt | pred side by side

    def test_profiler_trace_window(self, tmp_path):
        """Monitor.profile_steps captures a jax.profiler trace for the
        configured window (SURVEY.md section 5 named the profiler hook as the
        TPU equivalent of the reference's wall-clock-only timing)."""
        import jax
        import jax.numpy as jnp

        from pctrans_tpu.utils.monitor import Monitor

        mon = Monitor(str(tmp_path), log_every=1, use_tensorboard=False,
                      profile_iters=(1, 2))
        for it in range(4):
            mon.profile_steps(it)
            jnp.ones(4).sum().block_until_ready()
        assert not mon._profiling
        trace_dir = os.path.join(str(tmp_path), "profile")
        assert os.path.isdir(trace_dir) and os.listdir(trace_dir)
        mon.close()
