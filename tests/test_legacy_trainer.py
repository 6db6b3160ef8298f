"""LegacyTrainer: end-to-end volume training, run_chunk, windowed test."""
import json
import os

import h5py
import numpy as np
import pytest


def _legacy_cfg(tmp_path, arch="unet_2d", chunk=False):
    from pctrans_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.defrost()
    cfg.SYSTEM.NUM_DEVICES = 1
    cfg.SYSTEM.NUM_CPUS = 2
    cfg.MONITOR.TENSORBOARD = False  # skip the heavy SummaryWriter import in CI
    cfg.MODEL.ARCHITECTURE = arch
    cfg.MODEL.IN_PLANES = 1
    cfg.MODEL.OUT_PLANES = 1
    cfg.MODEL.FILTERS = [8, 8, 8, 8, 8]
    cfg.MODEL.TARGET_OPT = ["0"]
    cfg.MODEL.WEIGHT_OPT = [["1"]]
    cfg.MODEL.LOSS_OPTION = [["WeightedBCE"]]
    cfg.MODEL.LOSS_WEIGHT = [[1.0]]
    cfg.MODEL.OUTPUT_ACT = [["none"]]
    cfg.MODEL.INPUT_SIZE = [1, 32, 32]
    cfg.MODEL.OUTPUT_SIZE = [1, 32, 32]
    cfg.MODEL.NORM_MODE = "gn"
    cfg.DATASET.DATA_TYPE = "tile" if chunk else "volume"
    cfg.DATASET.DO_2D = True
    cfg.DATASET.INPUT_PATH = str(tmp_path) + "/"
    cfg.DATASET.OUTPUT_PATH = str(tmp_path / "out")
    cfg.DATASET.IMAGE_NAME = "im.h5"
    cfg.DATASET.LABEL_NAME = "seg.h5"
    cfg.SOLVER.SAMPLES_PER_BATCH = 2
    cfg.SOLVER.ITERATION_TOTAL = 4
    cfg.SOLVER.ITERATION_SAVE = 100
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.INFERENCE.OUTPUT_PATH = str(tmp_path / "out")
    cfg.INFERENCE.STRIDE = [1, 16, 16]
    cfg.INFERENCE.SAMPLES_PER_BATCH = 2
    for key in cfg.AUGMENTOR:
        block = cfg.AUGMENTOR[key]
        if hasattr(block, "get") and block.get("ENABLED") is not None:
            block.ENABLED = False
    return cfg


def _write_volume(tmp_path, z=4, hw=64):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (z, hw, hw), dtype=np.uint8)
    lab = np.zeros((z, hw, hw), np.uint32)
    lab[:, 16:48, 16:48] = 1
    with h5py.File(tmp_path / "im.h5", "w") as f:
        f.create_dataset("main", data=img)
    with h5py.File(tmp_path / "seg.h5", "w") as f:
        f.create_dataset("main", data=lab)


class TestLegacyTrainer:
    def test_volume_train_and_test(self, tmp_path):
        from pctrans_tpu.engine.legacy_trainer import LegacyTrainer

        _write_volume(tmp_path)
        cfg = _legacy_cfg(tmp_path)
        tr = LegacyTrainer(cfg, mode="train")
        tr.train()
        tr.close()
        assert tr.start_iter == 4
        # loss was logged and is finite
        lines = [json.loads(l) for l in
                 open(os.path.join(cfg.DATASET.OUTPUT_PATH, "metrics.jsonl"))]
        assert lines and np.isfinite(lines[-1]["loss"])

        # windowed inference over the full volume writes a stitched h5
        cfg2 = _legacy_cfg(tmp_path)
        tr2 = LegacyTrainer(cfg2, mode="test")
        tr2.state = tr.state
        out = tr2.test()
        assert out.shape == (1, 4, 64, 64)
        assert np.isfinite(out).all()
        with h5py.File(tmp_path / "out" / "result.h5") as f:
            assert f["main"].shape == (1, 4, 64, 64)

    def test_run_chunk_train(self, tmp_path):
        from PIL import Image

        from pctrans_tpu.engine.legacy_trainer import LegacyTrainer

        # tile pyramid: 2 z-slices of 64x64 as 32px tiles + label json
        rng = np.random.RandomState(0)
        patterns, lab_patterns = [], []
        for z in range(2):
            zd = tmp_path / f"z{z}"
            zd.mkdir()
            for r in range(2):
                for c in range(2):
                    Image.fromarray(rng.randint(0, 255, (32, 32),
                                    dtype=np.uint8)).save(zd / f"{r}_{c}.png")
                    lab = np.zeros((32, 32), np.uint8)
                    lab[8:24, 8:24] = 1
                    Image.fromarray(lab).save(zd / f"l_{r}_{c}.png")
            patterns.append(str(zd) + "/{row}_{column}.png")
            lab_patterns.append(str(zd) + "/l_{row}_{column}.png")
        meta = {"ndim": 1, "dtype": "uint8", "depth": 2, "height": 64,
                "width": 64, "n_columns": 2, "n_rows": 2, "tile_size": 32,
                "tile_ratio": 1, "tile_st": [0, 0]}
        (tmp_path / "im.json").write_text(json.dumps({**meta, "image": patterns}))
        (tmp_path / "seg.json").write_text(
            json.dumps({**meta, "image": lab_patterns}))

        cfg = _legacy_cfg(tmp_path, chunk=True)
        cfg.DATASET.IMAGE_NAME = "im.json"
        cfg.DATASET.LABEL_NAME = "seg.json"
        cfg.DATASET.DO_CHUNK_TITLE = 1
        cfg.DATASET.DATA_CHUNK_NUM = [1, 2, 2]
        cfg.DATASET.DATA_CHUNK_STRIDE = False
        cfg.DATASET.DATA_CHUNK_ITER = 2
        cfg.SOLVER.ITERATION_TOTAL = 4  # 2 chunks x 2 iterations

        tr = LegacyTrainer(cfg, mode="train")
        tr.run_chunk("train")
        tr.close()
        assert tr.start_iter == 4
