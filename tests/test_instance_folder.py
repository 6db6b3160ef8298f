"""Cellpose / MoNuSeg folder datasets."""
import numpy as np
import pytest


def _make_cellpose(tmp_path, n=3, hw=96):
    from PIL import Image

    d = tmp_path / "train"
    d.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.randint(0, 255, (hw, hw, 3), dtype=np.uint8)
        lab = np.zeros((hw, hw), np.uint16)
        lab[10:40, 10:40] = 1
        lab[50:90, 50:90] = 2
        Image.fromarray(img).save(d / f"{i:03d}_img.png")
        Image.fromarray(lab).save(d / f"{i:03d}_masks.png")
    (tmp_path / "test").mkdir()
    Image.fromarray(rng.randint(0, 255, (hw, hw, 3), dtype=np.uint8)).save(
        tmp_path / "test" / "t_img.png")
    Image.fromarray(np.ones((hw, hw), np.uint16)).save(
        tmp_path / "test" / "t_masks.png")


class TestCellpose:
    def test_train_items(self, tmp_path):
        from pctrans_tpu.data.instance_folder import CellposeDataset

        _make_cellpose(tmp_path)
        ds = CellposeDataset(str(tmp_path), "train", crop_size=64)
        assert len(ds) == 3
        it = ds.__getitem__(0, rng=np.random.RandomState(0))
        assert it["image"].shape == (64, 64, 3)
        assert it["label"].shape == (64, 64)
        assert it["label"].max() <= 2  # relabeled consecutive

    def test_test_split_full_res(self, tmp_path):
        from pctrans_tpu.data.instance_folder import CellposeDataset

        _make_cellpose(tmp_path)
        ds = CellposeDataset(str(tmp_path), "test", crop_size=64)
        assert len(ds) == 1
        it = ds[0]
        assert it["image"].shape == (96, 96, 3)

    def test_dispatch_from_cfg(self, tmp_path):
        from pctrans_tpu.config import get_cfg_defaults
        from pctrans_tpu.data.build import get_dataset

        _make_cellpose(tmp_path)
        cfg = get_cfg_defaults()
        cfg.defrost()
        cfg.DATASET.DATA_TYPE = "cellpose"
        cfg.DATASET.INPUT_PATH = str(tmp_path)
        cfg.MODEL.INPUT_SIZE = [3, 64, 64]
        ds = get_dataset(cfg, "train")
        assert len(ds) == 3


class TestMoNuSeg:
    def test_items_and_split(self, tmp_path):
        from pctrans_tpu.data.instance_folder import MoNuSegDataset

        from PIL import Image

        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        rng = np.random.RandomState(0)
        for i in range(5):
            Image.fromarray(rng.randint(0, 255, (80, 80, 3),
                            dtype=np.uint8)).save(
                tmp_path / "images" / f"s{i}.png")
            lab = np.zeros((80, 80), np.int32)
            lab[20:60, 20:60] = i + 5
            np.save(tmp_path / "labels" / f"s{i}_ins.npy", lab)
        tr = MoNuSegDataset(str(tmp_path), "train", crop_size=64)
        va = MoNuSegDataset(str(tmp_path), "val", crop_size=64)
        assert len(tr) + len(va) == 5
        it = tr.__getitem__(0, rng=np.random.RandomState(0))
        assert it["image"].shape == (64, 64, 3)
        assert set(np.unique(va[0]["label"])) <= {0, 1}
