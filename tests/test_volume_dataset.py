"""VolumeDataset / TileDataset: sampling, targets, chunk orchestration."""
import json
import os

import numpy as np
import pytest

from pctrans_tpu.data.volume_dataset import (
    TileDataset, VolumeDataset, load_volume_inputs, relabel_consecutive,
)


def _blob_volume(z=8, hw=64, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.rand(z, hw, hw).astype(np.float32)
    lab = np.zeros((z, hw, hw), np.int64)
    lab[:, 8:24, 8:24] = 5
    lab[:, 32:56, 32:56] = 9
    return img, lab


class TestVolumeDataset:
    def test_train_item_shapes_static(self):
        img, lab = _blob_volume()
        ds = VolumeDataset([img], [lab], mode="train",
                           sample_volume_size=(4, 32, 32),
                           target_opt=["0", "4-1-0"],
                           weight_opt=[["1"], ["0"]], iter_num=10)
        rng = np.random.RandomState(0)
        items = [ds.__getitem__(i, rng=rng) for i in range(3)]
        for it in items:
            assert it["image"].shape == (1, 4, 32, 32)
            assert it["target_0"].shape == (1, 4, 32, 32)
            assert it["target_1"].shape == (1, 4, 32, 32)
            assert it["weight_0_0"].shape == (1, 4, 32, 32)
            assert it["weight_1_0"].size == 1  # no-weight placeholder
        assert len(ds) == 10

    def test_train_relabel_and_binary_target(self):
        img, lab = _blob_volume()
        ds = VolumeDataset([img], [lab], mode="train",
                           sample_volume_size=(8, 64, 64), iter_num=2)
        it = ds.__getitem__(0, rng=np.random.RandomState(1))
        # target '0' is the binary foreground of the relabelled crop
        fg = it["target_0"]
        assert set(np.unique(fg)) <= {0.0, 1.0}
        assert fg.sum() > 0

    def test_rejection_prefers_foreground(self):
        img = np.random.RandomState(0).rand(4, 128, 128).astype(np.float32)
        lab = np.zeros((4, 128, 128), np.int64)
        lab[:, :16, :16] = 1  # tiny foreground corner
        ds = VolumeDataset([img], [lab], mode="train",
                           sample_volume_size=(4, 32, 32),
                           reject_size_thres=64, reject_p=1.0, iter_num=100)
        hits = 0
        for i in range(20):
            it = ds.__getitem__(i, rng=np.random.RandomState(i))
            hits += it["target_0"].sum() >= 64
        # a random 32x32 crop overlaps the corner >=64 voxels ~2% of the
        # time; 50 rejection tries lift that to ~64%.  >=10/20 separates
        # cleanly from the ~0.4/20 no-rejection baseline.
        assert hits >= 10

    def test_eval_grid_covers_volume(self):
        img, _ = _blob_volume(z=5, hw=50)
        ds = VolumeDataset([img], mode="val",
                           sample_volume_size=(2, 32, 32),
                           sample_stride=(2, 16, 16))
        cover = np.zeros((5, 50, 50), bool)
        for i in range(len(ds)):
            it = ds[i]
            _, z, y, x = it["pos"]
            assert it["image"].shape == (1, 2, 32, 32)
            cover[z:z + 2, y:y + 32, x:x + 32] = True
        assert cover.all()

    def test_do_2d_squeezes_z(self):
        img, lab = _blob_volume(z=1)
        ds = VolumeDataset([img], [lab], mode="train",
                           sample_volume_size=(1, 32, 32), do_2d=True,
                           iter_num=1)
        it = ds.__getitem__(0, rng=np.random.RandomState(0))
        assert it["image"].shape == (1, 32, 32)
        assert it["target_0"].shape == (1, 32, 32)

    def test_relabel_consecutive(self):
        seg = np.array([[0, 7], [7, 1000]])
        out = relabel_consecutive(seg)
        assert out.tolist() == [[0, 1], [1, 2]]


def _write_tiles(tmp_path, depth=4, hw=64, tile_sz=32):
    """PNG tile pyramid + create_json-style metadata."""
    from PIL import Image

    rng = np.random.RandomState(0)
    patterns = []
    for z in range(depth):
        zdir = tmp_path / f"z{z}"
        zdir.mkdir()
        for r in range(hw // tile_sz):
            for c in range(hw // tile_sz):
                arr = rng.randint(0, 255, (tile_sz, tile_sz), dtype=np.uint8)
                Image.fromarray(arr).save(zdir / f"{r}_{c}.png")
        patterns.append(str(zdir) + "/{row}_{column}.png")
    meta = {"ndim": 1, "dtype": "uint8", "image": patterns,
            "depth": depth, "height": hw, "width": hw,
            "n_columns": hw // tile_sz, "n_rows": hw // tile_sz,
            "tile_size": tile_sz, "tile_ratio": 1, "tile_st": [0, 0]}
    p = tmp_path / "im.json"
    p.write_text(json.dumps(meta))
    return str(p)


class TestTileDataset:
    def test_chunks_and_inner_dataset(self, tmp_path):
        jp = _write_tiles(tmp_path)
        ds = TileDataset([jp], chunk_num=(1, 2, 2), chunk_stride=False,
                         chunk_iter=5, mode="train",
                         sample_volume_size=(2, 16, 16), target_opt=["0"],
                         weight_opt=[["0"]])
        assert len(ds) == 4
        names = set()
        for _ in range(4):
            ds.updatechunk()
            names.add(ds.get_coord_name())
            assert ds.dataset is not None
            assert ds.dataset.volume[0].shape == (4, 32, 32)
            item = ds.dataset.__getitem__(0, rng=np.random.RandomState(0))
            assert item["image"].shape == (1, 2, 16, 16)
        assert len(names) == 4  # all four chunks visited

    def test_train_half_stride_grid(self, tmp_path):
        jp = _write_tiles(tmp_path)
        ds = TileDataset([jp], chunk_num=(1, 2, 2), chunk_stride=True,
                         mode="train", sample_volume_size=(1, 8, 8))
        assert len(ds) == 9  # (2*2-1)^2 half-step positions

    def test_chunk_ind_split_shards(self, tmp_path):
        jp = _write_tiles(tmp_path)
        a = TileDataset([jp], chunk_num=(1, 2, 2), chunk_stride=False,
                        chunk_ind_split="0-2", mode="train",
                        sample_volume_size=(1, 8, 8))
        b = TileDataset([jp], chunk_num=(1, 2, 2), chunk_stride=False,
                        chunk_ind_split="1-2", mode="train",
                        sample_volume_size=(1, 8, 8))
        assert len(a) + len(b) == 4
        assert not set(a.chunk_ind) & set(b.chunk_ind)


class TestConfigPath:
    def test_build_volume_dataset_from_cfg(self, tmp_path):
        import h5py

        from pctrans_tpu.config import get_cfg_defaults
        from pctrans_tpu.data.build import build_volume_dataset

        img, lab = _blob_volume(z=8, hw=64)
        with h5py.File(tmp_path / "im.h5", "w") as f:
            f.create_dataset("main", data=(img * 255).astype(np.uint8))
        with h5py.File(tmp_path / "seg.h5", "w") as f:
            f.create_dataset("main", data=lab.astype(np.uint32))

        cfg = get_cfg_defaults()
        cfg.defrost()
        cfg.DATASET.DATA_TYPE = "volume"
        cfg.DATASET.INPUT_PATH = str(tmp_path) + "/"
        cfg.DATASET.IMAGE_NAME = "im.h5"
        cfg.DATASET.LABEL_NAME = "seg.h5"
        cfg.DATASET.DO_2D = False
        cfg.MODEL.INPUT_SIZE = [2, 32, 32]
        cfg.MODEL.OUTPUT_SIZE = [2, 32, 32]  # augmentor crop size
        cfg.MODEL.TARGET_OPT = ["0"]
        cfg.MODEL.WEIGHT_OPT = [["1"]]
        cfg.AUGMENTOR.SMOOTH = False
        for key in cfg.AUGMENTOR:
            block = cfg.AUGMENTOR[key]
            if hasattr(block, "get") and block.get("ENABLED") is not None:
                block.ENABLED = False  # inflation would exceed the tiny volume
        ds = build_volume_dataset(cfg, "train")
        item = ds.__getitem__(0, rng=np.random.RandomState(0))
        assert item["image"].shape[-3:] == (2, 32, 32)
        assert "target_0" in item and "weight_0_0" in item

    def test_load_volume_inputs_padding(self, tmp_path):
        import h5py

        from pctrans_tpu.config import get_cfg_defaults

        with h5py.File(tmp_path / "im.h5", "w") as f:
            f.create_dataset("main", data=np.zeros((4, 16, 16), np.uint8))
        cfg = get_cfg_defaults()
        cfg.defrost()
        cfg.DATASET.INPUT_PATH = str(tmp_path) + "/"
        cfg.DATASET.IMAGE_NAME = "im.h5"
        cfg.DATASET.LABEL_NAME = ""
        cfg.DATASET.PAD_SIZE = [1, 2, 2]
        img, lab, vm = load_volume_inputs(cfg, "train")
        assert img[0].shape == (6, 20, 20)
        assert lab is None and vm is None


class TestReviewRegressions:
    def test_relabel_preserves_instances_without_background(self):
        # a fully-labeled crop (no 0 anywhere) must keep every instance:
        # the naive unique->arange map sent the smallest id to background
        seg = np.array([[3, 3, 5], [5, 5, 3]], np.int64)
        out = relabel_consecutive(seg)
        assert 0 not in out
        assert len(np.unique(out)) == 2
        np.testing.assert_array_equal(out, [[1, 1, 2], [2, 2, 1]])

    def test_relabel_keeps_background(self):
        seg = np.array([[0, 7], [7, 9]], np.int32)
        out = relabel_consecutive(seg)
        np.testing.assert_array_equal(out, [[0, 1], [1, 2]])

    def test_chunk_grid_covers_every_voxel(self):
        # extent 10 / chunk_num 4 previously left z=4 and z=9 unowned
        from pctrans_tpu.data.volume_dataset import TileDataset
        import json, tempfile, os

        meta = {"depth": 10, "height": 10, "width": 10, "image": []}
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "v.json")
            json.dump(meta, open(p, "w"))
            ds = TileDataset(volume_json=p, chunk_num=(4, 4, 4),
                             chunk_stride=False, mode="test")
            owned = np.zeros((10, 10, 10), bool)
            for (z0, z1, y0, y1, x0, x1) in ds._coords:
                owned[z0:z1, y0:y1, x0:x1] = True
            assert owned.all()

    def test_normalize_is_crop_independent(self):
        ds = VolumeDataset(volume=[np.zeros((4, 8, 8), np.uint8)],
                           mode="test", sample_volume_size=(2, 4, 4))
        dark = ds._normalize(np.ones((2, 4, 4), np.uint8))
        bright = ds._normalize(np.full((2, 4, 4), 200, np.uint8))
        assert dark.max() == pytest.approx((1 / 255 - 0.5) / 0.5)
        assert bright.max() == pytest.approx((200 / 255 - 0.5) / 0.5)

    def test_normalize_scales_by_dtype_range(self):
        # a uint16 microscopy volume must land in [0, 1] pre-standardize,
        # not [0, 257] (dividing by 255 regardless of dtype)
        ds = VolumeDataset(volume=[np.zeros((4, 8, 8), np.uint8)],
                           mode="test", sample_volume_size=(2, 4, 4))
        full16 = ds._normalize(np.full((2, 4, 4), 65535, np.uint16))
        assert full16.max() == pytest.approx((1.0 - 0.5) / 0.5)
        half16 = ds._normalize(np.full((2, 4, 4), 32768, np.uint16))
        assert half16.max() == pytest.approx((32768 / 65535 - 0.5) / 0.5,
                                             rel=1e-4)
        # floats pass through unscaled
        f = ds._normalize(np.full((2, 4, 4), 0.25, np.float32))
        assert f.max() == pytest.approx((0.25 - 0.5) / 0.5)

    def test_label_center_crop_for_valid_conv(self):
        vol = np.random.RandomState(0).rand(8, 16, 16).astype(np.float32)
        lab = np.zeros((8, 16, 16), np.int32)
        lab[:, 6:10, 6:10] = 1
        ds = VolumeDataset(volume=[vol], label=[lab], mode="train",
                           sample_volume_size=(4, 12, 12),
                           sample_label_size=(4, 8, 8),
                           target_opt=("0",), weight_opt=(("1",),),
                           iter_num=2)
        item = ds.__getitem__(0, np.random.RandomState(0))
        assert item["image"].shape[-2:] == (12, 12)
        assert item["target_0"].shape[-2:] == (8, 8)


class TestAugmentorRegressions:
    def test_wide_integer_labels_survive_warps(self):
        from pctrans_tpu.data.volume_augment import Elastic, Rotate

        rs = np.random.RandomState(0)
        img = rs.rand(2, 16, 16).astype(np.float32)
        lab = (rs.randint(0, 3, (2, 16, 16)).astype(np.uint32)
               + np.uint32(70000))   # ids beyond uint16
        for aug in (Rotate(rot90=False, p=1.0),
                    Elastic(alpha=4.0, sigma=2.0, p=1.0)):
            out = aug({"image": img.copy(), "label": lab.copy()},
                      np.random.RandomState(1))
            assert out["label"].dtype == np.uint32
            # nearest-neighbor warp: only original ids may appear
            assert set(np.unique(out["label"])) <= (set(np.unique(lab)) | {0})

    def test_compose_rejects_4d_images(self):
        from pctrans_tpu.data.volume_augment import Compose, Grayscale

        comp = Compose([Grayscale(p=1.0)], input_size=(2, 8, 8))
        with pytest.raises(NotImplementedError):
            comp({"image": np.zeros((2, 2, 8, 8), np.float32),
                  "label": np.zeros((2, 8, 8), np.int32)},
                 np.random.RandomState(0))

    def test_bbbc_rotate_non_square(self):
        from pctrans_tpu.data.bbbc import aug_rotate

        rs = np.random.RandomState(0)
        img = rs.rand(20, 30).astype(np.float32)
        lab = (rs.rand(20, 30) > 0.7).astype(np.int32)
        out_img, out_lab = aug_rotate(rs, img, lab)
        assert out_img.shape == (20, 30)
        assert out_lab.shape == (20, 30)
