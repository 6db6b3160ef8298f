"""Synthetic-EM end-to-end run: legacy volumetric path trained to a metric.

The third data family's learning evidence (after synth CVPPP and synth
BBBC): a 3D Voronoi-cell "EM" volume with dark membranes, trained through
the complete legacy chain the reference ships for connectomics volumes —

  h5 volumes -> VolumeDataset (TARGET_OPT ['0','4'] binary+boundary,
  WeightedBCE) -> LegacyTrainer (UNet3D, jitted step) -> checkpoints ->
  sliding-window inference -> bc_watershed -> adapted_rand / VOI.

Reference protocol: connectomics/engine/trainer.py:113-202 (train),
:708-741 (volumes), utils/process.py:290-333 (bc_watershed),
utils/evaluate.py:11-118 (adapted Rand, VOI).

Usage:
  python tools_dev/synth_em_run.py --iters 2000            # train + sweep
  python tools_dev/synth_em_run.py --eval-only             # sweep only
  python tools_dev/synth_em_run.py --smoke                 # tiny CPU check
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Z_ANISO = 4.0  # EM voxels are anisotropic: z spacing ~4x the in-plane pitch


def make_em_volume(shape=(40, 288, 288), n_cells=140, seed=0,
                   membrane_px=1, noise_sigma=12.0):
    """Anisotropic 3D Voronoi cells + dark membranes, EM-style.

    Returns (image uint8 [z,y,x], seg uint32 [z,y,x]) where seg=0 on the
    carved membrane voxels (SNEMI-style GT: boundaries are background).
    """
    rng = np.random.RandomState(seed)
    zz, yy, xx = shape
    seeds = np.stack([
        rng.uniform(0, zz, n_cells) * Z_ANISO,
        rng.uniform(0, yy, n_cells),
        rng.uniform(0, xx, n_cells),
    ], axis=1)  # [N, 3] in physical coords

    # nearest-seed labelling, chunked over z to bound memory
    seg = np.zeros(shape, np.uint32)
    ys, xs = np.meshgrid(np.arange(yy, dtype=np.float32),
                         np.arange(xx, dtype=np.float32), indexing="ij")
    for z in range(zz):
        pz = z * Z_ANISO
        # [N, y, x] squared distances
        d = ((seeds[:, 0, None, None] - pz) ** 2
             + (seeds[:, 1, None, None] - ys) ** 2
             + (seeds[:, 2, None, None] - xs) ** 2)
        seg[z] = d.argmin(axis=0).astype(np.uint32) + 1

    # carve membranes: voxels whose neighbourhood (±membrane_px in-plane,
    # ±1 slice in z — EM z-pitch is coarse) spans more than one label.
    # 3D carving matters: without the z extent, z-adjacent cells touch and
    # any foreground-based postprocess merges them.
    from scipy import ndimage
    fp = np.ones((3, 2 * membrane_px + 1, 2 * membrane_px + 1))
    mx = ndimage.maximum_filter(seg, footprint=fp)
    mn = ndimage.minimum_filter(seg, footprint=fp)
    membrane = mx != mn
    seg = np.where(membrane, 0, seg).astype(np.uint32)

    # image: bright per-cell interior, dark membranes, smooth texture + noise
    base = rng.uniform(120, 210, n_cells + 1).astype(np.float32)
    base[0] = 35.0  # membrane intensity
    img = base[seg]
    texture = ndimage.gaussian_filter(
        rng.randn(*shape).astype(np.float32), sigma=(0.5, 3, 3)) * 25.0
    img = img + texture + rng.randn(*shape).astype(np.float32) * noise_sigma
    return np.clip(img, 0, 255).astype(np.uint8), seg


def build_cfg(data_dir, out_dir, iters, save_every, batch,
              input_size=(16, 128, 128), filters=(28, 36, 48, 64, 80),
              test_image="val_im.h5"):
    from pctrans_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.defrost()
    cfg.SYSTEM.NUM_DEVICES = 1
    cfg.SYSTEM.NUM_CPUS = 4
    cfg.MONITOR.TENSORBOARD = False
    cfg.MODEL.ARCHITECTURE = "unet_3d"
    cfg.MODEL.IN_PLANES = 1
    cfg.MODEL.OUT_PLANES = 2
    cfg.MODEL.FILTERS = list(filters)
    # binary foreground + instance boundary -> bc_watershed
    cfg.MODEL.TARGET_OPT = ["0", "4-1-1"]  # binary FG + instance boundary
    cfg.MODEL.WEIGHT_OPT = [["1"], ["1"]]
    cfg.MODEL.LOSS_OPTION = [["WeightedBCE"], ["WeightedBCE"]]
    cfg.MODEL.LOSS_WEIGHT = [[1.0], [1.0]]
    cfg.MODEL.OUTPUT_ACT = [["none"], ["none"]]
    cfg.MODEL.INPUT_SIZE = list(input_size)
    cfg.MODEL.OUTPUT_SIZE = list(input_size)
    cfg.MODEL.NORM_MODE = "bn"
    cfg.DATASET.DATA_TYPE = "volume"
    cfg.DATASET.DO_2D = False
    cfg.DATASET.INPUT_PATH = str(data_dir).rstrip("/") + "/"
    cfg.DATASET.OUTPUT_PATH = str(out_dir)
    cfg.DATASET.IMAGE_NAME = "train_im.h5"
    cfg.DATASET.LABEL_NAME = "train_seg.h5"
    cfg.SOLVER.SAMPLES_PER_BATCH = batch
    cfg.SOLVER.ITERATION_TOTAL = iters
    cfg.SOLVER.ITERATION_SAVE = save_every
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupPolyLR"
    cfg.SOLVER.WARMUP_ITERS = min(100, iters // 10)
    cfg.INFERENCE.OUTPUT_PATH = str(out_dir)
    cfg.INFERENCE.IMAGE_NAME = test_image
    cfg.INFERENCE.STRIDE = [8, 64, 64]
    cfg.INFERENCE.SAMPLES_PER_BATCH = batch
    cfg.INFERENCE.OUTPUT_ACT = ["sigmoid"]
    for key in cfg.AUGMENTOR:
        block = cfg.AUGMENTOR[key]
        if hasattr(block, "get") and block.get("ENABLED") is not None:
            block.ENABLED = False
    return cfg


def evaluate_checkpoint(cfg, ckpt_path, gt_seg):
    """Restore -> windowed inference -> bc_watershed -> rand/VOI/jaccard."""
    from pctrans_tpu.engine.legacy_trainer import LegacyTrainer
    from pctrans_tpu.inference.metrics_em import (adapted_rand,
                                                  get_binary_jaccard, voi)
    from pctrans_tpu.inference.postprocess_em import bc_watershed

    test_cfg = cfg.clone()
    test_cfg.defrost()
    test_cfg.DATASET.IMAGE_NAME = cfg.INFERENCE.IMAGE_NAME
    tr = LegacyTrainer(test_cfg, mode="test", checkpoint=ckpt_path)
    pred = tr.test(filename="em_pred.h5")  # [2, z, y, x] in [0, 1]
    vol = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
    seg = bc_watershed(vol, thres1=0.9, thres2=0.8, thres3=0.85,
                       thres_small=64, seed_thres=16)
    arand, prec, rec = adapted_rand(seg, gt_seg, all_stats=True)
    voi_split, voi_merge = voi(seg, gt_seg)
    jac = get_binary_jaccard(pred[0], (gt_seg > 0).astype(np.uint8),
                             thres=[0.5])[0]
    return {
        "adapted_rand": float(arand), "arand_precision": float(prec),
        "arand_recall": float(rec), "voi_split": float(voi_split),
        "voi_merge": float(voi_merge), "voi_sum": float(voi_split + voi_merge),
        "fg_jaccard_iou": float(jac[-1]), "n_pred_instances": int(seg.max()),
        "n_gt_instances": int(len(np.unique(gt_seg)) - 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--save-every", type=int, default=500)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--data-dir", default="outputs/synth_em_data")
    ap.add_argument("--work-dir", default="outputs/synth_em_r3")
    ap.add_argument("--record-dir", default="runs/synth_em_r3")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU shapes, 4 iters, no record")
    args = ap.parse_args()

    if args.smoke:
        # sitecustomize imports jax at startup with JAX_PLATFORMS=axon, so
        # the env var is too late — force the platform via jax.config
        # (same trick as tests/conftest.py).
        import jax
        jax.config.update("jax_platforms", "cpu")

    import h5py

    os.makedirs(args.data_dir, exist_ok=True)
    shapes = ((12, 64, 64), 12, (8, 48, 48), 6) if args.smoke else \
             ((40, 288, 288), 140, (32, 224, 224), 70)
    tr_shape, tr_cells, va_shape, va_cells = shapes
    paths = {n: os.path.join(args.data_dir, n + ".h5")
             for n in ("train_im", "train_seg", "val_im", "val_seg")}
    if not all(os.path.exists(p) for p in paths.values()):
        print("[synth-em] generating volumes ...", file=sys.stderr)
        tr_im, tr_seg = make_em_volume(tr_shape, tr_cells, seed=0)
        va_im, va_seg = make_em_volume(va_shape, va_cells, seed=1)
        for name, arr in (("train_im", tr_im), ("train_seg", tr_seg),
                          ("val_im", va_im), ("val_seg", va_seg)):
            with h5py.File(paths[name], "w") as f:
                f.create_dataset("main", data=arr, compression="gzip")

    with h5py.File(paths["val_seg"]) as f:
        gt_seg = f["main"][:]

    kw = dict(input_size=(8, 32, 32), filters=(8, 8, 8, 8, 8), batch=2) \
        if args.smoke else dict(batch=args.batch)
    cfg = build_cfg(args.data_dir, args.work_dir,
                    iters=4 if args.smoke else args.iters,
                    save_every=4 if args.smoke else args.save_every, **kw)

    if not args.eval_only:
        from pctrans_tpu.engine.legacy_trainer import LegacyTrainer
        t0 = time.time()
        tr = LegacyTrainer(cfg, mode="train")
        tr.train()
        tr.close()
        print(f"[synth-em] trained {cfg.SOLVER.ITERATION_TOTAL} iters in "
              f"{time.time() - t0:.0f}s", file=sys.stderr)

    # checkpoint sweep
    ckpts = sorted(d for d in os.listdir(args.work_dir)
                   if d.startswith("checkpoint_") and d[11:].isdigit())
    sweep = []
    for c in ckpts:
        it = int(c.split("_")[1])
        t0 = time.time()
        m = evaluate_checkpoint(cfg, os.path.join(args.work_dir, c), gt_seg)
        m["iter"] = it
        sweep.append(m)
        print(f"[synth-em] iter {it}: arand={m['adapted_rand']:.4f} "
              f"voi={m['voi_sum']:.4f} (split {m['voi_split']:.3f} / merge "
              f"{m['voi_merge']:.3f}) iou={m['fg_jaccard_iou']:.3f} "
              f"n_pred={m['n_pred_instances']}/{m['n_gt_instances']} "
              f"[{time.time() - t0:.0f}s]", file=sys.stderr)

    sweep_path = os.path.join(args.work_dir, "eval_sweep.json")
    with open(sweep_path, "w") as f:
        json.dump(sweep, f, indent=1)

    if args.smoke:
        print(json.dumps(sweep[-1]))
        return

    # commit-ready record dir (mirrors runs/synth_bbbc_r3 layout)
    os.makedirs(args.record_dir, exist_ok=True)
    for name in ("eval_sweep.json", "metrics.jsonl", "config.yaml"):
        src = os.path.join(args.work_dir, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(args.record_dir, name))
    with open(os.path.join(args.record_dir, "logging.txt"), "a") as f:
        for m in sweep:
            f.write(f"checkpoint_{m['iter']:06d} arand {m['adapted_rand']:.4f}"
                    f" voi {m['voi_sum']:.4f} iou {m['fg_jaccard_iou']:.4f}\n")
    print(json.dumps(sweep[-1]))


if __name__ == "__main__":
    main()
