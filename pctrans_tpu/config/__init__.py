"""Config subsystem (reference: connectomics/config/)."""

import os
from typing import List, Optional

from .node import CfgNode
from .defaults import get_cfg_defaults

__all__ = [
    "CfgNode",
    "get_cfg_defaults",
    "load_cfg",
    "save_all_cfg",
    "update_inference_cfg",
    "overwrite_cfg",
]


def load_cfg(
    config_base: Optional[str] = None,
    config_file: Optional[str] = None,
    opts: Optional[List[str]] = None,
    freeze: bool = True,
) -> CfgNode:
    """Merge defaults -> base yaml -> experiment yaml -> CLI opts.

    Mirrors the reference merge order (connectomics/config/utils.py:9-39).
    """
    cfg = get_cfg_defaults()
    if config_base:
        cfg.merge_from_file(config_base)
    if config_file:
        cfg.merge_from_file(config_file)
    if opts:
        cfg.merge_from_list(list(opts))
    if freeze:
        cfg.freeze()
    return cfg


def update_inference_cfg(cfg: CfgNode) -> CfgNode:
    """Apply inference-time overrides (reference: config/utils.py:53-120):
    the INFERENCE.* knobs overwrite their DATASET/MODEL counterparts so the
    test volume, window size and padding can differ from training."""
    cfg = cfg.clone().defrost()
    if cfg.INFERENCE.INPUT_PATH:
        cfg.DATASET.INPUT_PATH = cfg.INFERENCE.INPUT_PATH
    if cfg.INFERENCE.IMAGE_NAME:
        cfg.DATASET.IMAGE_NAME = cfg.INFERENCE.IMAGE_NAME
    if cfg.INFERENCE.OUTPUT_PATH:
        cfg.DATASET.OUTPUT_PATH = cfg.INFERENCE.OUTPUT_PATH
    if cfg.INFERENCE.PAD_SIZE is not None:
        cfg.DATASET.PAD_SIZE = cfg.INFERENCE.PAD_SIZE
    if cfg.INFERENCE.get("INPUT_SIZE", None):
        cfg.MODEL.INPUT_SIZE = cfg.INFERENCE.INPUT_SIZE
    if cfg.INFERENCE.get("OUTPUT_SIZE", None):
        cfg.MODEL.OUTPUT_SIZE = cfg.INFERENCE.OUTPUT_SIZE
    cfg.SOLVER.SAMPLES_PER_BATCH = cfg.INFERENCE.SAMPLES_PER_BATCH
    return cfg


def overwrite_cfg(cfg: CfgNode, key: str, value) -> None:
    cfg.merge_from_list([key, value])


def save_all_cfg(cfg: CfgNode, output_dir: str) -> str:
    """Persist the merged config to the run directory (config/utils.py:42-50)."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "config.yaml")
    cfg.save(path)
    return path
