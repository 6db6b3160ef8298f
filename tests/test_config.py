"""Config-system tests (pure python, no jax compiles).

Reference semantics: YACS merge_from_list raises on unknown keys
(connectomics/config/utils.py:30-38 merges --opts through YACS, which
errors on non-existent keys); YAML merges may introduce new keys only
for the documented maskformer add-on tree.
"""
import os

import pytest

from pctrans_tpu.config import get_cfg_defaults, load_cfg


class TestOptsStrictness:
    def test_unknown_opts_key_raises(self):
        cfg = get_cfg_defaults()
        with pytest.raises(KeyError, match="MONITOR.ITERATION_LOG"):
            cfg.merge_from_list(["MONITOR.ITERATION_LOG", "5"])

    def test_unknown_opts_section_raises(self):
        cfg = get_cfg_defaults()
        with pytest.raises(KeyError, match="NOPE.KEY"):
            cfg.merge_from_list(["NOPE.KEY", "1"])

    def test_known_opts_key_merges_and_coerces(self):
        cfg = get_cfg_defaults()
        cfg.merge_from_list(["SOLVER.BASE_LR", "0.01",
                             "SOLVER.ITERATION_TOTAL", "7"])
        assert cfg.SOLVER.BASE_LR == pytest.approx(0.01)
        assert cfg.SOLVER.ITERATION_TOTAL == 7

    def test_allow_new_escape_hatch(self):
        cfg = get_cfg_defaults()
        cfg.merge_from_list(["EXTRA.KEY", "1"], allow_new=True)
        assert cfg.EXTRA.KEY == 1


class TestReferenceYamls:
    @pytest.mark.parametrize("name", ["CVPPP", "BBBC"])
    @pytest.mark.skipif(not os.path.isdir("/root/reference/configs"),
                        reason="reference repo not present on this host")
    def test_reference_configs_load(self, name):
        cfg = load_cfg(
            f"/root/reference/configs/{name}/{name}-PCTrans-Base.yaml",
            f"/root/reference/configs/{name}/{name}-PCTrans.yaml",
        )
        assert cfg.MODEL.MASK_FORMER.HIDDEN_DIM == 128
        assert cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES == (
            100 if name == "CVPPP" else 300)

    def test_opts_after_yaml_merge(self):
        cfg = load_cfg("configs/CVPPP/CVPPP-PCTrans-Base.yaml",
                       "configs/CVPPP/CVPPP-PCTrans.yaml",
                       opts=["MODEL.MASK_FORMER.NUM_OBJECT_QUERIES", "64"],
                       freeze=True)
        assert cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES == 64

    @pytest.mark.parametrize("name", ["CVPPP", "BBBC"])
    def test_recipe_yaml_disables_remat(self, name):
        """The shipped recipes train no-remat (memory-analysis-backed:
        2.06/5.44 GB of 16 GB HBM at recipe shapes — BASELINE.md), and the
        value must reach ModelConfig as a real bool, not a YAML string."""
        from pctrans_tpu.models.pctrans import build_model_config

        cfg = load_cfg(f"configs/{name}/{name}-PCTrans-Base.yaml",
                       f"configs/{name}/{name}-PCTrans.yaml")
        mc = build_model_config(cfg)
        assert mc.remat is False
        # the global default stays the safe-for-any-shape setting
        assert build_model_config(get_cfg_defaults()).remat is True
