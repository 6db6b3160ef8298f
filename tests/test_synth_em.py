"""Synthetic-EM fixture + postprocess/metric chain oracle.

The synth-EM runner (tools_dev/synth_em_run.py) is the legacy volumetric
path's end-to-end learning harness (reference protocol:
connectomics/utils/process.py:290-333 bc_watershed, utils/evaluate.py
adapted Rand / VOI).  This test proves the chain is self-consistent:
feeding bc_watershed the IDEAL probability maps derived from the GT must
recover the GT instances to near-zero Rand error — so a trained model's
score reflects the model, not a broken fixture or postprocess.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools_dev"))


class TestSynthEMChain:
    def _volume(self):
        from synth_em_run import make_em_volume

        return make_em_volume(shape=(12, 96, 96), n_cells=14, seed=3)

    def test_generator_properties(self):
        img, seg = self._volume()
        assert img.dtype == np.uint8 and seg.dtype == np.uint32
        assert img.shape == seg.shape == (12, 96, 96)
        labels = np.unique(seg)
        assert labels[0] == 0                  # carved membranes
        assert len(labels) >= 10               # most cells survive carving
        # membranes are dark relative to cell interiors
        assert img[seg == 0].mean() < img[seg > 0].mean() - 20
        # deterministic by seed
        img2, seg2 = self._volume()
        assert np.array_equal(img, img2) and np.array_equal(seg, seg2)

    def test_ideal_probs_recover_gt(self):
        from pctrans_tpu.data.seg_targets import seg_to_targets
        from pctrans_tpu.inference.metrics_em import adapted_rand, voi
        from pctrans_tpu.inference.postprocess_em import bc_watershed

        _, seg = self._volume()
        targets = seg_to_targets(seg.astype(np.int64), ["0", "4-1-1"])
        semantic, boundary = targets[0][0], targets[1][0]
        vol = (np.stack([semantic, boundary]) * 255).astype(np.uint8)
        pred = bc_watershed(vol, thres1=0.9, thres2=0.8, thres3=0.85,
                            thres_small=64, seed_thres=16)
        arand = adapted_rand(pred, seg)
        voi_split, voi_merge = voi(pred, seg)
        assert arand < 0.05, arand
        assert voi_split + voi_merge < 0.35, (voi_split, voi_merge)
