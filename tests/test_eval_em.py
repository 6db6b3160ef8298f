"""EM benchmark eval wrappers + multicut baseline."""
import numpy as np

from pctrans_tpu.inference.eval_em import (
    CleftsEval, eval_binary_volume, eval_instance_volume, eval_synapse,
)
from pctrans_tpu.inference.postprocess_em import mc_baseline


def _two_instance_volume():
    gt = np.zeros((4, 32, 32), np.uint32)
    gt[:, 4:14, 4:28] = 1
    gt[:, 18:28, 4:28] = 2
    return gt


class TestEvalInstanceVolume:
    def test_perfect_prediction_scores_zero(self, tmp_path):
        gt = _two_instance_volume()
        pred = gt.copy()
        pred[pred == 1] = 7  # relabeled but identical partition
        vs, vm, vsum, arand = eval_instance_volume(
            gt, pred, output_txt=str(tmp_path / "log.txt"), tag="t")
        assert vsum < 1e-6 and arand < 1e-6
        assert (tmp_path / "log.txt").read_text().startswith("t\n")

    def test_merge_error_increases_voi_merge(self):
        gt = _two_instance_volume()
        pred = (gt > 0).astype(np.uint32)  # both instances merged
        vs, vm, vsum, arand = eval_instance_volume(gt, pred)
        assert vm > 0.1 and arand > 0.1


class TestClefts:
    def test_perfect_cleft_prediction(self):
        truth = np.zeros((2, 16, 16), np.uint8)
        truth[:, 4:8, 4:8] = 1
        s = eval_synapse(truth * 255, truth)
        assert s["false_positive_rate"] == 0.0
        assert s["false_negative_rate"] == 0.0
        assert s["f1"] == 1.0
        assert s["CRIME_score"] == 0.0

    def test_distant_false_positive_counted(self):
        truth = np.zeros((1, 32, 32), np.uint8)
        truth[0, 2:4, 2:4] = 1
        pred = np.zeros_like(truth)
        pred[0, 28:30, 28:30] = 1  # far from any true cleft (>200nm at 4nm/px)
        ev = CleftsEval(pred, truth)
        assert ev.count_false_positives(threshold=50.0) == 4
        assert ev.summary()["ADGT"] > 50.0

    def test_binary_volume_iou(self):
        gt = _two_instance_volume()
        assert eval_binary_volume((gt > 0).astype(np.float32), gt)[0, 0] > 0.99


class TestMulticutBaseline:
    def test_two_blobs_from_affinities(self):
        # boundary wall between two halves -> 2 instances
        aff = np.ones((2, 2, 32, 32), np.float32)
        aff[:, :, :, 15:17] = 0.0  # low affinity = boundary
        seg = mc_baseline(aff, merge_thres=0.5)
        fg_ids = np.unique(seg[seg > 0])
        assert len(fg_ids) >= 2
        # left and right halves carry different labels
        left = seg[:, :, :12]
        right = seg[:, :, 20:]
        l_ids = set(np.unique(left[left > 0]))
        r_ids = set(np.unique(right[right > 0]))
        assert l_ids and r_ids and not (l_ids & r_ids)

    def test_high_merge_threshold_joins_everything(self):
        aff = np.ones((2, 2, 16, 16), np.float32)
        aff[:, :, :, 7:9] = 0.6  # weak boundary
        seg_strict = mc_baseline(aff, merge_thres=0.1)
        seg_loose = mc_baseline(aff, merge_thres=0.99)
        n_loose = len(np.unique(seg_loose[seg_loose > 0]))
        n_strict = len(np.unique(seg_strict[seg_strict > 0]))
        assert n_loose <= n_strict
