"""Legacy loss zoo tests: numerical parity with torch transcriptions of the
reference formulas (model/loss/loss.py, regularization.py) plus the
multi-target Criterion smoke test mirroring the reference's own
tests/test_loss_functions.py:8-25 (loss > 0 over a TARGET_OPT mix)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pctrans_tpu.losses.legacy import (
    BinaryReg,
    ContourDTConsistency,
    DiceLoss,
    ForegroundDTConsistency,
    GANLoss,
    LegacyCriterion,
    NonoverlapReg,
    SplitActivation,
    WeightedBCE,
    WeightedBCEFocalLoss,
    WeightedBCEWithLogitsLoss,
    WeightedCE,
    WeightedLS,
    WeightedMAE,
    WeightedMSE,
    WSDiceLoss,
)

RS = np.random.RandomState(0)
PRED = RS.randn(2, 3, 8, 8).astype(np.float32)
PROB = 1 / (1 + np.exp(-PRED))
TGT = (RS.rand(2, 3, 8, 8) > 0.5).astype(np.float32)
W = RS.rand(2, 3, 8, 8).astype(np.float32)


def t(x):
    return torch.from_numpy(np.asarray(x))


class TestLossParity:
    def test_weighted_mse(self):
        ours = float(WeightedMSE()(jnp.asarray(PRED), jnp.asarray(TGT),
                                   jnp.asarray(W)))
        spatial = np.prod(PRED.shape[2:])
        ref = float((t(W) * (t(PRED) - t(TGT)) ** 2).sum()
                    / (spatial * PRED.shape[0]))
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_weighted_mae(self):
        ours = float(WeightedMAE()(jnp.asarray(PRED), jnp.asarray(TGT),
                                   jnp.asarray(W)))
        ref = float((F.l1_loss(t(PRED), t(TGT), reduction="none") * t(W)).mean())
        assert ours == pytest.approx(ref, rel=1e-5)

    def test_weighted_bce(self):
        ours = float(WeightedBCE()(jnp.asarray(PROB), jnp.asarray(TGT),
                                   jnp.asarray(W)))
        ref = float(F.binary_cross_entropy(t(PROB), t(TGT), t(W)))
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_weighted_bce_with_logits(self):
        ours = float(WeightedBCEWithLogitsLoss()(
            jnp.asarray(PRED), jnp.asarray(TGT), jnp.asarray(W)))
        ref = float(F.binary_cross_entropy_with_logits(t(PRED), t(TGT), t(W)))
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_dice(self):
        ours = float(DiceLoss()(jnp.asarray(PROB), jnp.asarray(TGT)))
        # literal transcription of loss.py:20-35
        loss = 0.0
        for b in range(PROB.shape[0]):
            i = PROB[b].reshape(-1)
            tt = TGT[b].reshape(-1)
            inter = (i * tt).sum()
            loss += 1 - (2 * inter + 100.0) / (i.sum() + tt.sum() + 100.0)
        assert ours == pytest.approx(loss / PROB.shape[0], rel=1e-5)

    def test_ws_dice(self):
        ours = float(WSDiceLoss()(jnp.asarray(PROB), jnp.asarray(TGT)))
        p = t(PROB).reshape(2, -1)
        g_t = t(TGT).reshape(2, -1)
        wt = g_t * 0.7 + 0.15
        gp, g = wt * (2 * p - 1), wt * (2 * g_t - 1)
        inter = (gp * g).sum(-1)
        ref = float((1 - (2 * inter + 100.0)
                     / ((gp ** 2).sum(-1) + (g ** 2).sum(-1) + 100.0)).mean())
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_weighted_ce(self):
        pred = RS.randn(2, 4, 8, 8).astype(np.float32)
        target = RS.randint(0, 4, (2, 8, 8))
        wm = RS.rand(2, 8, 8).astype(np.float32)
        ours = float(WeightedCE()(jnp.asarray(pred), jnp.asarray(target),
                                  jnp.asarray(wm)))
        ref = float((F.cross_entropy(t(pred), t(target).long(),
                                     reduction="none") * t(wm)).mean())
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_weighted_ls(self):
        pred = RS.randn(2, 4, 8, 8).astype(np.float32)
        target = RS.randint(0, 4, (2, 8, 8))
        ours = float(WeightedLS(classes=4)(jnp.asarray(pred),
                                           jnp.asarray(target)))
        # transcription of loss.py:162-176
        logp = F.log_softmax(t(pred), 1)
        true = torch.zeros_like(logp).fill_(0.2 / 3)
        true.scatter_(1, t(target).long().unsqueeze(1), 0.8)
        ref = float(torch.sum(-true * logp, dim=1).mean())
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_focal(self):
        ours = float(WeightedBCEFocalLoss()(jnp.asarray(PRED), jnp.asarray(TGT),
                                            jnp.asarray(W)))
        ps = t(PRED).sigmoid()
        pt = (1 - t(TGT)) * (1 - ps) + t(TGT) * ps
        at = 0.75 * t(TGT) + 0.25 * (1 - t(TGT))
        wt = at * (1 - pt) ** 2 * t(W)
        bce = F.binary_cross_entropy_with_logits(t(PRED), t(TGT),
                                                 reduction="none")
        assert ours == pytest.approx(float((wt * bce).mean()), rel=1e-4)

    @pytest.mark.parametrize("mode", ["lsgan", "vanilla", "wgangp"])
    def test_gan(self, mode):
        pred = RS.randn(4, 1).astype(np.float32)
        gan = GANLoss(mode)
        for real in (True, False):
            ours = float(gan(jnp.asarray(pred), real))
            if mode == "lsgan":
                ref = float(((t(pred) - (1.0 if real else 0.0)) ** 2).mean())
            elif mode == "vanilla":
                ref = float(F.binary_cross_entropy_with_logits(
                    t(pred), torch.full_like(t(pred), 1.0 if real else 0.0)))
            else:
                ref = float(-t(pred).mean() if real else t(pred).mean())
            assert ours == pytest.approx(ref, rel=1e-4)


class TestRegularizers:
    def test_binary_reg(self):
        ours = float(BinaryReg()(jnp.asarray(PRED)))
        diff = (t(PRED).sigmoid() - 0.5).abs().clamp(min=1e-2)
        assert ours == pytest.approx(float((1.0 / diff).mean()), rel=1e-4)

    def test_fg_dt_consistency(self):
        p2 = RS.randn(*PRED.shape).astype(np.float32)
        ours = float(ForegroundDTConsistency()(jnp.asarray(PRED),
                                               jnp.asarray(p2)))
        lp = F.logsigmoid(t(PRED))
        ln = F.logsigmoid(-t(PRED))
        d = torch.tanh(t(p2))
        ref = float((-lp * d.clamp(min=0) - ln * (-d.clamp(max=0))).mean())
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_contour_dt(self):
        p2 = RS.randn(*PRED.shape).astype(np.float32)
        ours = float(ContourDTConsistency()(jnp.asarray(PRED), jnp.asarray(p2)))
        ref = float(((t(PRED).sigmoid() * torch.tanh(t(p2)).abs()) ** 2).mean())
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_nonoverlap(self):
        pred = RS.randn(2, 3, 4, 8, 8).astype(np.float32)
        ours = float(NonoverlapReg()(jnp.asarray(pred)))
        p = t(pred)
        ref = float((p[:, 0].sigmoid() * p[:, 1].sigmoid()
                     * p[:, 2].detach().sigmoid()).mean())
        assert ours == pytest.approx(ref, rel=1e-4)


class TestSplitAndCriterion:
    def test_split_channels(self):
        sp = SplitActivation(["0", "2", "all"], split_only=True, do_2d=True)
        assert sp.split_channels == [1, 2, -1]
        x = jnp.zeros((2, 7, 8, 8))
        parts = sp(x)
        assert [p.shape[1] for p in parts] == [1, 2, 4]

    def test_criterion_smoke(self):
        """Reference tests/test_loss_functions.py:8-25: multi-target loss on
        random data is positive and finite."""
        crit = LegacyCriterion(
            target_opt=["0", "4"],
            loss_opt=[["WeightedBCEWithLogitsLoss", "DiceLoss"],
                      ["WeightedBCEWithLogitsLoss"]],
            output_act=[["none", "sigmoid"], ["none"]],
            loss_weight=[[1.0, 0.5], [1.0]],
            regu_opt=["Binary"], regu_target=[[0]], regu_weight=[0.1],
        )
        pred = jnp.asarray(RS.randn(2, 2, 16, 16).astype(np.float32))
        tgts = [jnp.asarray((RS.rand(2, 1, 16, 16) > 0.5).astype(np.float32))
                for _ in range(2)]
        weights = [[None, None], [None]]
        loss, vis = crit(pred, tgts, weights)
        assert float(loss) > 0 and np.isfinite(float(loss))
        assert len(vis) == 4  # three loss terms + one regularizer
