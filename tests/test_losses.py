"""Tests for targets, matcher, and the loss stack."""

import numpy as np
import pytest
from scipy.special import logsumexp

import jax
import jax.numpy as jnp

from pctrans_tpu.data.targets import targets_from_labels
from pctrans_tpu.losses.matcher import point_matcher_indices
from pctrans_tpu.losses.contrast import (
    cosine_similarity_matrix,
    pairwise_mask_dice,
    reid_losses_one_image,
)
from pctrans_tpu.losses.discriminative import discriminative_loss
from pctrans_tpu.losses.criterion import SetCriterion, CriterionConfig


class TestTargets:
    def test_padded_targets(self):
        label = np.zeros((1, 16, 16), np.int32)
        label[0, 2:6, 2:6] = 1      # 4x4 at rows 2-5, cols 2-5
        label[0, 10:12, 8:14] = 2   # 2x6
        t = targets_from_labels(jnp.array(label), max_instances=4)
        assert t["masks"].shape == (1, 4, 16, 16)
        np.testing.assert_array_equal(np.asarray(t["valid"]), [[True, True, False, False]])
        # center of instance 1: x = mean(2..5)=3.5, y=3.5; normalized by W=16
        np.testing.assert_allclose(np.asarray(t["center_points"][0, 0]), [3.5 / 16, 3.5 / 16])
        np.testing.assert_allclose(np.asarray(t["center_points"][0, 1]), [10.5 / 16, 10.5 / 16])
        assert np.asarray(t["fg_mask"]).sum() == 16 + 12
        np.testing.assert_array_equal(np.asarray(t["seg"][0]), label[0])


class TestMatcher:
    def test_obvious_assignment(self):
        H = W = 32
        G = 4
        Q = 6
        seg = np.zeros((1, H, W), np.int32)   # integer label map (id 1, 2)
        seg[0, :16, :16] = 1
        seg[0, 16:, 16:] = 2
        valid = np.array([[True, True, False, False]])
        pred = np.full((1, Q, H, W), -10.0, np.float32)
        pred[0, 2, :16, :16] = 10.0   # query 2 reproduces gt 0
        pred[0, 5, 16:, 16:] = 10.0   # query 5 reproduces gt 1
        q4g = point_matcher_indices(
            jax.random.key(0), jnp.array(pred), jnp.array(seg), jnp.array(valid), 512
        )
        q4g = np.asarray(q4g)
        assert q4g[0, 0] == 2
        assert q4g[0, 1] == 5
        # all assigned queries distinct
        assert len(set(q4g[0].tolist())) == G

    def test_dense_matches_point_matcher(self):
        """dense_matcher_indices agrees with the sampled matcher on
        well-separated costs (same estimator family, zero variance)."""
        from pctrans_tpu.losses.matcher import dense_matcher_indices
        from pctrans_tpu.ops.point_sample import sample_label_onehot_grid

        H = W = 32
        G, Q = 4, 6
        seg = np.zeros((1, H, W), np.int32)
        seg[0, :16, :16] = 1
        seg[0, 16:, 16:] = 2
        valid = np.array([[True, True, False, False]])
        pred = np.full((1, Q, H, W), -10.0, np.float32)
        pred[0, 2, :16, :16] = 10.0
        pred[0, 5, 16:, 16:] = 10.0
        tgt = sample_label_onehot_grid(jnp.array(seg), (H, W), G)
        q4g = np.asarray(dense_matcher_indices(
            jnp.array(pred), tgt.reshape(1, G, H * W), jnp.array(valid)))
        ref = np.asarray(point_matcher_indices(
            jax.random.key(0), jnp.array(pred), jnp.array(seg),
            jnp.array(valid), 512))
        assert q4g[0, 0] == ref[0, 0] == 2
        assert q4g[0, 1] == ref[0, 1] == 5
        assert len(set(q4g[0].tolist())) == G


def reid_oracle(query, emb_dist, mask_dice, q4g, valid):
    """Literal transcription of the reference's select_pos_neg_* + reid losses
    (mask2former_transformer_decoder.py:800-900, maskformer_criterion.py:
    318-383), with *all* negatives used for the aux term (callers construct
    cases where min(10*|pos|, |neg|) == |neg| so sampling is deterministic)."""
    Q = query.shape[0]
    pos_ids = [int(q4g[g]) for g in range(len(q4g)) if valid[g]]
    rest = [q for q in range(Q) if q not in pos_ids]
    clusters = {g: [] for g in range(len(q4g))}
    for q in rest:
        sims = [emb_dist[q, q4g[g]] if valid[g] else -np.inf for g in range(len(q4g))]
        clusters[int(np.argmax(sims))].append(q)
    cq = aq = cm = 0.0
    n_items = 0
    for g in range(len(q4g)):
        if not valid[g] or len(clusters[g]) == 0:
            continue
        n_items += 1
        key = int(q4g[g])
        pos = clusters[g]
        neg = [q for q in range(Q) if q not in pos and q != key]
        c = query @ query[key] / 2.0
        pairs = [c[n] - c[p] for p in pos for n in neg] + [0.0]
        cq += logsumexp(pairs)
        cos = emb_dist[key]
        errs = [(cos[p] - 1.0) ** 2 for p in pos] + [cos[n] ** 2 for n in neg]
        aq += np.mean(errs)
        dm = mask_dice[key] / 0.5
        pairs_m = [dm[n] - dm[p] for p in pos for n in neg] + [0.0]
        cm += logsumexp(pairs_m)
    return cq, aq, cm, n_items


class TestContrast:
    def test_matches_loop_oracle(self, rng):
        Q, G, C = 8, 3, 16
        # 2 valid gts -> 2 matched queries, 6 unmatched, |neg| <= 6 <= 10*|pos|
        query = rng.randn(Q, C).astype(np.float32)
        q4g = np.array([1, 4, 0])
        valid = np.array([True, True, False])
        masks = rng.randn(Q, 8, 8).astype(np.float32)
        emb_dist = np.asarray(cosine_similarity_matrix(jnp.array(query)))
        mask_dice = np.asarray(pairwise_mask_dice(jnp.array(masks)))

        cq, aq, cm, n = jax.jit(reid_losses_one_image)(
            jax.random.key(0), jnp.array(query), jnp.array(emb_dist),
            jnp.array(mask_dice), jnp.array(q4g), jnp.array(valid),
        )
        ocq, oaq, ocm, on = reid_oracle(query, emb_dist, mask_dice, q4g, valid)
        assert int(n) == on
        assert float(cq) == pytest.approx(ocq, rel=1e-4)
        assert float(aq) == pytest.approx(oaq, rel=1e-4)
        assert float(cm) == pytest.approx(ocm, rel=1e-4)

    def test_no_valid_gt(self, rng):
        Q, G, C = 6, 3, 8
        query = rng.randn(Q, C).astype(np.float32)
        emb_dist = np.asarray(cosine_similarity_matrix(jnp.array(query)))
        masks = rng.randn(Q, 4, 4).astype(np.float32)
        mask_dice = np.asarray(pairwise_mask_dice(jnp.array(masks)))
        cq, aq, cm, n = reid_losses_one_image(
            jax.random.key(0), jnp.array(query), jnp.array(emb_dist),
            jnp.array(mask_dice), jnp.zeros(G, jnp.int32),
            jnp.zeros(G, bool),
        )
        assert int(n) == 0 and float(cq) == 0 and float(cm) == 0


class TestDiscriminative:
    def test_pull_and_push_terms(self):
        # two instances with constant distinct embeddings, far apart
        emb = np.zeros((1, 8, 8, 2), np.float32)
        seg = np.zeros((1, 8, 8), np.int32)
        seg[0, :4] = 1
        seg[0, 4:] = 2
        emb[0, :4] = [0.0, 0.0]
        emb[0, 4:] = [10.0, 0.0]
        loss = discriminative_loss(jnp.array(emb), jnp.array(seg), max_instances=4)
        # pull: ||e - mu|| = 0 -> (0 - 0.5)^2 = 0.25 per instance
        # push: dist 10 > delta_d=3 -> 0
        # reg: 0.001 * mean(0, 10) = 0.005
        assert float(loss) == pytest.approx(0.25 + 0.005, abs=1e-5)

    def test_close_instances_pushed(self):
        emb = np.zeros((1, 8, 8, 2), np.float32)
        seg = np.zeros((1, 8, 8), np.int32)
        seg[0, :4] = 1
        seg[0, 4:] = 2
        emb[0, 4:] = [1.0, 0.0]  # centroids 1 apart < delta_d=3
        loss = discriminative_loss(jnp.array(emb), jnp.array(seg), max_instances=4)
        # dist term: relu(3-1)^2 summed over 2 ordered pairs / (2*1) / 2 = 4/2/... = 2? :
        # hinge matrix has (1,2) and (2,1) entries = 4 each -> sum 8 / 2 / 2 = 2
        assert float(loss) == pytest.approx(0.25 + 2.0 + 0.001 * 0.5, abs=1e-5)

    def test_empty_image(self):
        emb = np.random.randn(1, 8, 8, 4).astype(np.float32)
        seg = np.zeros((1, 8, 8), np.int32)
        loss = discriminative_loss(jnp.array(emb), jnp.array(seg), max_instances=4)
        assert float(loss) == 0.0


class TestCriterion:
    def _fake_outputs(self, rng, B=1, Q=6, h=16, w=16, C=8, L=3):
        mk = lambda: jnp.array(rng.randn(B, Q, h, w).astype(np.float32))
        return {
            "pred_masks": mk(),
            "aux_masks": [mk() for _ in range(L - 1)],
            "reference_points": jnp.array(rng.rand(B, Q, 2).astype(np.float32)),
            "aux_reference_points": [
                jnp.array(rng.rand(B, Q, 2).astype(np.float32)) for _ in range(L - 2)
            ],
            "query_emb": jnp.array(rng.randn(B, Q, C).astype(np.float32)),
            "sem_mask": jnp.array(rng.randn(B, 8, 8, 1).astype(np.float32)),
            "mask_features": jnp.array(rng.randn(B, 8, 8, C).astype(np.float32)),
        }

    def test_criterion_runs_and_is_finite(self, rng):
        label = np.zeros((1, 32, 32), np.int32)
        label[0, 2:10, 2:10] = 1
        label[0, 20:30, 20:30] = 2
        targets = targets_from_labels(jnp.array(label), max_instances=4)
        outputs = self._fake_outputs(rng, h=16, w=16)
        # exact_targets: the 32^2 toy masks are too small for the strided
        # target approximation used at production scale
        crit = SetCriterion(CriterionConfig(num_points=256, dec_layers=3,
                                            exact_targets=True))
        total, losses = jax.jit(crit.__call__)(jax.random.key(0), outputs, targets)
        assert np.isfinite(float(total))
        expected = {
            "loss_mask", "loss_dice", "loss_mask_0", "loss_dice_0",
            "loss_mask_1", "loss_dice_1", "loss_refpoints", "loss_refpoints_1",
            "loss_reid_query", "loss_reid_query_aux", "loss_reid_mask",
            "loss_sem", "loss_emb",
        }
        assert expected == set(losses.keys())
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_point_select_paths_agree_in_expectation(self, rng):
        """shared / weighted / topk / exact are the same estimator family:
        with a large point budget the mask losses must agree closely."""
        label = np.zeros((1, 64, 64), np.int32)
        label[0, 8:28, 8:28] = 1
        label[0, 36:60, 36:60] = 2
        targets = targets_from_labels(jnp.array(label), max_instances=4)
        outputs = self._fake_outputs(rng, h=16, w=16)
        vals = {}
        for mode in ("dense", "shared", "weighted", "topk", "exact"):
            crit = SetCriterion(CriterionConfig(
                num_points=2048, dec_layers=3, exact_targets=True,
                point_select=mode, sample_dtype="float32"))
            _, losses = jax.jit(crit.__call__)(
                jax.random.key(3), outputs, targets)
            vals[mode] = (float(losses["loss_mask"]),
                          float(losses["loss_dice"]))
        ce_ref, dice_ref = vals["exact"]
        for mode in ("dense", "shared", "weighted", "topk"):
            ce, dice = vals[mode]
            assert abs(ce - ce_ref) < 0.15 * abs(ce_ref) + 0.05, (mode, vals)
            assert abs(dice - dice_ref) < 0.15 * abs(dice_ref) + 0.05, (mode, vals)

    def test_perfect_prediction_beats_random(self, rng):
        """Uncertainty sampling concentrates points on mask boundaries, so a
        perfect prediction still has nonzero point-sampled BCE — but it must
        be much lower than a random prediction, and matched refpoints exact."""
        label = np.zeros((1, 32, 32), np.int32)
        label[0, 2:10, 2:10] = 1
        label[0, 20:30, 20:30] = 2
        targets = targets_from_labels(jnp.array(label), max_instances=4)
        # exact_targets: the 32^2 toy masks are too small for the strided
        # target approximation used at production scale
        crit = SetCriterion(CriterionConfig(num_points=256, dec_layers=3,
                                            exact_targets=True))

        outputs = self._fake_outputs(rng, h=32, w=32)
        _, losses_rand = crit(jax.random.key(0), outputs, targets)

        pm = np.full((1, 6, 32, 32), -20.0, np.float32)
        pm[0, 0][label[0] == 1] = 20.0
        pm[0, 1][label[0] == 2] = 20.0
        outputs["pred_masks"] = jnp.array(pm)
        rp = np.asarray(outputs["reference_points"]).copy()
        rp[0, 0] = np.asarray(targets["center_points"][0, 0])
        rp[0, 1] = np.asarray(targets["center_points"][0, 1])
        outputs["reference_points"] = jnp.array(rp)
        _, losses = crit(jax.random.key(0), outputs, targets)

        assert float(losses["loss_mask"]) < 0.3 * float(losses_rand["loss_mask"])
        assert float(losses["loss_dice"]) < 0.3 * float(losses_rand["loss_dice"])
        assert float(losses["loss_refpoints"]) < 1e-6

    def test_gradients_flow(self, rng):
        label = np.zeros((1, 32, 32), np.int32)
        label[0, 4:12, 4:12] = 1
        targets = targets_from_labels(jnp.array(label), max_instances=4)
        outputs = self._fake_outputs(rng, h=16, w=16)
        crit = SetCriterion(CriterionConfig(num_points=128, dec_layers=3))

        def f(pm):
            o = dict(outputs)
            o["pred_masks"] = pm
            total, _ = crit(jax.random.key(0), o, targets)
            return total

        g = jax.grad(f)(outputs["pred_masks"])
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestUncertainPointWeights:
    def test_mass_matches_reference_split(self):
        """The weight field must carry imp*N mass on the selected (most
        uncertain) candidates PLUS a (1-imp)*N/P uniform fill share on every
        candidate — the reference's fresh-uniform fill covers the whole
        domain, including the uncertain region."""
        from pctrans_tpu.ops.point_sample import uncertain_point_weights

        rng = jax.random.key(0)
        logits = jnp.asarray(
            np.random.RandomState(0).randn(3, 1, 16, 16), jnp.float32)
        N, over, imp = 256, 3.0, 0.75
        cx, cy, w = uncertain_point_weights(rng, logits, N, over, imp)
        P = int(N * over)
        assert w.shape == (3, P)
        # total mass == num_points
        np.testing.assert_allclose(np.asarray(w.sum(-1)), N, rtol=1e-5)
        # every candidate carries at least the uniform fill share
        fill = (1 - imp) * N / P
        assert float(w.min()) >= fill - 1e-6
        # selected mass (above-fill part) == imp*N
        extra = np.asarray(w) - fill
        np.testing.assert_allclose(extra.sum(-1), imp * N, rtol=1e-2)


class TestFgContourConsistency:
    def test_window_sizes_keep_shape(self):
        from pctrans_tpu.losses.legacy import FgContourConsistency

        rs = np.random.RandomState(0)
        p1 = jnp.asarray(rs.randn(1, 1, 2, 12, 12), jnp.float32)
        p2 = jnp.asarray(rs.randn(1, 1, 2, 12, 12), jnp.float32)
        for tsz_h in (1, 2, 3):
            loss = FgContourConsistency(tsz_h=tsz_h)(p1, p2)
            assert np.isfinite(float(loss)), tsz_h
