"""Kernel-level tests, in the spirit of the reference's ops/test.py harness:
dual implementation (JAX op vs torch public-API oracle), tolerance ladder,
and gradient checks.
"""

import numpy as np
import pytest
import scipy.optimize

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from pctrans_tpu.ops import (
    grid_sample_bilinear,
    point_sample,
    linear_sum_assignment,
    ms_deform_attn_core,
    resize_bilinear,
    resize_nearest_torch,
)
from pctrans_tpu.ops.lap import match_padded, solve_lap


# ------------------------------------------------------------- point sample
class TestPointSample:
    def test_hat_matches_gather_formulation(self, rng):
        from pctrans_tpu.ops.point_sample import grid_sample_bilinear_gather

        img = rng.randn(2, 3, 9, 11).astype(np.float32)
        x = (rng.rand(2, 37) * 13 - 1.5).astype(np.float32)
        y = (rng.rand(2, 37) * 11 - 1.5).astype(np.float32)
        hat = np.asarray(grid_sample_bilinear(jnp.array(img), jnp.array(x), jnp.array(y),
                                              chunk=16))
        gat = np.asarray(grid_sample_bilinear_gather(jnp.array(img), jnp.array(x), jnp.array(y)))
        np.testing.assert_allclose(hat, gat, rtol=1e-5, atol=1e-6)

    def test_label_onehot_grid_matches_point_sample(self, rng):
        """sample_label_onehot_grid == point_sample of the one-hot masks at
        the grid's pixel-center coords (the dense criterion's GT side)."""
        from pctrans_tpu.ops.point_sample import (point_sample,
                                                  sample_label_onehot_grid)

        B, H, W, G, h, w = 2, 20, 24, 3, 5, 6
        seg = (rng.rand(B, H, W) * (G + 1)).astype(np.int32)
        onehot = np.stack([(seg == g + 1).astype(np.float32)
                           for g in range(G)], axis=1)  # [B, G, H, W]
        xs = (np.arange(w) + 0.5) / w
        ys = (np.arange(h) + 0.5) / h
        gx, gy = np.meshgrid(xs, ys)  # [h, w]
        coords = np.stack([gx.ravel(), gy.ravel()], -1)[None].repeat(B, 0)
        ref = np.asarray(point_sample(jnp.array(onehot), jnp.array(
            coords.astype(np.float32))))  # [B, G, h*w]
        out = np.asarray(sample_label_onehot_grid(jnp.array(seg), (h, w), G))
        np.testing.assert_allclose(out.reshape(B, G, h * w), ref,
                                   rtol=1e-5, atol=1e-6)

    def test_matches_torch_grid_sample(self, rng):
        B, C, H, W = 2, 3, 13, 17
        P = 50
        img = rng.randn(B, C, H, W).astype(np.float32)
        coords = rng.rand(B, P, 2).astype(np.float32)  # in [0,1], (x, y)

        ours = point_sample(jnp.array(img), jnp.array(coords))

        grid = torch.from_numpy(2 * coords - 1).unsqueeze(2)  # [B, P, 1, 2]
        ref = F.grid_sample(
            torch.from_numpy(img), grid, mode="bilinear",
            padding_mode="zeros", align_corners=False,
        ).squeeze(3)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5, atol=1e-5)

    def test_out_of_bounds_points(self, rng):
        img = rng.randn(1, 1, 8, 8).astype(np.float32)
        coords = np.array([[[-0.5, -0.5], [1.5, 1.5], [0.5, 0.5]]], np.float32)
        ours = np.asarray(point_sample(jnp.array(img), jnp.array(coords)))
        grid = torch.from_numpy(2 * coords - 1).unsqueeze(2)
        ref = F.grid_sample(torch.from_numpy(img), grid, mode="bilinear",
                            padding_mode="zeros", align_corners=False).squeeze(3)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-6)

    def test_gradients_flow(self, rng):
        img = jnp.array(rng.randn(1, 1, 8, 8).astype(np.float32))
        coords = jnp.array(rng.rand(1, 5, 2).astype(np.float32))
        g = jax.grad(lambda im: point_sample(im, coords).sum())(img)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


# ------------------------------------------------------------------ resize
class TestResize:
    def test_bilinear_matches_torch(self, rng):
        x = rng.randn(2, 4, 14, 10).astype(np.float32)
        for size in [(28, 20), (7, 5), (30, 17)]:
            ours = np.asarray(resize_bilinear(jnp.array(x), size))
            ref = F.interpolate(torch.from_numpy(x), size=size, mode="bilinear",
                                align_corners=False).numpy()
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_nearest_matches_torch(self, rng):
        x = rng.randn(1, 2, 9, 11).astype(np.float32)
        for size in [(18, 22), (5, 6), (4, 4)]:
            ours = np.asarray(resize_nearest_torch(jnp.array(x), size))
            ref = F.interpolate(torch.from_numpy(x), size=size, mode="nearest").numpy()
            np.testing.assert_array_equal(ours, ref)


# --------------------------------------------------------------------- LAP
class TestLAP:
    def test_matches_scipy_total_cost(self, rng):
        # fixed shape ladder (1 compile each) instead of 20 random shapes:
        # covers the degenerate single-row case, square, near-square, and
        # wide rectangles — same coverage, ~1/3 of the solver compiles
        shapes = [(1, 1), (1, 7), (3, 3), (5, 6), (7, 19), (11, 12)]
        for trial, (R, C) in enumerate(shapes):
            cost = rng.randn(R, C).astype(np.float32) * 10
            rows, cols = linear_sum_assignment(jnp.array(cost))
            srows, scols = scipy.optimize.linear_sum_assignment(cost)
            ours = cost[np.asarray(rows), np.asarray(cols)].sum()
            ref = cost[srows, scols].sum()
            assert ours == pytest.approx(ref, abs=1e-3), f"trial {trial}"
            # assignment must be a valid matching
            assert len(set(np.asarray(cols).tolist())) == R

    def test_transposed_shape(self, rng):
        cost = rng.randn(10, 4).astype(np.float32)  # queries x gt, like the matcher
        rows, cols = linear_sum_assignment(jnp.array(cost))
        srows, scols = scipy.optimize.linear_sum_assignment(cost)
        assert cost[np.asarray(rows), np.asarray(cols)].sum() == pytest.approx(
            cost[srows, scols].sum(), abs=1e-3
        )
        # scipy contract: for R > C, row_ind is sorted ascending
        assert (np.diff(np.asarray(rows)) > 0).all()

    def test_match_padded_ignores_invalid(self, rng):
        Q, G = 12, 6
        cost = rng.randn(Q, G).astype(np.float32)
        valid = np.array([True, True, True, False, False, False])
        q4g = np.asarray(match_padded(jnp.array(cost), jnp.array(valid)))
        # compare against scipy on the valid sub-problem
        sub = cost[:, :3]
        srows, scols = scipy.optimize.linear_sum_assignment(sub.T)
        ref_total = sub.T[srows, scols].sum()
        ours_total = sum(cost[q4g[g], g] for g in range(3))
        assert ours_total == pytest.approx(ref_total, abs=1e-3)
        # all assigned queries distinct (including padding slots)
        assert len(set(q4g.tolist())) == G

    def test_jit_and_vmap(self, rng):
        costs = rng.randn(4, 5, 9).astype(np.float32)  # batch of [5, 9]
        f = jax.jit(jax.vmap(solve_lap))
        out = np.asarray(f(jnp.array(costs)))
        for b in range(4):
            srows, scols = scipy.optimize.linear_sum_assignment(costs[b])
            assert costs[b][np.arange(5), out[b]].sum() == pytest.approx(
                costs[b][srows, scols].sum(), abs=1e-3
            )


# ------------------------------------------------------------- ms-deform-attn
def msda_torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent torch oracle: per level grid_sample + softmax-weighted sum."""
    value = torch.from_numpy(value)
    locs = torch.from_numpy(sampling_locations)
    attn = torch.from_numpy(attention_weights)
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = locs.shape
    out = torch.zeros(B, Lq, M, D, dtype=value.dtype)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]                      # [B, HW, M, D]
        v = v.permute(0, 2, 3, 1).reshape(B * M, D, H, W)
        g = 2 * locs[:, :, :, lid] - 1                           # [B, Lq, M, P, 2]
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)                   # [B*M, D, Lq, P]
        s = s.reshape(B, M, D, Lq, P).permute(0, 3, 1, 4, 2)     # [B, Lq, M, P, D]
        out += (s * attn[:, :, :, lid, :, None]).sum(dim=3)
        start += H * W
    return out.reshape(B, Lq, M * D).numpy()


class TestMSDeformAttn:
    def _random_inputs(self, rng, B=2, M=4, D=8, Lq=7, P=3):
        shapes = [(6, 8), (3, 4), (2, 2)]
        S = sum(h * w for h, w in shapes)
        L = len(shapes)
        value = rng.randn(B, S, M, D).astype(np.float32)
        locs = rng.rand(B, Lq, M, L, P, 2).astype(np.float32) * 1.2 - 0.1
        attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
        attn = attn / attn.sum(axis=(3, 4), keepdims=True)
        return value, shapes, locs, attn

    def test_matches_torch_oracle(self, rng):
        value, shapes, locs, attn = self._random_inputs(rng)
        ours = np.asarray(ms_deform_attn_core(jnp.array(value), shapes,
                                              jnp.array(locs), jnp.array(attn)))
        ref = msda_torch_oracle(value, shapes, locs, attn)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_float64_exact(self, rng):
        value, shapes, locs, attn = self._random_inputs(rng, B=1, M=2, D=4, Lq=3, P=2)
        with jax.enable_x64(True):
            ours = np.asarray(
                ms_deform_attn_core(
                    jnp.array(value, jnp.float64), shapes,
                    jnp.array(locs, jnp.float64), jnp.array(attn, jnp.float64),
                )
            )
        ref = msda_torch_oracle(
            value.astype(np.float64), shapes,
            locs.astype(np.float64), attn.astype(np.float64),
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)

    @pytest.mark.parametrize("which", ["hat", "separable", "gather"])
    def test_tpu_formulations_match_reference(self, rng, which):
        """Both TPU paths (hat-matmul production, patch-row gather) == the
        plain 4-corner gather path, values and gradients."""
        from pctrans_tpu.ops.msdeform import (
            ms_deform_attn_core_gather,
            ms_deform_attn_core_reference,
        )

        from pctrans_tpu.ops.msdeform import ms_deform_attn_core_separable

        core = {"hat": ms_deform_attn_core, "separable": ms_deform_attn_core_separable,
                "gather": ms_deform_attn_core_gather}[which]
        value, shapes, locs, attn = self._random_inputs(rng)

        prod = np.asarray(core(jnp.array(value), shapes,
                               jnp.array(locs), jnp.array(attn)))
        ref = np.asarray(ms_deform_attn_core_reference(jnp.array(value), shapes,
                                                       jnp.array(locs), jnp.array(attn)))
        np.testing.assert_allclose(prod, ref, rtol=1e-5, atol=1e-5)

        def loss(c, v, l, a):
            return (c(v, shapes, l, a) ** 2).sum()

        g1 = jax.grad(lambda v, l, a: loss(core, v, l, a), (0, 1, 2))(
            jnp.array(value), jnp.array(locs), jnp.array(attn))
        g2 = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_reference, v, l, a), (0, 1, 2))(
            jnp.array(value), jnp.array(locs), jnp.array(attn))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_gradcheck_vs_torch(self, rng):
        """Gradients wrt value, locations and weights match torch autograd."""
        value, shapes, locs, attn = self._random_inputs(rng, B=1, M=2, D=4, Lq=3, P=2)

        def loss_jax(v, l, a):
            return (ms_deform_attn_core(v, shapes, l, a) ** 2).sum()

        gv, gl, ga = jax.grad(loss_jax, argnums=(0, 1, 2))(
            jnp.array(value), jnp.array(locs), jnp.array(attn)
        )

        tv = torch.from_numpy(value).requires_grad_(True)
        tl = torch.from_numpy(locs).requires_grad_(True)
        ta = torch.from_numpy(attn).requires_grad_(True)
        out = msda_torch_differentiable(tv, shapes, tl, ta)
        (out**2).sum().backward()
        np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3, atol=1e-4)


def msda_torch_differentiable(value, spatial_shapes, locs, attn):
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = locs.shape
    out = torch.zeros(B, Lq, M, D, dtype=value.dtype)
    start = 0
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]
        v = v.permute(0, 2, 3, 1).reshape(B * M, D, H, W)
        g = 2 * locs[:, :, :, lid] - 1
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        s = s.reshape(B, M, D, Lq, P).permute(0, 3, 1, 4, 2)
        out = out + (s * attn[:, :, :, lid, :, None]).sum(dim=3)
        start += H * W
    return out.reshape(B, Lq, M * D)


class TestMSDeformAttnPallas:
    """Pallas TPU kernel vs the torch oracle and the JAX reference path
    (reference harness style: pixel_decoder/ops/test.py:35-92).  Runs in
    interpret mode on CPU, compiled on real TPU."""

    def _random_inputs(self, rng, B=2, M=4, D=8, Lq=7, P=4):
        shapes = [(6, 8), (3, 4), (2, 2)]
        S = sum(h * w for h, w in shapes)
        L = len(shapes)
        value = rng.randn(B, S, M, D).astype(np.float32)
        locs = rng.rand(B, Lq, M, L, P, 2).astype(np.float32) * 1.2 - 0.1
        attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
        attn = attn / attn.sum(axis=(3, 4), keepdims=True)
        return value, shapes, locs, attn

    def test_matches_torch_oracle(self, rng):
        from pctrans_tpu.ops.msdeform_pallas import ms_deform_attn_core_pallas

        value, shapes, locs, attn = self._random_inputs(rng)
        ours = np.asarray(
            ms_deform_attn_core_pallas(jnp.array(value), tuple(shapes),
                                       jnp.array(locs), jnp.array(attn)))
        ref = msda_torch_oracle(value, shapes, locs, attn)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_query_chunk_padding(self, rng):
        """Lq deliberately not a multiple of the chunk size."""
        from pctrans_tpu.ops.msdeform_pallas import ms_deform_attn_core_pallas

        value, shapes, locs, attn = self._random_inputs(rng, Lq=13)
        ours = np.asarray(
            ms_deform_attn_core_pallas(jnp.array(value), tuple(shapes),
                                       jnp.array(locs), jnp.array(attn),
                                       chunk=8))
        ref = msda_torch_oracle(value, shapes, locs, attn)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference_path(self, rng):
        from pctrans_tpu.ops.msdeform import ms_deform_attn_core_reference
        from pctrans_tpu.ops.msdeform_pallas import ms_deform_attn_core_pallas

        value, shapes, locs, attn = self._random_inputs(rng, B=1, M=2, D=4, Lq=5)

        def loss(core, v, l, a):
            return (core(v, tuple(shapes), l, a) ** 2).sum()

        g1 = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_pallas, v, l, a),
                      (0, 1, 2))(jnp.array(value), jnp.array(locs), jnp.array(attn))
        g2 = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_reference, v, l, a),
                      (0, 1, 2))(jnp.array(value), jnp.array(locs), jnp.array(attn))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_dispatcher(self, rng):
        from pctrans_tpu.ops.msdeform import ms_deform_attn

        value, shapes, locs, attn = self._random_inputs(rng)
        ref = msda_torch_oracle(value, shapes, locs, attn)
        for impl in ("pallas", "matmul", "gather", "reference", "auto"):
            out = np.asarray(ms_deform_attn(jnp.array(value), shapes,
                                            jnp.array(locs), jnp.array(attn),
                                            impl=impl))
            np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestMSDeformAttnPallas2:
    """Pallas v2 kernel (lane-major separable) vs the torch oracle and the
    reference path; interpret mode on CPU, compiled on real TPU."""

    _random_inputs = TestMSDeformAttnPallas._random_inputs

    def test_matches_torch_oracle(self, rng):
        from pctrans_tpu.ops.msdeform_pallas2 import ms_deform_attn_core_pallas2

        value, shapes, locs, attn = self._random_inputs(rng, D=16)
        ours = np.asarray(
            ms_deform_attn_core_pallas2(jnp.array(value), tuple(shapes),
                                        jnp.array(locs), jnp.array(attn)))
        ref = msda_torch_oracle(value, shapes, locs, attn)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_query_chunk_padding(self, rng):
        """Lq not a multiple of the lane-chunk size."""
        from pctrans_tpu.ops.msdeform_pallas2 import ms_deform_attn_core_pallas2

        value, shapes, locs, attn = self._random_inputs(rng, Lq=13, D=16)
        ours = np.asarray(
            ms_deform_attn_core_pallas2(jnp.array(value), tuple(shapes),
                                        jnp.array(locs), jnp.array(attn),
                                        chunk=128))
        ref = msda_torch_oracle(value, shapes, locs, attn)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference_path(self, rng):
        from pctrans_tpu.ops.msdeform import ms_deform_attn_core_reference
        from pctrans_tpu.ops.msdeform_pallas2 import ms_deform_attn_core_pallas2

        value, shapes, locs, attn = self._random_inputs(rng, B=1, M=2, D=16,
                                                        Lq=5)

        def loss(core, v, l, a):
            return (core(v, tuple(shapes), l, a) ** 2).sum()

        g1 = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_pallas2, v, l, a),
                      (0, 1, 2))(jnp.array(value), jnp.array(locs), jnp.array(attn))
        g2 = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_reference, v, l, a),
                      (0, 1, 2))(jnp.array(value), jnp.array(locs), jnp.array(attn))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_gradients_multichunk_padded(self, rng):
        """The Pallas backward kernel (msdeform_pallas2._backward) across
        chunk boundaries and query padding: Lq = 150 with chunk = 128 gives
        2 lane-chunks with 106 padded rows; all three grads must match the
        reference-path AD."""
        from pctrans_tpu.ops.msdeform import ms_deform_attn_core_reference
        from pctrans_tpu.ops.msdeform_pallas2 import ms_deform_attn_core_pallas2

        value, shapes, locs, attn = self._random_inputs(rng, B=2, M=2, D=16,
                                                        Lq=150)

        def loss(core, v, l, a, **kw):
            return (core(v, tuple(shapes), l, a, **kw) ** 2).sum()

        g1 = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_pallas2,
                                           v, l, a, chunk=128),
                      (0, 1, 2))(jnp.array(value), jnp.array(locs),
                                 jnp.array(attn))
        g2 = jax.grad(lambda v, l, a: loss(ms_deform_attn_core_reference,
                                           v, l, a),
                      (0, 1, 2))(jnp.array(value), jnp.array(locs),
                                 jnp.array(attn))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_dispatcher_pallas2(self, rng):
        from pctrans_tpu.ops.msdeform import ms_deform_attn

        value, shapes, locs, attn = self._random_inputs(rng, D=16)
        ref = msda_torch_oracle(value, shapes, locs, attn)
        out = np.asarray(ms_deform_attn(jnp.array(value), shapes,
                                        jnp.array(locs), jnp.array(attn),
                                        impl="pallas2"))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestAuctionLAP:
    """Jacobi auction solver vs scipy (the wide-iteration TPU alternative to
    the sequential JV solver; ops/lap.py solve_lap_auction)."""

    def test_matches_scipy_total_cost(self, rng):
        import scipy.optimize

        from pctrans_tpu.ops.lap import solve_lap_auction

        for trial in range(5):
            R, C = (8, 8) if trial % 2 == 0 else (6, 11)
            costs = rng.rand(R, C).astype(np.float32) * 10
            out = np.asarray(solve_lap_auction(jnp.asarray(costs)))
            srows, scols = scipy.optimize.linear_sum_assignment(costs)
            assert len(set(out.tolist())) == R  # valid permutation
            assert costs[np.arange(R), out].sum() == pytest.approx(
                costs[srows, scols].sum(), abs=1e-3)

    def test_degenerate_ties_terminate(self):
        from pctrans_tpu.ops.lap import solve_lap_auction

        costs = jnp.zeros((5, 7))  # all ties: worst case for bidding wars
        out = np.asarray(solve_lap_auction(costs))
        assert len(set(out.tolist())) == 5

    def test_match_padded_auction_equals_jv(self, rng):
        from pctrans_tpu.ops.lap import match_padded

        costs = jnp.asarray(rng.rand(12, 6).astype(np.float32))
        valid = jnp.asarray(np.array([1, 1, 0, 1, 0, 1], bool))
        a = np.asarray(match_padded(costs, valid, solver="auction"))
        j = np.asarray(match_padded(costs, valid, solver="jv"))
        # same total cost over valid slots (assignments may differ on ties)
        va = np.asarray(valid)
        ca = np.asarray(costs)[a, np.arange(6)][va].sum()
        cj = np.asarray(costs)[j, np.arange(6)][va].sum()
        assert ca == pytest.approx(cj, abs=1e-3)


# ----------------------------------------------------- dynamic mask render
def render_torch_oracle(feats, inst_xy, w1, w2, w3, b1, b2, b3, hw, stride):
    """Literal torch transcription of the reference dynamic mask head
    (mask2former_transformer_decoder.py:647-719): per-(b, q) 3-layer 1x1
    conv over [rel_coords, mask_feats]."""
    B, HW, Cm = feats.shape
    Q = inst_xy.shape[1]
    Hm, Wm = hw
    xs = torch.arange(Wm, dtype=torch.float32) * stride + stride // 2
    ys = torch.arange(Hm, dtype=torch.float32) * stride + stride // 2
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    loc = torch.stack([gx.reshape(-1), gy.reshape(-1)], dim=1)  # [HW, 2]
    out = torch.zeros(B, Q, HW)
    for b in range(B):
        for q in range(Q):
            rel = inst_xy[b, q][None, :] - loc                  # [HW, 2]
            x = torch.cat([rel, feats[b]], dim=1)               # [HW, cin]
            x = torch.relu(x @ w1[b, q].T + b1[b, q])
            x = torch.relu(x @ w2[b, q].T + b2[b, q])
            out[b, q] = (x @ w3[b, q].T + b3[b, q])[:, 0]
    return out


class TestRenderPallas:
    """Fused dynamic-mask render kernel (ops/render_pallas.py) vs a literal
    torch oracle and the einsum formulation; interpret mode on CPU."""

    def _inputs(self, rng, B=2, Q=5, Cm=16, ch=8, Hm=9, Wm=11, stride=4):
        HW = Hm * Wm
        t = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
        feats = t(B, HW, Cm)
        inst = (rng.rand(B, Q, 2) * [Wm * stride, Hm * stride]).astype(np.float32)
        return (feats, inst, t(B, Q, ch, Cm + 2), t(B, Q, ch, ch),
                t(B, Q, 1, ch), t(B, Q, ch), t(B, Q, ch), t(B, Q, 1),
                (Hm, Wm), stride)

    def test_matches_torch_oracle(self, rng):
        from pctrans_tpu.ops.render_pallas import dynamic_mask_render

        args = self._inputs(rng)
        ref = render_torch_oracle(*[torch.from_numpy(a) for a in args[:8]],
                                  args[8], args[9]).numpy()
        out = np.asarray(dynamic_mask_render(
            *[jnp.asarray(a) for a in args[:8]], args[8], args[9]))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_matches_einsum_formulation_and_odd_shapes(self, rng):
        from pctrans_tpu.ops.render_pallas import (dynamic_mask_render,
                                                   render_reference)

        # Q not a multiple of 8, HW not a multiple of 128, Cm + 3 unpadded
        args = self._inputs(rng, B=1, Q=3, Hm=7, Wm=13)
        ref = np.asarray(render_reference(
            *[jnp.asarray(a) for a in args[:8]], hw=args[8], stride=args[9],
            dtype=jnp.float32))
        out = np.asarray(dynamic_mask_render(
            *[jnp.asarray(a) for a in args[:8]], args[8], args[9]))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_grads_match_einsum(self, rng):
        from pctrans_tpu.ops.render_pallas import (dynamic_mask_render,
                                                   render_reference)

        args = self._inputs(rng, B=1, Q=4, Hm=5, Wm=6)
        ja = [jnp.asarray(a) for a in args[:8]]

        def lk(*a):
            return (dynamic_mask_render(*a, args[8], args[9]) ** 2).sum()

        def lr(*a):
            return (render_reference(*a, hw=args[8], stride=args[9],
                                     dtype=jnp.float32) ** 2).sum()

        gk = jax.grad(lk, argnums=tuple(range(8)))(*ja)
        gr = jax.grad(lr, argnums=tuple(range(8)))(*ja)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4)

    def test_no_rel_coord(self, rng):
        from pctrans_tpu.ops.render_pallas import (dynamic_mask_render,
                                                   render_reference)

        args = self._inputs(rng)
        w1 = args[2][..., 2:]  # feats-only input channels
        ref = np.asarray(render_reference(
            jnp.asarray(args[0]), jnp.asarray(args[1]), jnp.asarray(w1),
            *[jnp.asarray(a) for a in args[3:8]], hw=args[8],
            stride=args[9], rel_coord=False, dtype=jnp.float32))
        out = np.asarray(dynamic_mask_render(
            jnp.asarray(args[0]), jnp.asarray(args[1]), jnp.asarray(w1),
            *[jnp.asarray(a) for a in args[3:8]], args[8], args[9], False))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
