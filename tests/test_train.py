"""End-to-end training-step tests: one jitted step on a sharded mesh, loss
decreases when overfitting a single synthetic image.  This covers what the
reference never tested (SURVEY.md section 4): the full train path and the
distributed path (here: 8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pctrans_tpu.config import get_cfg_defaults
from pctrans_tpu.data.synthetic import SyntheticDataset
from pctrans_tpu.engine.solver import build_lr_schedule, build_optimizer
from pctrans_tpu.engine.state import TrainState, make_train_step
from pctrans_tpu.losses import SetCriterion, CriterionConfig
from pctrans_tpu.models import PCTransModel, ModelConfig
from pctrans_tpu.parallel import create_mesh, replicate, shard_batch

TINY = ModelConfig(
    hidden_dim=32, conv_dim=32, mask_dim=8, num_queries=10, nheads=4,
    dim_feedforward=64, enc_layers=1, dec_layers=3, head_norm="GN",
    backbone_depth=14,
)
# criterion sees dec_layers+1 mask predictions (the learnable-query one)
CRIT = CriterionConfig(num_points=256, dec_layers=4)


def tiny_setup(batch=2, size=32):
    cfg = get_cfg_defaults()
    cfg.SOLVER.WARMUP_ITERS = 0   # overfit tests need a real LR from step 0
    cfg.SOLVER.BASE_LR = 3e-4
    model = PCTransModel(config=TINY, train=True)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, size, size, 3)))
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    ds = SyntheticDataset(size=(size, size), length=batch, n_instances=(2, 4))
    items = [ds[i] for i in range(batch)]
    batch_np = {
        "image": np.stack([it["image"] for it in items]),
        "label": np.stack([it["label"] for it in items]),
    }
    return cfg, model, tx, state, batch_np


class TestLRSchedule:
    def test_warmup_poly(self):
        cfg = get_cfg_defaults()
        sched = build_lr_schedule(cfg)
        lr0 = float(sched(0))
        lr_mid = float(sched(cfg.SOLVER.WARMUP_ITERS))
        lr_end = float(sched(cfg.SOLVER.ITERATION_TOTAL - 1))
        assert lr0 == pytest.approx(cfg.SOLVER.BASE_LR * cfg.SOLVER.WARMUP_FACTOR, rel=1e-5)
        # right at warmup end: full base LR scaled by poly decay
        frac = 1 - cfg.SOLVER.WARMUP_ITERS / cfg.SOLVER.ITERATION_TOTAL
        assert lr_mid == pytest.approx(cfg.SOLVER.BASE_LR * frac**0.9, rel=1e-4)
        assert lr_end < 1e-7

    def test_multistep_no_warmup(self):
        cfg = get_cfg_defaults()
        cfg.SOLVER.LR_SCHEDULER_NAME = "MultiStepLR"
        cfg.SOLVER.STEPS = (10, 20)
        cfg.SOLVER.GAMMA = 0.1
        sched = build_lr_schedule(cfg)
        base = cfg.SOLVER.BASE_LR
        assert float(sched(0)) == pytest.approx(base)       # no warmup
        assert float(sched(9)) == pytest.approx(base)
        assert float(sched(10)) == pytest.approx(base * 0.1)
        assert float(sched(25)) == pytest.approx(base * 0.01)

    def test_onecycle_matches_torch(self):
        import torch

        cfg = get_cfg_defaults()
        cfg.SOLVER.LR_SCHEDULER_NAME = "OneCycle"
        cfg.SOLVER.ITERATION_TOTAL = 100
        cfg.SOLVER.WARMUP_ITERS = 20
        sched = build_lr_schedule(cfg)

        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        ref = torch.optim.lr_scheduler.OneCycleLR(
            opt, max_lr=cfg.SOLVER.BASE_LR, pct_start=0.2,
            final_div_factor=1000, total_steps=100)
        ref_lrs = []
        for _ in range(100):
            ref_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            ref.step()
        for step in (0, 5, 19, 20, 21, 50, 99):
            assert float(sched(step)) == pytest.approx(ref_lrs[step], rel=1e-5), step

    def test_reduce_on_plateau_transform(self):
        from pctrans_tpu.engine.solver import reduce_on_plateau

        tx = reduce_on_plateau(factor=0.5, patience=3, threshold=0.001)
        params = {"w": jnp.ones((2,))}
        st = tx.init(params)
        g = {"w": jnp.ones((2,))}
        # improving loss keeps scale at 1
        for i in range(5):
            u, st = tx.update(g, st, params, value=jnp.float32(10.0 - i))
        assert float(st.scale) == 1.0
        np.testing.assert_allclose(np.asarray(u["w"]), 1.0)
        # plateau: constant loss for > patience steps halves the scale
        for _ in range(5):
            u, st = tx.update(g, st, params, value=jnp.float32(5.0))
        assert float(st.scale) == pytest.approx(0.5)
        u, st = tx.update(g, st, params, value=jnp.float32(5.0))
        np.testing.assert_allclose(np.asarray(u["w"]), 0.5)

    def test_plateau_optimizer_end_to_end(self):
        cfg = get_cfg_defaults()
        cfg.SOLVER.LR_SCHEDULER_NAME = "ReduceLROnPlateau"
        cfg.SOLVER.GAMMA = 0.1
        params = {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
        tx = build_optimizer(cfg, params)
        st = tx.init(params)
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        u, st = tx.update(g, st, params, value=jnp.float32(1.0))
        assert np.isfinite(jax.tree_util.tree_leaves(u)[0]).all()


class TestTrainStep:
    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_loss_decreases_overfitting(self):
        cfg, model, tx, state, batch_np = tiny_setup(batch=1, size=32)
        criterion = SetCriterion(CRIT)
        step = jax.jit(make_train_step(TINY, criterion, tx, max_instances=8))
        rng = jax.random.key(0)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        losses = []
        for _ in range(12):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_uint8_transfer_matches_float(self):
        """DATASET.TRANSFER_UINT8: the uint8-packed batch dequantizes on
        device to within the quantization step of the float batch, and a
        train step on it produces a loss close to the float-batch loss."""
        cfg, model, tx, state, batch_np = tiny_setup(batch=1, size=32)
        criterion = SetCriterion(CRIT)
        lo, hi = -0.25, 1.25
        step = jax.jit(make_train_step(TINY, criterion, tx, max_instances=8,
                                       input_range=(lo, hi)))
        rng = jax.random.key(0)
        f32_batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        img_u8 = np.rint((batch_np["image"] - lo) * (255.0 / (hi - lo))
                         ).clip(0, 255).astype(np.uint8)
        u8_batch = {"image": jnp.asarray(img_u8),
                    "label": jnp.asarray(batch_np["label"].astype(np.uint8))}
        # round-trip error bound: half a quantization step (+ clip regions)
        deq = img_u8.astype(np.float32) * ((hi - lo) / 255.0) + lo
        clipped = ((batch_np["image"] < lo) | (batch_np["image"] > hi))
        err = np.abs(deq - batch_np["image"])[~clipped]
        assert err.max() <= (hi - lo) / 255.0 / 2 + 1e-6
        _, m_f = step(state, f32_batch, rng)
        _, m_u = step(state, u8_batch, rng)
        lf, lu = float(m_f["loss"]), float(m_u["loss"])
        assert np.isfinite(lu)
        assert abs(lu - lf) / max(abs(lf), 1e-6) < 0.05, (lf, lu)

    @pytest.mark.slow  # long trainer/compile — slow tier
    def test_sharded_step_matches_single_device(self):
        """One mesh program covers both distributed properties: the 8-way
        sharded step computes the same loss as the single-device program on
        the identical batch (the DDP-equivalence guarantee), and parameters
        come out of the update still fully replicated."""
        cfg, model, tx, state, batch_np = tiny_setup(batch=8, size=32)
        criterion = SetCriterion(CRIT)
        step = make_train_step(TINY, criterion, tx, max_instances=8)
        rng = jax.random.key(0)

        _, m_single = jax.jit(step)(
            state, {k: jnp.asarray(v) for k, v in batch_np.items()}, rng)

        mesh = create_mesh(8)
        with mesh:
            state_r = replicate(mesh, state)
            batch = shard_batch(mesh, batch_np)
            jitted = jax.jit(step)
            # Collective audit of the compiled SPMD program: gradients must
            # all-reduce over the data axis, and nothing may all-gather the
            # sharded batch back onto every device — a silent
            # re-replication regression that the loss-equality check below
            # cannot catch (each device would just redo the full batch).
            hlo = jitted.lower(state_r, batch, rng).compile().as_text()
            assert hlo.count(" all-reduce") >= 1, "no gradient all-reduce"
            assert " all-gather" not in hlo, \
                "sharded values re-replicated via all-gather"
            new_state, m_mesh = jitted(state_r, batch, rng)
        assert float(m_single["loss"]) == pytest.approx(
            float(m_mesh["loss"]), rel=2e-3)
        assert np.isfinite(float(m_mesh["loss"]))
        # params remain replicated after the update
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated

    def test_eval_step_top_k_exact_subset(self):
        """Top-k lean eval returns exactly the full path's masks for the kept
        queries, in descending peak order."""
        from pctrans_tpu.engine.state import make_eval_step

        cfg, model, tx, state, batch_np = tiny_setup(batch=1, size=32)
        images = jnp.asarray(batch_np["image"])
        full = jax.jit(make_eval_step(TINY))
        lean = jax.jit(make_eval_step(TINY, top_k=4))
        probs_all, peaks_all = full(state, images)
        probs_k, peaks_k = lean(state, images)
        assert probs_k.shape[1] == 4
        order = np.argsort(-np.asarray(peaks_all)[0], kind="stable")[:4]
        np.testing.assert_allclose(
            np.asarray(probs_k)[0], np.asarray(probs_all)[0][order], rtol=1e-6, atol=1e-6
        )

