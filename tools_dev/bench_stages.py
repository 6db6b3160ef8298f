"""Per-stage device timing of the PCTrans forward at CVPPP eval shapes.

Each stage runs n times inside one jitted fori_loop with a scalar data
dependency between iterations, and only a scalar crosses the tunnel, so the
measurement is pure device time (minus one ~30ms round trip).
"""
import os, sys, time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pctrans_tpu.models import PCTransModel, ModelConfig
from pctrans_tpu.models.resnet import ResNet
from pctrans_tpu.models.pixel_decoder import MSDeformAttnPixelDecoder
from pctrans_tpu.models.transformer_decoder import MultiScaleMaskedTransformerDecoder

N = 8
RT = 0.030  # measured tunnel round trip


def first_leaf(tree):
    return jax.tree_util.tree_leaves(tree)[0]


def time_stage(label, fn, *inputs):
    @jax.jit
    def loop(c):
        def body(i, c):
            out = fn(c, *inputs)
            return first_leaf(out).astype(jnp.float32).ravel()[0] * 1e-30 + c
        return jax.lax.fori_loop(0, N, body, c)

    float(loop(jnp.float32(0.0)))  # warmup/compile
    t0 = time.perf_counter()
    float(loop(jnp.float32(0.0)))
    dt = (time.perf_counter() - t0 - RT) / N

    # Roofline coordinates: XLA's own cost model for the single-call program
    # (flops, HBM bytes). Pallas custom calls report 0 flops — stages using
    # them carry an analytic correction upstream in bench.py; here the raw
    # number is still the right *bandwidth* coordinate.
    flops = bytes_ = float("nan")
    try:
        ca = jax.jit(fn).lower(jnp.float32(0.0), *inputs).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
    except Exception as e:  # cost analysis is best-effort
        print(f"  (cost_analysis unavailable: {e})", flush=True)
    tf = flops / dt / 1e12
    gbps = bytes_ / dt / 1e9
    print(f"{label}: {dt*1000:.1f} ms | {flops/1e9:.1f} GFLOP "
          f"-> {tf:.1f} TFLOP/s | {bytes_/1e9:.2f} GB -> {gbps:.0f} GB/s",
          flush=True)
    return dt


def main():
    B, H, W = 10, 530, 500
    c = ModelConfig(dtype="bfloat16")
    dtype = jnp.dtype(c.dtype)
    model = PCTransModel(config=c, train=False)
    rng = np.random.RandomState(0)
    x = jax.device_put(jnp.asarray(rng.randn(B, H, W, 3), jnp.float32))
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])
    params = variables["params"]
    frozen = variables.get("frozen", {})

    backbone = ResNet(depth=c.backbone_depth, stride_in_1x1=c.stride_in_1x1,
                      norm=c.backbone_norm, train=False, dtype=dtype)
    pixdec = MSDeformAttnPixelDecoder(
        conv_dim=c.conv_dim, mask_dim=c.mask_dim, norm=c.head_norm,
        transformer_layers=c.enc_layers, n_heads=c.nheads, n_points=c.enc_points,
        train=False, dtype=dtype)
    predictor = MultiScaleMaskedTransformerDecoder(
        hidden_dim=c.hidden_dim, num_queries=c.num_queries, nheads=c.nheads,
        dim_feedforward=c.dim_feedforward, dec_layers=c.dec_layers,
        mask_dim=c.mask_dim, points_num=c.points_num, sem_loss_on=c.sem_loss_on,
        sem_norm=c.head_norm, rel_coord=c.rel_coord, train=False, dtype=dtype)

    bb_vars = {"params": params["backbone"], "frozen": frozen.get("backbone", {})}
    feats = jax.jit(lambda x: backbone.apply(bb_vars, x.astype(dtype)))(x)
    feats = jax.tree_util.tree_map(lambda a: jax.device_put(a), feats)

    pd_vars = {"params": params["pixel_decoder"]}
    if "batch_stats" in variables and "pixel_decoder" in variables["batch_stats"]:
        pd_vars["batch_stats"] = variables["batch_stats"]["pixel_decoder"]
    mask_features, _, ms = jax.jit(lambda f: pixdec.apply(pd_vars, f))(feats)
    ms = list(ms)

    pr_vars = {"params": params["predictor"]}
    if "batch_stats" in variables and "predictor" in variables["batch_stats"]:
        pr_vars["batch_stats"] = variables["batch_stats"]["predictor"]

    time_stage("backbone (R-50, B=10 530x500)",
               lambda cc, xx: backbone.apply(bb_vars, (xx + cc).astype(dtype)), x)
    time_stage("pixel_decoder (6-layer deform enc + FPN)",
               lambda cc, ff: pixdec.apply(
                   pd_vars, jax.tree_util.tree_map(lambda a: a + cc.astype(a.dtype), ff))[0],
               feats)
    time_stage("transformer decoder (9 layers + dyn masks)",
               lambda cc, m, mf: predictor.apply(
                   pr_vars, [mi + cc.astype(mi.dtype) for mi in m], mf + cc.astype(mf.dtype)
               )["pred_masks"],
               ms, mask_features)

    from pctrans_tpu.ops.resize import resize_bilinear
    pm = jax.jit(lambda m, mf: predictor.apply(pr_vars, m, mf)["pred_masks"])(ms, mask_features)
    pm = jax.device_put(pm)

    def upsample_topk(cc, p):
        peak = (p + cc).max(axis=(2, 3))
        top_peak, idx = jax.lax.top_k(peak, 50)
        masks = jnp.take_along_axis(p, idx[:, :, None, None], axis=1)
        return jax.nn.sigmoid(resize_bilinear(masks, (H, W)))

    time_stage("top50 select + upsample + sigmoid", upsample_topk, pm)

    # full model for reference
    state_vars = variables
    time_stage("FULL forward",
               lambda cc, xx: model.apply(state_vars, xx + cc)["pred_masks"], x)


if __name__ == "__main__":
    main()
