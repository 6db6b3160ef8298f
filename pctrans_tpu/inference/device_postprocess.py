"""TPU-resident instance postprocess: the production inference path.

The reference's ``instance_inference`` (arch/maskformer.py:267-346) is host
code: per image it thresholds Q full-resolution masks, builds a Q x Q
pairwise-dice matrix (a ~6.6 GFLOP numpy matmul at CVPPP shapes), greedily
clusters, suppresses, and argmax-paints — measured at 150-182 ms/image
single-threaded here, ~25x the model forward.  SURVEY.md §7 specifies the
TPU-native design instead: every *pixel-scale* step runs on device and only
*statistics* cross to the host:

* device: binarize (already fused into the eval step), per-mask areas and
  the K x K intersection matrix (one bf16 MXU matmul, integer-exact), cluster mean-merge
  (a membership matmul), re-binarize, merged-mask stats, and the final
  ascending-area argmax painting;
* host: the greedy dice clustering and MMI-NMS loops — O(K^2) scalar work
  on [K] / [K, K] arrays (microseconds), running the *same* shared code as
  the numpy oracle (:func:`postprocess.clusters_from_dice`,
  :func:`postprocess.nms_keep`).

Host <-> device traffic per batch: [B, K] areas + [B, K, K] intersections
down, [B, K, K] membership up, the [B, H, W] int16 label map down.  The
masks themselves never leave the device.

Exactness: every device matmul has 0/1 operands, so intersections, areas
and member counts are exact integers (< 2^24); merged-mask values are
fl(count / n) — bit-identical to numpy's ``mean`` — and every threshold
compare therefore matches :func:`postprocess.instance_inference_cvppp` /
``_bbbc`` bit-for-bit.  The single documented deviation: BBBC paint
*ordering* uses the exact rational cluster area (sum of member areas / n)
where numpy sums HW f32 values pairwise — orders can differ only for
fractional-area ties within f32 summation noise (~1e-7 relative).

``tests/test_device_postprocess.py`` asserts label-map equality against the
numpy oracle (itself proven against the executed reference in
``tests/test_refexec_postprocess.py``).
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .postprocess import clusters_from_dice, dice_from_stats, nms_keep


# ---------------------------------------------------------------- device ops
def _binary_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, X, P] x [B, Y, P] -> [B, X, Y] counts, exact: 0/1 operands are
    exact in bf16 and the MXU accumulates in f32, so every count < 2^24 is
    the true integer.  (An int8 einsum is *not* the fast path on this
    stack: measured ~16 s/call at CVPPP shapes vs sub-ms for the bf16 MXU
    dot — XLA lowers the s8 dot off the MXU.)"""
    return jnp.einsum("bxp,byp->bxy", a.astype(jnp.bfloat16),
                      b.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


def mask_stats(masks: jnp.ndarray):
    """[B, K, H, W] binary (any dtype) -> (areas [B, K] i32, inter [B, K, K]
    i32); one bf16 MXU matmul, integer-exact."""
    B, K = masks.shape[:2]
    flat = masks.reshape(B, K, -1)
    inter = _binary_dot(flat, flat).astype(jnp.int32)
    areas = flat.astype(jnp.int32).sum(axis=-1)
    return areas, inter


def packed_mask_stats(masks: jnp.ndarray,
                      extra: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mask statistics packed into ONE f32 array [B, K, K+1(+1)]:
    ``[..., :K]`` = intersections, ``[..., K]`` = areas, ``[..., K+1]`` =
    the optional extra per-mask column (e.g. peak logits).  All counts are
    < 2^24 so f32 holds them exactly; packing matters because this
    environment's relay charges a fixed ~8 ms per landed host fetch — one
    array per program round trip instead of three."""
    areas, inter = mask_stats(masks)
    cols = [inter.astype(jnp.float32), areas[:, :, None].astype(jnp.float32)]
    if extra is not None:
        cols.append(extra[:, :, None].astype(jnp.float32))
    return jnp.concatenate(cols, axis=-1)


def unpack_mask_stats(stats: np.ndarray):
    """Host-side inverse of :func:`packed_mask_stats` -> (areas, inter[,
    extra]) as float32 views."""
    K = stats.shape[1]
    inter = stats[:, :, :K]
    areas = stats[:, :, K]
    if stats.shape[-1] > K + 1:
        return areas, inter, stats[:, :, K + 1]
    return areas, inter


@jax.jit
def _stats(masks):
    return mask_stats(masks)


@jax.jit
def _merge_binarize(masks, member, nmem, thres2):
    """Mean-merge clusters and re-binarize (mask_post with bd_flag=True).

    masks  [B, K, H, W] binary u8; member [B, C, K] int8 membership;
    nmem   [B, C] f32 member counts (>=1; zero-padded rows clamp to 1).
    Returns (merged u8 [B, C, H, W], packed stats f32 [B, C, C+1]).
    """
    B, K, H, W = masks.shape
    flat = masks.reshape(B, K, -1)
    counts = jnp.einsum("bck,bkp->bcp", member.astype(jnp.bfloat16),
                        flat.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    frac = counts / nmem[:, :, None]
    merged = (frac > thres2).astype(jnp.uint8)
    merged = merged.reshape(B, -1, H, W)
    return merged, packed_mask_stats(merged)


@jax.jit
def _paint(masks, perm, count):
    """Gather masks by the host-computed ascending-area permutation, zero the
    padding slots, prepend the background plane, argmax (first max wins —
    jnp.argmax and np.argmax share that tie rule).  Returns [B, H, W] u8
    when labels fit (K < 256, e.g. CVPPP), else i16 — label values are
    identical; the narrow dtype halves the host transfer through this
    environment's ~20 MB/s TPU relay."""
    B, C, H, W = masks.shape
    g = jnp.take_along_axis(masks, perm[:, :, None, None], axis=1)
    slot = (jnp.arange(C)[None, :] < count[:, None]).astype(masks.dtype)
    g = g * slot[:, :, None, None]
    stack = jnp.concatenate([jnp.zeros((B, 1, H, W), masks.dtype), g], axis=1)
    out_dtype = jnp.uint8 if C + 1 <= 256 else jnp.int16
    return jnp.argmax(stack, axis=1).astype(out_dtype)


@jax.jit
def _merge_paint_frac(masks, member, nmem, perm, count):
    """BBBC fused tail: mean-merge (NO re-binarize — merged masks stay
    fractional, mask_post bd_flag=False) in the host-given paint order, then
    argmax-paint.  Membership rows are pre-permuted on device so only the
    needed clusters are materialized, in paint order."""
    B, K, H, W = masks.shape
    flat = masks.reshape(B, K, -1)
    member_p = jnp.take_along_axis(member, perm[:, :, None], axis=1)
    nmem_p = jnp.take_along_axis(nmem, perm, axis=1)
    counts = jnp.einsum("bck,bkp->bcp", member_p.astype(jnp.bfloat16),
                        flat.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    frac = counts / nmem_p[:, :, None]
    slot = (jnp.arange(member.shape[1])[None, :] < count[:, None])
    frac = frac * slot[:, :, None].astype(jnp.float32)
    stack = jnp.concatenate(
        [jnp.zeros((B, 1, frac.shape[-1]), jnp.float32), frac], axis=1)
    return jnp.argmax(stack, axis=1).astype(jnp.int16).reshape(B, H, W)


# ---------------------------------------------------------------- host glue
class DevicePostprocessor:
    """Batched device/host instance inference on binarized mask stacks.

    ``__call__(masks, areas, inter)``: ``masks`` is the ON-DEVICE binarized
    [B, K, H, W] u8 stack from the eval step (``make_eval_step(...,
    threshold=..., with_stats=True)``); ``areas`` / ``inter`` are its
    host-fetched statistics.  Returns the painted [B, H, W] int16 label
    maps, semantics identical to ``instance_inference_cvppp`` / ``_bbbc``.
    """

    def __init__(self, dataset: str, min_area: float = 40.0,
                 cluster_thres1: Optional[float] = None,
                 cluster_thres2: Optional[float] = None,
                 nms_thres: float = 0.72):
        self.dataset = dataset
        if dataset == "cvppp":
            self.thres1 = 0.5 if cluster_thres1 is None else cluster_thres1
            self.thres2 = 0.6 if cluster_thres2 is None else cluster_thres2
        elif dataset == "bbbc":
            self.thres1 = 0.15 if cluster_thres1 is None else cluster_thres1
            self.thres2 = 0.25 if cluster_thres2 is None else cluster_thres2
        else:
            raise ValueError(f"unknown dataset {dataset!r}")
        self.min_area = min_area
        self.nms_thres = nms_thres

    def _membership(self, areas: np.ndarray, inter: np.ndarray):
        """Area filter + greedy clustering per image (shared greedy core).
        Returns (member [B,K,K] i8, nmem [B,K] f32, clusters per image)."""
        B, K = areas.shape
        member = np.zeros((B, K, K), np.int8)
        nmem = np.ones((B, K), np.float32)
        all_clusters: List[List[np.ndarray]] = []
        for b in range(B):
            valid = np.where(areas[b] > self.min_area)[0]
            clusters: List[np.ndarray] = []
            if valid.size:
                dice = dice_from_stats(areas[b, valid].astype(np.float32),
                                       inter[b][np.ix_(valid, valid)])
                for mem in clusters_from_dice(dice, self.thres1):
                    clusters.append(valid[np.asarray(mem, np.int64)])
            for c, mem in enumerate(clusters):
                member[b, c, mem] = 1
                nmem[b, c] = len(mem)
            all_clusters.append(clusters)
        return member, nmem, all_clusters

    def start(self, masks: jnp.ndarray, areas: np.ndarray,
              inter: np.ndarray):
        """Pipeline stage: greedy clustering on the (already landed) stats,
        then dispatch the postprocess tail.  BBBC's tail is one fused
        merge+paint program, so its pending tuple is terminal; CVPPP
        dispatches merge/re-binarize and starts the async host copies of
        the merged-mask statistics — :meth:`finish` reads them a batch
        later, by which time they have landed (this environment's relay
        charges ~150-400 ms for any blocking fetch of a *fresh* result but
        <10 ms once the async copy has completed)."""
        member, nmem, clusters = self._membership(areas, inter)
        B, K = areas.shape
        if self.dataset == "bbbc":
            perm = np.zeros((B, K), np.int32)
            count = np.zeros((B,), np.int32)
            for b, cls in enumerate(clusters):
                if not cls:
                    continue
                # f64: member areas are exact ints < 2^24 but their SUM can
                # exceed f32's integer range (300 x 265k pixels)
                frac_areas = np.array(
                    [areas[b, mem].astype(np.float64).sum() / len(mem)
                     for mem in cls])
                order = np.argsort(frac_areas, kind="stable")
                perm[b, : len(cls)] = order.astype(np.int32)
                count[b] = len(cls)
            labels = _merge_paint_frac(
                masks, jnp.asarray(member), jnp.asarray(nmem),
                jnp.asarray(perm), jnp.asarray(count))
            copy_to_host_async(labels)
            return ("done", labels)
        merged, m_stats = _merge_binarize(
            masks, jnp.asarray(member), jnp.asarray(nmem),
            jnp.float32(self.thres2))
        copy_to_host_async(m_stats)
        return ("nms", merged, m_stats, clusters)

    def finish(self, pending):
        """Pipeline stage: greedy MMI-NMS + ascending-area ordering on the
        landed merged statistics, dispatch the paint, start the label map's
        host copy.  Returns the device label array."""
        if pending[0] == "done":
            return pending[1]
        _, merged, m_stats, clusters = pending
        m_areas, m_inter = unpack_mask_stats(np.asarray(m_stats))
        B, K = m_areas.shape
        perm = np.zeros((B, K), np.int32)
        count = np.zeros((B,), np.int32)
        for b, cls in enumerate(clusters):
            nc = len(cls)
            if nc == 0:
                continue
            a = m_areas[b, :nc]
            scores = a / max(a.max(), 1e-5)
            keep = nms_keep(a, m_inter[b, :nc, :nc], scores, self.nms_thres)
            order = np.argsort(a[keep], kind="stable")
            p = np.asarray(keep, np.int32)[order]
            perm[b, : len(p)] = p
            count[b] = len(p)
        labels = _paint(merged, jnp.asarray(perm), jnp.asarray(count))
        copy_to_host_async(labels)
        return labels

    def __call__(self, masks: jnp.ndarray, areas: np.ndarray,
                 inter: np.ndarray, return_device: bool = False):
        """Serial convenience (tests, single-batch ``predict_labels``):
        stages run back to back.  Returns painted label maps — np.ndarray,
        or the device array (host copy in flight) when ``return_device``."""
        labels = self.finish(self.start(masks, areas, inter))
        return labels if return_device else np.asarray(labels)


def copy_to_host_async(arr) -> None:
    """Best-effort async device->host copy (no-op where unsupported).
    Through this environment's remote-TPU relay a blocking fetch of a
    fresh result costs ~150-400 ms regardless of size, but <10 ms once an
    async copy has landed — so every array the pipeline will read gets its
    copy started the moment it is dispatched."""
    try:
        arr.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        pass


def pipeline_batches(batches: Iterable, *stages):
    """Software pipeline for the eval loops (the reference's loop is
    strictly serial — trainer.py:398-450): ``stages`` are callables
    ``(batch, value) -> value`` with stage k running one batch behind
    stage k-1, so each stage's device results and async host copies have a
    full batch interval to land before the next stage blocks on them.
    Stage 0 receives ``(batch, None)``.  Yields ``(batch, final_value)``
    in input order.
    """
    qs = [deque() for _ in stages]  # qs[i]: outputs of stages[i]

    def _advance(force: bool):
        for i in range(len(stages) - 1):
            while qs[i] and (force or len(qs[i]) >= 2):
                b, v = qs[i].popleft()
                qs[i + 1].append((b, stages[i + 1](b, v)))
        out = []
        while qs[-1] and (force or len(qs[-1]) >= 2):
            out.append(qs[-1].popleft())
        return out

    for batch in batches:
        qs[0].append((batch, stages[0](batch, None)))
        yield from _advance(False)
    yield from _advance(True)
