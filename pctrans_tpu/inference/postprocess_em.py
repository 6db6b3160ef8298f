"""Legacy EM post-processing: probability maps -> instance masks.

Equivalent of the reference watershed/connected-component zoo
(connectomics/utils/process.py): ``binary_connected``:191,
``binary_watershed``:217, ``bc_connected``:252, ``bc_watershed``:290,
``bcd_watershed``:335 and ``polarity2instance``:386.  Inputs are
``(C, Z, Y, X)`` uint8 probability volumes scaled to [0, 255], matching the
reference's ``int(255*thres)`` thresholding.

skimage is not in this image, so the marker-based watershed is implemented
here as a bucket-queue flood (:func:`watershed`): intensity levels descend
from high to low semantic probability; at each level labels expand into
connected unlabeled mask voxels (plateaus flood breadth-first via repeated
neighborhood dilation).  Ties between adjacent basins resolve to the larger
label id — watershed tie-breaking is implementation-defined in skimage too.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import ndimage


def cast2dtype(segm: np.ndarray) -> np.ndarray:
    """Cast a label volume to the smallest sufficient unsigned dtype
    (process.py cast2dtype)."""
    mx = segm.max() if segm.size else 0
    for dt in (np.uint8, np.uint16, np.uint32):
        if mx <= np.iinfo(dt).max:
            return segm.astype(dt)
    return segm.astype(np.uint64)


def remove_small_objects(segm: np.ndarray, min_size: int) -> np.ndarray:
    """Zero out connected instances smaller than ``min_size`` voxels."""
    if min_size <= 0:
        return segm
    counts = np.bincount(segm.ravel())
    small = np.where(counts < min_size)[0]
    out = segm.copy()
    out[np.isin(out, small[small > 0])] = 0
    return out


def remove_small_instances(segm: np.ndarray, thres_small: int,
                           mode: str = "background") -> np.ndarray:
    """process.py remove_small_instances: drop (or reassign) small instances.

    ``background``: set to 0; ``neighbor``: absorb into the most frequent
    adjacent instance; ``none``: keep everything."""
    if mode == "none" or thres_small <= 0:
        return segm
    if mode == "background":
        return remove_small_objects(segm, thres_small)
    assert mode == "neighbor"
    counts = np.bincount(segm.ravel())
    out = segm.copy()
    for idx in np.where(counts < thres_small)[0]:
        if idx == 0 or counts[idx] == 0:
            continue
        region = out == idx
        ring = ndimage.binary_dilation(region) & ~region
        neigh = out[ring]
        neigh = neigh[neigh != idx]
        target = np.bincount(neigh).argmax() if neigh.size else 0
        out[region] = target
    return out


def watershed(neg_image: np.ndarray, markers: np.ndarray,
              mask: Optional[np.ndarray] = None,
              flood_iters: int = 8) -> np.ndarray:
    """Marker-based watershed on ``neg_image`` (lower floods first), the
    call signature of ``skimage.segmentation.watershed`` as used by
    process.py (always ``watershed(-semantic, seed, mask=foreground)``).

    Cost model: per intensity level, labels expand by one neighborhood step
    per dilation pass, capped at ``flood_iters`` passes (unbounded flooding
    would cost O(levels x basin-diameter) whole-volume max-filters on large
    EM volumes).  Anything still unlabeled after the level sweep is assigned
    to the euclidean-nearest labeled voxel in one EDT pass — an
    approximation of flood order only for basins wider than
    ``flood_iters * levels`` voxels, and of geodesic distance in strongly
    concave masks."""
    if mask is None:
        mask = np.ones(neg_image.shape, bool)
    labels = np.where(mask, markers, 0).astype(np.int32)
    # quantize flood levels: ascend neg_image = descend semantic
    q = neg_image
    if not np.issubdtype(q.dtype, np.integer):
        finite = q[np.isfinite(q)]
        if finite.size == 0:
            return labels
        lo, hi = float(finite.min()), float(finite.max())
        q = np.clip(((q - lo) / (hi - lo + 1e-12) * 255), 0, 255).astype(np.int32)
    levels = np.unique(q[mask])
    for level in levels:
        active = mask & (q <= level)
        for _ in range(flood_iters):
            neighbor_max = ndimage.grey_dilation(
                labels, size=(3,) * labels.ndim)
            new = (labels == 0) & active & (neighbor_max > 0)
            if not new.any():
                break
            labels[new] = neighbor_max[new]
    # EDT-nearest cleanup for voxels the bounded flood did not reach
    todo = mask & (labels == 0)
    if todo.any() and (labels > 0).any():
        inds = ndimage.distance_transform_edt(
            labels == 0, return_indices=True, return_distances=False)
        labels = np.where(todo, labels[tuple(inds)], labels)
    return labels


def _maybe_rescale(segm: np.ndarray, scale_factors: Tuple[float, ...]) -> np.ndarray:
    if all(s == 1.0 for s in scale_factors):
        return segm
    return ndimage.zoom(segm, scale_factors, order=0)


def binary_connected(volume, thres=0.8, thres_small=128,
                     scale_factors=(1.0, 1.0, 1.0),
                     remove_small_mode="background"):
    """Foreground probability -> instances by connected components
    (process.py:191-215)."""
    semantic = volume[0]
    foreground = semantic > int(255 * thres)
    segm, _ = ndimage.label(foreground)
    segm = remove_small_instances(segm, thres_small, remove_small_mode)
    return cast2dtype(_maybe_rescale(segm, scale_factors))


def binary_watershed(volume, thres1=0.98, thres2=0.85, thres_small=128,
                     scale_factors=(1.0, 1.0, 1.0),
                     remove_small_mode="background", seed_thres=32):
    """Foreground probability -> instances by seeded watershed
    (process.py:217-249)."""
    semantic = volume[0]
    seed_map = semantic > int(255 * thres1)
    foreground = semantic > int(255 * thres2)
    seed, _ = ndimage.label(seed_map)
    seed = remove_small_objects(seed, seed_thres)
    segm = watershed(-semantic.astype(np.float64), seed, mask=foreground)
    segm = remove_small_instances(segm, thres_small, remove_small_mode)
    return cast2dtype(_maybe_rescale(segm, scale_factors))


def bc_connected(volume, thres1=0.8, thres2=0.5, thres_small=128,
                 scale_factors=(1.0, 1.0, 1.0), dilation_struct=(1, 5, 5),
                 remove_small_mode="background"):
    """Foreground + contour -> instances by connected components with
    morphological dilation (process.py:252-287)."""
    semantic, boundary = volume[0], volume[1]
    foreground = (semantic > int(255 * thres1)) & (boundary < int(255 * thres2))
    segm, _ = ndimage.label(foreground)
    segm = ndimage.grey_dilation(segm, size=dilation_struct)
    segm = remove_small_instances(segm, thres_small, remove_small_mode)
    return cast2dtype(_maybe_rescale(segm, scale_factors))


def bc_watershed(volume, thres1=0.9, thres2=0.8, thres3=0.85, thres_small=128,
                 scale_factors=(1.0, 1.0, 1.0),
                 remove_small_mode="background", seed_thres=32,
                 return_seed=False, precomputed_seed=None):
    """Foreground + contour -> instances by seeded watershed
    (process.py:290-333)."""
    assert volume.shape[0] == 2
    semantic, boundary = volume[0], volume[1]
    foreground = semantic > int(255 * thres3)
    if precomputed_seed is not None:
        seed = precomputed_seed
    else:
        seed_map = (semantic > int(255 * thres1)) & (boundary < int(255 * thres2))
        seed, _ = ndimage.label(seed_map)
        seed = remove_small_objects(seed, seed_thres)
    segm = watershed(-semantic.astype(np.float64), seed, mask=foreground)
    segm = remove_small_instances(segm, thres_small, remove_small_mode)
    segm = cast2dtype(_maybe_rescale(segm, scale_factors))
    return (segm, seed) if return_seed else segm


def bcd_watershed(volume, thres1=0.9, thres2=0.8, thres3=0.85, thres4=0.5,
                  thres5=0.0, thres_small=128, scale_factors=(1.0, 1.0, 1.0),
                  remove_small_mode="background", seed_thres=32,
                  return_seed=False, precomputed_seed=None):
    """Foreground + contour + signed EDT -> instances by seeded watershed
    (process.py:335-383)."""
    assert volume.shape[0] == 3
    semantic, boundary, distance = volume[0], volume[1], volume[2]
    distance = (distance / 255.0) * 2.0 - 1.0
    foreground = (semantic > int(255 * thres3)) & (distance > thres5)
    if precomputed_seed is not None:
        seed = precomputed_seed
    else:
        seed_map = ((semantic > int(255 * thres1))
                    & (boundary < int(255 * thres2)) & (distance > thres4))
        seed, _ = ndimage.label(seed_map)
        seed = remove_small_objects(seed, seed_thres)
    segm = watershed(-semantic.astype(np.float64), seed, mask=foreground)
    segm = remove_small_instances(segm, thres_small, remove_small_mode)
    segm = cast2dtype(_maybe_rescale(segm, scale_factors))
    return (segm, seed) if return_seed else segm


def mc_baseline(affs: np.ndarray, fragments: Optional[np.ndarray] = None,
                merge_thres: float = 0.5, seed_thres: float = 0.25,
                min_seed_size: int = 8) -> np.ndarray:
    """Multicut-style affinity agglomeration baseline (process.py:103-188).

    The reference shells out to elf/nifty's exact multicut solver (not in
    this image); this rebuilds the same pipeline with a greedy additive
    edge contraction (GAEC) approximation of the multicut objective:

    1. boundary map from the affinity channels (process.py:109-122:
       2-channel -> mean of inverted xy affinities; 3-channel -> max of
       inverted y/x; 1-channel or raw 3D -> as-is);
    2. per-slice distance-transform watershed over-segmentation into
       fragments (offset per slice so ids are unique, process.py:130-136);
    3. region-adjacency edges weighted by the mean boundary probability
       along the shared surface;
    4. merge edges in ascending cost order while cost < ``merge_thres``
       (union-find) — the greedy multicut surrogate.
    """
    if affs.ndim == 4:
        if affs.shape[0] == 2:
            inv = 1.0 - affs.astype(np.float64)
            boundary = (inv[0] + inv[1]) / 2.0
        elif affs.shape[0] == 3:
            inv = 1.0 - affs.astype(np.float64)
            boundary = np.maximum(inv[1], inv[2])
        else:
            boundary = affs[0].astype(np.float64)
    else:
        boundary = affs.astype(np.float64)
    if boundary.max() > 1.5:  # uint8-scaled input
        boundary = boundary / 255.0

    if fragments is None:
        fragments = np.zeros(boundary.shape, np.int64)
        offset = 0
        for z in range(boundary.shape[0]):
            fg = boundary[z] < 0.5
            edt = ndimage.distance_transform_edt(fg)
            seeds, _ = ndimage.label(
                ndimage.gaussian_filter(edt, 2.0) >
                max(1.0, np.percentile(edt[fg], 75) if fg.any() else 1.0))
            seeds = remove_small_objects(seeds, min_seed_size)
            if seeds.max() == 0:  # no interior: fall back to low-boundary
                seeds, _ = ndimage.label(boundary[z] < seed_thres)
            ws = watershed(boundary[z], seeds)
            fragments[z] = ws + offset * (ws > 0)
            offset += int(ws.max())

    # region adjacency: mean boundary value along each touching surface
    edge_sum: dict = {}
    edge_cnt: dict = {}
    for axis in range(fragments.ndim):
        sl_a = [slice(None)] * fragments.ndim
        sl_b = [slice(None)] * fragments.ndim
        sl_a[axis] = slice(None, -1)
        sl_b[axis] = slice(1, None)
        a, b = fragments[tuple(sl_a)], fragments[tuple(sl_b)]
        ba, bb = boundary[tuple(sl_a)], boundary[tuple(sl_b)]
        m = (a != b) & (a > 0) & (b > 0)
        lo = np.minimum(a[m], b[m])
        hi = np.maximum(a[m], b[m])
        val = (ba[m] + bb[m]) / 2.0
        for k, v in zip(lo * (fragments.max() + 1) + hi, val):
            edge_sum[k] = edge_sum.get(k, 0.0) + v
            edge_cnt[k] = edge_cnt.get(k, 0) + 1

    n = int(fragments.max()) + 1
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    base = fragments.max() + 1
    edges = sorted((edge_sum[k] / edge_cnt[k], k) for k in edge_sum)
    for cost, k in edges:
        if cost >= merge_thres:
            break
        ra, rb = find(int(k // base)), find(int(k % base))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    lut = np.array([find(i) for i in range(n)], np.int64)
    merged = lut[fragments]
    # relabel consecutive, 0 reserved for background even when absent
    uniq = np.unique(merged)
    fg_ids = uniq[uniq > 0]
    relab = np.zeros(int(uniq.max()) + 1, np.int64)
    relab[fg_ids] = np.arange(1, len(fg_ids) + 1)
    return cast2dtype(relab[merged])


def polarity2instance(volume, thres=0.5, thres_small=128,
                      scale_factors=(1.0, 1.0, 1.0), semantic=False,
                      dilate_sz=5):
    """Synaptic polarity (pre, post, union) -> instances or semantic classes
    (process.py:386+): threshold the union channel, dilate it, connected-
    component the union, and split each synapse into its pre (2k-1) / post
    (2k) parts; ``semantic=True`` returns {0, 1, 2} classes instead."""
    pre = volume[0] > int(255 * thres)
    post = volume[1] > int(255 * thres)
    union = volume[2] > int(255 * thres)
    union = ndimage.binary_dilation(
        union, structure=np.ones((1, dilate_sz, dilate_sz), bool))
    pre, post = pre & union, post & union

    if semantic:
        seg = np.zeros(pre.shape, np.uint8)
        seg[pre] = 1
        seg[post] = 2
        return cast2dtype(_maybe_rescale(seg, scale_factors))

    synapses, n = ndimage.label(union)
    synapses = remove_small_objects(synapses, thres_small)
    seg = np.zeros(pre.shape, np.int64)
    seg[pre] = synapses[pre] * 2 - 1
    seg[post] = synapses[post] * 2
    seg[seg < 0] = 0
    return cast2dtype(_maybe_rescale(seg, scale_factors))
