"""Vectorized panoptic post-processing (Panoptic-DeepLab fusion).

Behavior parity with /root/reference/misc/post_processing_panoptic.py, but
redesigned for TPU: the reference's per-instance Python loops
(merge_semantic_and_instance, :155-220) become fixed-K tensor ops —
one-hot segment sums for majority voting, a K x K rank matrix for
per-class instance renumbering — so the whole fusion trades under jit
with static shapes.

Conventions (matching the reference):
  - instance id 0 = stuff/background; ids 1..K index NMS centers.
  - panoptic id  = semantic_class * label_divisor + instance_id,
    void = -1 (int32 here; the reference uses int16).
  - torch.mode resolves ties to the SMALLEST value; jnp.argmax's
    first-max rule over ascending class ids implements exactly that
    (do NOT reverse the class axis — that would pick the largest id).

Order parity: the reference enumerates centers in row-major spatial order
(torch.nonzero); after top-k selection we re-sort surviving centers by
flat position so instance ids match the reference whenever <= top_k
centers pass the threshold (the common case; beyond that, ids permute,
which PQ is invariant to).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class Centers(NamedTuple):
    yx: jnp.ndarray      # (K, 2) float32 center coordinates (y, x)
    score: jnp.ndarray   # (K,) heatmap score
    valid: jnp.ndarray   # (K,) bool


def find_instance_centers(center_heatmap: jnp.ndarray,
                          threshold: float = 0.1,
                          nms_kernel: int = 7,
                          top_k: int = 200) -> Centers:
    """Threshold + max-pool NMS + top-k on the center heatmap.

    Parity: find_instance_center
    (/root/reference/misc/post_processing_panoptic.py:31-70).

    Args:
      center_heatmap: (H, W) raw heatmap.
    """
    height, width = center_heatmap.shape
    hm = jnp.where(center_heatmap > threshold, center_heatmap, -1.0)

    pad = (nms_kernel - 1) // 2
    pooled = jax.lax.reduce_window(
        hm, -jnp.inf, jax.lax.max,
        window_dimensions=(nms_kernel, nms_kernel),
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)])
    keep = (hm == pooled) & (hm > 0)
    scores = jnp.where(keep, hm, 0.0).reshape(-1)

    # Reference keeps centers STRICTLY above the top_k-th score once the
    # candidate count reaches top_k (post_processing_panoptic.py:64-70:
    # nonzero(hm > top_k_scores[-1]) — at most top_k-1 survive, ties
    # with the k-th all drop); below top_k every positive survives.
    # Both cases are ONE rule over the exact k-th-largest threshold t of
    # the 0-sentineled score map (saturated: t = k-th positive score;
    # unsaturated: t = 0): survivors = scores > t. lax.top_k would sort
    # the whole H*W map on TPU; radix selection (ops/topk.py) plus a
    # block-cumsum compaction replaces sort + argsort, and yields the
    # survivors directly in raster order — the reference's id order
    # (torch.nonzero), previously restored with an extra argsort.
    from codeps_tpu.ops.topk import kth_largest
    t = kth_largest(scores, top_k)
    mask = scores > t

    n = scores.shape[0]
    block = 512
    padn = (-n) % block
    maskp = (jnp.concatenate([mask, jnp.zeros((padn,), bool)])
             if padn else mask)
    m2 = maskp.reshape(-1, block)
    bcnt = jnp.sum(m2, axis=1, dtype=jnp.int32)           # (G,)
    boff = jnp.cumsum(bcnt) - bcnt                        # exclusive
    ranks = jnp.arange(top_k, dtype=jnp.int32)
    # containing block of rank j: last g with boff[g] <= j (empty blocks
    # share the next block's boff, so side='right' skips them)
    g = (jnp.searchsorted(boff, ranks, side="right") - 1).astype(jnp.int32)
    rows = m2[g]                                          # (top_k, block)
    loc_rank = ranks - boff[g]
    loc_cum = jnp.cumsum(rows, axis=1) - 1
    hit = rows & (loc_cum == loc_rank[:, None])
    valid = jnp.any(hit, axis=1)                          # rank exists
    top_idx = g * block + jnp.sum(
        jnp.where(hit, jnp.arange(block, dtype=jnp.int32)[None, :], 0),
        axis=1)
    top_scores = jnp.where(valid, scores[top_idx], -1.0)

    ys = (top_idx // width).astype(jnp.float32)
    xs = (top_idx % width).astype(jnp.float32)
    return Centers(yx=jnp.stack([ys, xs], axis=-1), score=top_scores,
                   valid=valid)


def group_pixels(centers: Centers, offsets: jnp.ndarray,
                 chunk: int = 8) -> jnp.ndarray:
    """Assign each pixel the id (1..K) of its nearest offset-shifted center.

    Parity: group_pixels
    (/root/reference/misc/post_processing_panoptic.py:73-109). The K x H*W
    distance matrix is never materialized: a fori_loop over center chunks
    keeps a running (H*W,) min — bounded VMEM, VPU-friendly.

    Any top_k works: the center list is padded to a chunk multiple with
    infinitely-distant sentinels (the reference supports arbitrary
    top_k; the Pallas kernel still requires top_k % 8 == 0 and the
    caller auto-gates to this path otherwise).

    Args:
      offsets: (H, W, 2) with channels (offset_y, offset_x).
    """
    height, width, _ = offsets.shape
    k = centers.yx.shape[0]

    y_coord = jnp.arange(height, dtype=jnp.float32)[:, None]
    x_coord = jnp.arange(width, dtype=jnp.float32)[None, :]
    loc_y = (y_coord + offsets[..., 0]).reshape(-1)
    loc_x = (x_coord + offsets[..., 1]).reshape(-1)

    ctr_y = jnp.where(centers.valid, centers.yx[:, 0], jnp.inf)
    ctr_x = jnp.where(centers.valid, centers.yx[:, 1], jnp.inf)
    pad = (-k) % chunk
    if pad:
        ctr_y = jnp.concatenate(
            [ctr_y, jnp.full((pad,), jnp.inf, ctr_y.dtype)])
        ctr_x = jnp.concatenate(
            [ctr_x, jnp.full((pad,), jnp.inf, ctr_x.dtype)])
        k += pad

    def body(i, carry):
        best_dist, best_id = carry
        sl = jax.lax.dynamic_slice_in_dim
        cy = sl(ctr_y, i * chunk, chunk)
        cx = sl(ctr_x, i * chunk, chunk)
        dy = cy[:, None] - loc_y[None, :]
        dx = cx[:, None] - loc_x[None, :]
        dist = dy * dy + dx * dx                     # (chunk, H*W)
        dist = jnp.where(jnp.isnan(dist), jnp.inf, dist)
        chunk_best = jnp.min(dist, axis=0)
        chunk_arg = jnp.argmin(dist, axis=0) + i * chunk
        take = chunk_best < best_dist
        return (jnp.where(take, chunk_best, best_dist),
                jnp.where(take, chunk_arg, best_id))

    init = (jnp.full((height * width,), jnp.inf, jnp.float32),
            jnp.zeros((height * width,), jnp.int32))
    _, best_id = jax.lax.fori_loop(0, k // chunk, body, init)
    instance_id = (best_id + 1).reshape(height, width)
    # No centers at all -> all-zero instance map (reference:147-149).
    return jnp.where(jnp.any(centers.valid), instance_id, 0)


def _thing_mask_from_semantic(semantic: jnp.ndarray,
                              thing_list: Sequence[int]) -> jnp.ndarray:
    mask = jnp.zeros_like(semantic, dtype=jnp.bool_)
    for thing_class in thing_list:
        mask = mask | (semantic == thing_class)
    return mask


def merge_semantic_and_instance(semantic: jnp.ndarray,
                                instance: jnp.ndarray,
                                centers_valid: jnp.ndarray,
                                thing_list: Sequence[int],
                                label_divisor: int = 1000,
                                stuff_area: int = 0,
                                void_label: int = 255,
                                num_classes: int | None = None) -> jnp.ndarray:
    """Fuse semantic classes with class-agnostic instances -> panoptic ids.

    Parity: merge_semantic_and_instance
    (/root/reference/misc/post_processing_panoptic.py:155-220), vectorized:

      - majority vote per instance: (K+1, C) count matrix via one-hot
        scatter-add; argmax == torch.mode (smallest id on ties).
      - per-class instance renumbering in ascending original-id order via
        a K x K lower-triangular same-class count.
      - stuff pasted on non-instance pixels with an area threshold.

    ``centers_valid`` contributes only its STATIC length K (the
    instance-id budget); per-center validity is re-derived from vote
    counts (inst_exists below), exactly as the reference derives
    existence from pixel membership.
    """
    assert num_classes is not None
    height, width = semantic.shape
    k = centers_valid.shape[0]
    semantic = semantic.astype(jnp.int32)

    semantic_thing = _thing_mask_from_semantic(semantic, thing_list)
    thing_seg = instance > 0

    # Void pixels get a dedicated class slot C (never a valid class id).
    class_idx = jnp.where(semantic == void_label, num_classes, semantic)
    num_slots = num_classes + 1

    # ---- majority vote: counts[inst, class] over voting pixels.
    # TPU scatters/gathers serialize per ROW (~7.5 ms per 1M rows on
    # v5e), so a 491k-pixel scatter-add into (K+1)*C bins costs ~4 ms.
    # The same contraction as a one-hot matmul rides the MXU instead:
    # counts = inst_onehot^T @ class_onehot, ~0.3 ms bandwidth-bound.
    # Counts are < 2^24, exact in the f32 accumulator (bf16 0/1 inputs
    # are exact); integer results are bit-identical to the scatter.
    votes = semantic_thing & thing_seg
    pix_inst = instance.astype(jnp.int32)
    flat_inst = pix_inst.reshape(-1)
    flat_class = class_idx.reshape(-1)
    inst_oh = ((flat_inst[:, None] == jnp.arange(1, k + 1)[None, :])
               & votes.reshape(-1)[:, None])          # (N, K) — id 0 drops
    class_oh = flat_class[:, None] == jnp.arange(num_slots)[None, :]
    counts = jax.lax.dot_general(
        inst_oh.astype(jnp.bfloat16), class_oh.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.int32)  # (K, C)
    counts = jnp.concatenate(
        [jnp.zeros((1, num_slots), jnp.int32), counts])  # id 0 is stuff

    inst_exists = jnp.sum(counts, axis=1) > 0      # (K+1,)
    inst_class = jnp.argmax(counts, axis=1)        # torch.mode parity

    # ---- per-class renumbering: rank among existing instances of the same
    # class, in ascending original-id order (reference:189-207).
    ids = jnp.arange(k + 1)
    same_class = inst_class[None, :] == inst_class[:, None]
    earlier = (ids[None, :] <= ids[:, None]) & inst_exists[None, :]
    new_inst_id = jnp.sum(same_class & earlier, axis=1)  # 1-based rank

    # ---- stuff area over non-instance pixels per class: 15 bins, so a
    # compare+reduce beats the 491k-row scatter (same serialization
    # economics as above).
    stuff_votes = ~thing_seg
    stuff_counts = jnp.sum(
        class_oh & stuff_votes.reshape(-1)[:, None], axis=0,
        dtype=jnp.int32)                               # (C,)
    is_thing_class = jnp.zeros((num_slots,), jnp.bool_)
    for thing_class in thing_list:
        is_thing_class = is_thing_class.at[thing_class].set(True)

    # ---- per-pixel table lookups. The three thing lookups share the
    # pix_inst index and the two stuff lookups share class_idx: pack
    # each group into ONE gather (rows dominate gather cost, width is
    # nearly free). thing_pan/thing_valid/stuff_ok arithmetic folds
    # into the packed tables where it only depends on table entries.
    thing_table = jnp.stack(
        [inst_class * label_divisor + new_inst_id,     # thing_pan value
         inst_exists.astype(jnp.int32)], axis=-1)      # (K+1, 2)
    thing_rows = thing_table[pix_inst]                 # (H, W, 2)
    thing_pan = thing_rows[..., 0]
    thing_valid = votes & (thing_rows[..., 1] > 0)

    stuff_class_ok = (~is_thing_class) & (stuff_counts >= stuff_area)
    stuff_ok = (stuff_class_ok[class_idx]
                & (semantic != void_label)
                & stuff_votes)
    stuff_pan = jnp.where(semantic == void_label, -1,
                          semantic * label_divisor)

    pan = jnp.full((height, width), -1, jnp.int32)
    pan = jnp.where(stuff_ok, stuff_pan, pan)
    pan = jnp.where(thing_valid, thing_pan, pan)
    return pan


@functools.partial(jax.jit, static_argnames=(
    "thing_list", "label_divisor", "stuff_area", "void_label", "threshold",
    "nms_kernel", "top_k", "num_classes", "do_merge", "use_pallas"))
def get_panoptic_segmentation(
    semantic_probs: jnp.ndarray,
    center_heatmap: jnp.ndarray,
    offsets: jnp.ndarray,
    thing_list: tuple[int, ...],
    label_divisor: int = 1000,
    stuff_area: int = 0,
    void_label: int = 255,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    top_k: int = 200,
    foreground_mask: jnp.ndarray | None = None,
    num_classes: int | None = None,
    do_merge: bool = True,
    use_pallas: bool | None = None,
):
    """Single-image panoptic fusion.

    Parity: get_panoptic_segmentation
    (/root/reference/misc/post_processing_panoptic.py:223-300). Defaults
    match InstanceSegAlgo.panoptic_fusion
    (/root/reference/algos/instance_seg.py:233-240).

    Args:
      semantic_probs: (H, W, C) class probabilities, or (H, W) precomputed
        integer labels.
      center_heatmap: (H, W).
      offsets: (H, W, 2), channels (dy, dx).
      foreground_mask: optional thing mask — (H, W) binary, or the raw
        (H, W, 2) two-channel head output (argmaxed internally, like
        the reference's 4-dim branch).

    Returns:
      (panoptic (H, W) int32 or None, instance (H, W) int32, Centers)
    """
    if semantic_probs.ndim == 3:
        semantic = jnp.argmax(semantic_probs, axis=-1).astype(jnp.int32)
        if num_classes is None:
            num_classes = semantic_probs.shape[-1]
    else:
        semantic = semantic_probs.astype(jnp.int32)
        assert num_classes is not None, \
            "num_classes required with precomputed labels"

    centers = find_instance_centers(center_heatmap, threshold, nms_kernel,
                                    top_k)
    height, width = center_heatmap.shape
    if use_pallas is None:
        # Auto: the Pallas grouping kernel on TPU when shapes tile cleanly
        # (all published feed sizes do).
        use_pallas = (jax.default_backend() == "tpu"
                      and width % 128 == 0 and height % 8 == 0
                      and top_k % 8 == 0)
    if use_pallas:
        from codeps_tpu.ops.pallas.grouping import group_pixels_pallas
        raw_instance = group_pixels_pallas(centers.yx, centers.valid,
                                           offsets)
    else:
        raw_instance = group_pixels(centers, offsets)

    if foreground_mask is not None:
        if foreground_mask.ndim == 3:
            # Raw 2-channel thing-mask (softmax/logits): argmax, like
            # the reference's 4-dim branch
            # (post_processing_panoptic.py:56-60).
            foreground_mask = jnp.argmax(foreground_mask, axis=-1)
        thing_seg = foreground_mask.astype(jnp.int32)
    else:
        thing_seg = _thing_mask_from_semantic(semantic,
                                              thing_list).astype(jnp.int32)
    instance = thing_seg * raw_instance

    panoptic = None
    if do_merge:
        panoptic = merge_semantic_and_instance(
            semantic, instance, centers.valid, thing_list, label_divisor,
            stuff_area, void_label, num_classes=num_classes)
    return panoptic, instance, centers


def panoptic_fusion_batch(semantic_probs, center, offsets, thing_list,
                          threshold: float = 0.1, nms_kernel: int = 7,
                          top_k: int = 200, label_divisor: int = 1000,
                          stuff_area: int = 0, void_label: int = 255,
                          thing_mask=None):
    """Batched fusion via vmap.

    Parity: InstanceSegAlgo.panoptic_fusion
    (/root/reference/algos/instance_seg.py:207-258), which loops over the
    batch calling the single-image routine; here it's one vmapped program.

    Args:
      semantic_probs: (B, H, W, C) probabilities.
      center: (B, H, W, 1).
      offsets: (B, H, W, 2).
      thing_mask: optional — (B, H, W) binary, or the raw (B, H, W, 2)
        InstanceHead thing-mask output (argmaxed internally).
    """
    def one(sem, ctr, off, fg):
        return get_panoptic_segmentation(
            sem, ctr[..., 0], off, tuple(thing_list),
            label_divisor=label_divisor, stuff_area=stuff_area,
            void_label=void_label, threshold=threshold,
            nms_kernel=nms_kernel, top_k=top_k, foreground_mask=fg)

    if thing_mask is None:
        pan, inst, centers = jax.vmap(
            lambda s, c, o: one(s, c, o, None))(semantic_probs, center,
                                                offsets)
    else:
        pan, inst, centers = jax.vmap(one)(semantic_probs, center, offsets,
                                           thing_mask)
    return pan, inst, centers
