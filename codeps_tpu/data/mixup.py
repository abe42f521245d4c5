"""Cross-domain mixup of pseudo-labeled target data into source frames.

Parity: datasets/mixup.py (/root/reference/datasets/mixup.py:22-658):
  - do_mixup: EMA predictions -> panoptic fusion -> pseudo instance
    labels; optional geometric augmentation (camera-to-camera warping of
    the target frame into the source intrinsics via unit-depth
    reprojection); strategy composition; center/offset GT recomputation
    from the mixed instance map.
  - cut_mixup: paste nof_segments random grid cells of the target into
    the source (the rare-class-scored cell selection variant is disabled
    by `or True` in the reference, mixup.py:104 — mirrored).
  - class_mixup: random half of the source classes keep their pixels,
    the rest come from the target.
  - conf_instance_mixup: paste whole target instances at the
    max-distance-transform x-position with occlusion conflict resolution.

Arrays are channel-last, unbatched (the reference asserts batch-of-1
throughout). Composition runs on host numpy — it is control-flow heavy
and off the TPU hot path; the warps and panoptic fusion use the jitted
TPU ops.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from codeps_tpu.data.dataset import get_offset_center
from codeps_tpu.ops.grid_sample import grid_sample
from codeps_tpu.ops.panoptic import get_panoptic_segmentation


def kornia_dist_row(mask: np.ndarray, row: int) -> np.ndarray:
    """kornia.contrib.distance_transform values of one ``row``, exactly.

    conf_instance_mixup consumes exactly ONE row of the distance map —
    dist_map[center_y, :] (mixup.py:587-590) — so only that row is
    computed. The reference's kornia call is an iterative-convolution
    chamfer: per iteration, convolve the reached-set indicator with an
    exp(-hypot(dy, dx)/0.35) 3x3 kernel (replicate border) and assign
    newly reached pixels i + cdt, cdt = -h*log(conv). Because the
    reached set grows by one 3x3 dilation per iteration, a pixel p is
    reached at iteration cheb(p)-1 (cheb = exact Chebyshev/L-inf
    distance to the mask), so the value kornia assigns is EXACTLY

        out(p) = (cheb(p) - 1) + cdt(p),
        cdt(p) = -h * log(sum over 3x3 taps q of
                          exp(-hypot(dy,dx)/h) * [cheb(clip(q)) < cheb(p)])

    — a closed form this function evaluates directly (no iteration):
    the Chebyshev term from an exact (W, W) lower envelope per needed
    row, the sub-pixel cdt tie-break from the 8 clamped neighbors.
    Verified tap-for-tap against a faithful reimplementation of
    kornia's published algorithm in
    tests/test_replay_buffer.py::test_conf_instance_dt_vs_kornia_algo
    (the earlier exact-Euclidean stand-in was WRONG at long range:
    kornia's ring growth is L-inf, and its argmax — the consumed paste
    offset — disagreed with Euclidean on ~25% of random masks).
    Mask pixels and the all-zero mask give 0, like kornia.

    Cost: three column-wise mins + three (W, W) envelopes — O(HW + W^2),
    ~2 ms at 512x1024, cheaper than any full-map transform.
    """
    height, width = mask.shape
    if not (mask > 0).any():
        return np.zeros(width, np.float64)
    binary = mask > 0
    rows = np.arange(height, dtype=np.float64)[:, None]
    cols = np.arange(width, dtype=np.float64)
    col_gap = np.abs(cols[:, None] - cols[None, :])  # (W, W)

    def cheb_row(y: int) -> np.ndarray:
        # cheb[y, x] = min_j max(|x - j|, min_{mask rows r in col j}|r-y|)
        gcol = np.where(binary, np.abs(rows - float(y)), np.inf).min(axis=0)
        return np.maximum(col_gap, gcol[None, :]).min(axis=1)

    r0, rm, rp = (cheb_row(row), cheb_row(max(row - 1, 0)),
                  cheb_row(min(row + 1, height - 1)))
    cheb3 = np.stack([rm, r0, rp])  # clamped rows row-1, row, row+1
    h = 0.35
    conv = np.zeros(width, np.float64)
    for dy in (-1, 0, 1):
        src = cheb3[dy + 1]
        w_ax = math.exp(-1.0 / h)
        w_di = math.exp(-math.hypot(1.0, 1.0) / h)
        for dx, wgt in ((-1, w_di if dy else w_ax),
                        (0, 1.0 if dy == 0 else w_ax),
                        (1, w_di if dy else w_ax)):
            if dy == 0 and dx == 0:
                continue  # p itself is never in its own reached set
            qx = np.clip(np.arange(width) + dx, 0, width - 1)
            conv += wgt * (src[qx] < r0)
    with np.errstate(divide="ignore"):
        cdt = -h * np.log(conv)
    return np.where(r0 > 0, (r0 - 1.0) + cdt, 0.0)


def distance_transform_manhattan(mask: np.ndarray) -> np.ndarray:
    """Manhattan distance to the nearest non-zero pixel (exact).

    Retained utility (replay-buffer tests exercise it); the
    conf_instance_mixup paste offset uses kornia_dist_row instead —
    kornia's conv chamfer grows in L-inf rings, matching neither the
    Manhattan nor the Euclidean transform at range. Pixels of an
    all-zero mask get H+W.

    The L1 DT is separable min-plus: the down/up row relaxations equal
    min_j d0[j] + |i - j| per column, which is two ``minimum.accumulate``
    scans of (d0 -/+ i) — no Python loop over rows/cols (the loop form
    cost ~ms per call, and conf_instance_mixup calls this once per
    pasted instance). Integer math, bit-identical to the 4-loop
    relaxation.
    """
    height, width = mask.shape
    inf = height + width
    d = np.where(mask > 0, 0, inf).astype(np.int32)
    ri = np.arange(height, dtype=np.int32)[:, None]
    down = np.minimum.accumulate(d - ri, axis=0) + ri
    up = np.minimum.accumulate((d + ri)[::-1], axis=0)[::-1] - ri
    d = np.minimum(down, up)
    ci = np.arange(width, dtype=np.int32)[None, :]
    left = np.minimum.accumulate(d - ci, axis=1) + ci
    right = np.minimum.accumulate((d + ci)[:, ::-1], axis=1)[:, ::-1] - ci
    d = np.minimum(left, right)
    return d.astype(np.float32)


def warp_c2c(intr_src: np.ndarray, intr_tgt: np.ndarray,
             in_src: np.ndarray, out_shape, depth_val: float = 1.0,
             interp_mode: str = "bilinear",
             padding_mode: str = "border") -> np.ndarray:
    """Camera-to-camera warp via unit-depth plane reprojection.

    Parity: Mixup.warp_c2c / _src_pcl_to_tgt (mixup.py:28-66, 210-229):
    the output grid (``out_shape`` = (H_out, W_out)) is backprojected at
    ``depth_val`` through ``intr_tgt``, projected through ``intr_src``,
    and ``in_src`` is sampled there.

    Args:
      in_src: (H_s, W_s) or (H_s, W_s, C) image to sample.
    """
    squeeze = in_src.ndim == 2
    if squeeze:
        in_src = in_src[..., None]
    h_out, w_out = out_shape
    h_src, w_src = in_src.shape[:2]

    fx_t, fy_t, cx_t, cy_t = [float(v) for v in np.asarray(intr_tgt)]
    fx_s, fy_s, cx_s, cy_s = [float(v) for v in np.asarray(intr_src)]

    u = np.arange(w_out, dtype=np.float32)[None, :]
    v = np.arange(h_out, dtype=np.float32)[:, None]
    x3d = depth_val * (u - cx_t) / fx_t
    y3d = depth_val * (v - cy_t) / fy_t
    z3d = max(depth_val, 1e-5)
    u2d = x3d / z3d * fx_s + cx_s
    v2d = y3d / z3d * fy_s + cy_s
    u2d = np.broadcast_to(u2d, (h_out, w_out))
    v2d = np.broadcast_to(v2d, (h_out, w_out))

    grid = np.stack([(u2d / (w_src - 1) - 0.5) * 2.0,
                     (v2d / (h_src - 1) - 0.5) * 2.0], axis=-1)
    out = grid_sample(jnp.asarray(in_src, jnp.float32)[None],
                      jnp.asarray(grid, jnp.float32)[None],
                      mode=interp_mode, padding_mode=padding_mode)
    out = np.asarray(out[0])
    return out[..., 0] if squeeze else out


class Mixup:
    """Mixup composition operating on single unbatched samples."""

    # -------------------------------------------------------- strategies

    @staticmethod
    def cut_mixup(rng: np.random.Generator, img_src, img_tgt, instance_src,
                  semantic_src, semantic_pred_tgt, instance_pred_tgt,
                  nof_vert_splits: int, nof_hor_splits: int,
                  nof_segments: int):
        """Grid-cell paste (mixup.py:88-148, 313-344).

        Note the reference's off-by-one: cell slices end at
        ``(k+1)*crop - 1`` exclusive, leaving 1px seams — mirrored.
        """
        height, width = img_tgt.shape[:2]
        nof_splits = nof_vert_splits * nof_hor_splits
        crop_h = height // nof_vert_splits
        crop_w = width // nof_hor_splits

        mask = np.zeros((height, width), bool)
        split_ids = rng.choice(nof_splits, nof_segments, replace=False)
        for split_id in split_ids:
            mul_x = split_id % nof_hor_splits
            mul_y = split_id // nof_hor_splits
            mask[mul_y * crop_h:(mul_y + 1) * crop_h - 1,
                 mul_x * crop_w:(mul_x + 1) * crop_w - 1] = True

        rgb = img_src.astype(np.float32).copy()
        rgb[mask] = img_tgt[mask].astype(np.float32)
        semantic = semantic_src.copy()
        semantic[mask] = semantic_pred_tgt[mask]
        instance = instance_src.astype(np.int32).copy()
        instance[mask] = instance_pred_tgt[mask].astype(np.int32)
        return rgb, semantic, instance

    @staticmethod
    def class_mixup(rng: np.random.Generator, img_src, img_tgt,
                    instance_src, semantic_src, semantic_pred_tgt,
                    instance_pred_tgt):
        """Random half of the source classes replaced by target content
        (mixup.py:68-86, 260-309)."""
        all_classes = np.unique(semantic_src)
        num = all_classes.shape[0]
        chosen = all_classes[rng.choice(num, (num + num % 2) // 2,
                                        replace=False)]
        mask = np.isin(semantic_src, chosen)

        rgb = img_src.astype(np.float32).copy()
        rgb[mask] = img_tgt[mask].astype(np.float32)
        semantic = semantic_src.copy()
        semantic[mask] = semantic_pred_tgt[mask]
        instance = instance_src.astype(np.int32).copy()
        instance[mask] = instance_pred_tgt[mask].astype(np.int32)
        return rgb, semantic, instance

    @staticmethod
    def conf_instance_mixup(img_src, img_tgt, instance_src, semantic_src,
                            semantic_pred_tgt, instance_pred_tgt,
                            min_inst_size: int, thing_list=None,
                            num_classes: int = 14,
                            conf_thresh: float = 0.0):
        """Paste whole target instances at the source position with
        maximum distance to existing things; later instances crop earlier
        ones on conflict (mixup.py:346-403, 541-658).

        When ``thing_list`` is given, the reference's exact instance-map
        derivation runs first (do_mixup -> get_conf_mask,
        mixup.py:444-446, 541-549): exact center/offset maps are
        recomputed from the (warped) ``instance_pred_tgt`` via
        get_offset_center (= the reference's Mixup.get_off_cen ->
        Dataset.get_offset_center) and RE-FUSED at
        threshold_center=``conf_thresh`` — renumbering the ids (which
        sets the paste iteration order) and intersecting the
        warped-semantic thing mask. Without ``thing_list`` the warped
        map is pasted directly (legacy shortcut, kept for callers
        without label metadata)."""
        if thing_list is not None:
            offset, center = get_offset_center(
                np.asarray(instance_pred_tgt, np.int32))
            _, refused, _ = get_panoptic_segmentation(
                jnp.asarray(np.asarray(semantic_pred_tgt, np.int32)),
                jnp.asarray(center[..., 0]), jnp.asarray(offset),
                tuple(thing_list), num_classes=num_classes,
                threshold=float(conf_thresh), do_merge=False)
            instance_pred_tgt = np.asarray(refused)
        height, width = semantic_pred_tgt.shape
        thing_msk = (instance_src != 0).astype(np.float32)

        rgb = img_src.astype(np.float32).copy()
        semantic = semantic_src.copy()
        instance = instance_src.astype(np.int32).copy()

        msk_src_accum = np.zeros((height, width), np.int32)
        instance_id_mask = np.zeros((height, width), np.int32)
        pasted = []  # (conf_id, tgt_idx, offset_x)

        for conf_id in np.unique(instance_pred_tgt):
            conf_id = int(conf_id)
            if conf_id == 0:
                continue
            inst_mask = instance_pred_tgt == conf_id
            if inst_mask.sum() < min_inst_size:
                continue
            idxs_tgt = np.argwhere(inst_mask)
            center = np.round(idxs_tgt.astype(np.float64).mean(0)).astype(int)

            dist_row = kornia_dist_row(thing_msk, int(center[0]))
            idx_max = int(np.argmax(dist_row))
            offset_x = idx_max - center[1]

            idxs_src = idxs_tgt.copy()
            idxs_src[:, 1] += offset_x
            min_x = idxs_src[:, 1].min()
            max_x = idxs_src[:, 1].max()
            if min_x < 0:
                idxs_src[:, 1] -= min_x
                offset_x -= min_x
            if max_x > width - 1:
                idxs_src[:, 1] -= max_x - (width - 1)
                offset_x -= max_x - (width - 1)

            msk_src_accum[idxs_src[:, 0], idxs_src[:, 1]] += 1
            if np.any(msk_src_accum > 1):
                # Conflict: the new instance wins the overlap; the
                # conflicting earlier instance is cropped
                # (mixup.py:611-637, "crop the new instance" comment is
                # stale — the code crops via msk_tgt zeroing).
                conflict_ids = np.unique(
                    instance_id_mask[msk_src_accum > 1])
                for conflicting in conflict_ids:
                    if conflicting == 0:
                        continue
                    conflict_idx = np.argwhere(
                        (msk_src_accum > 1)
                        & (instance_id_mask == conflicting))
                    tgt_idx = conflict_idx.copy()
                    tgt_idx[:, 1] -= offset_x
                    valid = (tgt_idx[:, 1] >= 0) & (tgt_idx[:, 1] < width)
                    inst_mask[tgt_idx[valid, 0], tgt_idx[valid, 1]] = False
                surviving = (msk_src_accum == 1) & (instance_id_mask == 0)
                instance_id_mask[surviving] = conf_id
            else:
                instance_id_mask[idxs_src[:, 0], idxs_src[:, 1]] = conf_id
            msk_src_accum = np.clip(msk_src_accum, 0, 1)

            src_idx = np.argwhere(instance_id_mask == conf_id)
            tgt_idx = src_idx.copy()
            tgt_idx[:, 1] -= offset_x
            valid = (tgt_idx[:, 1] >= 0) & (tgt_idx[:, 1] < width)
            src_idx, tgt_idx = src_idx[valid], tgt_idx[valid]
            pasted.append((conf_id, src_idx, tgt_idx))
            thing_msk[src_idx[:, 0], src_idx[:, 1]] = 1

        for conf_id, src_idx, tgt_idx in pasted:
            rgb[src_idx[:, 0], src_idx[:, 1]] = \
                img_tgt[tgt_idx[:, 0], tgt_idx[:, 1]].astype(np.float32)
            semantic[src_idx[:, 0], src_idx[:, 1]] = \
                semantic_pred_tgt[tgt_idx[:, 0], tgt_idx[:, 1]]
            instance[src_idx[:, 0], src_idx[:, 1]] = \
                instance_pred_tgt[tgt_idx[:, 0], tgt_idx[:, 1]].astype(
                    np.int32)
        return rgb, semantic, instance

    # ------------------------------------------------------------ driver

    @staticmethod
    def do_mixup(mixup_strategy: str, mixup_data: Dict[str, Any],
                 thing_list, cfg_mixup,
                 rng: Optional[np.random.Generator] = None,
                 num_classes: int = 14,
                 get_off_cen: bool = True) -> Dict[str, Any]:
        """Compose one mixup sample from raw materials + EMA predictions.

        Parity: Mixup.do_mixup (mixup.py:405-489). ``mixup_data`` holds
        channel-last unbatched arrays:
          rgb_src/rgb_tgt: {0: (H, W, 3)}, semantic_src/instance_src,
          camera_model_src/tgt (4,), semantic_pred_tgt_ema (H, W) labels,
          center_pred_tgt_ema (H, W, 1), offset_pred_tgt_ema (H, W, 2),
          tgt_is_replay.
        """
        if rng is None:
            rng = np.random.default_rng()
        strategy = mixup_strategy.split("/")[-1]
        for suffix in ("cut_mixup", "class_mixup", "conf_instance_mixup"):
            if mixup_strategy.endswith(suffix):
                strategy = suffix

        img_src = np.asarray(mixup_data["rgb_src"][0], np.float32)
        img_tgt = np.asarray(mixup_data["rgb_tgt"][0], np.float32)
        semantic_src = np.asarray(mixup_data["semantic_src"])
        instance_src = np.asarray(mixup_data["instance_src"])
        semantic_pred = np.asarray(mixup_data["semantic_pred_tgt_ema"])
        center_pred = np.asarray(mixup_data["center_pred_tgt_ema"])
        offset_pred = np.asarray(mixup_data["offset_pred_tgt_ema"])

        # EMA pseudo instance labels via panoptic fusion (mixup.py:415-417).
        _, instance_pred, _ = get_panoptic_segmentation(
            jnp.asarray(semantic_pred.astype(np.int32)),
            jnp.asarray(center_pred[..., 0]),
            jnp.asarray(offset_pred),
            tuple(thing_list), num_classes=num_classes)
        instance_pred = np.asarray(instance_pred)

        if cfg_mixup.general.geom_augment:
            intr_src = np.asarray(mixup_data["camera_model_src"])
            intr_tgt = np.asarray(mixup_data["camera_model_tgt"])
            out_shape = img_src.shape[:2]
            img_tgt = warp_c2c(intr_tgt, intr_src, img_tgt, out_shape,
                               interp_mode="bilinear", padding_mode="zeros")
            instance_pred = warp_c2c(
                intr_tgt, intr_src, instance_pred.astype(np.float32),
                out_shape, interp_mode="nearest",
                padding_mode="zeros").astype(instance_pred.dtype)
            semantic_pred = warp_c2c(
                intr_tgt, intr_src, semantic_pred.astype(np.float32),
                out_shape, interp_mode="nearest",
                padding_mode="border").astype(semantic_pred.dtype)

        if strategy == "class_mixup":
            rgb, semantic, instance = Mixup.class_mixup(
                rng, img_src, img_tgt, instance_src, semantic_src,
                semantic_pred, instance_pred)
        elif strategy == "cut_mixup":
            rgb, semantic, instance = Mixup.cut_mixup(
                rng, img_src, img_tgt, instance_src, semantic_src,
                semantic_pred, instance_pred,
                cfg_mixup.cut_mix.nof_vert_splits,
                cfg_mixup.cut_mix.nof_hor_splits,
                cfg_mixup.cut_mix.nof_segments)
        elif strategy == "conf_instance_mixup":
            rgb, semantic, instance = Mixup.conf_instance_mixup(
                img_src, img_tgt, instance_src, semantic_src,
                semantic_pred, instance_pred,
                cfg_mixup.conf_instance_mix.min_inst_size,
                thing_list=thing_list, num_classes=num_classes,
                conf_thresh=cfg_mixup.conf_instance_mix.conf_thresh)
        else:
            raise NotImplementedError(
                f"Mixup strategy not implemented: {mixup_strategy}")

        out = {
            "rgb": {0: rgb},
            "camera_model": mixup_data["camera_model_src"],
            "semantic": semantic,
            "instance": instance,
        }
        if get_off_cen:
            # NOTE: the reference always recomputes these on CPU
            # (mixup.py:399-402) but no adaptation loss ever consumes the
            # mixup center/offset (InstanceSegAlgo.adaptation reads only
            # the source entries, instance_seg.py:177-182) — callers on
            # the hot path pass get_off_cen=False.
            offset, center = get_offset_center(instance)
            out["center"] = center
            out["offset"] = offset
        return out
