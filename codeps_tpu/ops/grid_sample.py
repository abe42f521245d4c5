"""Differentiable image sampling (grid_sample) for NHWC tensors.

Semantics match ``torch.nn.functional.grid_sample(mode=..., padding_mode=
'border', align_corners=True)`` as used by the warper
(/root/reference/misc/image_warper.py:178-182). Grids hold normalized
coordinates in [-1, 1] ordered (u, v) = (x, y).

Implemented as gathers over the flattened spatial axis; XLA fuses the
weight computation into the gather consumers. A Pallas kernel can replace
this on the photometric hot path if profiling warrants.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] -> [0, size-1] with align_corners=True."""
    return (coords + 1.0) * 0.5 * (size - 1)


def _gather_2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """Gather pixels: img (B, H, W, C), iy/ix (B, Ho, Wo) int32 -> (B, Ho, Wo, C)."""
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    idx = iy * w + ix  # (B, Ho, Wo)
    out = jnp.take_along_axis(
        flat, idx.reshape(b, -1, 1), axis=1)  # (B, Ho*Wo, C)
    return out.reshape(b, iy.shape[1], iy.shape[2], c)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                mode: str = "bilinear",
                padding_mode: str = "border") -> jnp.ndarray:
    """Sample ``img`` at ``grid`` locations.

    Args:
      img:  (B, H, W, C) source image.
      grid: (B, Ho, Wo, 2) normalized (u, v) coordinates in [-1, 1].
      mode: 'bilinear' or 'nearest'.
      padding_mode: 'border' (clamp) or 'zeros' (out-of-range reads 0,
        with torch's bilinear edge weighting).

    Returns:
      (B, Ho, Wo, C) sampled image, align_corners=True.
    """
    _, h, w, _ = img.shape
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)

    if padding_mode == "zeros":
        if mode == "nearest":
            # torch nearest uses std::nearbyint = round-half-to-EVEN
            # (verified vs torch CPU at exactly-representable .5 coords:
            # x=[0.5,1.5,2.5,3.5] -> pixels [0,2,2,4]); jnp.round
            # matches. floor(x+0.5) would shift every exact tie by +1.
            ix = jnp.round(x)
            iy = jnp.round(y)
            inside = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
            ix = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
            iy = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
            out = _gather_2d(img, iy, ix)
            return out * inside[..., None].astype(out.dtype)
        # Packed taps for zeros padding too (see the border-mode note on
        # TPU gather economics below: 4 gathers -> 1). The tap table is
        # built over x0 in [-1, w-1] / y0 in [-1, h-1] (one extra
        # top/left row, edge-replicated) so every in-range TAP reads its
        # true pixel even when the anchor (x0, y0) itself is outside;
        # out-of-range taps read a replicated neighbor and are zeroed
        # through their weight, exactly like the 4-gather formulation
        # (bit-identical: same per-tap multiply order, 0 * finite == 0).
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        jj = (jnp.clip(y0, -1, h - 1) + 1).astype(jnp.int32)  # [0, h]
        ii = (jnp.clip(x0, -1, w - 1) + 1).astype(jnp.int32)  # [0, w]
        padded = jnp.concatenate([img[:, :1], img], axis=1)
        padded = jnp.concatenate([padded[:, :, :1], padded], axis=2)
        taps = _gather_2d(_pack_taps(padded), jj, ii)  # (B, Ho, Wo, 4C)
        c = img.shape[-1]
        v00, v01, v10, v11 = (taps[..., :c], taps[..., c:2 * c],
                              taps[..., 2 * c:3 * c], taps[..., 3 * c:])
        vals = 0.0
        for gi, dy, dx, wgt_y, wgt_x in (
                (v00, 0, 0, 1.0 - wy, 1.0 - wx),
                (v01, 0, 1, 1.0 - wy, wx),
                (v10, 1, 0, wy, 1.0 - wx),
                (v11, 1, 1, wy, wx)):
            inside = ((x0 + dx >= 0) & (x0 + dx <= w - 1)
                      & (y0 + dy >= 0) & (y0 + dy <= h - 1))
            vals = vals + gi * wgt_x * wgt_y \
                * inside[..., None].astype(gi.dtype)
        return vals

    if padding_mode != "border":
        raise ValueError(f"Unsupported padding mode: {padding_mode}")

    if mode == "bilinear":
        # TPU gathers serialize per gathered ROW, almost independent of
        # row width (measured: 3-wide 7.5ms vs 128-wide 11.8ms per 1M rows
        # on v5e). Packing the 2x2 taps into one 4C-wide row via
        # edge-replicated shifts turns 4 gathers into 1 (~3.3x faster
        # warps); values are bit-identical to the 4-gather formulation.
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)

        taps = _gather_2d(_pack_taps(img), iy0, ix0)  # (B, Ho, Wo, 4C)
        c = img.shape[-1]
        v00, v01, v10, v11 = (taps[..., :c], taps[..., c:2 * c],
                              taps[..., 2 * c:3 * c], taps[..., 3 * c:])
        top = v00 * (1.0 - wx) + v01 * wx
        bottom = v10 * (1.0 - wx) + v11 * wx
        return top * (1.0 - wy) + bottom * wy

    if mode == "nearest":
        # torch nearest uses std::nearbyint = round-half-to-EVEN
        # (verified vs torch CPU at exactly-representable .5 coords);
        # jnp.round matches that tie-break exactly.
        ix = jnp.clip(jnp.round(x), 0, w - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.round(y), 0, h - 1).astype(jnp.int32)
        return _gather_2d(img, iy, ix)

    raise ValueError(f"Unsupported mode: {mode}")


def _pack_taps(img: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 4C) edge-replicated 2x2 tap pack."""
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down_right = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    return jnp.concatenate([img, right, down, down_right], axis=-1)


def prewarp_host(x, y, height: int, width: int):
    """Host-side (numpy, float64) tap/weight precomputation for
    ``grid_sample_pair_pre``.

    Why this exists: when the coordinate chain lives INSIDE a jitted
    program, XLA duplicates it into the gather-index operand and may
    contract the two copies differently (measured on CPU: the index copy
    picked tap x=17 while the weight copy said x=16 with wx=0 at an
    exactly-integer warp coordinate — a 0.079 RGB error). The reference
    sidesteps the whole class by warping in float64
    (/root/reference/datasets/mixup.py:224-226, ``F.grid_sample(
    in_src.double(), pixel_coords.double(), align_corners=True)``).
    Precomputing the INTEGER tap anchors and float32 weights on the host
    in float64 makes device tap selection immune to fusion: integers
    cannot be re-derived or re-rounded by the compiler.

    Args:
      x, y: float64 numpy arrays (B, Ho, Wo) of UNNORMALIZED pixel
        coordinates into the sampled (height, width) image
        (align_corners=True convention: pixel centers at integers).
    Returns:
      dict of numpy arrays (a jit-ready pytree): int32 padded anchors
      ``ii``/``jj``; float32 weights ``wx``/``wy``; bool per-tap
      inside masks ``in_x0``/``in_x1``/``in_y0``/``in_y1`` (zeros
      padding); bool nearest-tap selectors ``sel_x0``/``sel_y0``; bool
      ``nn_inside`` (unclipped round-half-even index within bounds, the
      nearest+zeros validity mask).
    """
    import numpy as np
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    x0 = np.floor(x)
    y0 = np.floor(y)
    # round-half-to-even (np.rint), matching torch nearest's nearbyint
    rx = np.rint(x)
    ry = np.rint(y)
    ii = (np.clip(x0, -1, width - 1) + 1).astype(np.int32)
    jj = (np.clip(y0, -1, height - 1) + 1).astype(np.int32)
    rxc = np.clip(rx, 0, width - 1)
    ryc = np.clip(ry, 0, height - 1)
    return {
        "ii": ii,
        "jj": jj,
        "wx": (x - x0).astype(np.float32),
        "wy": (y - y0).astype(np.float32),
        "in_x0": (x0 >= 0) & (x0 <= width - 1),
        "in_x1": (x0 + 1 >= 0) & (x0 + 1 <= width - 1),
        "in_y0": (y0 >= 0) & (y0 <= height - 1),
        "in_y1": (y0 + 1 >= 0) & (y0 + 1 <= height - 1),
        "sel_x0": np.maximum(ii - 1, 0) == rxc,
        "sel_y0": np.maximum(jj - 1, 0) == ryc,
        "nn_inside": ((rx >= 0) & (rx <= width - 1)
                      & (ry >= 0) & (ry <= height - 1)),
    }


def grid_sample_pair_pre(img_lin: jnp.ndarray, img_nn: jnp.ndarray,
                         pre) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``grid_sample_pair`` from a host-precomputed ``prewarp_host`` dict.

    Same packed single-gather layout and identical per-tap multiply
    order as ``grid_sample_pair``; tap anchors/weights/masks arrive as
    program INPUTS so XLA fusion cannot desynchronize the index and
    weight chains (see ``prewarp_host``). Returns (bilinear/zeros lin,
    nearest/border nn) like ``grid_sample_pair``.
    """
    c_lin = img_lin.shape[-1]
    wx = pre["wx"][..., None]
    wy = pre["wy"][..., None]
    dtype = jnp.result_type(img_lin.dtype, img_nn.dtype)
    payload = jnp.concatenate([img_lin.astype(dtype),
                               img_nn.astype(dtype)], axis=-1)
    padded = jnp.concatenate([payload[:, :1], payload], axis=1)
    padded = jnp.concatenate([padded[:, :, :1], padded], axis=2)
    taps = _gather_2d(_pack_taps(padded), pre["jj"], pre["ii"])
    c = payload.shape[-1]
    t00, t01, t10, t11 = (taps[..., :c], taps[..., c:2 * c],
                          taps[..., 2 * c:3 * c], taps[..., 3 * c:])

    vals = 0.0
    for gi, in_y, in_x, wgt_y, wgt_x in (
            (t00[..., :c_lin], "in_y0", "in_x0", 1.0 - wy, 1.0 - wx),
            (t01[..., :c_lin], "in_y0", "in_x1", 1.0 - wy, wx),
            (t10[..., :c_lin], "in_y1", "in_x0", wy, 1.0 - wx),
            (t11[..., :c_lin], "in_y1", "in_x1", wy, wx)):
        inside = pre[in_y] & pre[in_x]
        vals = vals + gi * wgt_x * wgt_y \
            * inside[..., None].astype(gi.dtype)

    sel_x0 = pre["sel_x0"][..., None]
    top_nn = jnp.where(sel_x0, t00[..., c_lin:], t01[..., c_lin:])
    bot_nn = jnp.where(sel_x0, t10[..., c_lin:], t11[..., c_lin:])
    nn_out = jnp.where(pre["sel_y0"][..., None], top_nn, bot_nn)
    return vals, nn_out


def grid_sample_pair(img_lin: jnp.ndarray, img_nn: jnp.ndarray,
                     grid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ONE gather for two same-grid samplings: bilinear/zeros + nearest/border.

    Bit-identical to the pair
      ``grid_sample(img_lin, grid, "bilinear", padding_mode="zeros")``
      ``grid_sample(img_nn,  grid, "nearest",  padding_mode="border")``
    but the lin and nn channels ride the SAME packed tap gather. TPU
    gathers serialize per gathered row almost independently of row width
    (see the border-mode note above), so fusing the two calls halves the
    warp's gather time — the mixup c2c warp (tasks/adapt.py,
    tasks/mixup_prep.py) samples RGB bilinearly and label maps nearest
    over one shared grid, parity with Mixup.warp_c2c
    (/root/reference/datasets/mixup.py:28-66).

    Why the nearest/border value is always among the 2x2 zeros-mode taps:
    the taps anchor at jj = clip(floor(y), -1, h-1) + 1 over a
    top/left-replicated pad, i.e. original rows r0 = max(jj-1, 0) and
    r1 = min(jj, h-1). The nearest row ry = clip(round(y), 0, h-1)
    satisfies ry in {r0, r1} for every y (round(y) in {floor(y),
    floor(y)+1}; all three clamp regimes checked), and likewise for
    columns — so a pair of `where` selections recovers the exact
    nearest-clamped pixel from the packed taps.

    Returns:
      (lin_out (B, Ho, Wo, C_lin), nn_out (B, Ho, Wo, C_nn)); nn_out is
      in the common payload dtype (cast labels back outside).
    """
    _, h, w, c_lin = img_lin.shape
    assert img_nn.shape[:3] == img_lin.shape[:3], (
        img_lin.shape, img_nn.shape)
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    jj = (jnp.clip(y0, -1, h - 1) + 1).astype(jnp.int32)  # [0, h]
    ii = (jnp.clip(x0, -1, w - 1) + 1).astype(jnp.int32)  # [0, w]

    dtype = jnp.result_type(img_lin.dtype, img_nn.dtype)
    payload = jnp.concatenate([img_lin.astype(dtype),
                               img_nn.astype(dtype)], axis=-1)
    padded = jnp.concatenate([payload[:, :1], payload], axis=1)
    padded = jnp.concatenate([padded[:, :, :1], padded], axis=2)
    taps = _gather_2d(_pack_taps(padded), jj, ii)  # (B, Ho, Wo, 4(Cl+Cn))
    c = c_lin + img_nn.shape[-1]
    t00, t01, t10, t11 = (taps[..., :c], taps[..., c:2 * c],
                          taps[..., 2 * c:3 * c], taps[..., 3 * c:])

    # bilinear / zeros: same per-tap multiply order as the zeros branch
    vals = 0.0
    for gi, dy, dx, wgt_y, wgt_x in (
            (t00[..., :c_lin], 0, 0, 1.0 - wy, 1.0 - wx),
            (t01[..., :c_lin], 0, 1, 1.0 - wy, wx),
            (t10[..., :c_lin], 1, 0, wy, 1.0 - wx),
            (t11[..., :c_lin], 1, 1, wy, wx)):
        inside = ((x0 + dx >= 0) & (x0 + dx <= w - 1)
                  & (y0 + dy >= 0) & (y0 + dy <= h - 1))
        vals = vals + gi * wgt_x * wgt_y \
            * inside[..., None].astype(gi.dtype)

    # nearest / border: select the tap whose clamped source pixel equals
    # the clamped rounded index (round-half-to-even, torch nearbyint)
    ry = jnp.clip(jnp.round(y), 0, h - 1).astype(jnp.int32)
    rx = jnp.clip(jnp.round(x), 0, w - 1).astype(jnp.int32)
    sel_y0 = (jnp.maximum(jj - 1, 0) == ry)[..., None]
    sel_x0 = (jnp.maximum(ii - 1, 0) == rx)[..., None]
    top_nn = jnp.where(sel_x0, t00[..., c_lin:], t01[..., c_lin:])
    bot_nn = jnp.where(sel_x0, t10[..., c_lin:], t11[..., c_lin:])
    nn_out = jnp.where(sel_y0, top_nn, bot_nn)
    return vals, nn_out
