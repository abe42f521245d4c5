"""Fused bilinear-upsample + 3x3 conv for the GUDA semantic fusion.

The reference's GUDA head (models/semantic_head.py:65-71) upsamples the
per-scale decoder maps (C = 128/64/32/16 at 1/8..1/1 resolution) to full
resolution with bilinear align_corners=False, channel-concats them
(240 ch), and applies one 3x3 conv to 14 classes. On TPU that
materializes ~1 GB of full-res bf16 intermediates per step (batch 4 at
512x1024), relayout-copies them between the resize einsums and the
convolutions, and runs the conv at C_out=14 — 14/128 MXU lane packing.

This module computes the SAME function per scale directly on the small
pre-upsample grid as a phase-decomposed (subpixel) convolution:

    conv3x3(zero_pad, U_r(x), W) == depth_to_space(
        conv3x3(replicate_pad, x, K), r)  -  border excess

where U_r is bilinear x r upsampling (align_corners=False; its edge
clamping is EXACTLY replicate padding of the small grid) and K is a
(3, 3, C_in, r*r*C_out) kernel precombined from W and the bilinear
phase weights. Benefits on TPU:

  - identical FLOPs but the output channel dim becomes r^2*C_out
    (896 for r=8) — full MXU lane packing instead of 14/128;
  - no full-resolution C-channel intermediates: activations stay at the
    small grid until the final 14-channel depth_to_space;
  - the backward differentiates through the K-construction einsum, so
    dW/dX also run at the small grid with well-packed shapes.

Border handling: the full-res conv zero-pads its input at the OUTPUT
borders, while the phase form sees the bilinear edge extension there.
The difference ("excess") is nonzero only on the one-pixel output ring
and is linear in x; it is computed from four cheap border strips (plus
inclusion-exclusion corner terms), summed over scales, and SUBTRACTED
with zero-interior pads — elementwise work that XLA fuses into the
scale-sum + bias chain (an earlier dynamic-update-slice formulation
cost a measured ~6.5 ms/step in full-tensor copies).

Exactness: fused == resize_bilinear + concat + conv to f32 roundoff
(tests/test_guda_fusion.py).

Production code uses only the *_blockspace forms (models/heads.py); the
full-resolution variants (``upsample_conv3x3``, ``guda_fused_semconv``,
``_phase_conv``, ``_apply_excess``) are retained as the independent
reference implementations the blockspace equality tests check against —
edit both or the tests catch the drift.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from codeps_tpu.ops.resize import _linear_weight_matrix


@functools.lru_cache(maxsize=None)
def _phase_pattern(r: int, mode: str = "bilinear") -> np.ndarray:
    """T[d, t, n]: weight of input pixel (q + n - 1) in the x r upsample
    at full-res position r*q + (t + d - 1), for tap offsets d in
    {-1, 0, 1} (the 3x3 conv rows) and phases t in [0, r).

    bilinear: torch's half-pixel mapping src = (p + 0.5)/r - 0.5;
    out-of-range source indices clamp, which replicate padding of the
    small grid reproduces exactly. nearest: torch's asymmetric
    floor(p/r) (upsample_nearest_2x and friends); the u = -1 row maps
    to input -1, which replicate padding also reproduces.
    """
    # r=1 bilinear would index n0+2 == 3 out of the 3-tap axis (t=0,
    # d=1 -> rel=1.0); callers wanting no upsample use the same-res
    # conv paths instead of r=1 here.
    assert r >= 2, f"phase upsample requires r >= 2, got r={r}"
    pattern = np.zeros((3, r, 3), np.float32)
    for d in (-1, 0, 1):
        for t in range(r):
            u = t + d
            if mode == "bilinear":
                rel = (u + 0.5) / r - 0.5
                n0 = int(np.floor(rel))
                frac = rel - n0
                pattern[d + 1, t, n0 + 1] += 1.0 - frac
                pattern[d + 1, t, n0 + 2] += frac
            else:
                n = u // r
                pattern[d + 1, t, n + 1] += 1.0
    return pattern


def _phase_kernel(kernel: jnp.ndarray, r: int,
                  mode: str = "bilinear") -> jnp.ndarray:
    """(3, 3, C_in, C_out) -> (3, 3, C_in, r*r*C_out) phase-expanded
    kernel; channel order (ty, tx, c_out) matches NHWC depth_to_space."""
    pattern = jnp.asarray(_phase_pattern(r, mode), kernel.dtype)
    # K[ny, nx, i, ty, tx, o] = sum_{dy,dx} W[dy,dx,i,o] T[dy,ty,ny] T[dx,tx,nx]
    fused = jnp.einsum("deio,dta,esb->abitso", kernel, pattern, pattern,
                       precision=jax.lax.Precision.HIGHEST)
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    return fused.reshape(3, 3, c_in, r * r * c_out)


def _depth_to_space(z: jnp.ndarray, r: int, c_out: int) -> jnp.ndarray:
    b, h, w, _ = z.shape
    z = z.reshape(b, h, w, r, r, c_out)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, h * r, w * r, c_out)


def _conv(x, kernel, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _phase_conv(x: jnp.ndarray, kernel: jnp.ndarray, r: int,
                mode: str = "bilinear"):
    """Main phase term: exact everywhere except the 1px output ring."""
    fused_kernel = _phase_kernel(kernel, r, mode)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = _conv(xpad, fused_kernel, "VALID")
    return _depth_to_space(z, r, kernel.shape[3])


def _hp():
    return jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _nearest_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) 0/1 matrix of torch's asymmetric nearest
    mapping src = floor(p * in / out)."""
    weights = np.zeros((out_size, in_size), dtype=np.float32)
    for p in range(out_size):
        weights[p, min(p * in_size // out_size, in_size - 1)] = 1.0
    return weights


def _line_weight_matrix(in_size: int, out_size: int,
                        mode: str) -> np.ndarray:
    if mode == "bilinear":
        return _linear_weight_matrix(in_size, out_size, False)
    return _nearest_weight_matrix(in_size, out_size)


def _border_excess(x: jnp.ndarray, kernel: jnp.ndarray,
                   out_res: tuple[int, int], mode: str = "bilinear"):
    """The phase-vs-true difference on the output ring.

    The upsample extension rows/cols the phase conv consumed beyond the
    image are: y_ext[-1] = Uh(x[0]) (the first input row, horizontally
    upsampled with clamp), y_ext[H] = Uh(x[h-1]), and analogously the
    columns; their own corner extensions replicate. Holds for bilinear
    (half-pixel clamp) and nearest (floor clamp) alike — both extend
    with the edge row/col. Returns (top, bottom, left, right, corners)
    with top/bottom (B, 1, W_out, C_out), left/right (B, H_out, 1,
    C_out), corners (B, 2, 2, C_out) of inclusion-exclusion add-backs.
    """
    out_h, out_w = out_res
    h, w = x.shape[1:3]
    wy = jnp.asarray(_line_weight_matrix(h, out_h, mode), x.dtype)
    wx = jnp.asarray(_line_weight_matrix(w, out_w, mode), x.dtype)

    # extension lines in full resolution
    top_line = jnp.einsum("pw,bwc->bpc", wx, x[:, 0],
                          precision=_hp())[:, None]     # (B,1,W_out,C)
    bot_line = jnp.einsum("pw,bwc->bpc", wx, x[:, -1],
                          precision=_hp())[:, None]
    left_line = jnp.einsum("oh,bhc->boc", wy, x[:, :, 0],
                           precision=_hp())[:, :, None]  # (B,H_out,1,C)
    right_line = jnp.einsum("oh,bhc->boc", wy, x[:, :, -1],
                            precision=_hp())[:, :, None]

    def hpad(line):   # replicate the horizontal corner extensions
        return jnp.pad(line, ((0, 0), (0, 0), (1, 1), (0, 0)),
                       mode="edge")

    def vpad(line):
        return jnp.pad(line, ((0, 0), (1, 1), (0, 0), (0, 0)),
                       mode="edge")

    # row excess: the dy=-1 (resp. +1) kernel row applied to the line,
    # with the line's own replicated horizontal extension
    top = _conv(hpad(top_line), kernel[:1], "VALID")
    bottom = _conv(hpad(bot_line), kernel[2:], "VALID")
    left = _conv(vpad(left_line), kernel[:, :1], "VALID")
    right = _conv(vpad(right_line), kernel[:, 2:], "VALID")

    # corner double-count: taps with BOTH row and column out of range
    x00 = x[:, 0, 0]
    x0w = x[:, 0, -1]
    xh0 = x[:, -1, 0]
    xhw = x[:, -1, -1]

    def corner(val, ky, kx):
        return jnp.einsum("bc,co->bo", val, kernel[ky, kx],
                          precision=_hp())

    corners = jnp.stack([
        jnp.stack([corner(x00, 0, 0), corner(x0w, 0, 2)], axis=1),
        jnp.stack([corner(xh0, 2, 0), corner(xhw, 2, 2)], axis=1),
    ], axis=1)                                   # (B, 2, 2, C_out)
    return top, bottom, left, right, corners


def _apply_excess(out, excess):
    """out - (row/col excess) + (corner add-backs), as zero-interior
    pads + adds (fusible elementwise; no full-tensor update-slices)."""
    top, bottom, left, right, corners = excess
    b, out_h, out_w, c = out.shape

    def padded(strip, cfg):
        return jnp.pad(strip, ((0, 0), *cfg, (0, 0)))

    out = out - padded(top, ((0, out_h - 1), (0, 0)))
    out = out - padded(bottom, ((out_h - 1, 0), (0, 0)))
    out = out - padded(left, ((0, 0), (0, out_w - 1)))
    out = out - padded(right, ((0, 0), (out_w - 1, 0)))
    # inclusion-exclusion corner add-backs as sparse pads
    tl = padded(corners[:, :1, :1], ((0, out_h - 1), (0, out_w - 1)))
    tr = padded(corners[:, :1, 1:], ((0, out_h - 1), (out_w - 1, 0)))
    bl = padded(corners[:, 1:, :1], ((out_h - 1, 0), (0, out_w - 1)))
    br = padded(corners[:, 1:, 1:], ((out_h - 1, 0), (out_w - 1, 0)))
    return out + tl + tr + bl + br


def upsample_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                     out_res: tuple[int, int]) -> jnp.ndarray:
    """conv3x3(zero-pad)(bilinear_resize(x, out_res)) without the
    full-resolution intermediate. Integer upsample factors only."""
    h, w = x.shape[1:3]
    out_h, out_w = out_res
    if (h, w) == (out_h, out_w):
        return _conv(x, kernel, [(1, 1), (1, 1)])
    assert out_h % h == 0 and out_w % w == 0 and out_h // h == out_w // w, (
        f"integer upsample factors only: {(h, w)} -> {out_res}")
    r = out_h // h
    out = _phase_conv(x, kernel, r)
    return _apply_excess(out, _border_excess(x, kernel, out_res))


def _regroup_to_block(term: jnp.ndarray, r: int, block: int,
                      c_out: int) -> jnp.ndarray:
    """Phase output of factor r -> the 6-d block-phase view of factor
    ``block`` (full-res row = r*(k*Q + m) + t = block*Q + (r*m + t),
    k = block//r): (B, H/block, W/block, block, block, C_out)."""
    b, h, w, _ = term.shape
    k = block // r
    hb, wb = h // k, w // k
    z = term.reshape(b, hb, k, wb, k, r, r, c_out)
    z = z.transpose(0, 1, 3, 2, 5, 4, 6, 7)      # (B,hb,wb,k,r,k,r,C)
    return z.reshape(b, hb, wb, block, block, c_out)


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(B, H, W, ...) -> (B, H/block, W/block, block, block, ...):
    the block-phase view of a full-resolution map (labels, weights,
    conv outputs). Pure reshape/transpose."""
    b, h, w = x.shape[:3]
    rest = x.shape[3:]
    z = x.reshape(b, h // block, block, w // block, block, *rest)
    perm = (0, 1, 3, 2, 4) + tuple(range(5, 5 + len(rest)))
    return z.transpose(*perm)


def depth_to_space(z: jnp.ndarray, block: int) -> jnp.ndarray:
    """Inverse of space_to_depth for (B, hb, wb, block, block, ...)."""
    b, hb, wb = z.shape[:3]
    rest = z.shape[5:]
    perm = (0, 1, 3, 2, 4) + tuple(range(5, 5 + len(rest)))
    x = z.transpose(*perm)
    return x.reshape(b, hb * block, wb * block, *rest)


def _apply_excess_blockspace(z: jnp.ndarray, excess) -> jnp.ndarray:
    """Border correction directly in the 6-d block-phase view: the
    full-res output ring lives in block-row/col 0 or -1 at phase
    row/col 0 or -1 — pads along the block and phase axes only, never
    touching a full-resolution tensor."""
    top, bottom, left, right, corners = excess
    b, hb, wb, blk, _, c = z.shape

    def pad6(strip, cfg):
        return jnp.pad(strip, ((0, 0), *cfg, (0, 0)))

    # top (B,1,W,C) -> (B,1,wb,1,blk,C) at block-row 0, phase-row 0
    top_z = top.reshape(b, 1, wb, 1, blk, c)
    bot_z = bottom.reshape(b, 1, wb, 1, blk, c)
    left_z = left.reshape(b, hb, 1, blk, 1, c)
    right_z = right.reshape(b, hb, 1, blk, 1, c)
    z = z - pad6(top_z, ((0, hb - 1), (0, 0), (0, blk - 1), (0, 0)))
    z = z - pad6(bot_z, ((hb - 1, 0), (0, 0), (blk - 1, 0), (0, 0)))
    z = z - pad6(left_z, ((0, 0), (0, wb - 1), (0, 0), (0, blk - 1)))
    z = z - pad6(right_z, ((0, 0), (wb - 1, 0), (0, 0), (blk - 1, 0)))
    corner_z = corners.reshape(b, 2, 2, c)

    def corner6(sel_h, sel_w, cfg):
        piece = corner_z[:, sel_h:sel_h + 1, sel_w:sel_w + 1]
        piece = piece.reshape(b, 1, 1, 1, 1, c)
        return pad6(piece, cfg)

    z = z + corner6(0, 0, ((0, hb - 1), (0, wb - 1), (0, blk - 1),
                           (0, blk - 1)))
    z = z + corner6(0, 1, ((0, hb - 1), (wb - 1, 0), (0, blk - 1),
                           (blk - 1, 0)))
    z = z + corner6(1, 0, ((hb - 1, 0), (0, wb - 1), (blk - 1, 0),
                           (0, blk - 1)))
    z = z + corner6(1, 1, ((hb - 1, 0), (wb - 1, 0), (blk - 1, 0),
                           (blk - 1, 0)))
    return z


def upsample_conv3x3_blockspace(x: jnp.ndarray, kernel: jnp.ndarray,
                                r: int, mode: str = "bilinear"
                                ) -> jnp.ndarray:
    """conv3x3(zero-pad)(upsample_x_r(x)) in the BLOCK-PHASE view:
    returns (B, H, W, r, r, C_out); depth_to_space of it equals the
    full-resolution formulation exactly. The conv runs on the small
    grid with r*r*C_out output channels (MXU lane packing) and no
    full-resolution intermediate is materialized.

    mode="nearest" covers the decoder tails (upsample_nearest_2x +
    zero-padded conv3x3, models/depth_head.py:64-70 stage 0);
    mode="bilinear" the GUDA per-scale terms.
    """
    fused_kernel = _phase_kernel(kernel, r, mode)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    raw = _conv(xpad, fused_kernel, "VALID")
    b, h, w = raw.shape[:3]
    z = raw.reshape(b, h, w, r, r, kernel.shape[3])
    excess = _border_excess(x, kernel,
                            (h * r, w * r), mode)
    return _apply_excess_blockspace(z, excess)


@functools.lru_cache(maxsize=None)
def _blockconv_select(block: int) -> np.ndarray:
    """S[t, delta, p, d] = 1 iff output phase t's kernel tap d (of 3)
    reads phase p of the odd-shifted block at offset delta in {0, 1}.

    Odd-shift grid: block a covers full-res rows block*a - 1 ..
    block*a + block - 2. Output row block*q + t reads rows
    block*q + t - 1 + d; with u = t - 1 + d in [-1, block], that is
    offset 0 phase u+1 when u <= block-2, else offset 1 phase
    u + 1 - block. Kernel extent over blocks is exactly 2 for any
    block >= 2.
    """
    sel = np.zeros((block, 2, block, 3), np.float32)
    for t in range(block):
        for d in range(3):
            u = t - 1 + d
            if u <= block - 2:
                sel[t, 0, u + 1, d] = 1.0
            else:
                sel[t, 1, u + 1 - block, d] = 1.0
    return sel


def _oddshift(z: jnp.ndarray, axis_block: int, axis_phase: int,
              pad: str) -> jnp.ndarray:
    """(..., hb, ..., blk, ...) -> (..., hb+1, ..., blk, ...): the
    odd-shifted block decomposition (rows block*a - 1 .. block*a +
    block - 2) assembled from block-axis slices; boundary rows -1 and
    H..H+blk-3 filled per ``pad`` ("zero" any block, "reflect"
    block 2 only: row -1 := row 1, row H := row H-2)."""
    blk = z.shape[axis_phase]

    def take(axis, sl):
        idx = [slice(None)] * z.ndim
        idx[axis] = sl
        return tuple(idx)

    last_phase = z[take(axis_phase, slice(blk - 1, blk))]
    first_phases = z[take(axis_phase, slice(0, blk - 1))]
    if pad == "zero":
        top = jnp.zeros_like(last_phase[take(axis_block, slice(0, 1))])
        bot = jnp.zeros_like(first_phases[take(axis_block, slice(0, 1))])
    elif pad == "reflect":
        assert blk == 2, "reflect odd-shift implemented for block=2"
        # full-res row -1 reflects to row 1 = block 0 phase 1;
        # row H reflects to row H-2 = block hb-1 phase 0
        top = z[take(axis_block, slice(0, 1))][take(axis_phase,
                                                    slice(1, 2))]
        bot = z[take(axis_block, slice(-1, None))][take(axis_phase,
                                                        slice(0, 1))]
    else:
        raise ValueError(pad)
    p0 = jnp.concatenate([top, last_phase], axis=axis_block)
    prest = jnp.concatenate([first_phases, bot], axis=axis_block)
    return jnp.concatenate([p0, prest], axis=axis_phase)


def blockspace_conv3x3(z: jnp.ndarray, kernel: jnp.ndarray,
                       pad: str = "zero") -> jnp.ndarray:
    """Full-resolution 3x3 conv evaluated directly in the block-phase
    view: z (B, hb, wb, blk, blk, C_in) -> (B, hb, wb, blk, blk,
    C_out), exact (== conv3x3(pad, depth_to_space(z))). The conv runs
    at block resolution with blk^2-packed channels: a 2x2 block-kernel
    over the odd-shifted grid with the (3,3) kernel expanded through
    the phase-selection pattern."""
    b, hb, wb, blk, _, c_in = z.shape
    c_out = kernel.shape[3]
    zx = _oddshift(z, 1, 3, pad)
    zx = _oddshift(zx, 2, 4, pad)
    sel = jnp.asarray(_blockconv_select(blk), kernel.dtype)
    # E[da', db', pa, pb, i, ta, tb, o]
    expanded = jnp.einsum("deio,uavd,wbxe->abvxiuwo", kernel, sel, sel,
                          precision=_hp())
    expanded = expanded.reshape(2, 2, blk * blk * c_in,
                                blk * blk * c_out)
    flat = zx.reshape(b, hb + 1, wb + 1, blk * blk * c_in)
    out = _conv(flat, expanded, "VALID")
    return out.reshape(b, hb, wb, blk, blk, c_out)


@functools.lru_cache(maxsize=None)
def _fold_pattern(r: int, block: int, mode: str = "bilinear") -> np.ndarray:
    """F[d, t, m]: weight of input pixel (k*a + m - 1) in the x r
    upsample at full-res position block*a + (t + d - 1), for conv taps
    d in {-1, 0, 1}, output phases t in [0, block), window offsets
    m in [0, k+2), k = block // r.

    This is _phase_pattern's T re-indexed through the regroup: output
    phase t of the block view is phase t % r of the r-grid position
    k*a + t//r, whose 3-tap window sits at m = t//r + n. A stride-k
    (k+2)-window conv with the F-expanded kernel therefore emits the
    block-grid output DIRECTLY — no post-conv _regroup_to_block
    reshuffle of a full-res-sized tensor.
    """
    k = block // r
    assert block == k * r, (r, block)
    pattern = _phase_pattern(r, mode)              # (3, r, 3)
    fold = np.zeros((3, block, k + 2), np.float32)
    for t in range(block):
        for n in range(3):
            fold[:, t, t // r + n] = pattern[:, t % r, n]
    return fold


def _phase_conv_to_block(x: jnp.ndarray, kernel: jnp.ndarray, r: int,
                         block: int, mode: str = "bilinear") -> jnp.ndarray:
    """Main phase term of conv3x3(U_r(x)) emitted straight in the
    factor-``block`` block-phase view: (B, H/block, W/block, block,
    block, C_out) from x at the small grid, one stride-k conv, no
    regroup transpose. Same multiset of multiply-adds as
    _phase_conv + _regroup_to_block (contraction grouping differs only
    in f32 rounding). Exact everywhere except the 1px output ring
    (apply the summed border excess as before)."""
    k = block // r
    fold = jnp.asarray(_fold_pattern(r, block, mode), kernel.dtype)
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    fused = jnp.einsum("deio,dta,esb->abitso", kernel, fold, fold,
                       precision=jax.lax.Precision.HIGHEST)
    fused = fused.reshape(k + 2, k + 2, c_in, block * block * c_out)
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    z = jax.lax.conv_general_dilated(
        xpad, fused, (k, k), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, hb, wb = z.shape[:3]
    return z.reshape(b, hb, wb, block, block, c_out)


@functools.lru_cache(maxsize=None)
def _blockfold_select(blk: int, block: int) -> np.ndarray:
    """S[d, t, m, p] = 1 iff block-view output phase t's kernel tap d
    (of 3) reads phase p of the input block at window offset m (of
    k+2, k = block // blk): full-res row block*a + t + d - 1 ==
    blk*(k*a + m - 1) + p."""
    k = block // blk
    sel = np.zeros((3, block, k + 2, blk), np.float32)
    for t in range(block):
        for d in range(3):
            u = t + d - 1                      # in [-1, block]
            sel[d, t, u // blk + 1, u % blk] = 1.0
    return sel


def blockspace_conv3x3_to_block(z: jnp.ndarray, kernel: jnp.ndarray,
                                block: int) -> jnp.ndarray:
    """Full-resolution zero-pad 3x3 conv of a factor-``blk`` block-phase
    tensor, emitted straight in the factor-``block`` view: z (B, H/blk,
    W/blk, blk, blk, C_in) -> (B, H/block, W/block, block, block,
    C_out). One stride-k conv over the flattened phase channels with
    the conv's own zero padding — replaces blockspace_conv3x3 +
    regroup_block (which paid an odd-shift concat + reshape + a
    full-res-sized regroup transpose)."""
    b, h2, w2, blk, _, c_in = z.shape
    c_out = kernel.shape[3]
    k = block // blk
    sel = jnp.asarray(_blockfold_select(blk, block), kernel.dtype)
    # E[my, mx, py, px, i, ty, tx, o]
    fused = jnp.einsum("deio,dtuv,eswx->uwvxitso", kernel, sel, sel,
                       precision=_hp())
    fused = fused.reshape(k + 2, k + 2, blk * blk * c_in,
                          block * block * c_out)
    flat = z.reshape(b, h2, w2, blk * blk * c_in)
    out = jax.lax.conv_general_dilated(
        flat, fused, (k, k), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(b, h2 // k, w2 // k, block, block, c_out)


def regroup_block(z: jnp.ndarray, big: int) -> jnp.ndarray:
    """Block-phase view of factor blk -> factor ``big`` (a multiple):
    (B, hb, wb, blk, blk, C) -> (B, hb*blk/big, ..., big, big, C).
    Pure reshuffle: full-res row blk*(k*Q + j) + t = big*Q +
    (blk*j + t) with k = big // blk."""
    b, hb, wb, blk, _, c = z.shape
    k = big // blk
    hb2, wb2 = hb // k, wb // k
    z = z.reshape(b, hb2, k, wb2, k, blk, blk, c)
    z = z.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return z.reshape(b, hb2, wb2, big, big, c)


def guda_fused_semconv_blockspace(feats, kernel: jnp.ndarray,
                                  out_res: tuple[int, int]) -> jnp.ndarray:
    """The GUDA fusion conv in BLOCK-PHASE space: returns
    (B, H/block, W/block, block, block, C_out) — depth_to_space of this
    equals guda_fused_semconv (== resize+concat+conv) exactly.

    block is the coarsest scale's upsample factor. Per scale the phase
    conv runs on the small grid; factors < block regroup into the
    common block view with cheap reshuffles (28 MB instead of the
    full-res C-channel tensors); the already-full-res scale pays ONE
    space_to_depth of its 14-channel output. Consumers (softmax + CE,
    argmax) operate per pixel over C_out, so they run in this view
    without ever materializing the full-resolution activation.
    """
    out_h, out_w = out_res
    block = out_h // feats[0].shape[1]
    c_out = kernel.shape[3]
    offset = 0
    z_sum = None
    excesses = []
    for feat in feats:
        c = feat.shape[-1]
        w_s = kernel[:, :, offset:offset + c, :]
        offset += c
        if feat.ndim == 6:
            # full-res scale already in block-phase view: ONE stride-k
            # fold conv emits the common-block output directly (exact
            # zero-pad semantics; replaces blockspace_conv3x3 +
            # regroup_block and their full-res-sized reshuffles)
            z = blockspace_conv3x3_to_block(feat, w_s, block)
            z_sum = z if z_sum is None else z_sum + z
            continue
        h, w = feat.shape[1:3]
        if (h, w) == (out_h, out_w):
            term = _conv(feat, w_s, [(1, 1), (1, 1)])   # exact already
            z = space_to_depth(term, block)
        else:
            r = out_h // h
            assert out_h == h * r and out_w == w * r
            # stride-(block//r) fold conv: block-grid output directly,
            # no _regroup_to_block transpose (for r == block this IS
            # the plain phase conv: window 3, stride 1)
            z = _phase_conv_to_block(feat, w_s, r, block)
            excesses.append(_border_excess(feat, w_s, out_res))
        z_sum = z if z_sum is None else z_sum + z
    if excesses:
        summed = tuple(functools.reduce(jnp.add, strips)
                       for strips in zip(*excesses))
        z_sum = _apply_excess_blockspace(z_sum, summed)
    return z_sum


def guda_fused_semconv(feats, kernel: jnp.ndarray,
                       out_res: tuple[int, int]) -> jnp.ndarray:
    """sum_s conv3x3(U(f_s), W_s) == conv3x3(concat_s U(f_s), W) — the
    GUDA fusion conv, evaluated per scale at the small grids. The
    border excess is linear, so it is summed across scales and applied
    once at the end."""
    offset = 0
    out = None
    excesses = []
    for feat in feats:
        c = feat.shape[-1]
        w_s = kernel[:, :, offset:offset + c, :]
        offset += c
        h, w = feat.shape[1:3]
        if (h, w) == out_res:
            term = _conv(feat, w_s, [(1, 1), (1, 1)])   # exact already
        else:
            r = out_res[0] // h
            assert out_res[0] == h * r and out_res[1] == w * r, (
                f"integer upsample factors only: {(h, w)} -> {out_res}")
            term = _phase_conv(feat, w_s, r)
            excesses.append(_border_excess(feat, w_s, out_res))
        out = term if out is None else out + term
    if excesses:
        summed = tuple(
            functools.reduce(jnp.add, strips)
            for strips in zip(*excesses))
        out = _apply_excess(out, summed)
    return out
