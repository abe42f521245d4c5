"""Exactness of the phase-decomposed GUDA upsample+conv
(ops/guda_fusion.py) against the reference formulation
(resize_bilinear -> concat -> 3x3 zero-pad conv)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codeps_tpu.ops.guda_fusion import guda_fused_semconv, upsample_conv3x3
from codeps_tpu.ops.resize import resize_bilinear

RNG = np.random.default_rng(7)


def _ref(x, kernel, out_res):
    up = resize_bilinear(x, out_res)
    return jax.lax.conv_general_dilated(
        up, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("r,h,w,cin", [(1, 16, 24, 16), (2, 8, 12, 32),
                                       (4, 4, 6, 64), (8, 2, 3, 128)])
def test_upsample_conv_matches_reference(r, h, w, cin):
    x = jnp.asarray(RNG.normal(0, 1, (2, h, w, cin)).astype(np.float32))
    kernel = jnp.asarray(
        RNG.normal(0, 0.2, (3, 3, cin, 14)).astype(np.float32))
    out_res = (h * r, w * r)
    got = upsample_conv3x3(x, kernel, out_res)
    want = _ref(x, kernel, out_res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_guda_fused_semconv_matches_concat_conv():
    out_res = (16, 24)
    feats = [
        jnp.asarray(RNG.normal(0, 1, (2, 2, 3, 128)).astype(np.float32)),
        jnp.asarray(RNG.normal(0, 1, (2, 4, 6, 64)).astype(np.float32)),
        jnp.asarray(RNG.normal(0, 1, (2, 8, 12, 32)).astype(np.float32)),
        jnp.asarray(RNG.normal(0, 1, (2, 16, 24, 16)).astype(np.float32)),
    ]
    kernel = jnp.asarray(
        RNG.normal(0, 0.2, (3, 3, 240, 14)).astype(np.float32))
    got = guda_fused_semconv(feats, kernel, out_res)
    cat = jnp.concatenate([resize_bilinear(f, out_res) for f in feats],
                          axis=-1)
    want = jax.lax.conv_general_dilated(
        cat, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_blockspace_semconv_matches_reference():
    """depth_to_space(block-phase output) == resize+concat+conv."""
    from codeps_tpu.ops.guda_fusion import (depth_to_space,
                                            guda_fused_semconv_blockspace)
    out_res = (16, 24)
    feats = [
        jnp.asarray(RNG.normal(0, 1, (2, 2, 3, 128)).astype(np.float32)),
        jnp.asarray(RNG.normal(0, 1, (2, 4, 6, 64)).astype(np.float32)),
        jnp.asarray(RNG.normal(0, 1, (2, 8, 12, 32)).astype(np.float32)),
        jnp.asarray(RNG.normal(0, 1, (2, 16, 24, 16)).astype(np.float32)),
    ]
    kernel = jnp.asarray(
        RNG.normal(0, 0.2, (3, 3, 240, 14)).astype(np.float32))
    z = guda_fused_semconv_blockspace(feats, kernel, out_res)
    assert z.shape == (2, 2, 3, 8, 8, 14)
    got = depth_to_space(z, 8)
    cat = jnp.concatenate([resize_bilinear(f, out_res) for f in feats],
                          axis=-1)
    want = jax.lax.conv_general_dilated(
        cat, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_space_to_depth_roundtrip():
    from codeps_tpu.ops.guda_fusion import depth_to_space, space_to_depth
    x = jnp.asarray(RNG.integers(0, 14, (2, 16, 24)).astype(np.int32))
    z = space_to_depth(x, 8)
    assert z.shape == (2, 2, 3, 8, 8)
    np.testing.assert_array_equal(np.asarray(depth_to_space(z, 8)),
                                  np.asarray(x))


def test_semantic_head_phase_space_matches_full():
    """SemanticHead(phase_space=True) d2s == the full-res output, and
    semantic_loss over the phase view equals the full-res loss (top-k
    selects the same VALUES regardless of pixel order)."""
    from codeps_tpu.losses import semantic_loss
    from codeps_tpu.models.heads import SemanticHead
    from codeps_tpu.ops.guda_fusion import depth_to_space, space_to_depth

    head = SemanticHead(num_ch_enc=(64, 64, 128, 256, 512),
                        num_classes=14, use_guda_fusion=True)
    h, w = 32, 64
    # encoder pyramid geometry: feats[i] at 1/2^(i+1) resolution
    feats = [
        jnp.asarray(RNG.normal(
            0, 1, (2, h // (2 ** (i + 1)), w // (2 ** (i + 1)),
                   c)).astype(np.float32))
        for i, c in enumerate((64, 64, 128, 256, 512))
    ]
    params = head.init(jax.random.PRNGKey(0), feats)["params"]
    full = head.apply({"params": params}, feats)
    phase = head.apply({"params": params}, feats, phase_space=True)
    assert phase.shape == (2, h // 8, w // 8, 8, 8, 14)
    np.testing.assert_allclose(np.asarray(depth_to_space(phase, 8)),
                               np.asarray(full), rtol=2e-4, atol=2e-5)

    labels = jnp.asarray(RNG.integers(0, 14, (2, h, w)).astype(np.int32))
    weights = jnp.ones((2, h, w), jnp.float32)
    loss_full = semantic_loss(full, labels, weights,
                              top_k_percent_pixels=0.2)
    loss_phase = semantic_loss(phase, space_to_depth(labels, 8),
                               space_to_depth(weights, 8),
                               top_k_percent_pixels=0.2)
    np.testing.assert_allclose(float(loss_phase), float(loss_full),
                               rtol=1e-4)


def test_guda_fused_semconv_gradients_match():
    out_res = (8, 12)
    feats = [
        jnp.asarray(RNG.normal(0, 1, (1, 2, 3, 16)).astype(np.float32)),
        jnp.asarray(RNG.normal(0, 1, (1, 8, 12, 8)).astype(np.float32)),
    ]
    kernel = jnp.asarray(
        RNG.normal(0, 0.2, (3, 3, 24, 5)).astype(np.float32))

    def loss_fused(feats, kernel):
        return jnp.sum(jnp.sin(guda_fused_semconv(feats, kernel, out_res)))

    def loss_ref(feats, kernel):
        cat = jnp.concatenate(
            [resize_bilinear(f, out_res) for f in feats], axis=-1)
        out = jax.lax.conv_general_dilated(
            cat, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(out))

    v1, g1 = jax.value_and_grad(loss_fused, argnums=(0, 1))(feats, kernel)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(feats, kernel)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_nearest_phase_conv_matches_reference():
    """upsample_conv3x3_blockspace(mode=nearest) == nearest-2x upsample
    -> zero-padded conv3x3 (the decoder-tail stage)."""
    from codeps_tpu.ops.guda_fusion import (depth_to_space,
                                            upsample_conv3x3_blockspace)
    from codeps_tpu.ops.resize import upsample_nearest_2x
    x = jnp.asarray(RNG.normal(0, 1, (2, 9, 13, 16)).astype(np.float32))
    kernel = jnp.asarray(
        RNG.normal(0, 0.2, (3, 3, 16, 16)).astype(np.float32))
    z = upsample_conv3x3_blockspace(x, kernel, 2, mode="nearest")
    assert z.shape == (2, 9, 13, 2, 2, 16)
    want = jax.lax.conv_general_dilated(
        upsample_nearest_2x(x), kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(depth_to_space(z, 2)),
                               np.asarray(want), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("pad", ["zero", "reflect"])
def test_blockspace_conv3x3_matches_fullres(pad):
    from codeps_tpu.ops.guda_fusion import (blockspace_conv3x3,
                                            depth_to_space, space_to_depth)
    x = jnp.asarray(RNG.normal(0, 1, (2, 10, 14, 16)).astype(np.float32))
    kernel = jnp.asarray(
        RNG.normal(0, 0.2, (3, 3, 16, 3)).astype(np.float32))
    z = blockspace_conv3x3(space_to_depth(x, 2), kernel, pad=pad)
    if pad == "reflect":
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        want = jax.lax.conv_general_dilated(
            xp, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        want = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(depth_to_space(z, 2)),
                               np.asarray(want), rtol=2e-4, atol=2e-5)


def test_blockspace_conv3x3_gradients_match():
    from codeps_tpu.ops.guda_fusion import (blockspace_conv3x3,
                                            depth_to_space, space_to_depth)
    x = jnp.asarray(RNG.normal(0, 1, (1, 6, 8, 8)).astype(np.float32))
    kernel = jnp.asarray(
        RNG.normal(0, 0.2, (3, 3, 8, 4)).astype(np.float32))

    def loss_block(x, kernel):
        z = blockspace_conv3x3(space_to_depth(x, 2), kernel, pad="reflect")
        return jnp.sum(jnp.sin(depth_to_space(z, 2)))

    def loss_ref(x, kernel):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        out = jax.lax.conv_general_dilated(
            xp, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(out))

    v1, g1 = jax.value_and_grad(loss_block, argnums=(0, 1))(x, kernel)
    v2, g2 = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
