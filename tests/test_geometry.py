"""Golden parity tests for geometry vs the torch reference implementation.

The reference modules under misc/ are pure torch (no torchvision) and are
imported directly as oracles; see SURVEY.md §4 ("the PyTorch reference
itself is the test fixture").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from codeps_tpu.geometry import (backproject, project,
                                 transformation_from_parameters,
                                 transform_points, warp_coordinates,
                                 warp_image)
from codeps_tpu.ops import grid_sample

from misc.camera_model import CameraModel  # reference oracle
from misc.image_warper import CoordinateWarper, ImageWarper  # reference oracle

RNG = np.random.default_rng(0)


def _load_reference_module(name, path):
    """Import a single reference file without triggering its package
    __init__ (which pulls in torchvision)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _random_pose(batch):
    pose_head = _load_reference_module(
        "ref_pose_head", "/root/reference/models/pose_head.py")
    axisangle = torch.tensor(RNG.normal(0, 0.01, (batch, 1, 3)).astype(np.float32))
    translation = torch.tensor(RNG.normal(0, 0.05, (batch, 1, 3)).astype(np.float32))
    return axisangle, translation, pose_head.PoseHead


@pytest.mark.parametrize("invert", [False, True])
def test_pose_from_parameters_matches_reference(invert):
    batch = 3
    axisangle, translation, PoseHead = _random_pose(batch)
    # Reference signature takes (B, 1, 3) slices (models/pose_head.py:52).
    ref = PoseHead.transformation_from_parameters(
        axisangle, translation[:, 0], invert).numpy()
    ours = transformation_from_parameters(
        jnp.asarray(axisangle[:, 0].numpy()),
        jnp.asarray(translation[:, 0].numpy()), invert)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_backproject_project_roundtrip():
    batch, height, width = 2, 12, 20
    depth = RNG.uniform(1.0, 50.0, (batch, height, width, 1)).astype(np.float32)
    intr = np.tile(np.asarray([[25.0, 24.0, 9.5, 5.5]], np.float32), (batch, 1))
    points = backproject(jnp.asarray(depth), jnp.asarray(intr))
    uv = project(points, jnp.asarray(intr))
    u_expect = np.broadcast_to(np.arange(width, dtype=np.float32),
                               (batch, height, width))
    v_expect = np.broadcast_to(np.arange(height, dtype=np.float32)[:, None],
                               (batch, height, width))
    np.testing.assert_allclose(np.asarray(uv[..., 0]), u_expect, atol=1e-3)
    np.testing.assert_allclose(np.asarray(uv[..., 1]), v_expect, atol=1e-3)


def test_backproject_matches_reference_rays():
    """Our direct pinhole backprojection equals the reference's normalized
    ray formulation (misc/image_warper.py:68-87)."""
    height, width = 8, 10
    cm = CameraModel(width, height, 12.0, 11.0, 4.5, 3.5)
    depth_np = RNG.uniform(0.5, 30.0, (1, 1, height, width)).astype(np.float32)

    u2d = torch.arange(width).expand(height, width).float()
    v2d = torch.arange(height).expand(width, height).t().float()
    rx, ry, rz = cm.get_viewing_ray(u2d, v2d)
    depth_t = torch.tensor(depth_np)
    x3d = depth_t / abs(rz) * rx
    y3d = depth_t / abs(ry * 0 + rz) * ry
    z3d = depth_t / abs(rz) * rz
    ref = torch.cat([x3d, y3d, z3d], dim=1).numpy().transpose(0, 2, 3, 1)

    intr = np.asarray([[12.0, 11.0, 4.5, 3.5]], np.float32)
    ours = backproject(jnp.asarray(depth_np.transpose(0, 2, 3, 1)),
                       jnp.asarray(intr))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_warp_coordinates_matches_reference():
    batch, height, width = 2, 16, 24
    device = torch.device("cpu")
    fx, fy, cx, cy = 20.0, 19.0, 11.5, 7.5
    cams = [CameraModel(width, height, fx, fy, cx, cy) for _ in range(batch)]
    depth_np = RNG.uniform(1.0, 40.0, (batch, 1, height, width)).astype(np.float32)

    axisangle, translation, PoseHead = _random_pose(batch)
    T = PoseHead.transformation_from_parameters(axisangle,
                                                translation[:, 0], False)

    ref_warper = CoordinateWarper(width, height, device)
    ref = ref_warper(cams, torch.tensor(depth_np), T).numpy()

    intr = np.tile(np.asarray([[fx, fy, cx, cy]], np.float32), (batch, 1))
    ours = warp_coordinates(jnp.asarray(intr),
                            jnp.asarray(depth_np.transpose(0, 2, 3, 1)),
                            jnp.asarray(T.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_warp_coordinates_with_object_motion_matches_reference():
    batch, height, width = 1, 10, 14
    device = torch.device("cpu")
    fx, fy, cx, cy = 12.0, 12.0, 6.5, 4.5
    cams = [CameraModel(width, height, fx, fy, cx, cy)]
    depth_np = RNG.uniform(1.0, 40.0, (batch, 1, height, width)).astype(np.float32)
    motion_np = RNG.normal(0, 0.05, (batch, 3, height, width)).astype(np.float32)

    axisangle, translation, PoseHead = _random_pose(batch)
    T = PoseHead.transformation_from_parameters(axisangle,
                                                translation[:, 0], True)

    ref_warper = CoordinateWarper(width, height, device)
    ref = ref_warper(cams, torch.tensor(depth_np), T,
                     torch.tensor(motion_np)).numpy()

    intr = np.asarray([[fx, fy, cx, cy]], np.float32)
    ours = warp_coordinates(jnp.asarray(intr),
                            jnp.asarray(depth_np.transpose(0, 2, 3, 1)),
                            jnp.asarray(T.numpy()),
                            jnp.asarray(motion_np.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(mode, padding_mode):
    batch, height, width, chans = 2, 9, 13, 3
    img = RNG.uniform(0, 1, (batch, chans, height, width)).astype(np.float32)
    grid = RNG.uniform(-1.3, 1.3, (batch, height, width, 2)).astype(np.float32)
    # Hit anchor edge cases exactly: x0 = -1 (in-range right tap only),
    # x0 = w-1 / y0 = h-1 (in-range left tap only), far out-of-range.
    grid[0, 0, 0] = [-1.0 - 0.7 * 2.0 / (width - 1), 0.0]
    grid[0, 0, 1] = [1.0, -1.0 - 0.3 * 2.0 / (height - 1)]
    grid[0, 0, 2] = [1.0 + 0.4 * 2.0 / (width - 1), 1.0]
    grid[0, 0, 3] = [-3.0, 2.5]

    ref = torch.nn.functional.grid_sample(
        torch.tensor(img), torch.tensor(grid), mode=mode,
        padding_mode=padding_mode, align_corners=True).numpy()

    ours = grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)),
                       jnp.asarray(grid), mode=mode,
                       padding_mode=padding_mode)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_grid_sample_nearest_half_tie_matches_torch(padding_mode):
    # torch nearest uses std::nearbyint = round-half-to-EVEN; exact .5
    # source coordinates (exactly representable with w=5: x=(u+1)*2 for
    # u in {-0.75,-0.25,0.25,0.75}) must pick pixels [0,2,2,4], not the
    # floor(x+0.5) answers [1,2,3,4].
    width = 5
    img = np.arange(width, dtype=np.float32).reshape(1, 1, 1, width)
    us = np.array([-0.75, -0.25, 0.25, 0.75], np.float32)
    grid = np.array([[[[u, -1.0] for u in us]]], np.float32)
    ref = torch.nn.functional.grid_sample(
        torch.tensor(img), torch.tensor(grid), mode="nearest",
        padding_mode=padding_mode, align_corners=True).numpy().ravel()
    np.testing.assert_array_equal(ref, [0.0, 2.0, 2.0, 4.0])
    ours = grid_sample(
        jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(grid),
        mode="nearest", padding_mode=padding_mode)
    np.testing.assert_array_equal(np.asarray(ours).ravel(), ref)


def test_grid_sample_pair_bit_exact_vs_separate_calls():
    # grid_sample_pair fuses bilinear/zeros + nearest/border over one
    # shared grid into ONE gather; values must be BIT-identical to the
    # two separate grid_sample calls, including out-of-range anchors,
    # exact-integer coordinates, and round-half-to-even ties.
    from codeps_tpu.ops.grid_sample import grid_sample_pair

    batch, height, width = 2, 9, 13
    rng = np.random.default_rng(7)
    img_lin = rng.uniform(0, 1, (batch, height, width, 3)).astype(np.float32)
    img_nn = rng.integers(0, 2000, (batch, height, width, 2)).astype(
        np.float32)
    grid = rng.uniform(-1.4, 1.4, (batch, height, width, 2)).astype(
        np.float32)
    # edge cases: exact integer coords, exact .5 source coords (ties),
    # anchors straddling every clamp regime
    grid[0, 1, 0] = [-1.0, -1.0]
    grid[0, 1, 1] = [1.0, 1.0]
    grid[0, 1, 2] = [(0.5 / (width - 1) - 0.5) * 2.0,
                     (2.5 / (height - 1) - 0.5) * 2.0]   # .5 ties
    grid[0, 1, 3] = [-1.0 - 0.7 * 2.0 / (width - 1), 0.0]
    grid[0, 1, 4] = [1.0 + 0.4 * 2.0 / (width - 1), 1.0]
    grid[0, 1, 5] = [-3.0, 2.5]                          # far outside

    lin_ref = grid_sample(jnp.asarray(img_lin), jnp.asarray(grid),
                          mode="bilinear", padding_mode="zeros")
    nn_ref = grid_sample(jnp.asarray(img_nn), jnp.asarray(grid),
                         mode="nearest", padding_mode="border")
    lin_out, nn_out = grid_sample_pair(jnp.asarray(img_lin),
                                       jnp.asarray(img_nn),
                                       jnp.asarray(grid))
    np.testing.assert_array_equal(np.asarray(lin_out), np.asarray(lin_ref))
    np.testing.assert_array_equal(np.asarray(nn_out), np.asarray(nn_ref))


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_warp_image_matches_reference(mode):
    batch, height, width = 2, 12, 18
    device = torch.device("cpu")
    fx, fy, cx, cy = 15.0, 14.0, 8.5, 5.5
    cams = [CameraModel(width, height, fx, fy, cx, cy) for _ in range(batch)]
    depth_np = RNG.uniform(1.0, 40.0, (batch, 1, height, width)).astype(np.float32)
    img_np = RNG.uniform(0, 1, (batch, 3, height, width)).astype(np.float32)

    axisangle, translation, PoseHead = _random_pose(batch)
    T = PoseHead.transformation_from_parameters(axisangle,
                                                translation[:, 0], False)

    ref_warper = ImageWarper(width, height, device)
    ref = ref_warper(cams, torch.tensor(img_np), torch.tensor(depth_np), T,
                     interp_mode=mode).numpy()

    intr = np.tile(np.asarray([[fx, fy, cx, cy]], np.float32), (batch, 1))
    ours = warp_image(jnp.asarray(intr),
                      jnp.asarray(img_np.transpose(0, 2, 3, 1)),
                      jnp.asarray(depth_np.transpose(0, 2, 3, 1)),
                      jnp.asarray(T.numpy()), interp_mode=mode)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               rtol=1e-4, atol=1e-4)
