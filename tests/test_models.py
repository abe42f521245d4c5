"""Model parity tests.

The reference head modules are pure torch (no torchvision) and are loaded
directly as golden oracles; random torch weights are converted with
codeps_tpu.io.convert_pth and outputs compared numerically. The ResNet
encoder (torchvision-dependent in the reference) is covered by shape and
pyramid-structure checks.
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from codeps_tpu.io.convert_pth import (convert_depth_head, convert_flow_head,
                                       convert_instance_head,
                                       convert_pose_head,
                                       convert_semantic_head)
from codeps_tpu.models import (DepthHead, FlowHead, InstanceHead, PoseHead,
                               SemanticHead, make_encoder)

RNG = np.random.default_rng(3)
NUM_CH_ENC = (64, 64, 128, 256, 512)
H, W = 64, 96  # input resolution; encoder features are /2../32


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", f"/root/reference/models/{name}.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _feature_pyramid(batch=1):
    """Random 5-level pyramid matching ResNet-18 channels."""
    feats_t, feats_j = [], []
    for lvl, ch in enumerate(NUM_CH_ENC):
        stride = 2 ** (lvl + 1)
        arr = RNG.normal(0, 1, (batch, ch, H // stride, W // stride))
        arr = arr.astype(np.float32)
        feats_t.append(torch.tensor(arr))
        feats_j.append(jnp.asarray(arr.transpose(0, 2, 3, 1)))
    return feats_t, feats_j


def test_depth_head_matches_reference():
    ref_mod = _load_ref("depth_head")
    ref = ref_mod.DepthHead(np.array(NUM_CH_ENC), use_skips=True).eval()
    feats_t, feats_j = _feature_pyramid()
    with torch.no_grad():
        ref_depth, ref_disp = ref(feats_t, return_disparity=True)

    params = convert_depth_head(ref.state_dict())
    ours = DepthHead(num_ch_enc=NUM_CH_ENC, use_skips=True)
    depth, disp = ours.apply({"params": params}, feats_j)
    np.testing.assert_allclose(np.asarray(disp)[..., 0],
                               ref_disp.numpy()[:, 0], rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(depth)[..., 0],
                               ref_depth.numpy()[:, 0], rtol=2e-3, atol=1e-2)


@pytest.mark.parametrize("invert", [False, True])
def test_pose_head_matches_reference(invert):
    ref_mod = _load_ref("pose_head")
    ref = ref_mod.PoseHead(np.array(NUM_CH_ENC), num_input_features=1,
                       num_frames_to_predict_for=2).eval()
    feats_t, feats_j = _feature_pyramid(batch=2)
    with torch.no_grad():
        ref_T = ref(feats_t, invert_pose=invert)

    params = convert_pose_head(ref.state_dict())
    ours = PoseHead()
    T = ours.apply({"params": params}, feats_j, invert_pose=invert)
    np.testing.assert_allclose(np.asarray(T), ref_T.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_flow_head_matches_reference():
    # auto_mask thresholds at the batch-mean motion norm; borderline pixels
    # flip under f32 accumulation-order differences between XLA and torch,
    # so parity is checked on the pre-mask path (the mask formula itself is
    # a one-liner mirrored from flow_head.py:70-79).
    ref_mod = _load_ref("flow_head")
    ref = ref_mod.FlowHead(list(NUM_CH_ENC), auto_mask=False).eval()
    feats_t, feats_j = _feature_pyramid()
    with torch.no_grad():
        ref_flow = ref(feats_t)

    params = convert_flow_head(ref.state_dict())
    ours = FlowHead(num_ch_enc=NUM_CH_ENC, auto_mask=False)
    flow = ours.apply({"params": params}, feats_j)
    np.testing.assert_allclose(np.asarray(flow).transpose(0, 3, 1, 2),
                               ref_flow.numpy(), rtol=5e-3, atol=5e-6)


@pytest.mark.parametrize("guda", [False, True])
def test_semantic_head_matches_reference(guda):
    ref_mod = _load_ref("semantic_head")
    num_classes = 14
    ref = ref_mod.SemanticHead(np.array(NUM_CH_ENC), num_classes,
                               use_skips=True, use_guda_fusion=guda).eval()
    feats_t, feats_j = _feature_pyramid()
    with torch.no_grad():
        ref_sem = ref(feats_t)

    params = convert_semantic_head(ref.state_dict(), use_guda_fusion=guda)
    ours = SemanticHead(num_ch_enc=NUM_CH_ENC, num_classes=num_classes,
                        use_skips=True, use_guda_fusion=guda)
    sem = ours.apply({"params": params}, feats_j)
    # rtol covers f32 summation-order divergence across 11 conv layers
    # between XLA-CPU and torch-oneDNN.
    np.testing.assert_allclose(np.asarray(sem).transpose(0, 3, 1, 2),
                               ref_sem.numpy(), rtol=5e-3, atol=5e-4)


@pytest.mark.parametrize("thing_mask", [False, True])
def test_instance_head_matches_reference(thing_mask):
    ref_mod = _load_ref("instance_head")
    ref = ref_mod.InstanceHead(np.array(NUM_CH_ENC),
                               use_thing_mask=thing_mask).eval()
    feats_t, feats_j = _feature_pyramid()
    with torch.no_grad():
        ref_center, ref_offset, ref_tm = ref(feats_t)

    params, stats = convert_instance_head(ref.state_dict(),
                                          use_thing_mask=thing_mask)
    ours = InstanceHead(num_ch_enc=NUM_CH_ENC, use_thing_mask=thing_mask)
    center, offset, tm = ours.apply(
        {"params": params, "batch_stats": stats}, feats_j, train=False)
    np.testing.assert_allclose(np.asarray(center).transpose(0, 3, 1, 2),
                               ref_center.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(offset).transpose(0, 3, 1, 2),
                               ref_offset.numpy(), rtol=1e-3, atol=1e-4)
    if thing_mask:
        np.testing.assert_allclose(np.asarray(tm).transpose(0, 3, 1, 2),
                                   ref_tm.numpy(), rtol=1e-4, atol=1e-5)
    else:
        assert tm is None


@pytest.mark.parametrize("num_layers,expect_ch", [
    (18, [64, 64, 128, 256, 512]),
    (50, [64, 256, 512, 1024, 2048]),
])
def test_encoder_pyramid_shapes(num_layers, expect_ch):
    enc = make_encoder(num_layers)
    assert list(enc.num_ch_enc) == expect_ch
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    assert len(feats) == 5
    strides = [2, 4, 8, 16, 32]
    for feat, stride, ch in zip(feats, strides, expect_ch):
        assert feat.shape == (1, 64 // stride, 96 // stride, ch)


def test_encoder_multi_image_input():
    enc = make_encoder(18, num_input_images=2, num_channels_input=4)
    x = jnp.zeros((1, 32, 48, 8), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    feats = enc.apply(variables, x, train=False)
    assert feats[0].shape == (1, 16, 24, 64)
    kernel = variables["params"]["conv1"]["conv"]["kernel"]
    assert kernel.shape == (7, 7, 8, 64)


@pytest.mark.parametrize("remat", [True, (1, 2)])
def test_encoder_remat_matches_plain(remat):
    """Full and stage-selective remat are numerically identity transforms
    (gradients recompute through the same blocks; see ResNetEncoder.remat).

    Gradients compare in eval-mode normalization: train-mode BN over the
    deepest 1x2-pixel feature map divides by a near-zero 2-element
    variance, which amplifies ulp-level fusion-order differences between
    the two compiled programs into O(1) relative grad noise at this toy
    shape (verified conditioning, not semantics — at 64x96 the same
    comparison passes at 2e-5)."""
    x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32))
    plain = make_encoder(18)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)

    def loss_fn(enc):
        def loss(params):
            feats = enc.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, False)
            return sum(jnp.sum(f ** 2) for f in feats)
        return loss

    base = jax.grad(loss_fn(plain))(variables["params"])
    rema_enc = make_encoder(18, remat=remat)
    rema = jax.grad(loss_fn(rema_enc))(variables["params"])
    # Cross-compile f32 fusion-order noise only (worst observed 1.5e-4
    # rel on near-cancelling sums).
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-3), base, rema)

    # Train-mode forward (batch-stat path) also agrees bit-for-bit here.
    def fwd(enc):
        feats, _ = enc.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            x, True, mutable=["batch_stats"])
        return float(sum(jnp.sum(f ** 2) for f in feats))

    np.testing.assert_allclose(fwd(plain), fwd(rema_enc), rtol=5e-5)


def test_encoder_batchnorm_updates_in_train_mode():
    enc = make_encoder(18)
    x = jnp.asarray(RNG.normal(0, 1, (2, 32, 48, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x, train=True)
    _, updates = enc.apply(variables, x, train=True,
                           mutable=["batch_stats"])
    old = variables["batch_stats"]["conv1"]["bn"]["mean"]
    new = updates["batch_stats"]["conv1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_codeps_net_facade():
    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.models import CodepsNet, build_modules, init_params

    cfg = get_cfg_defaults()
    cfg.model.po_depth_net.params.nof_layers = 18
    modules = build_modules(cfg, num_classes=14)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))
    net = CodepsNet(modules, params, stats)

    image = jnp.zeros((1, 32, 64, 3), jnp.float32)
    result = net(image, mode="infer")
    assert result["depth"].shape == (1, 32, 64, 1)
    assert result["semantic"].shape == (1, 32, 64)
    assert "panoptic" not in result

    result = net(image, mode="eval")
    assert result["panoptic"].shape == (1, 32, 64)


def test_encoder_s2d_conv1_matches_plain():
    """The space-to-depth conv1 fold (resnet._fold_conv1_s2d) computes the
    same multiply-add terms as the 7x7/stride-2 conv — values and grads
    match the plain path within f32 reassociation noise, on the SAME
    param tree (the fold is an execution detail, not a parametrization).
    Odd input sizes fall back to the plain conv (shape contract)."""
    from codeps_tpu.models.resnet import ResNetEncoder

    x = jnp.asarray(RNG.uniform(0, 1, (2, 32, 48, 6)).astype(np.float32))
    plain = ResNetEncoder(num_layers=18, num_input_images=2,
                          s2d_conv1=False)
    s2d = ResNetEncoder(num_layers=18, num_input_images=2, s2d_conv1=True)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    # identical param trees (fold happens at apply time)
    v2 = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape,
                                     variables["params"], v2["params"]))

    def loss_fn(enc):
        def loss(params):
            feats = enc.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, False)
            return sum(jnp.sum(f ** 2) for f in feats)
        return loss

    fp = jax.value_and_grad(loss_fn(plain))(variables["params"])
    fs = jax.value_and_grad(loss_fn(s2d))(variables["params"])
    np.testing.assert_allclose(float(fp[0]), float(fs[0]), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-3), fp[1], fs[1])

    # per-pixel conv1 feature agreement (tightest surface: one conv+BN)
    f_plain = plain.apply(variables, x, train=False)[0]
    f_s2d = s2d.apply(variables, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(f_s2d), np.asarray(f_plain),
                               rtol=1e-4, atol=1e-5)

    # odd spatial size: s2d path must fall back, shapes unchanged
    x_odd = jnp.asarray(RNG.uniform(0, 1, (1, 30, 46, 6)).astype(np.float32))
    v_odd = s2d.init(jax.random.PRNGKey(0), x_odd, train=False)
    f_odd = s2d.apply(v_odd, x_odd, train=False)[0]
    assert f_odd.shape == (1, 15, 23, 64)
