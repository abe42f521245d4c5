"""uint8 host->device transfer path: on-device normalization equals the
host-normalized float path."""

import numpy as np

import jax
import jax.numpy as jnp

from codeps_tpu.config import gen_config
from codeps_tpu.models import build_modules, init_params
from codeps_tpu.ops.normalize import maybe_normalize
from codeps_tpu.tasks.adapt import make_eval_step

RNG = np.random.default_rng(23)
MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


def test_maybe_normalize_matches_host_math():
    raw = RNG.integers(0, 256, (2, 8, 12, 3)).astype(np.uint8)
    host = (raw.astype(np.float32) / 255.0 - np.asarray(MEAN)) / \
        np.asarray(STD)
    device = maybe_normalize(jnp.asarray(raw), MEAN, STD)
    np.testing.assert_allclose(np.asarray(device), host, atol=1e-6)


def test_maybe_normalize_is_noop_for_float():
    x = RNG.normal(0, 1, (2, 8, 12, 3)).astype(np.float32)
    out = maybe_normalize(jnp.asarray(x), MEAN, STD)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_prepare_for_network_uint8_mode():
    from PIL import Image

    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.data.preprocessing import prepare_for_network

    cfg = get_cfg_defaults().dataset.normalization
    cfg.uint8_transfer = True
    img = Image.fromarray(RNG.integers(0, 255, (8, 12, 3), np.uint8), "RGB")
    output = {"rgb": {0: img}}
    prepare_for_network(output, cfg)
    assert output["rgb"][0].dtype == np.uint8
    assert output["rgb"][0].shape == (8, 12, 3)


def test_host_normalize_matches_device_math():
    # AdaptationRunner._host_normalize is the host twin of
    # maybe_normalize for mixup composition (the composed images are
    # float, so the device-side no-op must see normalized values).
    from types import SimpleNamespace

    from codeps_tpu.tasks.adapt_loop import AdaptationRunner

    shim = SimpleNamespace(_norm_mean=MEAN, _norm_std=STD)
    raw = RNG.integers(0, 256, (8, 12, 3)).astype(np.uint8)
    host = AdaptationRunner._host_normalize(shim, raw)
    np.testing.assert_allclose(
        host, np.asarray(maybe_normalize(jnp.asarray(raw), MEAN, STD)),
        atol=1e-6)
    # floats pass through untouched (already normalized)
    flt = RNG.normal(0, 1, (8, 12, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        AdaptationRunner._host_normalize(shim, flt), flt)


def test_plabel_steps_thread_custom_normalization():
    # Regression: the teacher pseudo-label programs used hardcoded
    # ImageNet constants for uint8 inputs instead of the cfg's — with
    # NON-default constants, uint8 and host-normalized float inputs
    # must still produce identical pseudo-labels.
    from codeps_tpu.tasks.adapt import make_plabel_step
    from codeps_tpu.tasks.mixup_prep import make_plabel_prep_step

    custom_mean = (0.2, 0.3, 0.4)
    custom_std = (0.5, 0.6, 0.7)
    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.semantics.class_weights = [1.0] * 14
    modules = build_modules(cfg, 14)
    params, stats = init_params(jax.random.PRNGKey(1), modules, (32, 64))

    raw = RNG.integers(0, 256, (2, 32, 64, 3)).astype(np.uint8)
    host_norm = ((raw.astype(np.float32) / 255.0
                  - np.asarray(custom_mean))
                 / np.asarray(custom_std)).astype(np.float32)

    plabel = make_plabel_step(modules, custom_mean, custom_std)
    sem_u8, ctr_u8, off_u8 = plabel(params, stats, jnp.asarray(raw))
    sem_f, ctr_f, off_f = plabel(params, stats, jnp.asarray(host_norm))
    np.testing.assert_array_equal(np.asarray(sem_u8), np.asarray(sem_f))
    np.testing.assert_allclose(np.asarray(ctr_u8), np.asarray(ctr_f),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(off_u8), np.asarray(off_f),
                               atol=1e-4)

    from codeps_tpu.tasks.mixup_prep import c2c_prewarp
    intr = np.asarray([[30.0, 30.0, 32.0, 16.0]] * 2, np.float32)
    warp = jax.tree.map(jnp.asarray,
                        c2c_prewarp(intr, intr, (32, 64), (32, 64)))
    prep = make_plabel_prep_step(modules, (9, 10, 11, 12, 13), (32, 64),
                                 mean=custom_mean, std=custom_std)
    rgb_u8, sem_w_u8, inst_u8 = prep(params, stats, jnp.asarray(raw),
                                     warp)
    rgb_f, sem_w_f, inst_f = prep(params, stats, jnp.asarray(host_norm),
                                  warp)
    # returned rgb is in normalized space either way
    np.testing.assert_allclose(np.asarray(rgb_u8), np.asarray(rgb_f),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(sem_w_u8),
                                  np.asarray(sem_w_f))
    np.testing.assert_array_equal(np.asarray(inst_u8), np.asarray(inst_f))


def test_eval_step_uint8_equals_float():
    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.semantics.class_weights = [1.0] * 14
    modules = build_modules(cfg, 14)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))
    eval_step = make_eval_step(modules, cfg, (9, 10, 11, 12, 13))

    raw = RNG.integers(0, 256, (1, 3, 32, 64, 3)).astype(np.uint8)
    host_norm = ((raw.astype(np.float32) / 255.0 - np.asarray(MEAN))
                 / np.asarray(STD)).astype(np.float32)
    camera = jnp.asarray([[30.0, 30.0, 32.0, 16.0]], jnp.float32)

    res_u8, _ = eval_step(params, stats,
                          {"frames": jnp.asarray(raw), "camera": camera})
    res_f32, _ = eval_step(params, stats,
                           {"frames": jnp.asarray(host_norm),
                            "camera": camera})
    np.testing.assert_allclose(np.asarray(res_u8["depth"]),
                               np.asarray(res_f32["depth"]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res_u8["semantic"]),
                                  np.asarray(res_f32["semantic"]))
    np.testing.assert_array_equal(np.asarray(res_u8["panoptic"]),
                                  np.asarray(res_f32["panoptic"]))
