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
