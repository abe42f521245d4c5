"""Scheduler parity vs the reference WarmupPolyLR, meters, checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from codeps_tpu.evaluation.meters import (AverageMeter, ConfusionMatrixMeter,
                                          ConstantMeter)
from codeps_tpu.tasks.optim import step_lr_schedule, warmup_poly_schedule


def test_warmup_poly_matches_reference():
    from misc.solver import WarmupPolyLR  # torch-only reference oracle

    base_lr = 0.001
    dummy = torch.nn.Linear(2, 2)
    optimizer = torch.optim.Adam(dummy.parameters(), lr=base_lr)
    ref_sched = WarmupPolyLR(optimizer, max_iters=500, warmup_factor=0.001,
                             warmup_iters=100, warmup_method="linear",
                             power=0.9, constant_ending=0.0)
    ours = warmup_poly_schedule(base_lr, max_iters=500, warmup_factor=0.001,
                                warmup_iters=100, warmup_method="linear",
                                power=0.9, constant_ending=0.0)

    for it in range(0, 480, 7):
        ref_lr = ref_sched.get_lr()[0]
        np.testing.assert_allclose(float(ours(it)), ref_lr, rtol=1e-5,
                                   err_msg=f"iter {it}")
        # advance the torch scheduler by 7 steps
        for _ in range(7):
            optimizer.step()
            ref_sched.step()


def test_warmup_poly_constant_ending():
    ours = warmup_poly_schedule(1.0, max_iters=100, warmup_factor=0.001,
                                warmup_iters=10, constant_ending=0.5)
    # late in training the poly factor drops below 0.5 -> constant
    assert float(ours(95)) == pytest.approx(0.5)
    assert float(ours(20)) > 0.5


def test_step_lr_epoch_semantics():
    sched = step_lr_schedule(1.0, step_size_epochs=2, gamma=0.1,
                             steps_per_epoch=10)
    assert float(sched(0)) == 1.0
    assert float(sched(19)) == 1.0          # epoch 1
    assert float(sched(20)) == pytest.approx(0.1)   # epoch 2
    assert float(sched(45)) == pytest.approx(0.01)  # epoch 4


def test_meters():
    avg = AverageMeter(())
    for value in (1.0, 2.0, 3.0):
        avg.update(value)
    assert float(avg.mean) == pytest.approx(2.0)
    assert float(avg.value) == pytest.approx(2.0)

    const = ConstantMeter(())
    const.update(5.0)
    const.update(7.0)
    assert float(const.value) == 7.0

    conf = ConfusionMatrixMeter(3)
    conf.update(np.asarray([[5, 1, 0], [0, 4, 0], [0, 0, 2]]))
    assert conf.iou.shape == (3,)
    assert conf.iou[2] == pytest.approx(1.0)

    state = avg.state_dict()
    avg2 = AverageMeter(())
    avg2.load_state_dict(state)
    assert float(avg2.mean) == pytest.approx(2.0)


def test_checkpoint_roundtrip(tmp_path):
    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.io import (load_checkpoint, resume_from_checkpoint,
                               save_checkpoint)

    cfg = get_cfg_defaults()
    params = {"depth_head": {"conv": {"kernel": np.ones((3, 3, 4, 8),
                                                        np.float32)}}}
    stats = {"backbone_po_depth": {"bn": {"mean": np.zeros(4, np.float32)}}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, cfg, epoch=3, global_step=42, params=params,
                    batch_stats=stats)

    checkpoint = load_checkpoint(path)
    assert checkpoint["training_meta"]["epoch"] == 3

    fresh_params = jax.tree.map(lambda x: np.zeros_like(x), params)
    fresh_stats = jax.tree.map(lambda x: np.ones_like(x), stats)
    new_params, new_stats = resume_from_checkpoint(checkpoint, fresh_params,
                                                   fresh_stats)
    np.testing.assert_array_equal(
        new_params["depth_head"]["conv"]["kernel"],
        params["depth_head"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        new_stats["backbone_po_depth"]["bn"]["mean"],
        stats["backbone_po_depth"]["bn"]["mean"])


def test_pth_conversion_full_checkpoint(tmp_path):
    """Reference-format .pth -> our params via pretrained_from_checkpoints."""
    import importlib.util

    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.io import pretrained_from_checkpoints
    from codeps_tpu.models import build_modules, init_params

    def load_ref(name):
        spec = importlib.util.spec_from_file_location(
            f"ref_{name}", f"/root/reference/models/{name}.py")
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module

    num_ch_enc = np.array([64, 64, 128, 256, 512])
    ref_depth = load_ref("depth_head").DepthHead(num_ch_enc, use_skips=True)
    ref_pose = load_ref("pose_head").PoseHead(num_ch_enc,
                                              num_input_features=1,
                                              num_frames_to_predict_for=2)
    torch_ckpt = {
        "state_dict": {
            "depth_head": ref_depth.state_dict(),
            "pose_head": ref_pose.state_dict(),
        },
    }
    pth_path = tmp_path / "ref.pth"
    torch.save(torch_ckpt, str(pth_path))

    cfg = get_cfg_defaults()
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.model.make_semantic = False
    cfg.model.make_instance = False
    modules = build_modules(cfg, num_classes=14)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))

    new_params, _ = pretrained_from_checkpoints([str(pth_path)], params,
                                                stats, cfg)
    ref_kernel = ref_depth.state_dict()["upconvs_0.4.0.weight"].numpy()
    ours_kernel = np.asarray(
        new_params["depth_head"]["upconv_4_0"]["conv"]["kernel"])
    np.testing.assert_allclose(ours_kernel.transpose(3, 2, 0, 1),
                               ref_kernel, atol=1e-6)
    # untouched module keeps its init
    np.testing.assert_array_equal(
        np.asarray(new_params["backbone_po_depth"]["conv1"]["conv"]["kernel"]),
        np.asarray(params["backbone_po_depth"]["conv1"]["conv"]["kernel"]))


def test_full_resume_bitmatch(tmp_path):
    """VERDICT item: a resumed run must BE the same run. Train 2 steps,
    checkpoint (params + batch_stats + optimizer + RNG + global_step +
    meters), restore into freshly-initialized objects, train 2 more
    steps, and bit-match against an uninterrupted 4-step run (reference
    restores all of this on --resume: io_utils/io_utils.py:76-88,
    scripts/train_codeps.py:502-543)."""
    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.io import (load_checkpoint, restore_meters,
                               restore_opt_state, restore_rng,
                               resume_from_checkpoint, save_checkpoint)
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.tasks import (TrainState, build_optimizer,
                                  build_schedule, make_train_step)

    cfg = get_cfg_defaults()
    cfg.model.make_semantic = False
    cfg.model.make_instance = False
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.model.pose_sflow_net.params.nof_layers = 18
    height, width = 32, 64

    modules = build_modules(cfg, num_classes=14)
    tx = build_optimizer(cfg, build_schedule(cfg, steps_per_epoch=2))
    step = make_train_step(modules, cfg, tx, class_weights=[1.0] * 14,
                           donate=False)

    rng = np.random.default_rng(3)
    batches = []
    for _ in range(4):
        batches.append({
            "frames": jnp.asarray(rng.uniform(
                0, 1, (1, 3, height, width, 3)).astype(np.float32)),
            "camera": jnp.asarray([[40.0, 40.0, width / 2, height / 2]],
                                  jnp.float32),
        })

    def fresh_state(seed=0):
        params, stats = init_params(jax.random.PRNGKey(seed), modules,
                                    (height, width))
        return TrainState(params=params, batch_stats=stats,
                          opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32),
                          rng=jax.random.PRNGKey(7))

    # uninterrupted 4-step run
    state = fresh_state()
    for batch in batches:
        state, _ = step(state, batch)
    ref_params = jax.device_get(state.params)
    ref_opt = jax.device_get(state.opt_state)

    # interrupted: 2 steps -> checkpoint
    state = fresh_state()
    for batch in batches[:2]:
        state, _ = step(state, batch)
    meters = {"loss": AverageMeter(())}
    meters["loss"].update(1.25)
    path = str(tmp_path / "ckpt_resume")
    save_checkpoint(path, cfg, epoch=0, global_step=2,
                    params=jax.device_get(state.params),
                    batch_stats=jax.device_get(state.batch_stats),
                    opt_state=jax.device_get(state.opt_state),
                    rng=jax.device_get(state.rng), meters=meters)

    # restore into a DIFFERENTLY-seeded fresh state (proves the restore)
    checkpoint = load_checkpoint(path)
    state2 = fresh_state(seed=99)
    params, stats = resume_from_checkpoint(checkpoint, state2.params,
                                           state2.batch_stats)
    opt_state = restore_opt_state(checkpoint, state2.opt_state)
    restored_rng = restore_rng(checkpoint)
    assert opt_state is not None and restored_rng is not None
    state2 = state2.replace(
        params=params, batch_stats=stats, opt_state=opt_state,
        rng=jnp.asarray(restored_rng),
        step=jnp.asarray(int(checkpoint["training_meta"]["global_step"]),
                         jnp.int32))
    meters2 = restore_meters(checkpoint, {"loss": AverageMeter(())})
    assert float(meters2["loss"].value) == 1.25

    for batch in batches[2:]:
        state2, _ = step(state2, batch)

    flat_a = jax.tree_util.tree_leaves(ref_params)
    flat_b = jax.tree_util.tree_leaves(jax.device_get(state2.params))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam moments + schedule count identical too
    for a, b in zip(jax.tree_util.tree_leaves(ref_opt),
                    jax.tree_util.tree_leaves(
                        jax.device_get(state2.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
