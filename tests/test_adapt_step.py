"""Online-adaptation step tests: eval/plabel/adapt jitted programs + the
rolling non-moving-frame skip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codeps_tpu.config import gen_config
from codeps_tpu.models import build_modules, init_params
from codeps_tpu.tasks import build_optimizer, make_adapt_state
from codeps_tpu.tasks.mixup_prep import c2c_prewarp
from codeps_tpu.tasks.adapt import (DIST_BUFFER_LEN, make_adapt_step,
                                    make_eval_step, make_gt_panoptic_step,
                                    make_plabel_step, update_ring_buffer)

RNG = np.random.default_rng(9)
HT, WT = 32, 64   # target resolution
HS, WS = 32, 96   # source resolution (must be /32-divisible, like the reference feed sizes)
NC = 14
THINGS = (9, 10, 11, 12, 13)


def _cfg():
    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.model.pose_sflow_net.params.nof_layers = 18
    cfg.semantics.class_weights = [1.0] * NC
    cfg.adapt.ema.semantic = True
    cfg.adapt.ema.alpha = 0.99
    return cfg


def _modules_state(cfg, frozen=("backbone_po_depth", "instance_head")):
    modules = build_modules(cfg, num_classes=NC)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (HT, WT))
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(2),
                             ema_modules=("semantic_head",),
                             frozen_modules=frozen, ema_alpha=0.99)
    return modules, state, tx


def _target_batch(with_gt=True):
    batch = {
        "frames": jnp.asarray(
            RNG.uniform(0, 1, (1, 3, HT, WT, 3)).astype(np.float32)),
        "camera": jnp.asarray([[30.0, 30.0, WT / 2, HT / 2]], jnp.float32),
    }
    if with_gt:
        batch["semantic"] = jnp.asarray(
            RNG.integers(0, NC, (1, HT, WT)).astype(np.int32))
        batch["depth_gt"] = jnp.asarray(
            RNG.uniform(1, 60, (1, HT, WT)).astype(np.float32))
    return batch


def _adapt_batch(num_source=2, num_replay=2, num_mixup=2):
    batch = {
        "target": _target_batch(with_gt=False),
        "source": {
            "frames": jnp.asarray(RNG.uniform(
                0, 1, (num_source, 3, HS, WS, 3)).astype(np.float32)),
            "camera": jnp.tile(
                jnp.asarray([[28.0, 28.0, WS / 2, HS / 2]], jnp.float32),
                (num_source, 1)),
            "semantic": jnp.asarray(RNG.integers(
                0, NC, (num_source, HS, WS)).astype(np.int32)),
            "semantic_weights": jnp.ones((num_source, HS, WS), jnp.float32),
            "center": jnp.asarray(RNG.uniform(
                0, 1, (num_source, HS, WS, 1)).astype(np.float32)),
            "offset": jnp.asarray(RNG.normal(
                0, 4, (num_source, HS, WS, 2)).astype(np.float32)),
        },
        "target_replay": {
            "frames": jnp.asarray(RNG.uniform(
                0, 1, (num_replay, 3, HT, WT, 3)).astype(np.float32)),
            "camera": jnp.tile(
                jnp.asarray([[30.0, 30.0, WT / 2, HT / 2]], jnp.float32),
                (num_replay, 1)),
        },
        "mixup": {
            "rgb": jnp.asarray(RNG.uniform(
                0, 1, (num_mixup, HS, WS, 3)).astype(np.float32)),
            "semantic": jnp.asarray(RNG.integers(
                0, NC, (num_mixup, HS, WS)).astype(np.int32)),
        },
    }
    return batch


def test_eval_step_outputs():
    cfg = _cfg()
    modules, state, _ = _modules_state(cfg)
    eval_step = make_eval_step(modules, cfg, THINGS)
    results, stats = eval_step(state.ema_params, state.ema_batch_stats,
                               _target_batch())
    assert results["depth"].shape == (1, HT, WT, 1)
    assert results["semantic"].shape == (1, HT, WT)
    assert results["panoptic"].shape == (1, HT, WT)
    assert stats["sem_conf"].shape == (NC, NC)
    assert np.isfinite(float(stats["d_abs_rel"]))


def test_plabel_and_gt_panoptic_steps():
    cfg = _cfg()
    modules, state, _ = _modules_state(cfg)
    plabel = make_plabel_step(modules)
    sem, center, offset = plabel(
        state.ema_params, state.ema_batch_stats,
        jnp.asarray(RNG.uniform(0, 1, (2, HT, WT, 3)).astype(np.float32)))
    assert sem.shape == (2, HT, WT)
    assert center.shape == (2, HT, WT, 1)
    assert offset.shape == (2, HT, WT, 2)

    gt_pan = make_gt_panoptic_step(modules, THINGS)
    pan = gt_pan(jnp.asarray(RNG.integers(0, NC, (1, HT, WT))),
                 jnp.zeros((1, HT, WT, 1)), jnp.zeros((1, HT, WT, 2)))
    assert pan.shape == (1, HT, WT)


def test_ring_buffer_skip_logic():
    buf = jnp.zeros((DIST_BUFFER_LEN,), jnp.float32)
    count = jnp.zeros((), jnp.int32)
    head = jnp.zeros((), jnp.int32)

    # not full -> never skip, appends
    buf, count, head, skip = update_ring_buffer(buf, count, head,
                                                jnp.asarray(0.5))
    assert not bool(skip) and int(count) == 1

    # fill with large distances
    full_buf = jnp.full((DIST_BUFFER_LEN,), 1.0, jnp.float32)
    full_count = jnp.asarray(DIST_BUFFER_LEN, jnp.int32)
    # tiny current distance -> skip, buffer unchanged
    b2, c2, h2, skip2 = update_ring_buffer(full_buf, full_count, head,
                                           jnp.asarray(0.01))
    assert bool(skip2)
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(full_buf))
    # normal distance -> no skip, overwrite oldest
    b3, c3, h3, skip3 = update_ring_buffer(full_buf, full_count,
                                           jnp.asarray(0, jnp.int32),
                                           jnp.asarray(0.5))
    assert not bool(skip3)
    assert float(b3[0]) == 0.5


@pytest.fixture(scope="module")
def shared_step():
    """One compiled adapt step shared by the tests that use the default
    shape/config (each make_adapt_step call creates a fresh jit cache
    entry; sharing saves a multi-minute XLA-CPU compile per test)."""
    cfg = _cfg()
    frozen = ("backbone_po_depth", "instance_head")
    modules, state, tx = _modules_state(cfg, frozen)
    step = make_adapt_step(
        modules, cfg, tx, class_weights=list(cfg.semantics.class_weights),
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=2, donate=False)
    return cfg, modules, state, tx, step


def test_adapt_step_end_to_end(shared_step):
    cfg, modules, state, tx, step = shared_step
    batch = _adapt_batch()
    # same batch pytree structure as the N-step test so the two share
    # ONE compiled executable (True = blend, the N=1 semantics)
    batch["do_ema"] = np.asarray(True)

    new_state, metrics, feats = step(state, batch)
    for key in ("depth_recon", "depth_smth", "semantic_source",
                "semantic_cut_mixup", "center_source",
                "offset_source"):
        assert np.isfinite(float(metrics[key])), key
    assert not bool(metrics["target_skipped"])
    # feature map for the replay buffer: last pyramid level of frame t
    assert feats.shape[0] == 1 and feats.shape[-1] == 512

    # frozen modules unchanged; live modules moved
    frozen_delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                                state.params["backbone_po_depth"],
                                new_state.params["backbone_po_depth"])
    assert max(jax.tree.leaves(frozen_delta)) == 0.0
    live_delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                              state.params["semantic_head"],
                              new_state.params["semantic_head"])
    assert max(jax.tree.leaves(live_delta)) > 0

    # EMA: semantic head blended (still close to old), depth head copied
    sem_ema_delta = jax.tree.map(
        lambda e, p: float(jnp.abs(e - p).max()),
        new_state.ema_params["semantic_head"],
        new_state.params["semantic_head"])
    assert max(jax.tree.leaves(sem_ema_delta)) > 0  # lags the student
    depth_ema_delta = jax.tree.map(
        lambda e, p: float(jnp.abs(e - p).max()),
        new_state.ema_params["depth_head"],
        new_state.params["depth_head"])
    assert max(jax.tree.leaves(depth_ema_delta)) == 0  # copied verbatim
    # frozen module EMA keeps old weights
    frozen_ema_delta = jax.tree.map(
        lambda e, p: float(jnp.abs(e - p).max()),
        new_state.ema_params["backbone_po_depth"],
        state.ema_params["backbone_po_depth"])
    assert max(jax.tree.leaves(frozen_ema_delta)) == 0
    assert int(new_state.dist_count) == 1


def test_adapt_step_fused_mixup():
    """In-jit mixup path: teacher pseudo-labels + c2c warp + per-strategy
    mask composition inside the adapt step — MIXED groups (one cut_mixup
    + one class_mixup sample) so both fused strategies compile into the
    same executable."""
    cfg = _cfg()
    cfg.losses.weights["semantic_class_mixup"] = 1.0
    frozen = ("backbone_po_depth", "instance_head")
    modules, state, tx = _modules_state(cfg, frozen)
    step = make_adapt_step(
        modules, cfg, tx, class_weights=list(cfg.semantics.class_weights),
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=2,
        mixup_groups=(("cut_mixup", 1), ("class_mixup", 1)),
        fused_mixup=True, donate=False)

    batch = _adapt_batch()
    num_mixup = 2
    # the class_mixup row replaces source classes {0..6} with target
    replace = np.zeros((1, 256), bool)
    replace[0, :7] = True
    batch["mixup"] = {
        "rgb_src": jnp.asarray(RNG.uniform(
            0, 1, (num_mixup, HS, WS, 3)).astype(np.float32)),
        "semantic_src": jnp.asarray(RNG.integers(
            0, NC, (num_mixup, HS, WS)).astype(np.int32)),
        "rgb_tgt": jnp.asarray(RNG.uniform(
            0, 1, (num_mixup, HT, WT, 3)).astype(np.float32)),
        "prewarp": jax.tree.map(jnp.asarray, c2c_prewarp(
            np.tile([[30.0, 30.0, WT / 2, HT / 2]], (num_mixup, 1)),
            np.tile([[28.0, 28.0, WS / 2, HS / 2]], (num_mixup, 1)),
            (HT, WT), (HS, WS))),
        "cut_cells": jnp.asarray([[0, 5]], jnp.int32),
        "class_replace": jnp.asarray(replace),
    }

    new_state, metrics, feats = step(state, batch)
    # one pooled CE PER strategy group (reference computes a single
    # flattened-top-k loss per strategy key)
    for key in ("semantic_cut_mixup", "semantic_class_mixup"):
        assert np.isfinite(float(metrics[key])), key
        assert float(metrics[key]) > 0
        assert np.ndim(np.asarray(metrics[key])) == 0
    assert np.isfinite(float(metrics["loss_total"]))


def test_adapt_step_depth_only():
    """Adaptation with the panoptic heads disabled (depth-only flavor,
    cfg.model.make_semantic/instance=False): only the multi-domain
    photometric/smoothness losses drive the step."""
    cfg = _cfg()
    cfg.model.make_semantic = False
    cfg.model.make_instance = False
    frozen = ("backbone_po_depth",)
    modules, state, tx = _modules_state(cfg, frozen)
    step = make_adapt_step(
        modules, cfg, tx, class_weights=list(cfg.semantics.class_weights),
        ema_modules=(), frozen_modules=frozen,
        has_replay=True, num_mixup=0, donate=False)
    batch = _adapt_batch()
    batch.pop("mixup")

    new_state, metrics, feats = step(state, batch)
    for key in ("depth_recon", "depth_smth", "loss_total"):
        assert np.isfinite(float(metrics[key])), key
    assert "semantic_source" not in metrics
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params["depth_head"],
                         new_state.params["depth_head"])
    assert max(jax.tree.leaves(delta)) > 0


def test_adapt_step_sflow_motion_maps():
    """sflow flavor: the step returns the student's target-domain
    object-motion pair in its eval results (algos/depth.py:595 ->
    online_adap.py:421) and the motion panel renders from it
    (visualizations.py:49-51)."""
    cfg = _cfg()
    cfg.model.make_sflow = True
    cfg.model.make_semantic = False
    cfg.model.make_instance = False
    frozen = ("backbone_po_depth",)
    modules, state, tx = _modules_state(cfg, frozen)
    from codeps_tpu.tasks.adapt import build_eval_forward
    step = make_adapt_step(
        modules, cfg, tx, class_weights=list(cfg.semantics.class_weights),
        ema_modules=(), frozen_modules=frozen,
        has_replay=True, num_mixup=0, donate=False,
        eval_forward=build_eval_forward(modules, cfg, THINGS))
    batch = _adapt_batch()
    batch.pop("mixup")

    _, metrics, _, eval_results, _ = step(state, batch)
    for key in ("flow_smth", "flow_sparsity"):
        assert np.isfinite(float(metrics[key])), key
    motion = np.asarray(eval_results["object_motion_map"])
    assert motion.shape == (2, 1, HT, WT, 3)
    assert np.isfinite(motion).all()

    from codeps_tpu.io.visualizations import gen_visualizations
    panels = gen_visualizations(
        {"frames": np.asarray(batch["target"]["frames"])},
        {k: np.asarray(v) for k, v in eval_results.items()
         if v is not None and k != "semantic_soft"},
        (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    assert panels["motion_0"].shape == (HT, 2 * WT, 3)


def test_adapt_step_source_thing_mask_loss():
    """use_thing_mask configs: the adapt step computes the source
    thing-mask CE (algos/instance_seg.py:177-182) and weights it into the
    total when cfg.losses.weights.thing_mask_source is set (the reference
    computes-but-drops it, online_adap.py:408-416 — documented upgrade)."""
    cfg = _cfg()
    cfg.model.instance_head.use_thing_mask = True
    cfg.losses.weights["thing_mask_source"] = 0.5
    frozen = ("backbone_po_depth",)  # instance head live so it trains
    modules, state, tx = _modules_state(cfg, frozen)
    step = make_adapt_step(
        modules, cfg, tx, class_weights=list(cfg.semantics.class_weights),
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=2, donate=False)
    batch = _adapt_batch()
    batch["source"]["thing_mask"] = jnp.asarray(RNG.integers(
        0, 2, (2, HS, WS)).astype(np.int32))

    new_state, metrics, _ = step(state, batch)
    tm = float(metrics["thing_mask_source"])
    assert np.isfinite(tm) and tm > 0
    # weighted into the total
    wdict = {k: v for k, v in cfg.losses.weights.items()}
    weighted = sum(
        (wdict[k] or 0.0) * float(v) for k, v in metrics.items()
        if k in wdict and np.ndim(np.asarray(v)) == 0)
    total = float(metrics["loss_total"])
    np.testing.assert_allclose(total, weighted, rtol=2e-4)


def test_ema_blends_once_per_frame_at_n_steps(shared_step):
    """nof_adaptation_steps=3: the EMA teacher must equal the reference
    formula applied ONCE to the final student params (update_weights is
    called after the N-step loop, adapt_codeps.py:268-299) — the traced
    do_ema flag keeps the teacher untouched on steps 0..N-2."""
    cfg, modules, state, tx, step = shared_step
    batch = _adapt_batch()

    ema0_sem = jax.tree.map(jnp.array, state.ema_params["semantic_head"])
    ema0_depth = jax.tree.map(jnp.array, state.ema_params["depth_head"])
    s = state
    for i in range(3):
        batch["do_ema"] = np.asarray(i == 2)
        s, metrics, _ = step(s, batch)
        if i < 2:
            # teacher untouched mid-loop
            delta = jax.tree.map(lambda e, o: float(jnp.abs(e - o).max()),
                                 s.ema_params["semantic_head"], ema0_sem)
            assert max(jax.tree.leaves(delta)) == 0.0
            delta = jax.tree.map(lambda e, o: float(jnp.abs(e - o).max()),
                                 s.ema_params["depth_head"], ema0_depth)
            assert max(jax.tree.leaves(delta)) == 0.0

    # EMA module: alpha*ema0 + (1-alpha)*student_final, applied once
    expected = jax.tree.map(lambda e, p: 0.99 * e + 0.01 * p,
                            ema0_sem, s.params["semantic_head"])
    err = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                       s.ema_params["semantic_head"], expected)
    assert max(jax.tree.leaves(err)) < 1e-6
    # non-EMA live module: copied verbatim from the final student
    err = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                       s.ema_params["depth_head"], s.params["depth_head"])
    assert max(jax.tree.leaves(err)) == 0.0


def test_sharded_adapt_step_published_config():
    """Sharded == single-device for the step the published configs RUN:
    fused cut-mixup + in-step teacher eval (AdaptationRunner's
    executable). Batch-1 target replicated; source/replay/mixup sharded.
    Tiny shapes (HT x WT everywhere) keep the two 1-core CPU compiles
    tractable; same-resolution domains still take the merged
    target+replay and batched source+mixup paths."""
    from codeps_tpu.parallel import make_mesh, replicate, shard_batch
    from codeps_tpu.tasks.adapt import build_eval_forward

    cfg = _cfg()
    # f32 per-pixel loss math for a SHARP equality: with the default
    # bf16 photometric dtype the pooled mixup CE's top_k ranks bf16
    # values with massive ties, so a 1-ulp FMA/fusion difference
    # between the single-device and SPMD compiles swaps boundary
    # pixels across a bf16 tie cliff (~3e-3 at loss~2.7) and shifts
    # the mean by ~1e-4 — cross-compile noise, not a sharding bug.
    # bf16 execution of this exact step variant stays covered by the
    # driver dryrun (__graft_entry__) and the TPU bench loop mode.
    cfg.tpu.compute_dtype = "float32"
    frozen = ("backbone_po_depth", "instance_head")
    modules, state, tx = _modules_state(cfg, frozen)
    eval_forward = build_eval_forward(modules, cfg, THINGS)
    step = make_adapt_step(
        modules, cfg, tx, class_weights=list(cfg.semantics.class_weights),
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=8, fused_mixup=True, donate=False,
        eval_forward=eval_forward)

    num = 8
    rng = np.random.default_rng(3)
    batch = _adapt_batch(num_source=num, num_replay=num, num_mixup=0)
    batch.pop("mixup")
    # source at target resolution so mixup (target-res) shares shapes
    batch["source"] = {
        "frames": jnp.asarray(rng.uniform(
            0, 1, (num, 3, HT, WT, 3)).astype(np.float32)),
        "camera": jnp.tile(jnp.asarray(
            [[30.0, 30.0, WT / 2, HT / 2]], jnp.float32), (num, 1)),
        "semantic": jnp.asarray(rng.integers(
            0, NC, (num, HT, WT)).astype(np.int32)),
        "semantic_weights": jnp.ones((num, HT, WT), jnp.float32),
        "center": jnp.asarray(rng.uniform(
            0, 1, (num, HT, WT, 1)).astype(np.float32)),
        "offset": jnp.asarray(rng.normal(
            0, 4, (num, HT, WT, 2)).astype(np.float32)),
    }
    batch["mixup"] = {
        "rgb_src": jnp.asarray(rng.uniform(
            0, 1, (num, HT, WT, 3)).astype(np.float32)),
        "semantic_src": jnp.asarray(rng.integers(
            0, NC, (num, HT, WT)).astype(np.int32)),
        "rgb_tgt": jnp.asarray(rng.uniform(
            0, 1, (num, HT, WT, 3)).astype(np.float32)),
        "prewarp": jax.tree.map(jnp.asarray, c2c_prewarp(
            np.tile([[30.0, 30.0, WT / 2, HT / 2]], (num, 1)),
            np.tile([[30.0, 30.0, WT / 2, HT / 2]], (num, 1)),
            (HT, WT), (HT, WT))),
        "cut_cells": jnp.asarray(
            rng.integers(0, 8, (num, 2)).astype(np.int32)),
    }
    batch["eval_gt"] = {
        "semantic": jnp.asarray(rng.integers(
            0, NC, (1, HT, WT)).astype(np.int32)),
        "depth_gt": jnp.asarray(rng.uniform(
            1, 60, (1, HT, WT)).astype(np.float32)),
    }
    batch["do_ema"] = np.asarray(True)

    new_state, metrics, feats, results, stats = step(state, batch)
    loss_single = float(metrics["loss_total"])

    mesh = make_mesh()
    state_r = replicate(state, mesh)
    batch_s = dict(batch)
    batch_s["target"] = replicate(batch["target"], mesh)
    batch_s["eval_gt"] = replicate(batch["eval_gt"], mesh)
    for key in ("source", "target_replay", "mixup"):
        batch_s[key] = shard_batch(batch[key], mesh)

    new_state_s, metrics_s, feats_s, results_s, stats_s = step(state_r,
                                                               batch_s)
    np.testing.assert_allclose(float(metrics_s["loss_total"]),
                               loss_single, rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics_s["semantic_cut_mixup"]),
        float(metrics["semantic_cut_mixup"]), rtol=1e-5)
    # Updated params equal up to the Adam step-1 sign-flip ceiling
    # (scripts/parity_adapt.py uses the same bound): the first
    # bias-corrected update is exactly +-lr*sign(g) per component, so
    # ulp-level cross-compile gradient noise on |g|~0 components shows
    # as 2*lr while any systematic sharding bug (wrong psum/mean
    # scale) flips a large fraction of signs. Loss equality above
    # catches magnitude bugs that step-1 Adam normalizes away.
    lr = cfg.train.optimizer.learning_rate
    flat = np.concatenate([
        np.abs(np.asarray(a - b)).ravel() for a, b in zip(
            jax.tree.leaves(new_state.params["semantic_head"]),
            jax.tree.leaves(new_state_s.params["semantic_head"]))])
    assert flat.max() <= 2.2 * lr
    # Flip fraction: two INDEPENDENT XLA compiles (SPMD vs single) FMA/
    # fuse differently, so |g|~ulp components flip sign more often than
    # parity_adapt's same-program torch-vs-jax runs (measured ~0.6%
    # here); a routing bug would flip a large fraction.
    assert (flat > 1e-5).mean() < 0.02
    np.testing.assert_array_equal(np.asarray(stats_s["sem_conf"]),
                                  np.asarray(stats["sem_conf"]))

    # ---- SPATIAL placement of the SAME step (cfg.tpu.spatial_shard
    # product path): every image leaf H-sharded over the mesh, GSPMD
    # inserts conv halos + warp/resize collectives. Must reproduce the
    # single-device step on the same global batch (SPATIAL_SHARD.md
    # proved the pipeline in isolation; this covers the full published
    # executable: fused cut-mixup + in-step eval + panoptic fusion).
    from codeps_tpu.parallel import shard_adapt_batch_spatial
    batch_sp = shard_adapt_batch_spatial(batch, mesh)
    new_state_sp, metrics_sp, feats_sp, results_sp, stats_sp = step(
        state_r, batch_sp)
    np.testing.assert_allclose(float(metrics_sp["loss_total"]),
                               loss_single, rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics_sp["semantic_cut_mixup"]),
        float(metrics["semantic_cut_mixup"]), rtol=1e-5)
    flat = np.concatenate([
        np.abs(np.asarray(a - b)).ravel() for a, b in zip(
            jax.tree.leaves(new_state.params["semantic_head"]),
            jax.tree.leaves(new_state_sp.params["semantic_head"]))])
    assert flat.max() <= 2.2 * lr          # Adam step-1 sign-flip bound
    assert (flat > 1e-5).mean() < 0.02
    np.testing.assert_array_equal(np.asarray(stats_sp["sem_conf"]),
                                  np.asarray(stats["sem_conf"]))
    # the fused panoptic map must be pixel-identical under sharding
    np.testing.assert_array_equal(np.asarray(results_sp["panoptic"]),
                                  np.asarray(results["panoptic"]))


def test_spatial_spec_mapping():
    """Unit checks for the spatial placement table (no jit)."""
    from jax.sharding import PartitionSpec as P

    from codeps_tpu.parallel.spatial import spatial_spec

    assert spatial_spec("frames", 5, "data") == P(None, None, "data",
                                                  None, None)
    assert spatial_spec("semantic", 3, "data") == P(None, "data", None)
    assert spatial_spec("offset", 4, "data") == P(None, "data", None, None)
    assert spatial_spec("camera", 2, "data") == P()       # replicated
    assert spatial_spec("cut_cells", 2, "data") == P()
    assert spatial_spec("do_ema", 0, "data") == P()


def test_sharded_adapt_step_over_mesh():
    """Data-parallel adaptation over the 8-device CPU mesh.

    Sharding layout (see __graft_entry__._dryrun_adapt): the batch-1
    online target triplet is replicated (the stream is sequential,
    scripts/adapt_codeps.py:155-307); source-replay / target-replay /
    mixup sub-batches are sharded over the data axis. Their per-domain
    losses are batch means, so the sharded step must equal the
    single-device step on the same global batch (SPMD semantics).
    """
    from codeps_tpu.parallel import make_mesh, replicate, shard_batch

    cfg = _cfg()
    frozen = ("backbone_po_depth", "instance_head")
    modules, state, tx = _modules_state(cfg, frozen)
    # mixup omitted to keep the two 1-core-CPU XLA compiles tractable;
    # the driver dryrun (__graft_entry__._dryrun_adapt) runs the fused
    # cut-mixup variant on the same 8-device mesh.
    step = make_adapt_step(
        modules, cfg, tx, class_weights=list(cfg.semantics.class_weights),
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=0, donate=False)

    batch = _adapt_batch(num_source=8, num_replay=8)
    batch.pop("mixup")

    new_state, metrics, feats = step(state, batch)
    loss_single = float(metrics["loss_total"])

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state_r = replicate(state, mesh)
    batch_s = dict(batch)
    batch_s["target"] = replicate(batch["target"], mesh)
    for key in ("source", "target_replay"):
        batch_s[key] = shard_batch(batch[key], mesh)

    new_state_s, metrics_s, feats_s = step(state_r, batch_s)
    loss_sharded = float(metrics_s["loss_total"])
    np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-5)
    # updated params identical too (replicated grads == global grads)
    delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        new_state.params["semantic_head"],
        new_state_s.params["semantic_head"])
    assert max(jax.tree.leaves(delta)) < 1e-5
