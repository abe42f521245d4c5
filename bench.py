#!/usr/bin/env python3
"""Benchmark: online-adaptation steps/sec on the real TPU chip.

North-star metric (BASELINE.json): adaptation train steps/sec (fwd+bwd)
at 384x1280 target resolution with the default CS->SemKITTI adaptation
shape: 1 target triplet + 2 source samples (512x1024) + 2 target replay
+ 2 mixup samples, ResNet-101 shared backbone + ResNet-18 pose backbone,
frozen backbone_po_depth/instance_head, bf16 conv compute.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 25 steps/s v5e-8 target.

Timing is differential with a forced value fetch: on relay-tunneled
chips, block_until_ready does not reliably wait for donated executables,
so we time (N+M steps with fetch) - (M steps with fetch), which cancels
both the fetch round-trip and dispatch pipelining.

Smaller-footprint knobs for smoke runs:
  BENCH_PRESET=tiny    (64x128, ResNet-18)
  BENCH_STEPS=N        timed steps (default 20)
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_STEPS_PER_SEC = 25.0  # north-star: v5e-8 (8 chips)
BASELINE_CHIPS = 8
V5E_PEAK_BF16_FLOPS = 1.97e14  # one v5e chip, bf16 MXU peak


def _cache_entries() -> int:
    """Number of entries in the persistent compilation cache (0 = cold)."""
    cache_dir = Path(__file__).resolve().parent / ".jax_cache"
    return len(list(cache_dir.glob("*"))) if cache_dir.exists() else 0


def _code_version() -> str:
    """Content hash of the library tree (flops change only with code or
    shapes; shapes live in the memo key)."""
    import subprocess
    try:
        out = subprocess.run(
            ["git", "-C", str(Path(__file__).resolve().parent),
             "rev-parse", "HEAD:codeps_tpu"],
            capture_output=True, timeout=10)
        return out.stdout.decode().strip() or "unknown"
    except Exception:
        return "unknown"


def _flops_per_call(jitted, args, memo_key=None) -> float | None:
    """Model FLOPs of one call from XLA's HLO cost analysis of the
    lowered (pre-optimization) program — optimization fuses bytes away
    but does not change the matmul/conv FLOP count. Lowering re-traces
    (minutes for the full step on this 1-core host) but never
    re-compiles; with ``memo_key`` the count is memoized to
    .bench_flops.json keyed by (memo_key, codeps_tpu tree hash), so
    repeat benches of unchanged code skip the retrace. Returns None
    where the lowering or the analysis is unsupported (recorded as
    null, never faked)."""
    memo_path = Path(__file__).resolve().parent / ".bench_flops.json"
    full_key = None
    if memo_key:
        full_key = f"{memo_key}|{_code_version()}"
        try:
            memo = json.loads(memo_path.read_text())
            if full_key in memo:
                return memo[full_key]
        except Exception:
            pass
    try:
        import jax
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), args)
        lowered = jitted.lower(*abstract)
        cost = lowered.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if not isinstance(cost, dict):
            # The axon relay backend returns None from cost_analysis();
            # the FLOP count of the unoptimized HLO is backend-agnostic,
            # so run the analysis against the in-process CPU client.
            import jax.extend as jex
            from jaxlib import _jax
            cost = _jax.hlo_module_cost_analysis(
                jex.backend.get_backend("cpu"),
                lowered.compiler_ir("hlo").as_hlo_module())
        flops = float(cost.get("flops", 0.0))
        if flops <= 0:
            return None
        if full_key:
            try:
                memo = {}
                if memo_path.exists():
                    memo = json.loads(memo_path.read_text())
                memo[full_key] = flops
                memo_path.write_text(json.dumps(memo, indent=1))
            except Exception:
                pass
        return flops
    except Exception:
        return None


def _mfu_fields(flops_per_step, seconds_per_step) -> dict:
    """FLOPs/step + achieved TFLOP/s + % of v5e bf16 peak (VERDICT r4 #3:
    roofline accounting in every bench artifact). flops counts the HLO
    as written (f32 geometry included), so mfu is a conservative bound."""
    if not flops_per_step or not seconds_per_step:
        return {}
    achieved = flops_per_step / seconds_per_step
    return {
        "flops_per_step": float(f"{flops_per_step:.4g}"),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_pct_v5e_bf16": round(100 * achieved / V5E_PEAK_BF16_FLOPS, 2),
    }


def _baseline_for_devices() -> float:
    """Per-run target scaled to the devices actually benched.

    The north-star is 25 adapt steps/s on a v5e-8; the adapt step is
    data-parallel, so an n-device run is held to 25*n/8. On the 1-chip
    axon tunnel that is 3.125 steps/s.
    """
    import jax
    return BASELINE_STEPS_PER_SEC * len(jax.devices()) / BASELINE_CHIPS


LAST_COMPILE_SECONDS = {}
LAST_AOT = {}


def _maybe_aot(jitted, args, tag, compile_key):
    """Swap a jitted function for an AOT-store-backed executable.

    The axon relay defeats jax's persistent compilation cache (the
    cache entry is written and found, yet the backend recompiles
    remotely: 221.6 s cold vs 1246.2 s "warm", round-5 measurement), so
    warm starts go through `codeps_tpu.io.aot_cache` instead:
    serialized executables keyed by code version + shapes + backend.
    BENCH_AOT=0 disables (true cold-compile measurement). The first
    call's wall time lands in LAST_COMPILE_SECONDS either way; LAST_AOT
    records hit/miss so the artifact says which kind of number it is.
    """
    if os.environ.get("BENCH_AOT", "1") == "0":
        LAST_AOT[compile_key] = "off"
        return jitted
    from codeps_tpu.io.aot_cache import load_or_compile
    info = {}
    compiled = load_or_compile(jitted, args, tag,
                               extra_files=("bench.py",), info=info)
    LAST_COMPILE_SECONDS[compile_key] = info.get("seconds")
    LAST_AOT[compile_key] = info.get("aot", "off")
    return compiled


def _differential_elapsed(timed, num_steps, warmup=3, profile=False,
                          compile_key=None):
    """Timing-honesty protocol in ONE place (see module docstring).

    ``timed(n)`` runs n iterations (threading any loop state via
    closure) and must END with a forced scalar fetch, then return wall
    seconds. We time an M-window and an (M+N)-window; their difference
    cancels the fetch RPC and dispatch pipelining. BENCH_PROFILE wraps
    the two timed windows in a profiler trace when ``profile`` is set.

    The FIRST call compiles the jitted program; its wall time is
    recorded under ``compile_key`` in LAST_COMPILE_SECONDS so every
    bench artifact carries a compile-time series (regression guard —
    the r03 dryrun died of an unnoticed compile blowup).
    """
    t_first = timed(1)  # compile + 1 step (or just 1 step under AOT)
    if compile_key:
        # an AOT load already recorded its own (deserialize or compile)
        # seconds under this key — keep that, it is the honest number
        LAST_COMPILE_SECONDS.setdefault(compile_key, round(t_first, 1))
    if warmup > 1:
        timed(warmup - 1)  # post-compile warmup
    profile_dir = os.environ.get("BENCH_PROFILE") if profile else None
    if profile_dir:
        import jax
        jax.profiler.start_trace(profile_dir)
    t_short = timed(3)
    t_long = timed(3 + num_steps)
    if profile_dir:
        import jax
        jax.profiler.stop_trace()
    return max(t_long - t_short, 1e-6)


def _bench_train(cfg, num_classes, num_steps, height, width):
    """Multi-task pretraining step throughput (train_cityscapes shape:
    batch 6 at 512x1024 per chip). Returns an images/sec record."""
    import jax
    import jax.numpy as jnp

    from codeps_tpu.tasks import (TrainState, build_optimizer,
                                  build_schedule, make_train_step)

    # The adapt config lacks the pretrain scheduler/loss-weight keys —
    # rebuild the train defaults with the same model settings.
    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.models import build_modules, init_params
    train_cfg = get_cfg_defaults()
    train_cfg.model.merge_from_dict(cfg.model.to_dict())
    train_cfg.semantics.class_weights = [1.0] * num_classes
    cfg = train_cfg
    # ResNet-101 fwd+bwd at batch 6 x 512x1024 needs remat on 16 GB chips.
    # BENCH_TRAIN_REMAT: "all" (default), "none", or a comma list of
    # encoder stage numbers, e.g. "1,2" (remat only the high-res stages).
    remat_env = os.environ.get("BENCH_TRAIN_REMAT", "all")
    if remat_env == "all":
        remat = True
    elif remat_env == "none":
        remat = False
    else:
        remat = tuple(int(s) for s in remat_env.split(",") if s)
    # BENCH_S2D=1: space-to-depth conv1 A/B (cfg.tpu.s2d_conv1)
    cfg.tpu.s2d_conv1 = os.environ.get("BENCH_S2D", "0") == "1"
    import jax.numpy as _jnp
    modules = build_modules(cfg, num_classes, dtype=_jnp.bfloat16,
                            remat=remat)
    params, stats = init_params(jax.random.PRNGKey(0), modules,
                                (height, width))

    batch_size = int(os.environ.get("BENCH_TRAIN_BATCH", "6"))
    rng = np.random.default_rng(0)
    batch = {
        "frames": jnp.asarray(rng.uniform(
            0, 1, (batch_size, 3, height, width, 3)).astype(np.float32)),
        "camera": jnp.tile(jnp.asarray(
            [[600.0, 600.0, width / 2, height / 2]], jnp.float32),
            (batch_size, 1)),
        "semantic": jnp.asarray(rng.integers(
            0, num_classes, (batch_size, height, width)).astype(np.int32)),
        "semantic_weights": jnp.ones((batch_size, height, width),
                                     jnp.float32),
        "center": jnp.asarray(rng.uniform(
            0, 1, (batch_size, height, width, 1)).astype(np.float32)),
        "center_weights": jnp.ones((batch_size, height, width, 1),
                                   jnp.float32),
        "offset": jnp.asarray(rng.normal(
            0, 4, (batch_size, height, width, 2)).astype(np.float32)),
        "offset_weights": jnp.ones((batch_size, height, width, 1),
                                   jnp.float32),
        "thing_mask": jnp.asarray(rng.integers(
            0, 2, (batch_size, height, width)).astype(np.int32)),
    }

    schedule = build_schedule(cfg, steps_per_epoch=500)
    tx = build_optimizer(cfg, schedule)
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0))
    step = make_train_step(modules, cfg, tx,
                           class_weights=[1.0] * num_classes, donate=True)
    jit_step = step
    step = _maybe_aot(step, (state, batch),
                      f"train_step@{height}x{width}@b{batch_size}"
                      f"@remat{remat_env}@s2d{int(cfg.tpu.s2d_conv1)}",
                      "train_step")

    state_box = [state]

    def timed(n):
        state = state_box[0]
        start = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, batch)
        float(metrics["loss_total"])  # force execution of the chain
        state_box[0] = state
        return time.perf_counter() - start

    elapsed = _differential_elapsed(timed, num_steps,
                                    compile_key="train_step")

    images_per_sec = num_steps * batch_size / elapsed
    mfu = _mfu_fields(
        _flops_per_call(jit_step, (state_box[0], batch),
                        memo_key=f"train@{height}x{width}@b{batch_size}"),
        elapsed / num_steps)
    return {
        "metric": "pretrain_images_per_sec",
        "value": round(images_per_sec, 3),
        "unit": "img/s",
        **mfu,
        # The reference publishes NO pretrain throughput (BASELINE.md:15
        # — the torch script has data_time/batch_time meters but no
        # reported numbers), so there is no honest ratio to compute;
        # earlier rounds divided train steps/s by the ADAPT steps/s
        # target, a unit mismatch. Omitted rather than faked.
        "vs_baseline": None,
        "baseline_note": "no published reference pretrain throughput "
                         "(BASELINE.md); ratio intentionally omitted",
    }


def _bench_infer(cfg, num_classes, num_steps, height, width):
    """Serving-path throughput: the facade eval forward (all heads +
    panoptic fusion) at the adaptation target resolution.

    Mirrors the reference's deployment surface — CodepsNet.forward
    eval mode (/root/reference/codeps/online_adap.py:142-181) followed
    by InstanceSegAlgo.panoptic_fusion (algos/instance_seg.py:207-258)
    — as one jitted program. BENCH_INFER_BATCH sets the batch (default
    1: per-frame serving latency)."""
    import jax
    import jax.numpy as jnp

    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.models.facade import CodepsNet

    modules = build_modules(cfg, num_classes, dtype=jnp.bfloat16)
    params, stats = init_params(jax.random.PRNGKey(0), modules,
                                (height, width))
    net = CodepsNet(modules, params, stats)

    batch_size = int(os.environ.get("BENCH_INFER_BATCH", "1"))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(
        0, 1, (batch_size, height, width, 3)).astype(np.float32))

    infer_jit = jax.jit(lambda img: net(img, mode="eval"))
    infer = _maybe_aot(infer_jit, (image,),
                       f"infer@{height}x{width}@b{batch_size}",
                       "infer_step")

    def timed(n):
        start = time.perf_counter()
        for _ in range(n):
            out = infer(image)
        # Force the chain: small device-side reduce, scalar fetch.
        float(jnp.sum(out["panoptic"]) + jnp.sum(out["depth"][0]))
        return time.perf_counter() - start

    elapsed = _differential_elapsed(timed, num_steps,
                                    compile_key="infer_step")

    images_per_sec = num_steps * batch_size / elapsed
    mfu = _mfu_fields(
        _flops_per_call(infer_jit, (image,),
                        memo_key=f"infer@{height}x{width}@b{batch_size}"),
        elapsed / num_steps)
    return {
        "metric": "infer_images_per_sec",
        "value": round(images_per_sec, 3),
        "unit": "img/s",
        **mfu,
        # No published reference serving throughput exists (BASELINE.md);
        # recorded for round-over-round comparability, not a ratio.
        "vs_baseline": None,
        "baseline_note": "no published reference inference throughput; "
                         f"batch={batch_size} at {height}x{width} incl. "
                         "panoptic fusion",
    }


def _bench_spatial(num_steps):
    """Spatially-sharded adaptation step: compile the PRODUCTION adapt
    executable (fused cut-mixup + in-step eval, published K360/SemKITTI
    shapes) with every image tensor H-sharded over an 8-device mesh,
    inventory the collectives GSPMD inserted, and project the v5e-8
    step latency.

    Runs on the virtual 8-CPU mesh (only one physical TPU chip is
    reachable here): the artifact is the compiled executable's
    collective payload — the only quantity a virtual mesh can measure
    honestly — combined with the measured single-chip step-time split
    (docs/ROADMAP.md r3 trace: 243 ms/step = 209 ms spatially-shardable
    conv/gather/elementwise/layout work + ~34 ms unshardable remainder:
    pose-head global reductions, panoptic-fusion sorts, top-k CE).
    Correctness of the sharded executable is equality-tested in
    tests/test_adapt_step.py::test_sharded_adapt_step_published_config.

    Env knobs: BENCH_SPATIAL_SCALES (default 5, the production recon
    pyramid), BENCH_SPATIAL_BASE_MS / BENCH_SPATIAL_UNSHARDED_MS to
    re-project from a newer single-chip trace.
    """
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", Path(__file__).resolve().parent
        / "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    devices = graft._force_cpu_mesh(8)

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from codeps_tpu.config import gen_config
    from codeps_tpu.data.labels import thing_classes
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.parallel import replicate, shard_adapt_batch_spatial
    from codeps_tpu.tasks import build_optimizer, make_adapt_state
    from codeps_tpu.tasks.adapt import build_eval_forward, make_adapt_step

    ht, wt = 384, 1280
    hs, ws = 512, 1024
    num_source, num_replay, num_mixup = 2, 2, 2
    num_classes = 14

    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 101
    cfg.semantics.class_weights = [1.0] * num_classes
    cfg.depth.num_recon_scales = int(
        os.environ.get("BENCH_SPATIAL_SCALES", "5"))
    cfg.freeze()

    modules = build_modules(cfg, num_classes, dtype=jnp.bfloat16)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (ht, wt))
    frozen = ("backbone_po_depth", "instance_head")
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(1),
                             ema_modules=("semantic_head",),
                             frozen_modules=frozen,
                             ema_alpha=cfg.adapt.ema.alpha)
    thing_list = tuple(thing_classes(cfg.dataset.label_mode, []))
    eval_forward = build_eval_forward(modules, cfg, thing_list)
    step = make_adapt_step(
        modules, cfg, tx, class_weights=[1.0] * num_classes,
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=num_mixup, fused_mixup=True,
        donate=False, eval_forward=eval_forward)

    rng = np.random.default_rng(0)
    from codeps_tpu.tasks.mixup_prep import c2c_prewarp

    def frames(n, h, w):
        return rng.uniform(0, 1, (n, 3, h, w, 3)).astype(np.float32)

    def camera(n, h, w):
        return np.tile(np.asarray([[w * 0.6, w * 0.6, w / 2, h / 2]],
                                  np.float32), (n, 1))

    batch = {
        "target": {"frames": frames(1, ht, wt),
                   "camera": camera(1, ht, wt)},
        "source": {
            "frames": frames(num_source, hs, ws),
            "camera": camera(num_source, hs, ws),
            "semantic": rng.integers(0, num_classes,
                                     (num_source, hs, ws)).astype(np.int32),
            "semantic_weights": np.ones((num_source, hs, ws), np.float32),
            "center": rng.uniform(0, 1, (num_source, hs, ws, 1)).astype(
                np.float32),
            "offset": rng.normal(0, 4, (num_source, hs, ws, 2)).astype(
                np.float32),
        },
        "target_replay": {"frames": frames(num_replay, ht, wt),
                          "camera": camera(num_replay, ht, wt)},
        "mixup": {
            "rgb_src": frames(num_mixup, hs, ws)[:, 0],
            "semantic_src": rng.integers(
                0, num_classes, (num_mixup, hs, ws)).astype(np.int32),
            "rgb_tgt": frames(num_mixup, ht, wt)[:, 0],
            "prewarp": c2c_prewarp(
                camera(num_mixup, ht, wt), camera(num_mixup, hs, ws),
                (ht, wt), (hs, ws)),
            "cut_cells": np.zeros((num_mixup, 2), np.int32),
        },
        "eval_gt": {
            "semantic": rng.integers(0, num_classes, (1, ht, wt)).astype(
                np.int32),
            "depth_gt": rng.uniform(0, 60, (1, ht, wt)).astype(np.float32),
        },
    }

    mesh = Mesh(np.asarray(devices), ("data",))
    state_r = replicate(state, mesh)
    batch_sp = shard_adapt_batch_spatial(batch, mesh)

    t0 = time.perf_counter()
    compiled = step.lower(state_r, batch_sp).compile()
    compile_s = time.perf_counter() - t0
    LAST_COMPILE_SECONDS["adapt_step_spatial"] = round(compile_s, 1)

    # ---- collective inventory of the sharded executable
    import re
    from collections import defaultdict
    counts, byte_totals = defaultdict(int), defaultdict(int)
    shape_re = re.compile(r"=\s*(\w+)\[([\d,]*)\]")
    sizes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "pred": 1, "s8": 1, "u8": 1, "s64": 8, "u64": 8}
    for line in compiled.as_text().splitlines():
        stripped = line.strip()
        for op in ("all-reduce", "all-gather", "collective-permute",
                   "reduce-scatter", "all-to-all"):
            if re.search(rf"= \S+ {op}", stripped):
                counts[op] += 1
                match = shape_re.search(stripped)
                if match:
                    elems = int(np.prod(
                        [int(d) for d in match.group(2).split(",") if d]
                        or [1]))
                    byte_totals[op] += elems * sizes.get(match.group(1), 4)
                break
    total_bytes = int(sum(byte_totals.values()))

    # ---- projection: measured single-chip split + ICI comm cost
    base_ms = float(os.environ.get("BENCH_SPATIAL_BASE_MS", "243"))
    unsharded_ms = float(os.environ.get("BENCH_SPATIAL_UNSHARDED_MS", "34"))
    ici_gbps = 186e9  # v5e 1D ring, usable per direction
    comm_ms = total_bytes / ici_gbps * 1e3
    ndev = len(devices)
    projected_ms = (base_ms - unsharded_ms) / ndev + unsharded_ms + comm_ms
    projected_steps = 1000.0 / projected_ms

    return {
        "metric": "adapt_steps_per_sec_spatial_projected",
        "value": round(projected_steps, 3),
        "unit": "steps/s (v5e-8 projection)",
        "vs_baseline": round(projected_steps / BASELINE_STEPS_PER_SEC, 3),
        "devices": ndev,
        "compile_seconds": {"adapt_step_spatial": round(compile_s, 1)},
        "collectives": {op: {"count": counts[op],
                             "bytes": int(byte_totals[op])}
                        for op in sorted(counts)},
        "collective_bytes_total": total_bytes,
        "comm_ms": round(comm_ms, 3),
        "assumptions": {
            "single_chip_step_ms": base_ms,
            "unshardable_ms": unsharded_ms,
            "ici_gbps": ici_gbps / 1e9,
            "note": "H-sharded executable compiled+inventoried on the "
                    "8-device virtual CPU mesh (1 physical chip here); "
                    "shardable work scales 1/n, unshardable remainder + "
                    "serialized collective payload added back. Equality "
                    "of the sharded step is tested in "
                    "test_adapt_step.py::"
                    "test_sharded_adapt_step_published_config.",
        },
    }


def _run_mode(mode):
    import jax
    import jax.numpy as jnp

    from codeps_tpu.config import gen_config
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.tasks import build_optimizer, make_adapt_state
    from codeps_tpu.tasks.adapt import make_adapt_step

    preset = os.environ.get("BENCH_PRESET", "full")
    if preset == "tiny":
        ht, wt = 64, 128
        hs, ws = 64, 96
        backbone = 18
    else:
        ht, wt = 384, 1280   # SemKITTI-DVPS adaptation resolution
        hs, ws = 512, 1024   # Cityscapes source resolution
        backbone = 101
    # BENCH_HSCALE: multiply every image HEIGHT (target + source +
    # replay + mixup together) by this factor. In the H-sharded layout
    # (parallel/spatial.py) the per-chip workload of an n-chip mesh is
    # the full step at hscale=1/n plus collectives, so measuring the
    # step at 1, 1/2, 1/4 height yields the REAL scaling curve
    # (BENCH_MODE=scaling) instead of an assumed-perfect 1/n.
    hscale = float(os.environ.get("BENCH_HSCALE", "1"))
    if hscale != 1.0:
        ht, hs = int(round(ht * hscale)), int(round(hs * hscale))
        assert ht % 32 == 0 and hs % 32 == 0, \
            f"BENCH_HSCALE={hscale} gives non-/32 heights {ht},{hs}"
    num_steps = int(os.environ.get("BENCH_STEPS", "20"))
    num_source, num_replay, num_mixup = 2, 2, 2
    num_classes = 14

    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = backbone
    cfg.semantics.class_weights = [1.0] * num_classes
    cfg.freeze()

    if mode == "train":
        return _bench_train(cfg, num_classes, num_steps, hs, ws)
    if mode == "infer":
        return _bench_infer(cfg, num_classes, num_steps, ht, wt)

    modules = build_modules(cfg, num_classes, dtype=jnp.bfloat16)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (ht, wt))

    frozen = ("backbone_po_depth", "instance_head")
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(1),
                             ema_modules=("semantic_head",),
                             frozen_modules=frozen,
                             ema_alpha=cfg.adapt.ema.alpha)

    # BENCH_LOOP_STRATEGIES: comma list of mixup strategies for loop
    # mode (default = the published configs' shape, 2 samples). Fusable
    # strategies (cut/class) compose in-jit; any conf_instance_mixup
    # entry drops the loop to the HOST composition path
    # (AdaptationRunner._compose_mixups) — run with
    # BENCH_LOOP_STRATEGIES=cut_mixup,conf_instance_mixup to price that
    # path (the config surface's host-speed cliff, documented in
    # docs/ROADMAP.md).
    loop_strategies = [s for s in os.environ.get(
        "BENCH_LOOP_STRATEGIES", "cut_mixup,cut_mixup").split(",") if s]
    loop_fused = all(s in ("cut_mixup", "class_mixup")
                     for s in loop_strategies)
    if mode == "loop":
        num_mixup = len(loop_strategies)
    mixup_groups = tuple(
        (name, loop_strategies.count(name))
        for name in ("cut_mixup", "class_mixup", "conf_instance_mixup")
        if name in loop_strategies) if mode == "loop" else None

    eval_forward = None
    if mode == "loop":
        # Loop mode mirrors AdaptationRunner: teacher metrics-eval folded
        # into the adapt executable (one dispatch per frame).
        from codeps_tpu.tasks.adapt import build_eval_forward
        eval_forward = build_eval_forward(modules, cfg,
                                          thing_list=(9, 10, 11, 12, 13))
    step = make_adapt_step(
        modules, cfg, tx, class_weights=[1.0] * num_classes,
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=num_mixup, mixup_groups=mixup_groups,
        fused_mixup=(mode == "loop" and loop_fused), donate=True,
        eval_forward=eval_forward)

    rng = np.random.default_rng(0)

    def frames(n, h, w):
        return jnp.asarray(rng.uniform(0, 1, (n, 3, h, w, 3)).astype(
            np.float32))

    batch = {
        "target": {
            "frames": frames(1, ht, wt),
            "camera": jnp.asarray([[720.0, 720.0, wt / 2, ht / 2]],
                                  jnp.float32),
        },
        "source": {
            "frames": frames(num_source, hs, ws),
            "camera": jnp.tile(jnp.asarray(
                [[600.0, 600.0, ws / 2, hs / 2]], jnp.float32),
                (num_source, 1)),
            "semantic": jnp.asarray(rng.integers(
                0, num_classes, (num_source, hs, ws)).astype(np.int32)),
            "semantic_weights": jnp.ones((num_source, hs, ws),
                                         jnp.float32),
            "center": jnp.asarray(rng.uniform(
                0, 1, (num_source, hs, ws, 1)).astype(np.float32)),
            "offset": jnp.asarray(rng.normal(
                0, 4, (num_source, hs, ws, 2)).astype(np.float32)),
        },
        "target_replay": {
            "frames": frames(num_replay, ht, wt),
            "camera": jnp.tile(jnp.asarray(
                [[720.0, 720.0, wt / 2, ht / 2]], jnp.float32),
                (num_replay, 1)),
        },
        "mixup": {
            "rgb": frames(num_mixup, hs, ws)[:, 0],
            "semantic": jnp.asarray(rng.integers(
                0, num_classes, (num_mixup, hs, ws)).astype(np.int32)),
        },
    }

    if os.environ.get("BENCH_FLOPS_ONLY"):
        # Trace-only: report the step's HLO FLOP count without touching
        # the device (backfills MFU for SCALING.json's measured points —
        # the count is shape-determined, so CPU lowering suffices).
        return {"metric": "adapt_step_flops", "mode": mode,
                "hscale": hscale,
                "value": _flops_per_call(
                    step, (state, batch),
                    memo_key=f"step@{ht}x{wt}+{hs}x{ws}"),
                "unit": "flops/step"}

    if mode == "loop":
        # Full per-frame adaptation loop: teacher eval + one adapt step
        # + buffer-add features. Fused strategies compose in-jit (the
        # host only draws mask materials and uploads fresh frame data);
        # a conf_instance_mixup entry runs the host composition path
        # per frame (plabel_prep device program + numpy paste + upload).
        from codeps_tpu.native.simindex import SimIndex

        nof_splits = (cfg.adapt.mixup.cut_mix.nof_vert_splits
                      * cfg.adapt.mixup.cut_mix.nof_hor_splits)
        nof_segments = cfg.adapt.mixup.cut_mix.nof_segments
        n_cut = loop_strategies.count("cut_mixup")
        n_class = loop_strategies.count("class_mixup")
        mix_rgb_tgt = jnp.asarray(rng.uniform(
            0, 1, (num_mixup, ht, wt, 3)).astype(np.float32))
        mix_sem_src = jnp.asarray(rng.integers(
            0, num_classes, (num_mixup, hs, ws)).astype(np.int32))
        mix_rgb_src = frames(num_mixup, hs, ws)[:, 0]
        loop_batch = dict(batch)
        from codeps_tpu.tasks.mixup_prep import c2c_prewarp
        loop_batch["mixup"] = {
            "rgb_src": mix_rgb_src,
            "semantic_src": mix_sem_src,
            "rgb_tgt": mix_rgb_tgt,
            "prewarp": jax.tree.map(jnp.asarray, c2c_prewarp(
                np.tile([[720.0, 720.0, wt / 2, ht / 2]], (num_mixup, 1)),
                np.tile([[600.0, 600.0, ws / 2, hs / 2]], (num_mixup, 1)),
                (ht, wt), (hs, ws))),
        }
        if n_cut:
            loop_batch["mixup"]["cut_cells"] = jnp.zeros(
                (n_cut, nof_segments), jnp.int32)
        if n_class:
            loop_batch["mixup"]["class_replace"] = jnp.zeros(
                (n_class, 256), bool)
        host_sem_src = np.asarray(mix_sem_src)
        if not loop_fused:
            # host composition path (AdaptationRunner._compose_mixups):
            # one device program for pseudo-labels + c2c warp, numpy
            # strategy paste, then the composed samples upload
            from codeps_tpu.data.mixup import Mixup
            from codeps_tpu.tasks.mixup_prep import (c2c_prewarp,
                                                     make_plabel_prep_step)
            plabel_prep = make_plabel_prep_step(
                modules, (9, 10, 11, 12, 13), (hs, ws), geom_augment=True)
            # fixed camera pair -> the host f64 warp precomputation and
            # its upload happen once (AdaptationRunner caches likewise)
            prewarp_dev = jax.tree.map(jnp.asarray, c2c_prewarp(
                np.tile([[720.0, 720.0, wt / 2, ht / 2]], (num_mixup, 1)),
                np.tile([[600.0, 600.0, ws / 2, hs / 2]], (num_mixup, 1)),
                (ht, wt), (hs, ws)))
            host_rgb_src = np.asarray(mix_rgb_src)
            host_inst_src = np.random.default_rng(3).integers(
                0, 4, (num_mixup, hs, ws)).astype(np.int32)
            loop_batch["mixup"] = {"rgb": mix_rgb_src,
                                   "semantic": mix_sem_src}
        sim_index = SimIndex(modules.backbone_po_depth.num_ch_enc[-1])
        host_rng = np.random.default_rng(0)

        pending_add = [None]

        def draw_fused_materials():
            """Host RNG draw + device upload of the per-frame mixup mask
            materials. Called right after a step DISPATCHES so the small
            upload RPCs ride alongside the device compute (double
            buffering) instead of padding the frame's critical path."""
            mats = {}
            if n_cut:
                cells = np.stack([
                    host_rng.choice(nof_splits, nof_segments,
                                    replace=False)
                    for _ in range(n_cut)]).astype(np.int32)
                mats["cut_cells"] = jnp.asarray(cells)
            if n_class:
                tables = np.zeros((n_class, 256), bool)
                for i in range(n_class):
                    classes = np.unique(host_sem_src[n_cut + i])
                    chosen = host_rng.choice(
                        classes,
                        (len(classes) + len(classes) % 2) // 2,
                        replace=False)
                    tables[i, chosen] = True
                mats["class_replace"] = jnp.asarray(tables)
            return mats

        next_materials = [draw_fused_materials() if loop_fused else None]

        def one_frame(state, frame_idx):
            if loop_fused:
                # this frame's materials were uploaded while the PREVIOUS
                # frame computed; swap in and dispatch immediately
                loop_batch["mixup"].update(next_materials[0])
            else:
                rgb_w, sem_w, inst_w = plabel_prep(
                    state.ema_params, state.ema_batch_stats, mix_rgb_tgt,
                    prewarp_dev)
                rgb_w = np.asarray(rgb_w)
                sem_w = np.asarray(sem_w)
                inst_w = np.asarray(inst_w)
                rgbs, sems = [], []
                for i, strategy in enumerate(loop_strategies):
                    if strategy == "cut_mixup":
                        rgb_m, sem_m, _ = Mixup.cut_mixup(
                            host_rng, host_rgb_src[i], rgb_w[i],
                            host_inst_src[i], host_sem_src[i], sem_w[i],
                            inst_w[i],
                            cfg.adapt.mixup.cut_mix.nof_vert_splits,
                            cfg.adapt.mixup.cut_mix.nof_hor_splits,
                            nof_segments)
                    elif strategy == "class_mixup":
                        rgb_m, sem_m, _ = Mixup.class_mixup(
                            host_rng, host_rgb_src[i], rgb_w[i],
                            host_inst_src[i], host_sem_src[i], sem_w[i],
                            inst_w[i])
                    else:
                        rgb_m, sem_m, _ = Mixup.conf_instance_mixup(
                            host_rgb_src[i], rgb_w[i], host_inst_src[i],
                            host_sem_src[i], sem_w[i], inst_w[i],
                            cfg.adapt.mixup.conf_instance_mix
                            .min_inst_size)
                    rgbs.append(rgb_m)
                    sems.append(sem_m)
                loop_batch["mixup"] = {
                    "rgb": jnp.asarray(np.stack(rgbs).astype(np.float32)),
                    "semantic": jnp.asarray(np.stack(sems).astype(
                        np.int32)),
                }
            state, metrics, features, results, _ = step(state, loop_batch)
            # everything below overlaps the dispatched device step:
            # next frame's mask-material upload, then the deferred
            # diversity add (previous frame's (1, C) features are ready
            # — its step finished before this one was dispatched)
            if loop_fused:
                next_materials[0] = draw_fused_materials()
            if pending_add[0] is not None:
                feats, idx = pending_add[0]
                feats = np.asarray(feats)
                sim_index.add_with_ids(feats, np.asarray([idx]))
                if sim_index.ntotal > 1:
                    sim_index.search(feats, 1)
            try:
                features.copy_to_host_async()
            except AttributeError:
                pass
            pending_add[0] = (features, frame_idx)
            return state, metrics

        jit_step = step
        step = _maybe_aot(step, (state, loop_batch),
                          f"adapt_loop@{ht}x{wt}+{hs}x{ws}"
                          f"@{','.join(loop_strategies)}"
                          f"@fused{int(loop_fused)}@r{backbone}",
                          "adapt_step_loop")
        state_box = [state]
        frame_counter = [0]  # monotonic: distinct sim-index ids per frame

        def timed_frames(n):
            state = state_box[0]
            start = time.perf_counter()
            for _ in range(n):
                state, metrics = one_frame(state, frame_counter[0])
                frame_counter[0] += 1
            float(metrics["loss_total"])
            state_box[0] = state
            return time.perf_counter() - start

        elapsed = _differential_elapsed(timed_frames, num_steps,
                                        warmup=2, profile=True,
                                        compile_key="adapt_step_loop")
        metric_name = "adapt_frames_per_sec"
    else:
        jit_step = step
        step = _maybe_aot(step, (state, batch),
                          f"adapt_step@{ht}x{wt}+{hs}x{ws}"
                          f"@src{num_source}rep{num_replay}"
                          f"mix{num_mixup}@r{backbone}",
                          "adapt_step")
        state_box = [state]

        def timed_steps(n):
            state = state_box[0]
            start = time.perf_counter()
            for _ in range(n):
                state, metrics, _ = step(state, batch)
            float(metrics["loss_total"])
            state_box[0] = state
            return time.perf_counter() - start

        elapsed = _differential_elapsed(timed_steps, num_steps,
                                        profile=True,
                                        compile_key="adapt_step")
        metric_name = "adapt_steps_per_sec"

    steps_per_sec = num_steps / elapsed
    record = {
        "metric": metric_name,
        "value": round(steps_per_sec, 3),
        "unit": ("frames/s" if metric_name == "adapt_frames_per_sec"
                 else "steps/s"),
        "vs_baseline": round(steps_per_sec / _baseline_for_devices(), 3),
    }
    flops_args = (state_box[0], loop_batch if mode == "loop" else batch)
    flops_key = (f"{mode}@{ht}x{wt}+{hs}x{ws}"
                 + (f"@{','.join(loop_strategies)}" if mode == "loop"
                    else ""))
    record.update(_mfu_fields(
        _flops_per_call(jit_step, flops_args, memo_key=flops_key),
        elapsed / num_steps))
    return record


def _bench_scaling(num_steps):
    """Measured per-chip scaling dossier for the H-sharded adapt step
    (VERDICT r4 #1: earn, don't assume, the v5e-8 projection).

    Runs the REAL-chip production adapt step at full, half, and quarter
    height — every image tensor scaled together, which is exactly the
    per-chip workload of the H-sharded layout at n = 1, 2, 4 chips minus
    collectives — and fits t(s) = a*s + b (a = H-proportional compute,
    b = the H-independent floor: fixed-K panoptic/pose/top-k work and
    per-op dispatch). The v5e-8 per-chip shard is s = 1/8; the projection
    adds the sharded executable's collective payload (BENCH_COMM_MS,
    measured by BENCH_MODE=spatial from the 8-device-mesh HLO).

    Writes SCALING.json next to bench.py so BENCH_MODE=all can fold the
    projection into every round artifact; the human-readable error
    budget lives in SCALING.md."""
    points = {}
    for scale in (1.0, 0.5, 0.25):
        os.environ["BENCH_HSCALE"] = str(scale)
        try:
            rec = _run_mode("step")
        finally:
            os.environ.pop("BENCH_HSCALE", None)
        entry = {"steps_per_sec": rec["value"],
                 "ms": round(1000.0 / rec["value"], 2)}
        for key in ("flops_per_step", "achieved_tflops",
                    "mfu_pct_v5e_bf16"):
            if key in rec:
                entry[key] = rec[key]
        points[str(scale)] = entry
        print(json.dumps({"scaling_point": scale, **entry}), flush=True)
    xs = np.asarray([float(s) for s in points], dtype=np.float64)
    ys = np.asarray([points[s]["ms"] for s in points], dtype=np.float64)
    a, b = np.polyfit(xs, ys, 1)
    fit_residual_ms = float(np.abs(ys - (a * xs + b)).max())
    comm_ms = float(os.environ.get("BENCH_COMM_MS", "1.4"))
    shard_ms = a / 8.0 + b
    projected_ms = shard_ms + comm_ms
    projected = 1000.0 / projected_ms
    record = {
        "metric": "projected_v5e8_adapt_steps_per_sec",
        "value": round(projected, 3),
        "unit": "steps/s (v5e-8 projection, measured scaling curve)",
        "vs_baseline": round(projected / BASELINE_STEPS_PER_SEC, 3),
        "measured_points_ms": points,
        "fit": {"a_ms": round(float(a), 2), "b_ms": round(float(b), 2),
                "max_residual_ms": round(fit_residual_ms, 2)},
        "per_chip_shard_ms": round(float(shard_ms), 2),
        "comm_ms": comm_ms,
        "comm_source": "scripts/scaling_dossier.py direct collective "
                       "inventory of the production-shape 8-device "
                       "sharded HLO (SCALING_COMM.json)",
        "compile_seconds": dict(LAST_COMPILE_SECONDS),
        "note": "t(s)=a*s+b fit over real-chip measurements at height "
                "scales 1, 1/2, 1/4; per-chip v5e-8 shard = t(1/8) + "
                "collective payload. Error budget in SCALING.md.",
    }
    (Path(__file__).resolve().parent / "SCALING.json").write_text(
        json.dumps(record, indent=1))
    return record


def _require_devices():
    """Fail fast (bounded) when the backend is unreachable.

    The axon relay hangs jax backend init indefinitely when the tunnel
    is down; a wedged bench run leaves the caller with no artifact at
    all. Probe device availability in a SUBPROCESS (SIGALRM cannot
    interrupt a hung C-level connect) under BENCH_DEVICE_TIMEOUT
    seconds (default 600 — first TPU connect is legitimately slow);
    on timeout print an explicit error record and exit non-zero.

    The probe pays a full duplicate backend init on a HEALTHY backend;
    callers that just proved relay health (e.g. scripts/tpu_runbook.sh
    after its first run) should set BENCH_DEVICE_TIMEOUT=0 to skip it.
    """
    import subprocess
    timeout = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "600"))
    if timeout <= 0:
        return
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, capture_output=True)
        if proc.returncode == 0:
            return
        detail = (proc.stderr or b"").decode(errors="replace")[-300:]
        err = f"jax backend init failed: {detail.strip()}"
    except subprocess.TimeoutExpired:
        err = (f"no jax devices within {timeout:.0f}s "
               "(TPU relay unreachable?)")
    # Label the error record with the mode that failed to run, so a
    # BENCH_MODE=train/loop/infer outage never fabricates a 0.0 data
    # point for the primary adapt-step metric.
    mode = os.environ.get("BENCH_MODE", "all")
    name, unit, base = {
        "step": ("adapt_steps_per_sec", "steps/s", 0.0),
        "all": ("adapt_steps_per_sec", "steps/s", 0.0),
        "loop": ("adapt_frames_per_sec", "frames/s", 0.0),
        "train": ("pretrain_images_per_sec", "img/s", None),
        "infer": ("infer_images_per_sec", "img/s", None),
    }.get(mode, ("adapt_steps_per_sec", "steps/s", 0.0))
    print(json.dumps({"metric": name, "value": 0.0, "unit": unit,
                      "vs_baseline": base, "error": err}))
    raise SystemExit(1)


def main():
    """Print ONE json line.

    BENCH_MODE=step|loop|train|infer runs a single mode; the default
    (all) runs the adapt step (primary metric) and folds loop + train +
    infer numbers into an "extra" field so every round's artifact
    carries all four (rounds stay comparable). A failing extra mode records its error
    without jeopardizing the primary metric.
    """
    mode = os.environ.get("BENCH_MODE", "all")
    if mode not in ("step", "loop", "train", "infer", "spatial",
                    "scaling", "all"):
        raise SystemExit(
            "BENCH_MODE must be step|loop|train|infer|spatial|scaling|"
            f"all, got {mode!r}")
    cache_entries_start = _cache_entries()
    # Persistent compilation cache (same dir as tests/conftest.py): the
    # full adapt step takes ~20 min to compile through the relay; cache
    # hits make repeat benches of unchanged programs start in seconds.
    # Keyed by HLO + platform, so entries cannot go stale; if a backend
    # cannot serialize executables jax just logs and compiles normally.
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if mode == "spatial":
        # Virtual-mesh mode: compiles the H-sharded production adapt
        # step on 8 CPU devices (no TPU relay involved).
        print(json.dumps(_bench_spatial(
            int(os.environ.get("BENCH_STEPS", "20")))))
        return
    _require_devices()

    def cache_fields():
        # Cold/warm labeling (VERDICT r4 hygiene): each artifact records
        # the persistent-cache population when the process started — 0
        # entries = every compile_seconds value is a COLD compile.
        end = _cache_entries()
        return {"entries_at_start": cache_entries_start,
                "entries_at_end": end,
                "state": ("cold" if cache_entries_start == 0
                          else "warm_or_partial")}

    if mode == "scaling":
        record = _bench_scaling(int(os.environ.get("BENCH_STEPS", "20")))
        record["compile_cache"] = cache_fields()
        print(json.dumps(record))
        return
    if mode != "all":
        record = _run_mode(mode)
        if LAST_COMPILE_SECONDS:
            record["compile_seconds"] = dict(LAST_COMPILE_SECONDS)
        if LAST_AOT:
            record["aot"] = dict(LAST_AOT)
        record["compile_cache"] = cache_fields()
        print(json.dumps(record))
        return

    start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET", "2700"))
    record = _run_mode("step")
    # Flush the primary metric immediately: if the caller times the
    # process out during the extra modes, the last complete JSON line is
    # still a valid artifact (the final combined line replaces it when
    # the extras finish).
    print(json.dumps(record), flush=True)
    import jax
    record["devices"] = len(jax.devices())
    record["baseline_note"] = (
        "north-star 25 steps/s on v5e-8; vs_baseline is measured against "
        "25*n_devices/8 (adaptation is data-parallel: the online target "
        "stays replicated, source/replay/mixup sub-batches shard over the "
        "mesh — dryrun_multichip + "
        "test_adapt_step.py::test_sharded_adapt_step_over_mesh)")
    extra = {}
    # infer before train: its compile is the cheapest and its number is
    # a headline (panoptic serving path); train is the one to drop when
    # the relay's compile variance eats BENCH_BUDGET.
    for extra_mode in ("loop", "infer", "train"):
        if time.perf_counter() - start > budget:
            extra[extra_mode] = {"skipped": "BENCH_BUDGET exceeded"}
            continue
        try:
            sub = _run_mode(extra_mode)
            extra[sub["metric"]] = {"value": sub["value"],
                                    "unit": sub["unit"],
                                    "vs_baseline": sub["vs_baseline"]}
            if sub.get("baseline_note"):
                extra[sub["metric"]]["baseline_note"] = sub["baseline_note"]
        except Exception as exc:  # noqa: BLE001 - keep the primary metric
            extra[extra_mode] = {"error": f"{type(exc).__name__}: {exc}"}
    # v5e-8 projection (VERDICT r4 #1): fold the measured scaling dossier
    # (BENCH_MODE=scaling -> SCALING.json) into every round artifact,
    # drift-adjusted by this run's full-scale step time so the projection
    # tracks the current code rather than the dossier's snapshot.
    scaling_path = Path(__file__).resolve().parent / "SCALING.json"
    if scaling_path.exists() and record.get("value"):
        try:
            dossier = json.loads(scaling_path.read_text())
            t_then = dossier["measured_points_ms"]["1.0"]["ms"]
            t_now = 1000.0 / record["value"]
            proj_ms = (dossier["per_chip_shard_ms"] * (t_now / t_then)
                       + dossier["comm_ms"])
            proj = 1000.0 / proj_ms
            extra["projected_v5e8_steps_per_sec"] = {
                "value": round(proj, 3),
                "unit": "steps/s",
                "vs_baseline": round(proj / BASELINE_STEPS_PER_SEC, 3),
                "baseline_note": "measured scaling-curve projection "
                                 "(SCALING.json/SCALING.md), drift-"
                                 "adjusted by this run's step time",
            }
        except Exception as exc:  # noqa: BLE001 - keep the artifact
            extra["projected_v5e8_steps_per_sec"] = {
                "error": f"{type(exc).__name__}: {exc}"}
    record["extra"] = extra
    # Wall time of each jitted program's first call (compile + 1 step):
    # the per-round compile-time series that would have caught the r03
    # dryrun blowup before the driver gate did.
    record["compile_seconds"] = dict(LAST_COMPILE_SECONDS)
    if LAST_AOT:
        # which compile_seconds are AOT-store loads vs real compiles
        record["aot"] = dict(LAST_AOT)
    record["compile_cache"] = cache_fields()
    print(json.dumps(record))


if __name__ == "__main__":
    main()
