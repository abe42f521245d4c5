"""True 2-process multihost proof (ROADMAP item; VERDICT r2 missing #5).

Launches 2 CPU processes (jax.distributed, 4 virtual devices each),
feeds per-host loader shards through parallel.shard_batch_multihost,
and asserts the global one-step loss + updated-parameter digest match
the single-process 8-device run on the same global batch — the SPMD
equivalent of the reference's torchrun 2-process DDP
(/root/reference/scripts/train.sh:12-14, misc/train_utils.py:47-59).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent))
import _multihost_worker as worker  # noqa: E402


def _free_port():
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


def test_two_process_multihost_matches_single_process(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    out_path = tmp_path / "proc0.json"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_COORDINATOR_ADDRESS", None)

    script = str(Path(worker.__file__).resolve())
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), coordinator, str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in (0, 1)
    ]
    outputs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=900)
        outputs.append(out.decode(errors="replace"))
    for proc, out in zip(procs, outputs):
        assert proc.returncode == 0, f"worker failed:\n{out}"
    result = json.loads(out_path.read_text())

    # single-process 8-device run on the SAME global batch (this test
    # process runs under the conftest-forced 8-device CPU mesh)
    from codeps_tpu.parallel import make_mesh, replicate, shard_batch

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state, step, modules, cfg = worker.build_state_and_step()
    state = replicate(state, mesh)
    batch = shard_batch(worker.build_global_batch(), mesh)
    new_state, metrics = step(state, batch)

    np.testing.assert_allclose(result["loss_total"],
                               float(metrics["loss_total"]), rtol=1e-5)
    np.testing.assert_allclose(result["depth_recon"],
                               float(metrics["depth_recon"]), rtol=1e-5)
    np.testing.assert_allclose(result["param_digest"],
                               worker.digest(new_state.params), rtol=1e-6)
    # the all-process collective save wrote a checkpoint that round-trips
    np.testing.assert_allclose(result["ckpt_param_digest"],
                               worker.digest(new_state.params), rtol=1e-6)

    # mesh-sharded validation: 2-process == single-process (covers both
    # place() paths: per-host slices + the replicated tail batch)
    from codeps_tpu.tasks.validate import run_validation
    val = run_validation(cfg, modules, new_state.params,
                         new_state.batch_stats, worker.build_val_loader(),
                         thing_list=(), stuff_list=(), mesh=mesh,
                         gen_visuals=True)
    np.testing.assert_allclose(result["val_d_abs_rel"],
                               float(val["d_abs_rel"]), rtol=1e-5)
    np.testing.assert_allclose(result["val_d_a1"],
                               float(val["d_a1"]), rtol=1e-5)
    # per-sample outputs (visual panels) require the multi-process
    # allgather inside run_validation — identical panels either way
    # (rtol absorbs uint8 colormap quantization at f32 noise edges)
    panels = val["visual_panels"]
    assert result["val_panels_count"] == len(panels)
    digest = float(sum(np.asarray(p, np.float64).sum()
                       for p in panels.values()))
    np.testing.assert_allclose(result["val_panels_digest"], digest,
                               rtol=1e-3)
