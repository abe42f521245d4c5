"""Adaptation-step numeric parity vs the torch reference, enforced in CI.

Thin wrapper over scripts/parity_adapt.py (the repo-root artifact run
covers 3 frames x {exact, published, N=3} variants): the strict
deviation-free variant must hold its bars on a 1-frame stream — same
converted weights, pinned cut cells, every loss term, the in-step
teacher eval, and the post-step student/EMA parameter trajectories.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parents[1]


def _load_module():
    spec = importlib.util.spec_from_file_location(
        "parity_adapt", str(REPO / "scripts" / "parity_adapt.py"))
    module = importlib.util.module_from_spec(spec)
    sys.modules["parity_adapt"] = module
    spec.loader.exec_module(module)
    return module


def test_adapt_step_parity_variant_a(tmp_path):
    parity = _load_module()
    parity.install_reference_stubs()
    import torch as _torch
    res = parity.run_variant(_torch, "A exact (pose frozen)",
                             freeze_pose=True, num_frames=1, nsteps=1,
                             with_mixup=True)
    assert res["max_loss_rel"] <= parity.LOSS_RTOL
    assert res["eval_abs_rel"] <= parity.ABS_REL_ATOL
    assert res["conf_frac"] <= parity.CONF_FRAC
    # Adam sign-flip-aware parameter bars (see compare_params docstring)
    assert res["student_pooled"]["p999"] <= 2e-5
    assert res["student_pooled"]["max"] <= 2.2 * res["lr"]
    assert res["ema_pooled"]["p999"] <= 2e-5
