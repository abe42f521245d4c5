"""End-to-end metric parity vs the torch reference, enforced in CI.

Thin wrapper over scripts/parity_e2e.py (which also writes the
PARITY_E2E.md artifact from the repo root): identical seeded weights +
frames through BOTH full eval pipelines; metric deltas must stay within
the BASELINE.md bars and the prediction maps must agree pixel-wise.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")

REPO = Path(__file__).resolve().parents[1]


def _load_parity_module():
    spec = importlib.util.spec_from_file_location(
        "parity_e2e", str(REPO / "scripts" / "parity_e2e.py"))
    module = importlib.util.module_from_spec(spec)
    sys.modules["parity_e2e"] = module
    spec.loader.exec_module(module)
    return module


def test_e2e_metric_parity(tmp_path):
    parity = _load_parity_module()
    ok, torch_metrics, jax_metrics, deltas = parity.run(
        num_frames=3, feed_size=(32, 64), seed=11,
        out_md=str(tmp_path / "PARITY_E2E.md"), tree_root=str(tmp_path))
    assert ok, (
        f"parity failure: torch={torch_metrics} jax={jax_metrics} "
        f"deltas={deltas}")
    assert deltas["abs_rel"] <= parity.ABS_REL_TOL
    assert deltas["pq"] <= parity.PQ_TOL
