"""Compile-time regression guard for the driver's multi-chip dryrun.

Round 3 regressed the 8-device dryrun into a compile timeout
(MULTICHIP_r03.json: rc=124 — the 5-scale adapt program's XLA CPU
compile blew past the driver budget). This test runs the REAL dryrun
entry (`__graft_entry__.py --dryrun-only`) in a subprocess under a hard
wall-clock budget so any future graph-growth regression fails the suite
instead of the driver gate.

The budget is calibrated to this 1-core host: the fixed dryrun
(2 recon scales + persistent compilation cache) runs ~6 min cold and
under a minute warm; 900 s trips on anything resembling the r03 blowup
(>40 min) while tolerating cold-cache runs.
"""

import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
BUDGET_SECONDS = 900


def test_dryrun_multichip_within_budget():
    start = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, str(REPO / "__graft_entry__.py"),
             "--dryrun-only"],
            cwd=REPO, capture_output=True, text=True,
            timeout=BUDGET_SECONDS)
    except subprocess.TimeoutExpired:
        raise AssertionError(
            f"dryrun_multichip exceeded the {BUDGET_SECONDS}s compile "
            "budget (r03-style XLA compile blowup)")
    elapsed = time.monotonic() - start
    assert proc.returncode == 0, (
        f"dryrun failed (rc={proc.returncode}) after {elapsed:.0f}s:\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    assert "dryrun_multichip(8): OK" in proc.stdout, proc.stdout[-2000:]
