"""The driver's graded multi-chip artifact must never silently regress.

Round 1 shipped a dryrun_multichip that assumed >=8 visible devices and
went red under the ambient single-chip axon platform (MULTICHIP_r01.json
rc=1). This test calls it exactly the way the driver does — no env
preparation beyond what the function itself arranges.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft_entry  # noqa: E402
import pytest  # noqa: E402

pytestmark = pytest.mark.slow  # two 12-check dryruns; full-suite tier


def test_dryrun_multichip_8():
    # Under pytest, conftest.py already forced 8 fake CPU devices, so this
    # runs inline; under a bare axon process it re-execs a configured child.
    graft_entry.dryrun_multichip(8)


def test_dryrun_multichip_reexec_path(tmp_path):
    """Exercise the subprocess re-exec branch explicitly: a child process
    with NO device-count flags must still pass because dryrun_multichip
    configures its own grandchild."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("_PCT_DRYRUN_CHILD", None)
    # Simulate the driver's bare invocation: no fake-device flags.
    env["XLA_FLAGS"] = ""
    env["JAX_PLATFORMS"] = "cpu"  # no TPU in the test env anyway
    repo = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        # 11 checks x concurrent-pytest load: the 10-check run took ~450s
        # standalone and timed out at 600s under a loaded host — keep
        # headroom proportional (do NOT run concurrent suites).
        env=env, cwd=repo, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr
    assert "FILIP token-gather DP" in proc.stdout
    assert "MLM unfrozen finetune over 8-way DP" in proc.stdout
