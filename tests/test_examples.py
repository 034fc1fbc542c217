"""Example smoke tests (VERDICT round-3 item 7).

The README advertises ``examples/*.py`` as the documented entry points;
none were executed by the suite, so they could rot silently.  Mirror the
reference's run-the-binaries CI
(``/root/reference/.github/workflows/ci.yaml`` runs its bench and
test_ply executables): run every example as a real subprocess — the
exact ``python examples/foo.py`` a user types — at smoke sizes
(``ICP_EXAMPLES_QUICK=1``), on the CPU backend (``ICP_EXAMPLES_CPU=1``;
a plain ``JAX_PLATFORMS=cpu`` env is clobbered by hosted sitecustomize
pinning), with image artifacts redirected to a temp dir
(``ICP_EXAMPLES_OUT``) so a test run never dirties the tree.

Each case asserts exit 0 plus the example's key output line — enough to
catch API drift and broken pipelines without duplicating the numeric
contracts the library tests already pin.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

# (script, substring that must appear in stdout)
CASES = [
    ("register_pair.py", "translation:"),
    ("fleet_registration.py", "pairs on"),
    ("serving_demo.py", "max pose error"),
    ("slam_pipeline.py", "optimized end-pose drift"),
    ("place_recognition.py", "descriptor search"),
    ("odometry_sequence.py", "optimized ATE"),
    ("odometry_sequence_3d.py", "after closure"),
    ("online_slam.py", "stream done"),
    ("multi_session_merge.py", "merged sessions:"),
]


@pytest.mark.parametrize("script,needle", CASES, ids=[c[0] for c in CASES])
def test_example_runs(script, needle, tmp_path):
    env = dict(os.environ)
    env.update(
        ICP_EXAMPLES_CPU="1",
        ICP_EXAMPLES_QUICK="1",
        ICP_EXAMPLES_OUT=str(tmp_path),
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script)],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=str(tmp_path),  # relative writes (if any) land in the sandbox
    )
    assert out.returncode == 0, (script, out.stdout[-2000:], out.stderr[-2000:])
    assert needle in out.stdout, (script, needle, out.stdout[-2000:])
