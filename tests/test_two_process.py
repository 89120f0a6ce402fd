"""Multi-host (DCN-edge) validation: two real OS processes joined via
jax.distributed, dp and ring axes crossing the boundary (VERDICT r4 #6).
Thin wrapper over scripts/two_process_dcn.py so the suite gates it."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dcn_edges():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "two_process_dcn.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "TWO_PROC all ok" in out.stdout, out.stdout
