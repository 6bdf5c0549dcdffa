"""Regression: the driver's multi-chip dryrun must pass as the driver runs
it — a fresh process, ``XLA_FLAGS=--xla_force_host_platform_device_count=8``,
and NO ``JAX_PLATFORMS`` override, so any accidental TPU-backend touch (the
round-1 failure mode, MULTICHIP_r01.json rc=1) surfaces here instead of in
the driver artifact.  Certifies the parallel execution of the reference's
element loop (``Hybrid-FEM-LSSVR.py:151-176``) on an 8-device mesh.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_as_driver_runs_it():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed under driver conditions:\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-4000:]}"
    )
    assert "OK" in proc.stdout
