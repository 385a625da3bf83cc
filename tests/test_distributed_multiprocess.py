"""Multi-host (multi-process) execution path: two-process jax.distributed
dryrun on localhost (SURVEY §5.8).  The batched render runs as one SPMD
program over a global mesh spanning both processes (gloo CPU collectives
standing in for DCN)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_render_batch():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_distributed.py")],
        capture_output=True, text=True, timeout=540, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["ok"] is True
    assert result["processes"] == 2
    assert result["global_devices"] == 4
    assert result["out_shape"][0] == result["batch"]
