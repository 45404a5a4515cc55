"""Re-runnable record of the REAL 2-process jax.distributed run.

VERDICT r4 item 5: the verified multi-process run (jax.distributed + Gloo,
gauss-sharded training with densify, bit-identical ranks) existed only as a
commit message. This wraps ``benchmarks/multiproc_check.py`` as a
GS_TPU_SLOW-gated test so the claim stays re-runnable; the last green run is
recorded in benchmarks/RESULTS.md.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("GS_TPU_SLOW") != "1",
    reason="spawns 2 OS processes, ~2-4 min; set GS_TPU_SLOW=1",
)
def test_two_process_distributed_training():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks",
                                      "multiproc_check.py")],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, (
        f"multiproc_check failed (rc={r.returncode})\n"
        f"stdout tail: {r.stdout[-2000:]}\nstderr tail: {r.stderr[-2000:]}")
    assert "MULTIPROC OK" in r.stdout
