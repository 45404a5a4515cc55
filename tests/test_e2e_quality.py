"""End-to-end quality gates on the synthetic recovery benchmark.

The only dataset-free quality evidence available on this box (no egress,
no lego/garden scenes): recover a ground-truth Gaussian scene from its own
renders, with the full densify/prune/reset schedule active, and assert
test-view PSNR — single-device, and on the 8-device "gauss" mesh with
sharded densify + rebalance (reference protocol: train.py:173-260).

The full-size recorded runs live in benchmarks/RESULTS.md; this test is a
scaled-down version (subprocess per run — each leg needs its own device
mesh) gated behind GS_TPU_SLOW=1 to keep the default suite fast.
"""

import os
import re
import subprocess
import sys

import pytest

slow = pytest.mark.skipif(
    os.environ.get("GS_TPU_SLOW") != "1",
    reason="multi-minute e2e recovery; set GS_TPU_SLOW=1 to run",
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARGS = ["--iters", "300", "--res", "64", "--views", "16",
        "--gt_gaussians", "1024", "--init_points", "512"]


def _run(extra, args=ARGS):
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "synthetic_e2e.py")]
        + args + extra,
        capture_output=True, text=True, timeout=1800, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = re.search(r"test PSNR: mean ([0-9.]+)", out.stdout)
    assert m, out.stdout[-2000:]
    return float(m.group(1))


def test_recovery_smoke_default_suite():
    """Always-on scaled-down recovery gate (~60 s on the 1-core box).

    Runs the real training loop (current kernel-formulation defaults, full
    schedule semantics) end-to-end and asserts the optimizer actually
    recovers the scene — the default suite's guard for exactly the paths a
    formulation/default flip changes. Measured headroom: config recovers
    ~26.8 dB; threshold 20 dB.
    """
    psnr = _run(["--mesh", "1"],
                args=["--iters", "150", "--res", "48", "--views", "8",
                      "--gt_gaussians", "512", "--init_points", "256"])
    assert psnr > 20.0, f"recovery smoke PSNR regressed: {psnr:.2f} dB"


@slow
def test_recovery_single_vs_mesh_gauss():
    # --mesh 1 forces the CPU platform and takes the single-device loop;
    # --mesh 8 runs the gauss-sharded trainer (densify + rebalance active)
    p1 = _run(["--mesh", "1"])
    p8 = _run(["--mesh", "8", "--layout", "gauss"])
    assert p1 > 18.0, f"single-device recovery PSNR regressed: {p1:.2f} dB"
    assert p8 > 18.0, f"mesh recovery PSNR regressed: {p8:.2f} dB"
    # same schedule, same data; the paths sample cameras / seed split noise
    # differently, so this bounds optimization-outcome drift, not bitwise
    # parity (recorded full-size runs differ by ~1.1 dB at 36-37 dB —
    # benchmarks/RESULTS.md)
    assert abs(p1 - p8) < 1.5, f"mesh PSNR diverged: {p1:.2f} vs {p8:.2f} dB"
