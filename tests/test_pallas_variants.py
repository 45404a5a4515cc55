"""MXU-variant kernel flags keep oracle parity (subprocess per flag set).

The GS_TPU_{SCAN,POWER,MOMENT}_MXU / GS_TPU_DOT_PREC knobs restate pieces
of the Pallas compositing kernels as MXU contractions (see
gs_tpu/ops/rasterize_pallas.py header comments). They are read at import
time, so each combination runs in a subprocess. Gated behind GS_TPU_SLOW=1:
interpret-mode kernels on the 1-core box cost ~1 min per combination.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("GS_TPU_SLOW") != "1",
    reason="subprocess interpret-mode kernel runs; set GS_TPU_SLOW=1",
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHECK = """
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import sys
sys.path.insert(0, {root!r})
from gs_tpu.config import RasterizeConfig
from gs_tpu.ops.rasterize_oracle import rasterize_oracle
from gs_tpu.ops.rasterize_tiled import rasterize_tiled
from tests.reference_raster import random_scene

h, w, n = 48, 48, 192
args = random_scene(jax.random.PRNGKey(2), n, h, w)
bg = jnp.array([0.2, 0.4, 0.6])
img_o, t_o, _ = rasterize_oracle(*args, h, w, bg, tile_w=16, tile_h=16)
cfg = RasterizeConfig(tile_w=16, tile_h=16, chunk=32, backend="pallas")
out = rasterize_tiled(*args, h, w, bg, cfg)
np.testing.assert_allclose(out.image, img_o, rtol=1e-3, atol=2e-4)
np.testing.assert_allclose(out.final_t, t_o, rtol=1e-3, atol=2e-4)

# gradient parity vs the xla backend
target = jax.random.uniform(jax.random.PRNGKey(3), (3, h, w))
cfg_x = RasterizeConfig(tile_w=16, tile_h=16, chunk=32, backend="xla")

def make_loss(c):
    def f(means2d, colors, opac):
        out = rasterize_tiled(means2d, args[1], colors, opac, args[4],
                              args[5], h, w, bg, c)
        return jnp.mean((out.image - target) ** 2)
    return f

g_p = jax.grad(make_loss(cfg), argnums=(0, 1, 2))(args[0], args[2], args[3])
g_x = jax.grad(make_loss(cfg_x), argnums=(0, 1, 2))(args[0], args[2], args[3])
for a, b in zip(g_x, g_p):
    scale = float(jnp.max(jnp.abs(a))) + 1e-8
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                               atol=2e-3 * scale)

# fp64-golden cleanliness: every knob holds the strict golden tolerances
# (SCAN via log1p on unrounded alpha; POWER via tile-center recentring).
import os as _os
if int(_os.environ.get("CHECK_GOLDEN", "0")):
    g = np.load(_os.path.join({root!r}, "tests", "golden",
                              "raster_golden.npz"))
    gh, gw = int(g["height"]), int(g["width"])
    gargs = tuple(jnp.asarray(g[k]) for k in
                  ("means2d", "conics", "colors", "opacities", "depths",
                   "radii"))
    gout = rasterize_tiled(*gargs, gh, gw, jnp.asarray(g["bg"]),
                           RasterizeConfig(tile_w=16, tile_h=16, chunk=32,
                                           backend="pallas"))
    np.testing.assert_allclose(np.asarray(gout.image), g["image"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gout.final_t), g["t_final"],
                               rtol=2e-5, atol=2e-6)
print("VARIANT_OK")
""".format(root=ROOT)


@pytest.mark.parametrize("env", [
    # the shipped defaults since the round-4 hardware sweep (VPU scans +
    # HIGH color dots), pinned explicitly
    {"GS_TPU_SCAN_MXU": "0", "GS_TPU_POWER_MXU": "0",
     "GS_TPU_MOMENT_MXU": "0", "GS_TPU_DOT_PREC": "high",
     "CHECK_GOLDEN": "1"},
    # fully-classic formulation (dot at HIGHEST too)
    {"GS_TPU_DOT_PREC": "highest", "CHECK_GOLDEN": "1"},
    # single-knob-ON attribution combos (each MXU contraction exercised
    # against the VPU remainder)
    {"GS_TPU_SCAN_MXU": "1", "CHECK_GOLDEN": "1"},
    {"GS_TPU_POWER_MXU": "1", "CHECK_GOLDEN": "1"},
    {"GS_TPU_MOMENT_MXU": "high", "CHECK_GOLDEN": "1"},
    # all-on MXU contraction formulation (the round-3 defaults; bench A/B
    # still probes it every run)
    {"GS_TPU_SCAN_MXU": "1", "GS_TPU_POWER_MXU": "1",
     "GS_TPU_MOMENT_MXU": "high", "GS_TPU_DOT_PREC": "high",
     "CHECK_GOLDEN": "1"},
    # tile-grid kernel mode (the hardware A/B combo)
    {"GS_TPU_PALLAS_KERNEL": "tile", "CHECK_GOLDEN": "1"},
    # scan-contraction precision "high": 2-pass exact-mask bf16 tri dots
    # (only meaningful with the scan contraction on)
    {"GS_TPU_SCAN_MXU": "1", "GS_TPU_SCAN_PREC": "high",
     "CHECK_GOLDEN": "1"},
    # segmented-sum gradient reduction (sort + blocked-MXU cumsum replaces
    # the pair-grad scatter-add; rasterize_tiled.gather_pairs_segsum)
    {"GS_TPU_GRAD_REDUCE": "segsum", "CHECK_GOLDEN": "1"},
    # round-5 pair-movement kernels: pallas segment-reduce backward, the
    # gather-free carry pipeline, the standalone interval-expand path, and
    # the standalone MXU suffix sum (the backward's 12 VPU log-step passes
    # as one 2-pass exact-mask tri contraction)
    {"GS_TPU_GRAD_REDUCE": "pallas", "CHECK_GOLDEN": "1"},
    {"GS_TPU_PAIR_SOURCE": "carry", "CHECK_GOLDEN": "1"},
    {"GS_TPU_PAIR_SOURCE": "carry", "GS_TPU_GRAD_REDUCE": "pallas",
     "GS_TPU_PALLAS_KERNEL": "tile", "CHECK_GOLDEN": "1"},
    {"GS_TPU_BIN_EXPAND": "pallas", "CHECK_GOLDEN": "1"},
    {"GS_TPU_SUF_MXU": "1", "CHECK_GOLDEN": "1"},
])
def test_variant_parity(env):
    out = subprocess.run(
        [sys.executable, "-c", CHECK],
        capture_output=True, text=True, timeout=900, cwd=ROOT,
        env={**os.environ, **env},
    )
    assert out.returncode == 0 and "VARIANT_OK" in out.stdout, (
        out.stdout[-1000:] + out.stderr[-2000:])
