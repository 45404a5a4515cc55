"""Stage-level profiling of the 1080p render+backward pipeline on TPU.

Times each stage in isolation: projection, binning, align+gather,
composite fwd, composite fwd+bwd, full render fwd+bwd.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from gs_tpu import cameras
from gs_tpu.config import RasterizeConfig
from gs_tpu.models import gaussians
from gs_tpu.ops import binning, projection
from gs_tpu.ops.rasterize_tiled import (A_OPAC, CompositeStatic,
                                        composite_tiles, pack_attributes,
                                        rasterize_tiled, resolve_backend)
from gs_tpu.renderer import render
from gs_tpu.utils import losses

H, W = 1080, 1920
N = 262_144
BACKEND = "pallas"


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(N, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    state = gaussians.create_from_pcd(pts, cols, max_sh_degree=3, capacity=N)
    state = state.replace(
        log_scale=jnp.clip(state.log_scale, -6.0, -3.5),
        logit_opacity=jnp.full_like(state.logit_opacity, 0.0),
    )
    cam = cameras.make_camera(
        np.eye(3), np.array([0.0, 0.0, 5.0]),
        fovx=math.radians(70), fovy=math.radians(46), width=W, height=H,
    )
    cfg = RasterizeConfig(backend=BACKEND, chunk=128, tile_w=16, tile_h=16)
    target = jnp.zeros((3, H, W), jnp.float32)

    tiles_x, tiles_y = -(-W // 16), -(-H // 16)
    num_tiles = tiles_x * tiles_y
    pair_budget = -(-int(cfg.pair_budget_factor * N) // cfg.chunk) * cfg.chunk

    # --- stage: projection ---------------------------------------------------
    @jax.jit
    def stage_project(state):
        cov3d = projection.compute_cov3d(state.log_scale, state.quat, 1.0)
        s = projection.project_gaussians(state.xyz, cov3d, cam)
        colors = projection.sh_colors(state.xyz, state.features_dc,
                                      state.features_rest, cam.cam_pos, 3)
        return s.means2d, s.conics, colors, s.depths, s.radii

    t = timeit(stage_project, state)
    print(f"projection+SH:        {t*1e3:8.2f} ms")
    means2d, conics, colors, depths, radii = jax.jit(stage_project)(state)
    opac = state.opacity[:, 0]

    # --- stage: aligned binning --------------------------------------------------
    @jax.jit
    def stage_bin(means2d, depths, radii):
        return binning.bin_gaussians_aligned(means2d, depths, radii, tiles_x,
                                             tiles_y, 16, 16, pair_budget,
                                             cfg.chunk)

    t = timeit(stage_bin, means2d, depths, radii)
    print(f"binning (aligned):    {t*1e3:8.2f} ms")
    ab = stage_bin(means2d, depths, radii)
    print(f"  true pairs: {int(ab.num_pairs)} / budget {pair_budget}")

    # --- stage: packed gather -----------------------------------------------------
    @jax.jit
    def stage_gather(ab, means2d, conics, colors, opac):
        attr = pack_attributes(means2d, conics, colors, opac)
        sp = attr[ab.pair_gauss]
        return sp.at[:, A_OPAC].multiply(ab.valid.astype(jnp.float32))

    t = timeit(stage_gather, ab, means2d, conics, colors, opac)
    print(f"packed gather:        {t*1e3:8.2f} ms")
    sp_attr = jax.jit(stage_gather)(ab, means2d, conics, colors, opac)
    starts, ends = ab.starts, ab.ends

    st = CompositeStatic(tiles_x=tiles_x, tiles_y=tiles_y, tile_w=16, tile_h=16,
                         chunk=cfg.chunk, tile_batch=256,
                         backend=resolve_backend(BACKEND))
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    # --- stage: composite fwd ---------------------------------------------------
    @jax.jit
    def stage_comp(sp_attr):
        return composite_tiles(st, sp_attr, tile_ids, starts, ends)[0]

    t = timeit(stage_comp, sp_attr)
    print(f"composite fwd:        {t*1e3:8.2f} ms")

    # --- stage: composite fwd+bwd -----------------------------------------------
    @jax.jit
    def stage_comp_grad(sp_attr):
        def f(a):
            color, tfin, _ = composite_tiles(st, a, tile_ids, starts, ends)
            return jnp.sum(color) + jnp.sum(tfin)
        return jax.grad(f)(sp_attr)

    t = timeit(stage_comp_grad, sp_attr)
    print(f"composite fwd+bwd:    {t*1e3:8.2f} ms")

    # --- full rasterize fwd ------------------------------------------------------
    @jax.jit
    def stage_raster(means2d, conics, colors, opac):
        return rasterize_tiled(means2d, conics, colors, opac, depths, radii,
                               H, W, jnp.zeros(3), cfg).image

    t = timeit(stage_raster, means2d, conics, colors, opac)
    print(f"rasterize fwd:        {t*1e3:8.2f} ms")

    # --- full render fwd+bwd (bench.py workload) ---------------------------------
    @jax.jit
    def full(state):
        def loss_fn(params):
            out = render(cam, state.with_params(params), active_sh_degree=3,
                         bg_color=jnp.zeros(3), cfg=cfg)
            return losses.l1_loss(out.image, target)
        return jax.value_and_grad(loss_fn)(state.params())

    t = timeit(full, state)
    print(f"full fwd+bwd:         {t*1e3:8.2f} ms   ({H*W/t/1e6:.2f} Mpx/s)")


if __name__ == "__main__":
    main()
