"""Stage-level profiling of the 1080p render+backward pipeline on TPU.

Times each stage in isolation: projection, binning (payload-carrying depth
sort + aligned tile sort), composite fwd, composite fwd+bwd, full render
fwd+bwd. NOTE (round-2 lesson): through the axon tunnel, per-stage wall
timings carry ~tens of ms of sync noise — treat them as indicative and use
an XLA trace (jax.profiler + device-event aggregation) for op-level truth.
Config mirrors bench.py defaults (48x32 tiles, chunk 64, tight budget).
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import os as _os
jax.config.update("jax_compilation_cache_dir", _os.path.expanduser("~/.cache/gs_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from gs_tpu import cameras
from gs_tpu.config import RasterizeConfig
from gs_tpu.models import gaussians
from gs_tpu.ops import binning, projection
from gs_tpu.ops.rasterize_tiled import (ATTR_W, CompositeStatic,
                                        composite_tiles, effective_ends,
                                        pack_attributes, rasterize_tiled,
                                        resolve_backend)
from gs_tpu.renderer import render
from gs_tpu.utils import losses

H, W = 1080, 1920
N = 262_144
BACKEND = os.environ.get("GS_TPU_BENCH_BACKEND", "pallas")
CHUNK = int(os.environ.get("GS_TPU_BENCH_CHUNK", "64"))
TILE_W = int(os.environ.get("GS_TPU_BENCH_TILE_W", "48"))
TILE_H = int(os.environ.get("GS_TPU_BENCH_TILE_H", "32"))


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
    target = jnp.zeros((3, H, W), jnp.float32)
    cfg = RasterizeConfig(backend=BACKEND, chunk=CHUNK, tile_w=TILE_W,
                          tile_h=TILE_H)

    tiles_x, tiles_y = -(-W // TILE_W), -(-H // TILE_H)
    num_tiles = tiles_x * tiles_y

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

    # tight budget, like bench.py
    probe = binning.bin_gaussians_aligned(
        means2d, depths, projection.bin_radii(radii, opac), tiles_x, tiles_y,
        TILE_W, TILE_H, 4 * N, CHUNK)
    true_pairs = int(probe.num_pairs)
    pair_budget = -(-int(1.05 * true_pairs) // CHUNK) * CHUNK
    import dataclasses
    cfg = dataclasses.replace(cfg, pair_budget_factor=pair_budget / N)
    print(f"  true pairs: {true_pairs} (budget {pair_budget})")

    # --- stage: binning incl. attr payload ----------------------------------
    @jax.jit
    def stage_bin(means2d, conics, colors, opac, depths, radii):
        return binning.bin_gaussians_aligned(
            means2d, depths, projection.bin_radii(radii, opac), tiles_x,
            tiles_y, TILE_W, TILE_H, pair_budget, CHUNK)

    t = timeit(stage_bin, means2d, conics, colors, opac, depths, radii)
    print(f"binning:              {t*1e3:8.2f} ms")
    ab = jax.jit(stage_bin)(means2d, conics, colors, opac, depths, radii)
    attr_full = pack_attributes(means2d, conics, colors, opac)

    st = CompositeStatic(tiles_x=tiles_x, tiles_y=tiles_y, tile_w=TILE_W,
                         tile_h=TILE_H, chunk=CHUNK, tile_batch=256,
                         backend=resolve_backend(BACKEND))
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)

    @jax.jit
    def stage_pairs(ab, attr):
        attr_pad = jnp.concatenate(
            [attr, jnp.zeros((1, ATTR_W), jnp.float32)])
        sp_attr = attr_pad[ab.pair_gauss]
        ends = effective_ends(st, sp_attr, tile_ids, ab.starts, ab.ends)
        return sp_attr, ends

    t = timeit(stage_pairs, ab, attr_full)
    print(f"gather+trunc:         {t*1e3:8.2f} ms")
    sp_attr, ends = jax.jit(stage_pairs)(ab, attr_full)
    print(f"  truncated pairs: {int(jnp.sum(ends - ab.starts))} "
          f"of {int(jnp.sum(ab.ends - ab.starts))} aligned slots")

    # --- stage: composite fwd / fwd+bwd --------------------------------------
    @jax.jit
    def stage_comp(sp_attr):
        return composite_tiles(st, sp_attr, tile_ids, ab.starts, ends)[0]

    t = timeit(stage_comp, sp_attr)
    print(f"composite fwd:        {t*1e3:8.2f} ms")

    @jax.jit
    def stage_comp_grad(sp_attr):
        def f(a):
            color, tfin, _ = composite_tiles(st, a, tile_ids, ab.starts, ends)
            return jnp.sum(color) + jnp.sum(tfin)
        return jax.grad(f)(sp_attr)

    t = timeit(stage_comp_grad, sp_attr)
    print(f"composite fwd+bwd:    {t*1e3:8.2f} ms")

    # --- full render fwd+bwd (bench.py workload) -----------------------------
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
