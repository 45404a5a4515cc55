"""Isolated compositing-kernel microbench: fixed-vs-compute cost per grid step.

Runs ONLY composite_tiles (fwd, and fwd+bwd through the custom VJP) on the
bench scene's real binning layout, sweeping (tile_w x tile_h, chunk). The
question this answers: is the Pallas kernel time proportional to grid steps
(fixed per-step overhead dominates -> batch chunks per step) or to
pairs x pixels (compute-bound -> cut passes / go bf16 / shrink tiles)?

Timing protocol: chained dependent calls inside one jit per iteration
(bench.py's tunnel-proof protocol), tunnel RTT subtracted.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/gs_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from gs_tpu import cameras
from gs_tpu.config import RasterizeConfig
from gs_tpu.models import gaussians
from gs_tpu.ops import binning, projection
from gs_tpu.ops.rasterize_tiled import (ATTR_W, CompositeStatic,
                                        composite_tiles, effective_ends,
                                        pack_attributes, resolve_backend)

H, W = 1080, 1920
N = 262_144


def scene():
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
        image=np.zeros((3, H, W), np.float32),
    )
    return state, cam


def timed_chain(fn, iters=10):
    s = fn(np.float32(0), jnp.float32(0.0))
    float(s)
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        s = fn(np.float32(i), s)
    float(s)
    return (time.perf_counter() - t0) / iters


def main():
    state, cam = scene()
    tiny = jax.jit(lambda i, prev: prev * 0.5 + i)
    rtt = timed_chain(lambda i, prev: tiny(i, prev), iters=20)

    backend = resolve_backend(os.environ.get("GS_TPU_BENCH_BACKEND", "auto"))
    import json as _json
    configs = _json.loads(os.environ.get(
        "GS_TPU_MB_CONFIGS",
        "[[48,32,64],[48,32,128],[48,32,256],[32,16,64],[16,16,64],[16,16,256]]"))
    for row in configs:
        # [tw, th, chunk] or [tw, th, chunk, budget_x]: budget_x pads the
        # pair buffer with DEAD chunks (same live work, bigger grid) — the
        # delta vs budget_x=1 is the pure per-dead-grid-step cost
        tw, th, chunk = row[:3]
        budget_x = row[3] if len(row) > 3 else 1
        tiles_x, tiles_y = -(-W // tw), -(-H // th)
        cfg = RasterizeConfig(backend=backend, chunk=chunk, tile_w=tw,
                              tile_h=th)
        st = CompositeStatic(tiles_x=tiles_x, tiles_y=tiles_y, tile_w=tw,
                             tile_h=th, chunk=chunk, tile_batch=cfg.tile_batch,
                             backend=backend)

        @jax.jit
        def layout(state):
            cov3d = projection.compute_cov3d(state.log_scale, state.quat, 1.0)
            splats = projection.project_gaussians(state.xyz, cov3d, cam)
            radii = jnp.where(state.alive, splats.radii, 0)
            opac = jnp.where(state.alive[:, None], state.opacity, 0.0)[:, 0]
            colors = projection.sh_colors(
                state.xyz, state.features_dc, state.features_rest,
                cam.cam_pos, 3)
            means2d, depths = splats.means2d, splats.depths
            attr = pack_attributes(means2d, splats.conics, colors, opac)
            npairs = binning.bin_gaussians_aligned(
                means2d, depths, projection.bin_radii(radii, opac),
                tiles_x, tiles_y, tw, th, chunk, chunk).num_pairs
            return attr, means2d, depths, radii.astype(jnp.int32), opac, npairs

        attr, means2d, depths, radii, opac, npairs = layout(state)
        budget = -(-int(npairs) * 21 * budget_x // (20 * chunk)) * chunk

        @jax.jit
        def binned(attr, means2d, depths, radii, opac):
            ab = binning.bin_gaussians_aligned(
                means2d, depths, projection.bin_radii(radii, opac),
                tiles_x, tiles_y, tw, th, budget, chunk)
            attr_pad = jnp.concatenate(
                [attr, jnp.zeros((1, ATTR_W), jnp.float32)])
            sp_attr = attr_pad[ab.pair_gauss]
            tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
            ends = effective_ends(st, sp_attr, tile_ids, ab.starts, ab.ends)
            return sp_attr, tile_ids, ab.starts, ends

        sp_attr, tile_ids, starts, ends = jax.block_until_ready(
            binned(attr, means2d, depths, radii, opac))
        live_chunks = int(jnp.sum((ends - starts)) // chunk)

        @jax.jit
        def fwd(i, prev):
            sp = sp_attr.at[0, 0].add(prev * 1e-30 + i * 1e-12)
            color, t, _ = composite_tiles(st, sp, tile_ids, starts, ends)
            return jnp.sum(color) + jnp.sum(t)

        @jax.jit
        def fwdbwd(i, prev):
            sp = sp_attr.at[0, 0].add(prev * 1e-30 + i * 1e-12)

            def f(spa):
                color, t, _ = composite_tiles(st, spa, tile_ids, starts, ends)
                return jnp.sum(color) + jnp.sum(t)

            l, g = jax.value_and_grad(f)(sp)
            return l + 1e-30 * jnp.sum(g)

        t_fwd = timed_chain(fwd) - rtt
        t_fb = timed_chain(fwdbwd) - rtt
        print(json.dumps({
            "tile": f"{tw}x{th}", "chunk": chunk, "budget_x": budget_x,
            "num_pairs": int(npairs), "budget_rows": int(sp_attr.shape[0]),
            "live_chunks": live_chunks,
            "fwd_ms": round(t_fwd * 1e3, 2),
            "fwd_us_per_live_chunk": round(t_fwd * 1e6 / max(live_chunks, 1), 3),
            "fwdbwd_ms": round(t_fb * 1e3, 2),
            "bwd_ms": round((t_fb - t_fwd) * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
