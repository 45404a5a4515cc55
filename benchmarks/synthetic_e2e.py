"""End-to-end quality benchmark: recover a synthetic scene from scratch.

No datasets ship with this environment, so quality is validated by scene
RECOVERY: render a ground-truth Gaussian scene from orbiting cameras, then
train a fresh model (random init + full densify/prune schedule) against
those renders and report test-view PSNR. This exercises the full reference
pipeline semantics (SURVEY.md §3.1) — render, loss, backward, Adam,
densification, opacity reset — under realistic optimization dynamics.

Usage: python benchmarks/synthetic_e2e.py [--iters 2000] [--res 256]

``--mesh D`` runs the SAME recovery through the multi-device trainer on a
virtual D-device CPU mesh (``--layout gauss`` shards params+Adam+stats with
densify/rebalance active; ``--layout tile`` shards image tiles) — the
multi-device quality gate: its PSNR must match the single-device run within
a few tenths of a dB (recorded runs in benchmarks/RESULTS.md).
"""

from __future__ import annotations

import argparse
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


def orbit_camera(theta: float, phi: float, radius: float, res: int):
    """Camera on a sphere looking at the origin (COLMAP convention)."""
    from gs_tpu import cameras

    eye = radius * np.array([
        math.cos(phi) * math.sin(theta),
        math.sin(phi),
        math.cos(phi) * math.cos(theta),
    ])
    fwd = -eye / np.linalg.norm(eye)  # camera +z looks at origin
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # rows of world->cam rotation = (right, down, fwd); R is cam->world
    rot_w2c = np.stack([right, down, fwd])
    tvec = -rot_w2c @ eye
    fov = math.radians(50)
    return cameras.make_camera(rot_w2c.T, tvec, fov, fov, res, res)


def make_gt_scene(n: int, seed: int = 0):
    """A colorful cloud of anisotropic Gaussians inside the unit ball."""
    from gs_tpu.models import gaussians

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts *= 0.8 / np.abs(pts).max()
    cols = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    state = gaussians.create_from_pcd(pts, cols, max_sh_degree=0, capacity=n)
    state = state.replace(
        log_scale=jnp.asarray(
            rng.uniform(-3.8, -2.6, size=(n, 3)).astype(np.float32)
        ),
        logit_opacity=jnp.asarray(
            rng.uniform(0.5, 3.0, size=(n, 1)).astype(np.float32)
        ),
        quat=jnp.asarray(
            rng.normal(size=(n, 4)).astype(np.float32)
        ),
    )
    return state


def recover(iters=2000, res=256, gt_gaussians=4096, init_points=2048,
            views=64, backend="auto", parallel=None, verbose=True):
    """Train a fresh model against GT renders; return (mean PSNR, final state).

    ``parallel``: optional ParallelConfig — routes through the multi-device
    trainer (the caller is responsible for the device mesh existing).
    """
    from gs_tpu.config import OptimizationParams, PipelineParams, RasterizeConfig
    from gs_tpu.models import gaussians
    from gs_tpu.training import eval_render, run_training
    from gs_tpu.utils import metrics as metrics_mod

    raster_cfg = RasterizeConfig(backend=backend)
    gt_state = make_gt_scene(gt_gaussians)
    bg = jnp.zeros(3)

    # ground-truth renders from orbiting cameras; every 8th is a test view
    # (the reference's llffhold split, dataset_readers.py:191)
    rng = np.random.default_rng(1)
    cams = []
    for i in range(views):
        theta = 2 * math.pi * i / views + rng.uniform(0, 0.05)
        phi = rng.uniform(-0.9, 0.9)
        cams.append(orbit_camera(theta, phi, 3.5, res))
    if verbose:
        print(f"rendering {views} GT views at {res}^2 ...", flush=True)
    gt_cams = []
    for c in cams:
        img = eval_render(gt_state, c, bg, active_sh_degree=0,
                          raster_cfg=raster_cfg)
        gt_cams.append(c.replace(image=img))
    train_cams = [c for i, c in enumerate(gt_cams) if i % 8 != 0]
    test_cams = [c for i, c in enumerate(gt_cams) if i % 8 == 0]

    # fresh model from a noisy subsample of GT positions (SfM-like init)
    idx = rng.choice(gt_gaussians, init_points, replace=False)
    pts = np.asarray(gt_state.xyz)[idx] + rng.normal(
        scale=0.03, size=(init_points, 3)
    ).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(init_points, 3)).astype(np.float32)
    model = gaussians.create_from_pcd(pts, cols, max_sh_degree=0)

    class SyntheticScene:
        cameras_extent = 1.6
        model_path = "/tmp/gs_synth_e2e"
        gaussians = model

        def get_train_cameras(self):
            return train_cams

        def get_test_cameras(self):
            return test_cams

        def save(self, iteration, state=None):
            pass

    opt = OptimizationParams(
        iterations=iters,
        densify_from_iter=200,
        densification_interval=100,
        densify_until_iter=int(iters * 0.7),
        opacity_reset_interval=1200,
        position_lr_max_steps=iters,
    )

    t0 = time.time()

    def progress(it, m):
        if verbose and it % 200 == 0:
            print(f"[{it:5d}] loss {m['ema_loss']:.4f} "
                  f"({m.get('pix_per_s', 0)/1e6:.2f} Mpx/s)", flush=True)

    ts = run_training(
        SyntheticScene(), opt, PipelineParams(), raster_cfg=raster_cfg,
        test_iterations=(), save_iterations=(), progress=progress,
        parallel=parallel,
    )
    train_s = time.time() - t0

    psnrs = []
    for c in test_cams:
        img = eval_render(ts.state, c, bg, active_sh_degree=0,
                          raster_cfg=raster_cfg)
        psnrs.append(float(metrics_mod.psnr(img, c.image)[0, 0]))
    if verbose:
        print(
            f"\nsynthetic e2e: {iters} iters in {train_s:.0f}s "
            f"({iters / train_s:.1f} it/s), "
            f"alive {int(ts.state.num_alive)} gaussians\n"
            f"test PSNR: mean {np.mean(psnrs):.2f} dB  "
            f"min {np.min(psnrs):.2f}  max {np.max(psnrs):.2f}"
        )
    return float(np.mean(psnrs)), ts.state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--gt_gaussians", type=int, default=4096)
    ap.add_argument("--init_points", type=int, default=2048)
    ap.add_argument("--views", type=int, default=64)
    ap.add_argument("--backend", type=str, default="auto")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard devices on a virtual CPU mesh (0 = off)")
    ap.add_argument("--layout", type=str, default="gauss",
                    choices=("tile", "gauss"))
    ap.add_argument("--data_parallel", type=int, default=1)
    args = ap.parse_args()

    if args.mesh:
        # must precede any backend-initializing jax call (the axon
        # sitecustomize registration wins over env vars on this box)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.mesh * args.data_parallel)

    from gs_tpu.config import ParallelConfig

    parallel = None
    if args.mesh:
        parallel = ParallelConfig(
            data_parallel=args.data_parallel, shard_parallel=args.mesh,
            layout=args.layout,
        )
    psnr, _ = recover(
        iters=args.iters, res=args.res, gt_gaussians=args.gt_gaussians,
        init_points=args.init_points, views=args.views, backend=args.backend,
        parallel=parallel,
    )
    return psnr


if __name__ == "__main__":
    main()
