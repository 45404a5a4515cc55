"""Multi-device scaling sweep (BASELINE config 5 harness).

Measures the sharded train step's wall time as the ``shard`` axis widens,
reporting parallel efficiency vs 1 device. On real pod hardware this is the
1 chip -> 1 host -> N hosts sweep.

On THIS box the mesh is 8 virtual devices on ONE physical CPU core, so
devices execute serially and wall time cannot drop with shard count; what
the virtual numbers CAN bound is the de-replication of per-device work:
with the column-strip forward (round 2) the pair-proportional stages run
on 1/D of the pairs per device, so serialized wall time grows sub-linearly
in D for pair-dominated shapes, where the old fully-replicated forward grew
~linearly. XLA:CPU collective overhead (all_gather per step) still swamps
small shapes — treat these numbers as a harness check, and run
GS_TPU_SCALING_REAL=1 on an actual slice for the config-5 sweep.

Usage: python benchmarks/scaling.py [--layout tiles|gauss] [--res 128]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", choices=["tiles", "gauss"], default="tiles")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--gaussians", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--backend", default=None,
                    help="raster backend (default: xla on cpu, pallas on tpu)")
    args = ap.parse_args()

    # decide BEFORE any jax API call initializes a backend: this box exposes
    # one tunneled TPU chip, so default to the virtual 8-device CPU mesh;
    # set GS_TPU_SCALING_REAL=1 on actual multi-chip hardware.
    if os.environ.get("GS_TPU_SCALING_REAL") != "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)

    import jax.numpy as jnp
    import numpy as np

    from gs_tpu import cameras
    from gs_tpu.config import OptimizationParams, RasterizeConfig
    from gs_tpu.models import densify, gaussians, optim
    from gs_tpu.parallel import mesh as mesh_mod
    from gs_tpu.parallel.gauss_sharded import make_gauss_sharded_train_step
    from gs_tpu.parallel.sharded import make_sharded_train_step

    n_dev = len(jax.devices())
    backend = args.backend or ("pallas" if jax.default_backend() == "tpu" else "xla")
    rcfg = RasterizeConfig(backend=backend)
    opt_cfg = OptimizationParams()
    h = w = args.res

    rng = np.random.default_rng(0)
    st = gaussians.create_from_pcd(
        rng.uniform(-1, 1, (args.gaussians, 3)).astype(np.float32),
        rng.uniform(0, 1, (args.gaussians, 3)).astype(np.float32),
        max_sh_degree=1,
    )
    cam = cameras.make_camera(
        np.eye(3), np.array([0.0, 0.0, 4.0]), math.radians(60), math.radians(60),
        w, h, image=rng.uniform(0, 1, (3, h, w)).astype(np.float32),
    )
    cam_batch = cameras.stack_cameras([cam])
    adam = optim.init(st.params())
    stats = densify.DensifyStats.zeros(st.capacity)

    make = (make_gauss_sharded_train_step if args.layout == "gauss"
            else make_sharded_train_step)

    results = []
    n_shard = 1
    while n_shard <= n_dev:
        mesh = mesh_mod.make_mesh(
            data=1, shard=n_shard, devices=jax.devices()[:n_shard]
        )
        step = make(mesh, opt_cfg, rcfg, h, w, st.capacity, 1)
        # per-DEVICE compiled cost (SPMD executable): the falsifiable
        # de-replication metric on this serial box — flops/device must DROP
        # as the shard axis widens if per-device work is actually sharded
        # (wall time here cannot show it: 8 virtual devices, 1 core)
        try:
            ca = (
                jax.jit(step)
                .lower(st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0),
                       jnp.float32(1.0), jnp.bool_(True))
                .compile()
                .cost_analysis()
            )
            flops, bytes_ = ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)
        except Exception:  # cost model availability varies by backend
            flops = bytes_ = float("nan")
        out = step(st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0),
                   jnp.float32(1.0), jnp.bool_(True))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0),
                       jnp.float32(1.0), jnp.bool_(True))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        results.append((n_shard, dt, flops, bytes_))
        base = results[0][1]
        speedup = base / dt
        fl0 = results[0][2]
        print(f"shard={n_shard:2d}: {dt*1e3:8.2f} ms/step  "
              f"speedup x{speedup:.2f}  efficiency {speedup/n_shard*100:5.1f}%  "
              f"flops/dev {flops/1e9:7.3f} G ({flops/fl0*100:5.1f}% of 1-dev)  "
              f"bytes/dev {bytes_/1e6:7.1f} M",
              flush=True)
        n_shard *= 2

    return results


if __name__ == "__main__":
    main()
