"""AOT Mosaic compile check: prove every kernel variant compiles for TPU.

Interpret-mode tests lower Pallas kernels as XLA while-loops, so they can
never see a Mosaic *kernel compiler* rejection — round 3 shipped a default
(``lax.Precision.HIGH`` in an in-kernel dot) that every interpret test
passed and real TPU lowering rejects. This script is the committed form of
the manual recipe that caught it:

  - ``jax.experimental.topologies.get_topology_desc('v5e:2x2x1')`` works
    against the LOCAL libtpu with no device attached (``v5e:1x1x1`` is
    rejected: chips_per_host_bounds indivisible — use 2x2x1).
  - ``GS_TPU_PALLAS_INTERPRET=0`` forces ``pallas_call`` to emit the real
    ``tpu_custom_call`` even though the host backend is CPU, so
    ``.lower().compile()`` exercises the actual Mosaic compiler.

Mosaic lowering errors depend on BLOCK shapes (chunk, tile_w*tile_h), the
in-kernel ops, and dtypes — not on N, the image size, or the pair budget —
so the variants matrix runs at a small scene (fast compiles) with the real
chunk/tile dimensions. ``--bench-shape`` adds one defaults compile at the
full bench configuration (1080p / 262k / tight budget; ~5-6 min on the
1-core dev box). ``--sharded`` additionally compiles the gauss-sharded
train step with the Pallas backend over the 4-chip topology mesh — the
composition real multi-chip hardware will run first.

Run: ``python benchmarks/aot_check.py [--bench-shape] [--sharded] [--only NAME]``
Exit code 0 = every requested variant compiled.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# must precede any gs_tpu import that reads the env, and the platform
# config must precede any jax API call that initializes a backend
os.environ["GS_TPU_PALLAS_INTERPRET"] = "0"

import jax

jax.config.update("jax_platforms", "cpu")
import dataclasses

import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gs_tpu import cameras
from gs_tpu.config import RasterizeConfig
from gs_tpu.models import gaussians
from gs_tpu.ops import rasterize_pallas as rp
from gs_tpu.renderer import render
from gs_tpu.utils import losses

# the variants matrix: name -> (formulation overrides, cfg overrides).
# Covers the shipped defaults (VPU scans + HIGH dots since the round-4
# hardware sweep), the all-MXU contraction formulation and each knob
# singly on top of the defaults (the attribution set bench.py/sweep use),
# the chunk sizes the sweep uses, and the tile-grid kernel mode.
# Formulation spec: {} = shipped env defaults, "legacy"/"mxu" =
# set_formulation(False/True), dict = overrides on the shipped defaults.
VARIANTS = {
    "defaults": ({}, {}),
    "mxu_all": ("mxu", {}),
    "vpu_legacy": ("legacy", {}),
    "dot_highest": ({"_DOT_PREC": "highest"}, {}),
    "scan_on": ({"SCAN_MXU": True}, {}),
    "scan_on_high": ({"SCAN_MXU": True, "_SCAN_PREC": "high"}, {}),
    "power_on": ({"POWER_MXU": True}, {}),
    "moment_on": ({"MOMENT_MXU": True, "_MOMENT_PREC": "high"}, {}),
    "chunk32": ({}, {"chunk": 32}),
    "chunk128": ({}, {"chunk": 128}),
    "tile_grid": ({"KERNEL_MODE": "tile"}, {}),
    # big-tile candidates from the round-4 sweep (measured slower at both
    # formulations, kept compiling): stress VMEM ([chunk, tile_w*tile_h]
    # blocks) — prove they fit/lower.
    "tile96x64_c32": ({}, {"chunk": 32, "tile_w": 96, "tile_h": 64}),
    "tile128x64_c32": ({}, {"chunk": 32, "tile_w": 128, "tile_h": 64}),
    # round-5 pair-movement kernels (RT_ keys set rasterize_tiled globals):
    # the sorted segment-reduce backward, the gather-free carry pipeline
    # (interval-expand kernel + sort payloads), and carry at the small-tile
    # candidates it unlocks.
    "suf_on": ({"SUF_MXU": True}, {}),
    "grad_pallas": ({"RT_GRAD_REDUCE": "pallas"}, {}),
    "carry": ({"RT_PAIR_SOURCE": "carry"}, {}),
    "carry_grad_pallas": (
        {"RT_PAIR_SOURCE": "carry", "RT_GRAD_REDUCE": "pallas"}, {}),
    "carry_t32x32": ({"RT_PAIR_SOURCE": "carry"},
                     {"tile_w": 32, "tile_h": 32}),
    "carry_t16x16": ({"RT_PAIR_SOURCE": "carry"},
                     {"tile_w": 16, "tile_h": 16}),
    "carry_t16x16_tile": ({"RT_PAIR_SOURCE": "carry", "KERNEL_MODE": "tile"},
                          {"tile_w": 16, "tile_h": 16}),
}


def small_scene(n=4096, w=384, h=192):
    rng = np.random.default_rng(0)
    state = gaussians.create_from_pcd(
        rng.uniform(-2, 2, size=(n, 3)).astype(np.float32),
        rng.uniform(0, 1, size=(n, 3)).astype(np.float32),
        max_sh_degree=3, capacity=n)
    cam = cameras.make_camera(
        np.eye(3), np.array([0.0, 0.0, 5.0]),
        fovx=math.radians(70), fovy=math.radians(46), width=w, height=h)
    return state, cam


def bench_scene():
    state, cam = small_scene(n=262_144, w=1920, h=1080)
    state = state.replace(
        log_scale=jnp.clip(state.log_scale, -6.0, -3.5),
        logit_opacity=jnp.full_like(state.logit_opacity, 0.0))
    return state, cam


def fwd_bwd_fn(cam, cfg):
    def fwd_bwd(state, target):
        def loss_fn(params):
            out = render(cam, state.with_params(params), active_sh_degree=3,
                         bg_color=jnp.zeros(3), cfg=cfg)
            return losses.l1_loss(out.image, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params())
        return loss, grads

    return fwd_bwd


# import-time snapshot of the shipped (env-derived) formulation
_SHIPPED = rp.get_formulation()


def apply_variant(spec):
    """Set the rasterize_pallas / rasterize_tiled globals for one variant."""
    from gs_tpu.ops import rasterize_tiled as rt

    rt.PAIR_SOURCE = "gather"
    rt.GRAD_REDUCE = "scatter"
    if spec == "legacy":
        rp.set_formulation(False)
        return
    if spec == "mxu":
        rp.set_formulation(True)
        return
    rp.apply_formulation(_SHIPPED)
    for key, val in spec.items():
        if key.startswith("RT_"):
            setattr(rt, key[3:], val)
        else:
            setattr(rp, key, val)


def compile_fwd_bwd(mesh, state, cam, cfg, label):
    rep = NamedSharding(mesh, P())
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x),
                                       sharding=rep),
        (state, jnp.zeros((3, cam.height, cam.width), jnp.float32)))
    fn = fwd_bwd_fn(cam, cfg)
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*specs).compile()
    dt = time.perf_counter() - t0
    # proof the Mosaic path (not interpret) was actually taken
    text = compiled.as_text()
    assert "tpu_custom_call" in text, (
        f"{label}: compiled graph contains no tpu_custom_call — the kernels "
        "lowered as interpret-mode XLA and this check proved nothing")
    print(f"  [ok] {label}: compiled in {dt:.1f}s "
          f"({text.count('tpu_custom_call')} custom-call sites)")


def compile_sharded(devs, label):
    """AOT-compile the gauss-sharded train step with backend='pallas'.

    This is the composition real multi-chip hardware runs first:
    pallas_call inside the shard_map'd step (resolve_backend('auto') picks
    pallas on TPU). Neither the virtual-CPU-mesh tests nor dryrun_multichip
    can exercise it natively — they run backend='xla' — so it gets its own
    Mosaic compile here.
    """
    from gs_tpu.config import OptimizationParams
    from gs_tpu.models import densify, optim
    from gs_tpu.parallel import gauss_sharded
    from gs_tpu.parallel.mesh import DATA_AXIS, SHARD_AXIS

    mesh = Mesh(devs.reshape(1, -1), (DATA_AXIS, SHARD_AXIS))
    n_data, n_shard = mesh.shape[DATA_AXIS], mesh.shape[SHARD_AXIS]
    state, _ = small_scene(n=1024)
    h, w = 96, 192
    cams = [cameras.make_camera(
        np.eye(3), np.array([0.01 * i, 0.0, 5.0]),
        fovx=math.radians(70), fovy=math.radians(46), width=w, height=h,
        image=np.zeros((3, h, w), np.float32)) for i in range(n_data)]
    cam_batch = cameras.stack_cameras(cams)
    cfg = RasterizeConfig(backend="pallas", chunk=64, tile_w=48, tile_h=32,
                          pair_budget_factor=16.0)
    step = gauss_sharded.make_gauss_sharded_train_step(
        mesh, OptimizationParams(), cfg, height=h, width=w,
        capacity=state.capacity, active_sh_degree=3)

    adam = optim.init(state.params())
    stats = densify.DensifyStats.zeros(state.capacity)

    def sds(x, s):
        return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x),
                                    sharding=NamedSharding(mesh, s))

    def specs(val_tree, spec_tree):
        return jax.tree.map(sds, val_tree, spec_tree)

    cap = state.capacity
    rep = P()
    args = (
        specs(state, gauss_sharded.shard_specs(state, cap)),
        specs(adam, gauss_sharded.shard_specs(adam, cap)),
        specs(stats, gauss_sharded.shard_specs(stats, cap)),
        jax.tree.map(lambda x: sds(x, P(DATA_AXIS)), cam_batch),
        sds(jnp.zeros(3), rep),
        sds(jnp.int32(0), rep),
        sds(jnp.float32(1.0), rep),
        sds(jnp.bool_(True), rep),
    )
    t0 = time.perf_counter()
    compiled = step.lower(*args).compile()
    text = compiled.as_text()
    assert "tpu_custom_call" in text, (
        f"{label}: no tpu_custom_call in the sharded graph — pallas did not "
        "lower through Mosaic")
    print(f"  [ok] {label}: compiled in {time.perf_counter() - t0:.1f}s "
          f"({text.count('tpu_custom_call')} custom-call sites, "
          f"mesh {n_data}x{n_shard})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-shape", action="store_true",
                    help="also compile defaults at the full 1080p/262k shape")
    ap.add_argument("--sharded", action="store_true",
                    help="also compile the gauss-sharded step (pallas) "
                         "over the 4-chip topology mesh")
    ap.add_argument("--only", default=None,
                    help="run selected variants (comma-separated names)")
    args = ap.parse_args()

    topo = topologies.get_topology_desc("v5e:2x2x1", platform="tpu")
    devs = np.array(topo.devices)
    mesh = Mesh(devs.reshape(-1)[:1], ("d",))  # 1-device: replicated compile

    state, cam = small_scene()
    base = RasterizeConfig(backend="pallas", chunk=64, tile_w=48, tile_h=32,
                           pair_budget_factor=16.0)

    names = args.only.split(",") if args.only else list(VARIANTS)
    failures = []
    for name in names:
        fspec, cfg_over = VARIANTS[name]
        apply_variant(fspec)
        cfg = dataclasses.replace(base, **cfg_over)
        try:
            compile_fwd_bwd(mesh, state, cam, cfg, name)
        except Exception as e:  # noqa: BLE001 — report every variant
            failures.append(name)
            print(f"  [FAIL] {name}: {type(e).__name__}: {e}")
        finally:
            rp.apply_formulation(_SHIPPED)
            rp.KERNEL_MODE = os.environ.get("GS_TPU_PALLAS_KERNEL", "chunk")

    if args.bench_shape and not args.only:
        bstate, bcam = bench_scene()
        bcfg = dataclasses.replace(base, pair_budget_factor=3.5)
        try:
            compile_fwd_bwd(mesh, bstate, bcam, bcfg, "defaults@bench-shape")
        except Exception as e:  # noqa: BLE001
            failures.append("defaults@bench-shape")
            print(f"  [FAIL] defaults@bench-shape: {type(e).__name__}: {e}")

    if args.sharded:
        try:
            compile_sharded(devs, "gauss-sharded-pallas")
        except Exception as e:  # noqa: BLE001
            failures.append("gauss-sharded-pallas")
            print(f"  [FAIL] gauss-sharded-pallas: {type(e).__name__}: {e}")

    if failures:
        print(f"FAILED variants: {failures}")
        sys.exit(1)
    print("all requested variants compile under Mosaic")


if __name__ == "__main__":
    main()
