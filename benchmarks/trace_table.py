"""Op-level device-time table for the bench fwd+bwd step (TPU trace).

Captures a jax.profiler trace of the full differentiable render step at the
bench shape, then aggregates device-side events from the trace protobuf
(vm.trace.json.gz) into a sorted per-op table. This is the ground truth the
stage-level wall timings (profile_stages.py) approximate — tunnel syncs add
~tens of ms of noise to host-side timing, device events do not lie.

Usage: python benchmarks/trace_table.py [--train] [--top N]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/gs_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
N = 262_144


def main():
    top = 40
    if "--top" in sys.argv:
        top = int(sys.argv[sys.argv.index("--top") + 1])

    from micro_kernel import scene
    from gs_tpu.config import RasterizeConfig
    from gs_tpu.renderer import render
    from gs_tpu.utils import losses

    state, cam = scene()
    chunk = int(os.environ.get("GS_TPU_BENCH_CHUNK", "64"))
    cfg = RasterizeConfig(
        backend=os.environ.get("GS_TPU_BENCH_BACKEND", "auto"), chunk=chunk,
        tile_w=int(os.environ.get("GS_TPU_BENCH_TILE_W", "48")),
        tile_h=int(os.environ.get("GS_TPU_BENCH_TILE_H", "32")),
        pair_budget_factor=3.1,
    )
    target = jnp.zeros((3, H, W), jnp.float32)

    def grads_sum(grads):
        return sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    if "--train" in sys.argv:
        # the FULL jitted training step (SSIM loss, Adam, densify stats) —
        # what a real iteration pays beyond the L1 fwd+bwd
        from gs_tpu.config import OptimizationParams
        from gs_tpu.models import densify, optim
        from gs_tpu.training import train_step

        opt_cfg = OptimizationParams()
        adam = optim.init(state.params())
        stats = densify.DensifyStats.zeros(state.capacity)

        @jax.jit
        def fwd_bwd(state, i, prev):
            bg = jnp.full((3,), 1e-12, jnp.float32) * i + 1e-30 * prev
            st, ad, sts, m = train_step(
                state, adam, stats, cam, bg, jnp.int32(100),
                jnp.float32(1.0), active_sh_degree=3, opt_cfg=opt_cfg,
                raster_cfg=cfg, accumulate_stats=True,
            )
            return (m["loss"] + 1e-30 * grads_sum(st.params())
                    + 1e-30 * grads_sum(ad.mu) + 1e-30 * sts.denom.sum())
    else:
        @jax.jit
        def fwd_bwd(state, i, prev):
            bg = jnp.full((3,), 1e-12, jnp.float32) * i + 1e-30 * prev

            def loss_fn(params):
                out = render(cam, state.with_params(params), active_sh_degree=3,
                             bg_color=bg, cfg=cfg)
                return losses.l1_loss(out.image, target)

            loss, grads = jax.value_and_grad(loss_fn)(state.params())
            return loss + 1e-30 * grads_sum(grads)

    s = fwd_bwd(state, np.float32(0), jnp.float32(0.0))
    float(s)

    tdir = tempfile.mkdtemp(prefix="gs_trace_")
    with jax.profiler.trace(tdir):
        for i in range(1, 4):
            s = fwd_bwd(state, np.float32(i), s)
        float(s)

    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {tdir}"
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)

    # device pids: process_name containing TPU / device
    dev_pids = set()
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            nm = ev.get("args", {}).get("name", "")
            if "TPU" in nm or "/device:" in nm:
                dev_pids.add(ev["pid"])
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for ev in tr["traceEvents"]:
        if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
            name = ev.get("name", "?")
            args = ev.get("args", {})
            longname = args.get("long_name") or args.get("tf_op") or name
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            agg[(name, str(longname)[:90])] += dur
            cnt[(name, str(longname)[:90])] += 1
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    iters = 3
    print(f"device total {total / iters:.2f} ms/iter over {iters} iters "
          f"(pids {sorted(dev_pids)})")
    for (name, longname), dur in rows:
        print(f"{dur / iters:8.3f} ms  x{cnt[(name, longname)] // iters:<4} "
              f"{name[:60]:60s} {longname[:80]}")


if __name__ == "__main__":
    main()
