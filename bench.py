"""Benchmark: fwd+bwd rasterization throughput at 1080p on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: fwd+bwd pixels/second for a full differentiable render step
(project -> bin -> composite -> loss -> backward through the custom VJP)
at 1920x1080 with a synthetic Gaussian cloud. Baseline reference point:
the reference codebase's headline ">=30 fps at 1080p" *forward-only*
rendering (README.md:14) = 62.2 Mpx/s; vs_baseline = ours / that (ours also
includes the backward pass, so 1.0 is strictly stronger than reference
parity).
"""

from __future__ import annotations

import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1080, 1920
N_GAUSS = 262_144
BASELINE_PIX_PER_S = 30 * 1920 * 1080  # reference: >=30fps @1080p fwd-only
BACKEND = os.environ.get("GS_TPU_BENCH_BACKEND", "auto")
CHUNK = int(os.environ.get("GS_TPU_BENCH_CHUNK", "64"))
TILE_W = int(os.environ.get("GS_TPU_BENCH_TILE_W", "16"))
TILE_H = int(os.environ.get("GS_TPU_BENCH_TILE_H", "16"))


def main():
    from gs_tpu import cameras
    from gs_tpu.config import RasterizeConfig
    from gs_tpu.models import gaussians
    from gs_tpu.renderer import render
    from gs_tpu.utils import losses

    platform = jax.devices()[0].platform
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(N_GAUSS, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, size=(N_GAUSS, 3)).astype(np.float32)
    state = gaussians.create_from_pcd(pts, cols, max_sh_degree=3, capacity=N_GAUSS)
    # make splats reasonably sized/visible
    state = state.replace(
        log_scale=jnp.clip(state.log_scale, -6.0, -3.5),
        logit_opacity=jnp.full_like(state.logit_opacity, 0.0),
    )
    cam = cameras.make_camera(
        np.eye(3), np.array([0.0, 0.0, 5.0]),
        fovx=math.radians(70), fovy=math.radians(46), width=W, height=H,
    )
    target = jnp.zeros((3, H, W), jnp.float32)
    cfg = RasterizeConfig(backend=BACKEND, chunk=CHUNK, tile_w=TILE_W, tile_h=TILE_H)

    @jax.jit
    def fwd_bwd(state):
        def loss_fn(params):
            out = render(cam, state.with_params(params), active_sh_degree=3,
                         bg_color=jnp.zeros(3), cfg=cfg)
            return losses.l1_loss(out.image, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params())
        return loss, grads

    # warmup/compile
    loss, grads = fwd_bwd(state)
    jax.block_until_ready((loss, grads))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = fwd_bwd(state)
    jax.block_until_ready((loss, grads))
    dt = (time.perf_counter() - t0) / iters

    pix_per_s = H * W / dt
    print(json.dumps({
        "metric": f"fwd+bwd pixels/s @1080p ({N_GAUSS} gaussians, {platform})",
        "value": round(pix_per_s, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pix_per_s / BASELINE_PIX_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
