"""Sequential-scan reference rasterizer for tests.

An *independent* implementation of the reference CUDA compositing loop
(SURVEY.md §2.2a step 3) with literal per-splat sequential semantics via
``lax.scan`` — including the skip (alpha < 1/255, power > 0), saturation
(alpha cap 0.99) and termination (T would drop below 1e-4 -> pixel done)
rules. Used to validate the closed-form oracle and the tiled/Pallas fast
paths, for both forward values and autodiff gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gs_tpu.ops import binning

ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def rasterize_scan(
    means2d, conics, colors, opacities, depths, radii, height, width, bg,
    tile_w=16, tile_h=16,
):
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf), stable=True)

    px = jnp.tile(jnp.arange(width, dtype=jnp.float32), height)
    py = jnp.repeat(jnp.arange(height, dtype=jnp.float32), width)
    tx = (px / tile_w).astype(jnp.int32)
    ty = (py / tile_h).astype(jnp.int32)
    n_pix = height * width

    x0, y0, x1, y1 = binning.tile_rect(means2d, radii, tiles_x, tiles_y, tile_w, tile_h)

    def step(carry, idx):
        color_acc, t, done = carry
        mu = means2d[idx]
        con = conics[idx]
        dx = mu[0] - px
        dy = mu[1] - py
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opacities[idx] * jnp.exp(power))
        in_rect = (tx >= x0[idx]) & (tx < x1[idx]) & (ty >= y0[idx]) & (ty < y1[idx])
        use = in_rect & (radii[idx] > 0) & (alpha >= ALPHA_SKIP) & (power <= 0.0) & ~done
        test_t = t * (1.0 - alpha)
        stop = use & (test_t < T_EPS)
        contrib = use & ~stop
        w = jnp.where(contrib, alpha * t, 0.0)
        color_acc = color_acc + w[:, None] * colors[idx][None, :]
        t = jnp.where(contrib, test_t, t)
        done = done | stop
        return (color_acc, t, done), None

    init = (jnp.zeros((n_pix, 3)), jnp.ones((n_pix,)), jnp.zeros((n_pix,), bool))
    (color_acc, t, _), _ = jax.lax.scan(step, init, order)
    img = color_acc + t[:, None] * bg[None, :]
    return img.T.reshape(3, height, width), t.reshape(height, width)


def random_scene(key, n, height, width, depth_range=(2.0, 8.0)):
    """Random projected splats directly in screen space (for kernel tests)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    means2d = jax.random.uniform(
        k1, (n, 2), minval=-10.0, maxval=max(height, width) + 10.0
    )
    # random SPD 2x2 covariance -> conic
    a = jax.random.uniform(k2, (n,), minval=0.5, maxval=30.0)
    c = jax.random.uniform(k3, (n,), minval=0.5, maxval=30.0)
    b = jax.random.uniform(k4, (n,), minval=-0.9, maxval=0.9) * jnp.sqrt(a * c)
    det = a * c - b * b
    conics = jnp.stack([c / det, -b / det, a / det], axis=-1)
    colors = jax.random.uniform(k5, (n, 3))
    opac = jax.random.uniform(k6, (n,), minval=0.1, maxval=1.0)
    depths = jax.random.uniform(key, (n,), minval=depth_range[0], maxval=depth_range[1])
    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radii = jnp.ceil(3.0 * jnp.sqrt(lam)).astype(jnp.int32)
    return means2d, conics, colors, opac, depths, radii
