"""Oracle rasterizer: O(N * pixels), pure jnp, differentiable by autodiff.

The correctness anchor for the fast tiled/Pallas paths (SURVEY.md §7 step 1).
It reproduces the reference CUDA compositing semantics *exactly* (SURVEY.md
§2.2a steps 3-4), but in a vectorized closed form instead of a sequential
per-pixel loop:

  front-to-back compositing  C = sum_i c_i a_i T_i,  T_i = prod_{j<i} (1-a_j)

is rewritten with log-space transmittance so the whole image is a couple of
cumsums + one einsum. The reference's sequential skip/terminate rules are
mapped to closed-form masks:

  - a splat contributes only to pixels of tiles its radius-rect covers
  - alpha = min(0.99, opacity * exp(power)), skipped when alpha < 1/255 or
    power > 0
  - termination: the first splat whose inclusion would push T below 1e-4
    stops the pixel; that splat and everything behind it contribute nothing
    (and T stays at its pre-stop value for background compositing). Because
    excluded splats never affect the T of earlier ones, the first-stop index
    can be found from the "as-if-no-stop" T sequence, which is what makes the
    closed form exact.

Gradients flow through alpha/T/colors exactly as in the reference backward
(the discrete masks are treated as constants, like the CUDA done-flags).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gs_tpu.ops import binning

ALPHA_SKIP = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


class RasterOut(NamedTuple):
    image: jnp.ndarray  # [3, H, W]
    final_t: jnp.ndarray  # [H, W] remaining transmittance
    num_pairs: jnp.ndarray | None = None  # true (tile,splat) pair count


def rasterize_oracle(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    height: int,
    width: int,
    bg: jnp.ndarray,
    tile_w: int = 16,
    tile_h: int = 16,
) -> RasterOut:
    """Composite N projected splats over every pixel (reference semantics).

    Args:
      means2d: [N,2] pixel-space centers. conics: [N,3] (a,b,c) inverse 2D cov.
      colors: [N,3]; opacities: [N] activated in (0,1); depths: [N] camera z;
      radii: [N] int (0 = invisible). bg: [3].
    """
    n = means2d.shape[0]
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)

    order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf), stable=True)
    mu = means2d[order]
    con = conics[order]
    col = colors[order]
    opa = opacities[order]
    rad = radii[order]

    px = jnp.arange(width, dtype=jnp.float32)[None, :]  # [1,W]
    py = jnp.arange(height, dtype=jnp.float32)[:, None]  # [H,1]
    px = jnp.broadcast_to(px, (height, width)).reshape(-1)  # [P]
    py = jnp.broadcast_to(py, (height, width)).reshape(-1)

    dx = mu[:, 0:1] - px[None, :]  # [N,P]
    dy = mu[:, 1:2] - py[None, :]
    power = -0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy) - con[:, 1:2] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opa[:, None] * jnp.exp(power))

    # tile-rect gate (CUDA composites only within covered tiles)
    x0, y0, x1, y1 = binning.tile_rect(mu, rad, tiles_x, tiles_y, tile_w, tile_h)
    tx = (px / tile_w).astype(jnp.int32)[None, :]
    ty = (py / tile_h).astype(jnp.int32)[None, :]
    in_rect = (tx >= x0[:, None]) & (tx < x1[:, None]) & (ty >= y0[:, None]) & (ty < y1[:, None])

    incl = in_rect & (rad[:, None] > 0) & (alpha >= ALPHA_SKIP) & (power <= 0.0)
    log_omb = jnp.where(incl, jnp.log1p(-jnp.where(incl, alpha, 0.0)), 0.0)
    log_t_after = jnp.cumsum(log_omb, axis=0)  # inclusive: log T after splat i
    log_t_before = log_t_after - log_omb
    t_before = jnp.exp(log_t_before)

    stop = incl & (t_before * (1.0 - alpha) < T_EPS)
    died_before = jnp.cumsum(stop.astype(jnp.int32), axis=0) - stop.astype(jnp.int32)
    contrib = incl & (died_before == 0) & ~stop

    w = jnp.where(contrib, alpha * t_before, 0.0)  # [N,P]
    img = w.T @ col  # [P,3]

    # final T: pre-stop T where stopped, else full product over contributing splats
    log_t_contrib = jnp.where(contrib, log_omb, 0.0)
    t_final = jnp.exp(jnp.sum(log_t_contrib, axis=0))  # [P]
    img = img + t_final[:, None] * bg[None, :]

    return RasterOut(
        image=img.T.reshape(3, height, width),
        final_t=t_final.reshape(height, width),
    )
