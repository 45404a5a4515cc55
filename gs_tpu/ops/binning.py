"""Tile binning: depth ordering + (tile, splat) pair expansion, static shapes.

This replaces the reference rasterizer's "duplicate per tile with 64-bit
[tileID|depth] keys + global radix sort" stage (SURVEY.md §2.2a step 2) with an
XLA-friendly formulation:

  1. argsort Gaussians by camera depth once (invalid -> +inf, stable).
  2. per (depth-sorted) Gaussian, compute its tile-rect span and covered-tile
     count; exclusive cumsum gives each Gaussian's slot range in a *static*
     pair budget.
  3. materialize pairs: for each pair slot, ``searchsorted`` recovers the
     owning Gaussian; a *stable* sort by tile id then yields per-tile runs
     already in depth order (stable sort preserves the depth ordering), so no
     64-bit key is ever needed.
  4. per-tile [start, end) ranges via ``searchsorted`` over the sorted tile ids.

Static shapes everywhere: the pair buffer has a fixed budget; overflow is
detected and reported (the trainer grows the budget and retraces — a bounded
number of recompiles, same strategy as Gaussian capacity growth).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def tile_rect(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Clamped tile-rect [x0,x1) x [y0,y1) covered by each splat.

    Mirrors the CUDA ``getRect`` helper semantics: bbox of center +- radius,
    snapped outward to tile boundaries, clamped to the grid.
    """
    r = radii.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile_w), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile_h), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + r + tile_w - 1) / tile_w), 0, tiles_x).astype(
        jnp.int32
    )
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + r + tile_h - 1) / tile_h), 0, tiles_y).astype(
        jnp.int32
    )
    empty = radii <= 0
    x1 = jnp.where(empty, x0, x1)
    y1 = jnp.where(empty, y0, y1)
    return x0, y0, x1, y1


class TileBinning(NamedTuple):
    """Static-shape binning result.

    All pair arrays have length ``pair_budget``. ``pair_gauss`` indexes into
    the *original* (unsorted) Gaussian arrays. Padding pairs carry
    ``pair_tile == tiles_x*tiles_y`` (sorted to the end) and gauss index 0.
    """

    pair_gauss: jnp.ndarray  # [B] int32, original Gaussian index per pair
    pair_tile: jnp.ndarray  # [B] int32, tile id per pair (sentinel T for pad)
    tile_offsets: jnp.ndarray  # [T+1] int32, per-tile [start, end) into pairs
    num_pairs: jnp.ndarray  # scalar int32, true pair count (may exceed budget!)
    depth_order: jnp.ndarray  # [N] int32, Gaussian indices sorted by depth


def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    pair_budget: int,
) -> TileBinning:
    """Build depth-ordered per-tile splat lists with a static pair budget."""
    n = means2d.shape[0]
    num_tiles = tiles_x * tiles_y

    # 1. depth order (invalid/culled entries have depth = +inf already)
    safe_depth = jnp.where(radii > 0, depths, jnp.inf)
    depth_order = jnp.argsort(safe_depth, stable=True).astype(jnp.int32)

    # 2. spans in depth order
    x0, y0, x1, y1 = tile_rect(means2d, radii, tiles_x, tiles_y, tile_w, tile_h)
    sx0, sy0 = x0[depth_order], y0[depth_order]
    w = (x1 - x0)[depth_order]
    h = (y1 - y0)[depth_order]
    counts = (w * h).astype(jnp.int32)
    # exclusive cumsum -> slot offsets per depth-sorted Gaussian
    offsets = jnp.cumsum(counts) - counts
    num_pairs = (offsets[-1] + counts[-1]) if n > 0 else jnp.int32(0)

    # 3. expand: recover owning gaussian per pair slot
    slot = jnp.arange(pair_budget, dtype=jnp.int32)
    owner = (jnp.searchsorted(offsets, slot, side="right") - 1).astype(jnp.int32)
    owner = jnp.clip(owner, 0, max(n - 1, 0))
    local = slot - offsets[owner]
    valid = (slot < num_pairs) & (local >= 0) & (local < counts[owner])
    ow = jnp.maximum(w[owner], 1)
    tile_x = sx0[owner] + local % ow
    tile_y = sy0[owner] + local // ow
    pair_tile = jnp.where(valid, tile_y * tiles_x + tile_x, num_tiles).astype(jnp.int32)
    pair_gauss_depthsorted = owner

    # 4. stable sort by tile id -> per-tile runs in depth order
    tile_order = jnp.argsort(pair_tile, stable=True).astype(jnp.int32)
    pair_tile_sorted = pair_tile[tile_order]
    pair_gauss = depth_order[pair_gauss_depthsorted[tile_order]]

    tile_offsets = jnp.searchsorted(
        pair_tile_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return TileBinning(
        pair_gauss=pair_gauss,
        pair_tile=pair_tile_sorted,
        tile_offsets=tile_offsets,
        num_pairs=num_pairs,
        depth_order=depth_order,
    )
