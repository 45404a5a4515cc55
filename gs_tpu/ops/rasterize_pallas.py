"""Pallas TPU compositing kernels (forward + hand-derived backward).

TPU-native core of the differentiable tile rasterizer (the role CUDA kernels
play in the reference's diff-gaussian-rasterization; SURVEY.md §2.2a steps
3-4). Same math as the XLA backend in rasterize_tiled.py, restated as a
single fused Pallas kernel each way:

  grid = one step per chunk of splat pairs; chunks of a tile are consecutive
  grid steps. Packed [S,9] splat blocks stream HBM->VMEM via BlockSpecs
  whose index maps read scalar-prefetched chunk->block tables (tile pair
  ranges are chunk-aligned by binning, so every block is full — no
  partial-chunk masking). The tile's color/transmittance/ncon accumulators
  live in the revisited output block in VMEM and flush to HBM once per tile.

  forward, per chunk:   alpha [S,P] on the VPU, exclusive cumprod of
  (1-alpha) via log-step shifted multiplies, color += rgb^T(alpha*T) on the
  MXU, early-skip of whole chunks once every pixel's transmittance died.

  backward, per chunk (tiles walked in reverse chunk order via a second
  prefetched visit table): transmittance reconstructed by division from the
  running tail product, strict suffix-sums for dL/dalpha, per-pair [S,9]
  gradient blocks written straight to their slots (each block is owned by
  exactly one tile, so writes never race).

Residuals match the reference CUDA kernel's: final per-pixel transmittance
and the last-contributor index, nothing else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs_tpu.ops.rasterize_oracle import ALPHA_MAX, ALPHA_SKIP, T_EPS

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST
ATTR_W = 9


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------------------
# in-kernel scan helpers (axis 0 = sublanes, static size -> unrolled log-steps)
# ----------------------------------------------------------------------------


def _shift_down(x, k, fill):
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _shift_up(x, k, fill):
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[k:], pad], axis=0)


def _cumprod_incl(x):
    """Inclusive cumprod along axis 0 (log-step shifted multiplies)."""
    s, k = x.shape[0], 1
    while k < s:
        x = x * _shift_down(x, k, 1.0)
        k *= 2
    return x


def _cumsum_excl(x):
    """Exclusive cumsum along axis 0."""
    x = _shift_down(x, 1, 0.0)
    s, k = x.shape[0], 1
    while k < s:
        x = x + _shift_down(x, k, 0.0)
        k *= 2
    return x


def _suffix_prod_incl(x):
    """Inclusive suffix product along axis 0: out[i] = prod_{j>=i} x[j]."""
    s, k = x.shape[0], 1
    while k < s:
        x = x * _shift_up(x, k, 1.0)
        k *= 2
    return x


def _suffix_sum_strict(x):
    """Strict suffix sum along axis 0: out[i] = sum_{j>i} x[j]."""
    x = _shift_up(x, 1, 0.0)
    s, k = x.shape[0], 1
    while k < s:
        x = x + _shift_up(x, k, 0.0)
        k *= 2
    return x


def _chunk_alpha(attr, px, py):
    """alpha/power for one chunk: attr[S, ATTR_W] vs px/py[1,P]."""
    dx = attr[:, 0:1] - px
    dy = attr[:, 1:2] - py
    power = (
        -0.5 * (attr[:, 2:3] * dx * dx + attr[:, 4:5] * dy * dy)
        - attr[:, 3:4] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, attr[:, 8:9] * jnp.exp(power))
    return alpha, power, dx, dy


def _pixel_coords(tid, tiles_x, tile_w, tile_h, p):
    pcol = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    x0 = (tid % tiles_x) * tile_w
    y0 = (tid // tiles_x) * tile_h
    px = (x0 + pcol % tile_w).astype(_F32)
    py = (y0 + pcol // tile_w).astype(_F32)
    return px, py


# ----------------------------------------------------------------------------
# chunk visit tables (plain JAX, shared by fwd/bwd)
# ----------------------------------------------------------------------------


def _visit_tables(starts, ends, chunk, cap_chunks, reverse, dead_blk=None):
    """Per-grid-step (row, block) tables for chunked tile traversal.

    Tiles are visited in list order; within a tile, chunks run forward
    (``reverse=False``) or backward. Grid steps beyond the true total get
    row == M (dummy) and block == ``dead_blk`` (default: the extra dump
    slot cap_chunks; the forward pass uses 0 since its compute is gated
    and it never writes pair-indexed outputs — saving the dump-block pad).

    The step->row map is a monotone step function, so it's built with the
    scatter+cumsum idiom rather than ``searchsorted`` (which costs ~7 ms at
    this size on TPU, measured via trace round 2).
    """
    from gs_tpu.ops.binning import vec_cummax, vec_cumsum

    if dead_blk is None:
        dead_blk = cap_chunks
    ncks = (ends - starts) // chunk  # [M], ranges are chunk-aligned
    m = starts.shape[0]
    inc = vec_cumsum(ncks)
    offs = inc - ncks  # [M] exclusive
    total = inc[-1] if m > 0 else jnp.int32(0)

    j = jnp.arange(cap_chunks, dtype=jnp.int32)
    # row[j] = the (nonempty) row whose chunk range contains step j: scatter
    # each nonempty row's index at its first step, then a running max fills
    # the range (for live steps this equals searchsorted(offs, j, "right")-1,
    # which always lands on a nonempty row). vec_* scans keep these small
    # scalar-prefetch-feeding arrays on the VPU (see binning.vec_cumsum),
    # and the scatter itself runs in f32 — int scatters into these arrays
    # get an SMEM layout and a ~1.7 ms serial loop (trace round 2); exact
    # for values < 2^24
    buf = jnp.full((cap_chunks + 1,), -1.0, jnp.float32).at[
        jnp.where(ncks > 0, offs, cap_chunks)
    ].max(jnp.arange(m, dtype=jnp.float32), mode="drop")
    row = vec_cummax(buf[:cap_chunks]).astype(jnp.int32)
    row = jnp.clip(row, 0, max(m - 1, 0))
    k = j - offs[row]
    if reverse:
        k = ncks[row] - 1 - k
    blk = starts[row] // chunk + k
    live = j < total
    row = jnp.where(live, row, m).astype(jnp.int32)
    blk = jnp.where(live, blk, dead_blk).astype(jnp.int32)
    return row, blk


# ----------------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------------


def _fwd_kernel(row_ref, blk_ref, tid_ref, attr_ref,
                color_ref, t_ref, ncon_ref, died_ref, *, st, m):
    j = pl.program_id(0)
    s = attr_ref.shape[0]
    p = st.tile_w * st.tile_h
    row = row_ref[j]
    first = jnp.where(j > 0, row_ref[jnp.maximum(j - 1, 0)] != row, True)

    @pl.when(first)
    def _():
        color_ref[:] = jnp.zeros_like(color_ref)
        t_ref[:] = jnp.ones_like(t_ref)
        ncon_ref[:] = jnp.zeros_like(ncon_ref)
        died_ref[:] = jnp.zeros_like(died_ref)

    live = row < m
    any_alive = jnp.min(died_ref[:]) < 0.5

    @pl.when(live & any_alive)
    def _():
        tid = tid_ref[jnp.minimum(row, m - 1)]
        px, py = _pixel_coords(tid, st.tiles_x, st.tile_w, st.tile_h, p)
        attr = attr_ref[:]
        alpha, power, _, _ = _chunk_alpha(attr, px, py)
        incl = (alpha >= ALPHA_SKIP) & (power <= 0.0)
        omb = jnp.where(incl, 1.0 - alpha, 1.0)
        # exclusive cumprod = shifted inclusive (no [S,P] division)
        t_before = t_ref[0] * _shift_down(_cumprod_incl(omb), 1, 1.0)
        stop = incl & (t_before * (1.0 - alpha) < T_EPS)
        stop_f = stop.astype(_F32)
        died_before = died_ref[:] + _cumsum_excl(stop_f)
        contrib = incl & (died_before < 0.5) & ~stop

        w = jnp.where(contrib, alpha * t_before, 0.0)
        color_ref[0] += jax.lax.dot_general(
            attr[:, 5:8], w, (((0,), (0,)), ((), ())), precision=_HI,
            preferred_element_type=_F32,
        )
        # Mosaic has no reduce_prod; the full product is the cumprod's last row
        t_ref[0] *= _cumprod_incl(jnp.where(contrib, omb, 1.0))[s - 1 : s]
        pos = blk_ref[j] * s + jax.lax.broadcasted_iota(jnp.int32, (s, p), 0)
        ncon_ref[0] = jnp.maximum(
            ncon_ref[0], jnp.max(jnp.where(contrib, pos + 1, 0), axis=0, keepdims=True)
        )
        died_ref[:] = jnp.maximum(died_ref[:], jnp.max(stop_f, axis=0, keepdims=True))


def composite_fwd_pallas(st, sp_attr, tile_ids, starts, ends):
    """Pallas forward. Returns (color [M,P,3], t_final [M,P], ncon [M,P])."""
    s = st.chunk
    p = st.tile_w * st.tile_h
    b = sp_attr.shape[0]
    assert b % s == 0, "pair buffer must be chunk-aligned"
    cap_chunks = b // s
    m = tile_ids.shape[0]

    # dead chunks read block 0 (their compute is @pl.when-gated) — no pad
    row, blk = _visit_tables(starts, ends, s, cap_chunks, reverse=False,
                             dead_blk=0)

    kernel = functools.partial(_fwd_kernel, st=st, m=m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # row, blk, tile_ids
        grid=(cap_chunks,),
        in_specs=[
            pl.BlockSpec((s, ATTR_W), lambda j, row, blk, tid: (blk[j], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda j, row, blk, tid: (row[j], 0, 0)),
            pl.BlockSpec((1, 1, p), lambda j, row, blk, tid: (row[j], 0, 0)),
            pl.BlockSpec((1, 1, p), lambda j, row, blk, tid: (row[j], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((1, p), _F32)],  # died mask
    )
    color, t_final, ncon = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m + 1, 3, p), _F32),
            jax.ShapeDtypeStruct((m + 1, 1, p), _F32),
            jax.ShapeDtypeStruct((m + 1, 1, p), jnp.int32),
        ],
        interpret=_interpret(),
    )(row, blk, tile_ids, sp_attr)
    # tiles with zero chunks are never visited -> their output blocks are
    # uninitialized; give them the empty-tile result (color 0, T 1, ncon 0)
    visited = (ends > starts)[:, None]
    color = jnp.where(visited[..., None], color[:m], 0.0)
    t_final = jnp.where(visited, t_final[:m, 0], 1.0)
    ncon = jnp.where(visited, ncon[:m, 0], 0)
    return color.transpose(0, 2, 1), t_final, ncon


# ----------------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------------


def _bwd_kernel(row_ref, blk_ref, tid_ref, attr_ref,
                gc_ref, gt_ref, tfin_ref, ncon_ref,
                dattr_ref, trun_ref, ssuf_ref, *, st, m):
    """One reverse-order chunk of the compositing backward.

    Math identical to rasterize_tiled._backward_chunk (see its docstring for
    the derivation); carries (running tail transmittance, suffix sum of w*b)
    live in VMEM scratch across the tile's grid steps.
    """
    j = pl.program_id(0)
    s = attr_ref.shape[0]
    p = st.tile_w * st.tile_h
    row = row_ref[j]
    first = jnp.where(j > 0, row_ref[jnp.maximum(j - 1, 0)] != row, True)
    live = row < m

    @pl.when(first)
    def _():
        trun_ref[:] = tfin_ref[0]
        ssuf_ref[:] = jnp.zeros_like(ssuf_ref)

    dattr_ref[:] = jnp.zeros_like(dattr_ref)

    # skip chunks entirely past the tile's last contributor: every pair in
    # them has pos >= ncon (zero grads, identity carries), and with early
    # termination most of a deep tile's pairs are in that tail
    has_work = blk_ref[j] * s < jnp.max(ncon_ref[:])

    @pl.when(live & has_work)
    def _():
        tid = tid_ref[jnp.minimum(row, m - 1)]
        px, py = _pixel_coords(tid, st.tiles_x, st.tile_w, st.tile_h, p)
        attr = attr_ref[:]
        alpha, power, dx, dy = _chunk_alpha(attr, px, py)
        pos = blk_ref[j] * s + jax.lax.broadcasted_iota(jnp.int32, (s, p), 0)
        incl = (alpha >= ALPHA_SKIP) & (power <= 0.0)
        contrib = incl & (pos < ncon_ref[0])
        omb = jnp.where(contrib, 1.0 - alpha, 1.0)

        omb_sufprod = _suffix_prod_incl(omb)
        t_before = trun_ref[:] / omb_sufprod  # (1,P)/(S,P)
        w = jnp.where(contrib, alpha * t_before, 0.0)

        gc = gc_ref[0]  # [3,P]
        bdot = jax.lax.dot_general(
            attr[:, 5:8], gc, (((1,), (0,)), ((), ())), precision=_HI,
            preferred_element_type=_F32,
        )  # [S,P]
        wb = jnp.where(contrib, w * bdot, 0.0)
        s_after = ssuf_ref[:] + _suffix_sum_strict(wb)
        d_alpha = jnp.where(
            contrib,
            t_before * bdot - (s_after + gt_ref[0]) / omb,
            0.0,
        )

        g_exp = jnp.exp(power)
        d_opac = jnp.sum(
            jnp.where(contrib, g_exp * d_alpha, 0.0), axis=1, keepdims=True
        )
        d_power = jnp.where(contrib, attr[:, 8:9] * g_exp * d_alpha, 0.0)
        sum1 = lambda x: jnp.sum(x, axis=1, keepdims=True)
        d_rgb = jax.lax.dot_general(
            w, gc, (((1,), (1,)), ((), ())), precision=_HI,
            preferred_element_type=_F32,
        )  # [S,P] x [3,P] -> [S,3]
        dattr_ref[:] = jnp.concatenate(
            [
                sum1(-(attr[:, 2:3] * dx + attr[:, 3:4] * dy) * d_power),
                sum1(-(attr[:, 4:5] * dy + attr[:, 3:4] * dx) * d_power),
                sum1(-0.5 * dx * dx * d_power),
                sum1(-dx * dy * d_power),
                sum1(-0.5 * dy * dy * d_power),
                d_rgb,
                d_opac,
            ] + ([jnp.zeros((s, ATTR_W - 9), _F32)] if ATTR_W > 9 else []),
            axis=1,
        )

        # full chunk product = first row of the inclusive suffix product
        trun_ref[:] = trun_ref[:] / omb_sufprod[0:1]
        ssuf_ref[:] = ssuf_ref[:] + jnp.sum(wb, axis=0, keepdims=True)


def composite_bwd_pallas(st, residuals, cotangents):
    (sp_attr, tile_ids, starts, ends, t_final, ncon_all) = residuals
    g_color_all, g_t_all, _ = cotangents

    s = st.chunk
    p = st.tile_w * st.tile_h
    b = sp_attr.shape[0]
    assert b % s == 0
    cap_chunks = b // s
    m = tile_ids.shape[0]

    row, blk = _visit_tables(starts, ends, s, cap_chunks, reverse=True)
    sp_attr_p = jnp.concatenate([sp_attr, jnp.zeros((s, ATTR_W), _F32)])

    # per-tile cotangents, padded with a dummy row for dead chunks
    gc = jnp.concatenate(
        [jnp.asarray(g_color_all).transpose(0, 2, 1), jnp.zeros((1, 3, p), _F32)]
    )
    gt = jnp.concatenate(
        [jnp.asarray(g_t_all) * t_final, jnp.zeros((1, p), _F32)]
    )[:, None, :]  # tfin_term = T_fin * dL/dT_fin
    tf = jnp.concatenate([t_final, jnp.ones((1, p), _F32)])[:, None, :]
    nc = jnp.concatenate([ncon_all, jnp.zeros((1, p), jnp.int32)])[:, None, :]

    kernel = functools.partial(_bwd_kernel, st=st, m=m)
    tile_row3 = lambda j, row, blk, tid: (jnp.minimum(row[j], m), 0, 0)
    pair_blk = lambda j, row, blk, tid: (blk[j], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap_chunks,),
        in_specs=[
            pl.BlockSpec((s, ATTR_W), pair_blk),
            pl.BlockSpec((1, 3, p), tile_row3),
            pl.BlockSpec((1, 1, p), tile_row3),
            pl.BlockSpec((1, 1, p), tile_row3),
            pl.BlockSpec((1, 1, p), tile_row3),
        ],
        out_specs=[
            pl.BlockSpec((s, ATTR_W), pair_blk),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, p), _F32),  # running tail transmittance
            pltpu.VMEM((1, p), _F32),  # suffix sum of w*b
        ],
    )
    d_attr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b + s, ATTR_W), _F32),
        ],
        interpret=_interpret(),
    )(row, blk, tile_ids, sp_attr_p, gc, gt, tf, nc)[0]
    # pair blocks not owned by any tile in the list (unused buffer tail; other
    # devices' tiles in the sharded path) are never visited -> uninitialized;
    # zero them so the downstream scatter-add sees no garbage
    live_blk = jnp.where(row < m, blk, cap_chunks)
    vis_blocks = jnp.zeros(cap_chunks + 1, bool).at[live_blk].set(True)[:cap_chunks]
    rmask = jnp.repeat(vis_blocks, s)[:, None]
    return (jnp.where(rmask, d_attr[:b], 0.0), None, None, None)
