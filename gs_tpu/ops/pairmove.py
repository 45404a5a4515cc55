"""Pallas pair-movement kernels: sorted segment-reduce without scatters.

The rasterizer's gradient reduction sums per-pair gradient rows onto their
owning Gaussian — the role the reference CUDA backward's atomicAdd
accumulation plays (diff-gaussian-rasterization backward.cu semantics;
SURVEY.md §2.2a step 4, gaussian_renderer/__init__.py:98-106). XLA's
scatter-add runs at a measured ~17.7 ns per scattered row on a v5e
(13.5 ms at the bench shape, the largest non-kernel stage), because TPU
scatters serialize row updates.

This module replaces the scatter with a layout the hardware likes:

  1. the caller sorts pair gradient rows by Gaussian id (``lax.sort`` is
     ~4-8 ns/row including payload columns — benchmarks/micro_reduce.py);
  2. rows of one Gaussian are now contiguous, so the per-Gaussian sums are
     SEGMENT sums over a sorted buffer;
  3. the Pallas kernel below makes the grid one step per OUTPUT block of
     ``gb`` consecutive Gaussian ids. Because ids are sorted, all pairs of
     a block live in one contiguous input window — streamed HBM->VMEM in
     ``rows``-row chunks (double-buffered DMA), reduced on the MXU by an
     INTERVAL-indicator contraction on the global sorted row index

         out[:, g] += sum_r (seg_lo[g] <= r < seg_hi[g]) * vals[:, r]

     (sorted ids make membership an interval test — no id column is read).
     The 0/1 indicator is exact in bf16 and the f32 values are split into
     THREE bf16 terms by mantissa truncation — exact for every finite f32
     (bf16 is the top 16 bits of f32; see _trunc_split3) — so each
     product/sum is exact in the f32 accumulator: the reduce differs from
     a sequential sum only in association order. Rows outside a block's
     segments (window alignment slack, padding) zero themselves in the
     compare: no masking, no edge cases, no scatter.

Layout note: values travel TRANSPOSED as one packed [16, B] f32 array
([B, 16] row layout would sublane-pad every DMA; the 128-aligned minor
dimension keeps DMA dense), and the contraction is MXU-native:
vals[16, rows] @ ind[rows, gb] contracts vals' minor axis against ind's
MAJOR axis — the layout the MXU consumes without relayout. (The first
formulation compared a per-pair id row against a gaussian-axis iota and
contracted the minor axes of BOTH operands; Mosaic had to transpose an
operand per chunk, which measured ~70x off stream speed on hardware.)
The [rows, gb] indicator needs no transposes either: the row iota varies
along sublanes, the [2, gb] segment bounds broadcast along lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs_tpu.ops.rasterize_pallas import _interpret

_F32 = jnp.float32

PACK_W = 16  # packed rows: 0..8 gradient columns, IDS_ROW ids, rest zero
IDS_ROW = 9


def _segred_kernel(astart_ref, nch_ref, vals_hbm, bounds_ref, out_ref,
                   buf, sem, *, gb, rows, k):
    """Transposed-output segment reduce, MXU-native contraction.

    out_t[KP, gb] += vals[KP, rows] @ ind[rows, gb] — vals' minor (lane)
    axis contracts against ind's MAJOR axis, the layout the MXU consumes
    without relayout (the first formulation contracted the minor axes of
    BOTH operands, which Mosaic had to transpose per chunk). ``ind`` is an
    INTERVAL indicator on the global sorted-pair row index — sorted ids
    make "row belongs to gaussian g" equivalent to
    seg_lo[g] <= row < seg_hi[g], so no per-pair id column is ever read
    and the indicator needs no transposes: the row iota varies along
    sublanes, the [2, gb] segment bounds broadcast along lanes.
    """
    j = pl.program_id(0)
    astart = astart_ref[j]
    nch = nch_ref[j]

    out_ref[:] = jnp.zeros_like(out_ref)

    def dma(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(pl.multiple_of(astart + c * rows, 128),
                                 rows)],
            buf.at[slot], sem.at[slot],
        )

    @pl.when(nch > 0)
    def _():
        dma(jnp.int32(0)).start()

        def body(c, _):
            @pl.when(c + 1 < nch)
            def _():
                dma(c + 1).start()

            dma(c).wait()
            slot = jax.lax.rem(c, 2)
            blk = buf[slot]  # [PACK_W, rows]
            # global sorted-pair row index, exact-int f32, sublane axis
            r0 = (astart + c * rows).astype(_F32)
            ri = jax.lax.broadcasted_iota(
                jnp.int32, (rows, gb), 0).astype(_F32) + r0
            lo = bounds_ref[0:1, :]  # [1, gb] broadcast over rows
            hi = bounds_ref[1:2, :]
            ind = ((lo <= ri) & (ri < hi)).astype(jnp.bfloat16)  # [rows, gb]
            h1, h2, h3 = _trunc_split3(blk)
            dims = (((1,), (0,)), ((), ()))  # vals[KP, rows] @ ind[rows, gb]
            d = lambda y: jax.lax.dot_general(y, ind, dims,
                                              preferred_element_type=_F32)
            out_ref[:] += d(h1) + d(h2) + d(h3)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)


def segment_reduce_packed(packed, seg_cum, n, *, window=256, rows=512,
                          k=PACK_W):
    """Segment-sum a gaussian-sorted packed [PACK_W, BP] buffer -> [n, k].

    ``packed`` rows 0..k-1 are the value columns, sorted by owning
    gaussian id ascending, with padding rows past the last real pair
    carrying zero values (their row index falls outside every segment —
    the interval indicator never selects them, so their values are
    actually free to be anything). Row IDS_ROW is accepted for layout
    compatibility but never read. BP must be a multiple of 128 with at
    least ``rows`` columns of slack past the last real row (the last DMA
    window may overrun the final segment end).

    ``seg_cum`` [n] is the inclusive cumsum of per-gaussian pair counts.
    Exact: truncating 3-way bf16 value split (see the expand note) —
    every partial product/sum is exact; only the cross-chunk accumulation
    order differs from a sequential sum.
    """
    assert rows % 128 == 0, "DMA chunk must be lane-aligned"
    assert window % 128 == 0, "output block must be lane-aligned"
    assert packed.shape[0] == PACK_W
    bp = packed.shape[1]
    assert bp % 128 == 0
    nb = -(-n // window)
    jarr = jnp.arange(nb, dtype=jnp.int32)
    # window [block_start, block_end) in sorted-pair space; start aligned
    # down to 128 (rows ahead of it belong to earlier segments -> outside
    # the block's [lo, hi) intervals -> zeroed by the indicator)
    block_start = jnp.where(
        jarr == 0, 0, seg_cum[jnp.clip(jarr * window - 1, 0, n - 1)])
    block_end = seg_cum[jnp.clip((jarr + 1) * window - 1, 0, n - 1)]
    astart = (block_start // 128) * 128
    nch = -(-(jnp.maximum(block_end - astart, 0)) // rows)

    # per-gaussian [lo, hi) sorted-row intervals, padded to the block grid
    # (padding gaussians get empty intervals)
    npad = nb * window
    lo_b = jnp.concatenate([jnp.zeros((1,), jnp.int32), seg_cum[:-1]])
    bounds = jnp.zeros((2, npad), jnp.float32)
    bounds = bounds.at[0, :n].set(lo_b.astype(_F32))
    bounds = bounds.at[1, :n].set(seg_cum.astype(_F32))

    kernel = functools.partial(_segred_kernel, gb=window, rows=rows, k=k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # astart, nch
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((2, window), lambda j, a, c: (0, j)),
        ],
        out_specs=pl.BlockSpec((PACK_W, window), lambda j, a, c: (0, j)),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_W, rows), _F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PACK_W, nb * window), _F32),
        interpret=_interpret(),
    )(astart.astype(jnp.int32), nch.astype(jnp.int32), packed, bounds)
    return out_t[:, :n].T


def pack_sorted_columns(cols, ids_sorted, rows=512):
    """Stack sorted value columns + ids into the kernel's [PACK_W, BP] form.

    ``cols`` is a sequence of k <= IDS_ROW [B] f32 arrays already sorted by
    gaussian id; ``ids_sorted`` the matching [B] int32 ids (padding rows
    must carry id >= n). Pads the minor dim to a 128-multiple with >= rows
    slack columns whose id is 2^24-1 (past any real gaussian; exact in f32).
    """
    b = ids_sorted.shape[0]
    k = len(cols)
    assert k <= IDS_ROW
    bp = (-(-(b + rows) // rows)) * rows
    pad = bp - b
    big = jnp.full((pad,), float((1 << 24) - 1), _F32)
    rows_out = [
        jnp.concatenate([c.astype(_F32), jnp.zeros((pad,), _F32)])
        for c in cols
    ]
    rows_out += [jnp.zeros((bp,), _F32)] * (IDS_ROW - k)
    rows_out.append(jnp.concatenate([ids_sorted.astype(_F32), big]))
    rows_out += [jnp.zeros((bp,), _F32)] * (PACK_W - IDS_ROW - 1)
    return jnp.stack(rows_out, axis=0)


# ----------------------------------------------------------------------------
# interval expand: the inverse movement (gaussian rows -> their pair slots)
# ----------------------------------------------------------------------------
#
# Binning's pair expansion materializes per-slot owner fields as scattered
# row deltas + a [B]-length cumsum (binning.bin_gaussians_aligned step 3) —
# the delta scatters are 3 x [N] rows at the ~10 ns/row TPU scatter floor
# (6.9 ms at the bench shape). But the expansion is a pure INTERVAL
# step-function: slot p belongs to the unique gaussian n with
# offsets[n] <= p < ends[n] (offsets monotone, intervals disjoint). The
# kernel below makes the grid one step per OUTPUT slot-block; monotonicity
# means all gaussians owning a block's slots live in one contiguous input
# window, streamed HBM->VMEM and expanded by an interval-indicator MXU
# contraction
#
#     out[:, p] = sum_n (off_n <= p < end_n) * vals[:, n]
#
# Values are split into THREE bf16 terms by mantissa TRUNCATION (bit
# masking), which is EXACT for every finite f32: bf16 is the top 16 bits
# of f32, so h1 = mask16(v), h2 = mask16(v - h1), h3 = v - h1 - h2
# partition the 24-bit significand into 8+8+8 bits. Each product against
# the 0/1 indicator is exact in the f32 accumulator and the three partial
# sums reconstruct v exactly (each slot has exactly one owner), so the
# expand is BITWISE-exact — safe for integer owner fields and for f32
# attribute columns alike. No scatter, no cumsum, no gather.

EXPAND_W = 16  # packed rows: OFFS_ROW, ENDS_ROW, then up to 14 value rows
OFFS_ROW = 0
ENDS_ROW = 1
VALS_ROW = 2


def _trunc_split3(v):
    """f32 -> three bf16 terms summing EXACTLY to v (mantissa truncation)."""
    mask = jnp.uint32(0xFFFF0000)
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    h1 = jax.lax.bitcast_convert_type(u & mask, _F32)
    r1 = v - h1
    u1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    h2 = jax.lax.bitcast_convert_type(u1 & mask, _F32)
    r2 = r1 - h2
    return (h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16),
            r2.astype(jnp.bfloat16))


def _expand_kernel(astart_ref, nch_ref, vals_hbm, out_ref, buf, sem,
                   *, rblk, wchunk):
    j = pl.program_id(0)
    astart = astart_ref[j]
    nch = nch_ref[j]

    out_ref[:] = jnp.zeros_like(out_ref)
    # slot id per output column as exact-integer f32, broadcast over the
    # gaussian-window axis (sublanes)
    sl = (jax.lax.broadcasted_iota(jnp.int32, (wchunk, rblk), 1)
          + j * rblk).astype(_F32)

    def dma(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(pl.multiple_of(astart + c * wchunk, 128),
                                 wchunk)],
            buf.at[slot], sem.at[slot],
        )

    @pl.when(nch > 0)
    def _():
        dma(jnp.int32(0)).start()

        def body(c, _):
            @pl.when(c + 1 < nch)
            def _():
                dma(c + 1).start()

            dma(c).wait()
            slot = jax.lax.rem(c, 2)
            blk = buf[slot]  # [EXPAND_W, wchunk]
            off = blk[OFFS_ROW, :][:, None]  # [wchunk, 1]
            end = blk[ENDS_ROW, :][:, None]
            ind = ((off <= sl) & (sl < end)).astype(jnp.bfloat16)  # [W, R]
            h1, h2, h3 = _trunc_split3(blk)
            dims = (((1,), (0,)), ((), ()))  # vals[K, W] @ ind[W, R]
            d = lambda y: jax.lax.dot_general(y, ind, dims,
                                              preferred_element_type=_F32)
            out_ref[:] += d(h1) + d(h2) + d(h3)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)


def expand_intervals(packed, offsets, total, *, rblk=512, wchunk=256):
    """Expand interval-owned rows: out[:, p] = packed_vals[:, owner(p)].

    ``packed`` is [EXPAND_W, NP]: row OFFS_ROW holds each gaussian's first
    slot, row ENDS_ROW its one-past-last slot (both exact-integer f32,
    offsets monotone nondecreasing, intervals disjoint: end[n] <=
    off[n+1]), remaining rows are arbitrary f32 value columns. NP must be
    a 128-multiple with >= wchunk padding columns carrying off == end
    (empty intervals select nothing). Slots owned by no interval come out
    exactly 0. ``offsets`` is the UNPADDED [N] int32 offset array (used
    for the per-block window bookkeeping).

    Returns [EXPAND_W, ceil(total/rblk)*rblk]; callers slice [:, :total].
    Exact: see the truncating-split note above.
    """
    assert rblk % 128 == 0 and wchunk % 128 == 0
    assert packed.shape[0] == EXPAND_W
    np_ = packed.shape[1]
    assert np_ % 128 == 0
    nb = -(-total // rblk)
    jarr = jnp.arange(nb, dtype=jnp.int32)
    # window of gaussians a block can draw from: [astart, hi) where
    # astart <= owner(first slot) and hi = first gaussian starting at or
    # past the block end. Earlier rows in the 128-aligned-down slack have
    # end <= block start (disjoint ascending intervals) -> indicator 0.
    lo = jnp.maximum(
        jnp.searchsorted(offsets, jarr * rblk, side="right").astype(jnp.int32)
        - 1, 0)
    hi = jnp.searchsorted(offsets, (jarr + 1) * rblk,
                          side="left").astype(jnp.int32)
    astart = (lo // 128) * 128
    nch = -(-(jnp.maximum(hi - astart, 0)) // wchunk)

    kernel = functools.partial(_expand_kernel, rblk=rblk, wchunk=wchunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((EXPAND_W, rblk), lambda j, a, c: (0, j)),
        scratch_shapes=[
            pltpu.VMEM((2, EXPAND_W, wchunk), _F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EXPAND_W, nb * rblk), _F32),
        interpret=_interpret(),
    )(astart.astype(jnp.int32), nch.astype(jnp.int32), packed)


def pack_interval_columns(offsets, ends, cols, *, wchunk=256):
    """Stack offset/end/value columns into expand_intervals' [16, NP] form.

    ``offsets``/``ends`` are [N] int32 (monotone, disjoint); ``cols`` up to
    EXPAND_W - 2 [N] arrays (any dtype castable to f32; integers must be
    < 2^24 for exactness of the interval compare — values themselves are
    exact at ANY f32). Pads N to a 128-multiple with >= wchunk empty
    intervals (off == end == 2^24, selecting nothing).
    """
    n = offsets.shape[0]
    k = len(cols)
    assert k <= EXPAND_W - VALS_ROW
    np_ = (-(-(n + wchunk) // 128)) * 128
    pad = np_ - n
    big = jnp.full((pad,), float(1 << 24), _F32)
    rows = [
        jnp.concatenate([offsets.astype(_F32), big]),
        jnp.concatenate([ends.astype(_F32), big]),
    ]
    rows += [jnp.concatenate([c.astype(_F32), jnp.zeros((pad,), _F32)])
             for c in cols]
    rows += [jnp.zeros((np_,), _F32)] * (EXPAND_W - len(rows))
    return jnp.stack(rows, axis=0)


def segment_reduce_sorted(grads, ids_sorted, seg_cum, n, *, window=256,
                          rows=512):
    """Sum gaussian-sorted gradient rows [B, K] into [n, K] (no scatter).

    ``ids_sorted`` must be ascending with padding rows >= n; values must be
    exact in f32 (n < 2^24). See segment_reduce_packed for the mechanics.
    """
    assert n + window < (1 << 24), "ids (and the pad id) must be exact in f32"
    k = grads.shape[1]
    cols = [grads[:, i] for i in range(k)]
    packed = pack_sorted_columns(cols, ids_sorted, rows=rows)
    return segment_reduce_packed(packed, seg_cum, n, window=window,
                                 rows=rows)[:, :k]
