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
     ``rows``-row chunks (double-buffered DMA), reduced on the MXU by a
     one-hot contraction

         out[g, :] += sum_r (id_r == g) * vals[r, :]

     The 0/1 one-hot operand is exact in bf16 and the f32 values are hi/lo
     bf16-split (products exact in the f32 accumulator; only the ~2^-17
     split rounding of the values remains — the same decomposition as
     rasterize_tiled._cumsum_rows_mxu). Rows outside a block's id range
     (window alignment slack, padding rows with id == n) zero themselves
     in the compare: no masking, no edge cases, no scatter.

Measured (benchmarks/micro_reduce.py, v5e, B=762k / N=262k): the reduce
runs at HBM-stream speed (~0.5-1 ms) vs 6.4 ms for the XLA
cumsum+boundary-gather tail it replaces and 13.5 ms for the scatter-add.

Layout note: values travel TRANSPOSED as one packed [16, B] f32 array
(9 gradient columns + the ids as exact-integer f32 in row IDS_ROW + zero
pad). [B, 16] row layout would sublane-pad every DMA; the transposed form
keeps the minor dimension large and 128-aligned, and the kernel contracts
directly against the [16, R] block (dot_general on the shared minor axis)
so nothing is ever transposed in VMEM.
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


def _segred_kernel(astart_ref, nch_ref, vals_hbm, out_ref, buf, sem,
                   *, gb, rows, k):
    j = pl.program_id(0)
    astart = astart_ref[j]
    nch = nch_ref[j]
    g0f = (j * gb).astype(_F32)

    out_ref[:] = jnp.zeros_like(out_ref)
    # block-relative gaussian index per output row, as exact-integer f32
    gi = jax.lax.broadcasted_iota(jnp.int32, (gb, rows), 0).astype(_F32) + g0f

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
            oneh = (blk[IDS_ROW:IDS_ROW + 1, :] == gi).astype(jnp.bfloat16)
            hi = blk.astype(jnp.bfloat16)
            lo = (blk - hi.astype(_F32)).astype(jnp.bfloat16)
            dims = (((1,), (1,)), ((), ()))  # contract the shared minor axis
            d = lambda y: jax.lax.dot_general(oneh, y, dims,
                                              preferred_element_type=_F32)
            out_ref[:] += d(hi) + d(lo)
            return 0

        jax.lax.fori_loop(0, nch, body, 0)


def segment_reduce_packed(packed, seg_cum, n, *, window=256, rows=512,
                          k=PACK_W):
    """Segment-sum a gaussian-sorted packed [PACK_W, BP] buffer -> [n, k].

    ``packed`` rows 0..k-1 are the value columns; row IDS_ROW holds each
    pair's gaussian id as exact-integer f32, sorted ascending, with padding
    rows carrying id >= n and zero values. BP must be a multiple of 128
    with at least ``rows`` columns of id>=n slack past the last real row
    (the last DMA window may overrun the final segment end).

    ``seg_cum`` [n] is the inclusive cumsum of per-gaussian pair counts.
    """
    assert rows % 128 == 0, "DMA chunk must be lane-aligned"
    assert packed.shape[0] == PACK_W
    bp = packed.shape[1]
    assert bp % 128 == 0
    nb = -(-n // window)
    jarr = jnp.arange(nb, dtype=jnp.int32)
    # window [block_start, block_end) in sorted-pair space; start aligned
    # down to 128 (rows ahead of it belong to earlier blocks -> id < g0 ->
    # zeroed by the one-hot compare)
    block_start = jnp.where(
        jarr == 0, 0, seg_cum[jnp.clip(jarr * window - 1, 0, n - 1)])
    block_end = seg_cum[jnp.clip((jarr + 1) * window - 1, 0, n - 1)]
    astart = (block_start // 128) * 128
    nch = -(-(jnp.maximum(block_end - astart, 0)) // rows)

    kernel = functools.partial(_segred_kernel, gb=window, rows=rows, k=k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # astart, nch
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((window, k), lambda j, a, c: (j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_W, rows), _F32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * window, k), _F32),
        interpret=_interpret(),
    )(astart.astype(jnp.int32), nch.astype(jnp.int32), packed)
    return out[:n]


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
