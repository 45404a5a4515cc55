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
