"""Fast tiled rasterizer: binning + chunked per-tile compositing, custom VJP.

This is the TPU-native replacement for the reference CUDA tile rasterizer
(diff-gaussian-rasterization; SURVEY.md §2.2a). Rather than translating the
per-pixel sequential CUDA loop, compositing is vectorized over (chunk of S
splats) x (P tile pixels) blocks:

  forward, per (tile, chunk):
    alpha[S,P]                 VPU elementwise (one exp per element)
    T_before = carry * exclusive-cumprod(1-alpha)   (log-step shifted
                               multiplies — associative scan, no
                               transcendentals, fp32-exact like the CUDA
                               sequential products)
    tile_color += (alpha*T)^T @ rgb[S,3]            (MXU, fp32)
    carry *= prod(1-alpha over contributing splats); early-out when every
    pixel's transmittance died

  backward (reverse chunk order — the CUDA back-to-front replay):
    alpha is recomputed; the only residuals are the per-pixel final
    transmittance and the index of the last contributing pair (n_contrib),
    exactly the two quantities the reference kernel saves. T is walked
    backward by division (T_before = T_end / suffix-prod), the same
    reconstruction the CUDA backward uses per splat.

The sequential skip (alpha < 1/255, power > 0), cap (0.99) and termination
(T*(1-alpha) < 1e-4 kills the pixel) semantics of the reference are preserved
exactly via closed-form masks (see rasterize_oracle.py for the argument:
splats excluded by the first stop never affect the T of earlier splats, so
the first-stop index is recoverable from the as-if-no-stop T sequence).

Data layout: per-pair splat attributes live in ONE packed [B, 9] array
(mean xy | conic abc | rgb | opacity | pad). TPU random gathers/scatters cost
per ROW, so one wide gather is ~10x cheaper than four narrow ones (measured:
27ms vs 300ms for 2.2M pairs), and the backward's scatter-add of pair grads
onto Gaussians is likewise a single wide scatter (cost is per row, not per
column — measured identical at widths 9 and 16).

Two interchangeable compositing backends share this math:
  - XLA backend (this file): vmap over tiles + while_loop over chunks.
    Runs everywhere (CPU tests, TPU); memory-bounded via tile batching.
  - Pallas backend (rasterize_pallas.py): one grid step per chunk, splat
    blocks streamed HBM->VMEM, tile accumulators resident in VMEM.

Gradient flow: binning/gather happen in plain JAX (gather's autodiff is the
scatter-add that accumulates per-pair grads onto Gaussians); only
``composite_tiles`` carries the custom VJP.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs_tpu.config import RasterizeConfig
from gs_tpu.ops import binning
from gs_tpu.ops.rasterize_oracle import ALPHA_MAX, ALPHA_SKIP, RasterOut, T_EPS

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST  # fp32 MXU passes; bf16 default breaks parity

# packed attribute columns
A_MEAN = slice(0, 2)
A_CONIC = slice(2, 5)
A_RGB = slice(5, 8)
A_OPAC = 8
ATTR_W = 9


def resolve_backend(backend: str) -> str:
    """'auto' -> Pallas kernels on TPU, the XLA compositing path elsewhere."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def binning_align(chunk: int, backend: str,
                  kernel_mode: str | None = None) -> int:
    """Pair-layout alignment for a compositing backend.

    The Pallas tile-grid kernels stream the pair buffer as a transposed
    [9, B] array whose DMA column offsets (= tile range starts) must be
    128-aligned, so binning aligns tile ranges to lcm(chunk, 128) there;
    everywhere else chunk alignment suffices. ``kernel_mode`` None means
    the rasterize_pallas.KERNEL_MODE global.
    """
    if backend == "pallas":
        from gs_tpu.ops import rasterize_pallas as rp

        if (kernel_mode or rp.KERNEL_MODE) == "tile":
            a = chunk
            while a % 128:
                a += chunk
            return a
    return chunk


def pack_attributes(means2d, conics, colors, opacities):
    """[N,2]+[N,3]+[N,3]+[N] -> [N, ATTR_W] packed splat attributes."""
    n = means2d.shape[0]
    return jnp.concatenate(
        [
            means2d.astype(_F32),
            conics.astype(_F32),
            colors.astype(_F32),
            opacities.astype(_F32)[:, None],
        ] + ([jnp.zeros((n, ATTR_W - 9), _F32)] if ATTR_W > 9 else []),
        axis=1,
    )


# gradient reduction for the pair gather (the role of the reference CUDA
# backward's atomicAdd accumulation, SURVEY.md §2.2a step 4):
#   "scatter" — plain autodiff: one [AB, 9] -> [N, 9] scatter-add
#       (measured ~17.7 ns/scattered row on v5e = 13.5 ms at the bench
#       shape, the largest non-kernel stage);
#   "segsum"  — sort pair grads by gaussian id, blocked-MXU cumsum, boundary
#       gather of N rows (12.2 ms standalone: measured neutral, round 4);
#   "pallas"  — sort, then the pairmove windowed one-hot MXU segment-reduce
#       kernel (sorted ids make each output block's pairs one contiguous
#       HBM window; no scatter anywhere — see gs_tpu/ops/pairmove.py).
# Trace-time global (A/B harnesses retrace); env-selectable like the
# rasterize_pallas formulation knobs.
GRAD_REDUCE = os.environ.get("GS_TPU_GRAD_REDUCE", "scatter")

# how per-pair attributes are materialized:
#   "gather" — one [AB, 9] row gather through attr_pad[pair_gauss]
#       (measured ~10.3 ns/row = 4.5 ms at the bench shape) with the
#       GRAD_REDUCE backward;
#   "carry"  — no gather: attributes ride the binning depth sort as
#       payloads, the pairmove interval-expand kernel, and the pair sort
#       (bitwise equal to the gather; see binning.bin_gaussians_aligned
#       carry_attr). Backward is the same sort+segment-reduce as
#       GRAD_REDUCE="pallas". Implies the pallas binning expansion.
PAIR_SOURCE = os.environ.get("GS_TPU_PAIR_SOURCE", "gather")


def _cumsum_rows_mxu(x: jnp.ndarray, blk: int = 256) -> jnp.ndarray:
    """Inclusive cumsum of x [B, K] along axis 0 via blocked MXU contractions.

    A plain axis-0 cumsum over [B, K<=9] scans the major axis with padded
    lanes (~70 ns/row measured round 2). Here each blk-row block gets its
    inclusive prefix from ONE lower-triangular [blk, blk] contraction (the
    0/1 mask is bf16-exact; x is hi/lo split so products are exact in the
    f32 accumulator — only the ~2^-17 split rounding of x remains), plus a
    tiny exclusive block-carry scan.
    """
    b, k = x.shape
    pad = (-b) % blk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, k), x.dtype)])
    nb = x.shape[0] // blk
    x3 = x.reshape(nb, blk, k)
    r = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    tri = (c <= r).astype(jnp.bfloat16)  # lower-inclusive
    dims = (((1,), (1,)), ((), ()))  # tri[s,t] x3[n,t,k] -> [s, n, k]
    hi = x3.astype(jnp.bfloat16)
    lo = (x3 - hi.astype(_F32)).astype(jnp.bfloat16)
    d = lambda y: jax.lax.dot_general(tri, y, dims,
                                      preferred_element_type=_F32)
    within = (d(hi) + d(lo)).transpose(1, 0, 2)  # [nb, blk, k]
    sums = within[:, -1, :]  # [nb, k]
    carry = jnp.cumsum(sums, axis=0) - sums  # exclusive; nb is small
    return (within + carry[:, None, :]).reshape(-1, k)[:b]


@jax.custom_vjp
def gather_pairs_segsum(attr_pad, pair_gauss, seg_cum):
    """attr_pad[pair_gauss] with a segmented-sum backward.

    The gather's autodiff is a [AB, ATTR_W] -> [N, ATTR_W] scatter-add that
    runs at the measured ~10 ns/row TPU floor (11.3 ms at the bench shape —
    the largest non-kernel stage; cf. the reference's atomicAdd accumulation,
    SURVEY.md §2.2a step 4). This hand-written VJP computes the identical
    sum as: sort pair grads by gaussian id (lax.sort ~2 ns/row, payload
    columns nearly free) -> rows of one gaussian are now contiguous ->
    blocked-MXU inclusive cumsum -> per-gaussian sums are differences of
    the cumsum at segment boundaries (``seg_cum``, from
    binning(count_by_gauss=True)) — one N-row gather.

    ``seg_cum`` [N] must be the inclusive cumsum of per-original-gaussian
    pair counts (the multiset of pair_gauss values < N). Padding pairs
    (index N) sort past every real segment; their cotangents are zero by
    construction (they gathered the zero NULL row) and never enter a
    real gaussian's difference window.
    """
    return attr_pad[pair_gauss]


def _gps_fwd(attr_pad, pair_gauss, seg_cum):
    return attr_pad[pair_gauss], (pair_gauss, seg_cum, attr_pad.shape[0])


def reduce_pair_grads(g, pair_gauss, seg_cum, n1):
    """Sum per-pair gradient rows [AB, K] onto gaussians -> [n1, K].

    The sort-based alternative to the scatter-add (both exact sums; see
    the GRAD_REDUCE note). ``n1`` = N + 1 rows (incl. the NULL row, always
    zero-gradient here: padding pairs composite against exact zeros).
    """
    ab, k = g.shape
    cols = tuple(g[:, i] for i in range(k))
    sorted_ = jax.lax.sort((pair_gauss,) + cols, num_keys=1, is_stable=False)
    # the pallas kernel's interval indicator compares exact-integer f32 row
    # indices — beyond 2^24 rows fall back to the MXU-cumsum reduction
    if GRAD_REDUCE == "pallas" and ab < (1 << 24) and n1 < (1 << 24):
        from gs_tpu.ops import pairmove

        packed = pairmove.pack_sorted_columns(sorted_[1:], sorted_[0])
        d = pairmove.segment_reduce_packed(packed, seg_cum, n1 - 1)[:, :k]
    else:
        gs = jnp.stack(sorted_[1:], axis=1)  # [AB, K], gaussian-contiguous
        csum = _cumsum_rows_mxu(gs)
        # C(p) := incl. cumsum at row p-1, C(0)=0;  d[g] = C(end_g)-C(end_{g-1})
        idx = jnp.clip(seg_cum - 1, 0, ab - 1)
        at_end = jnp.where((seg_cum > 0)[:, None], csum[idx], 0.0)
        d = at_end - jnp.concatenate([jnp.zeros((1, k), _F32), at_end[:-1]])
    return jnp.concatenate([d, jnp.zeros((n1 - d.shape[0], k), _F32)])


def _gps_bwd(res, g):
    pair_gauss, seg_cum, n1 = res  # n1 = N + 1 (incl. the NULL row)
    return reduce_pair_grads(g, pair_gauss, seg_cum, n1), None, None


gather_pairs_segsum.defvjp(_gps_fwd, _gps_bwd)


# ----------------------------------------------------------------------------
# gather-free pair attributes: bin + carry with a segment-reduce backward
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def bin_carry_pairs(statics, attr, means2d, depths, radii_b, col_offset=0.0):
    """Binning with attributes carried to pair slots (PAIR_SOURCE="carry").

    Replaces the [AB, ATTR_W] pair gather AND binning's delta scatters:
    ``attr`` rides the depth sort, the pairmove interval-expand kernel and
    the pair sort into per-pair order — bitwise equal to
    ``attr_pad[pair_gauss]`` (binning.bin_gaussians_aligned carry_attr).
    The backward is the sorted segment-reduce (reduce_pair_grads), i.e.
    the same exact per-gaussian sum as the reference CUDA backward's
    atomicAdd accumulation (SURVEY.md §2.2a step 4). Binning geometry
    (means2d/depths/radii_b) is non-differentiable, as in the reference.

    ``statics`` = (tiles_x, tiles_y, tile_w, tile_h, pair_budget, align,
    col_stride); ``col_offset`` (f32 scalar, may be a traced device index)
    + col_stride > 1 select a tile-column strip (the sharded layouts).

    Returns (sp_attr [AB, ATTR_W], aux AlignedBinningOut sans pair_attr_t,
    seg_cum).
    """
    return _bcp_impl(statics, attr, means2d, depths, radii_b, col_offset)


def _bcp_impl(statics, attr, means2d, depths, radii_b, col_offset):
    tiles_x, tiles_y, tile_w, tile_h, pair_budget, align, col_stride = statics
    ab = binning.bin_gaussians_aligned(
        means2d, depths, radii_b, tiles_x, tiles_y, tile_w, tile_h,
        pair_budget, align, count_by_gauss=True, carry_attr=attr,
        expand_impl="pallas", col_stride=col_stride,
        col_offset=jnp.asarray(col_offset, jnp.int32),
    )
    seg_cum = binning.vec_cumsum(ab.gauss_counts).astype(jnp.int32)
    sp_attr = ab.pair_attr_t.T  # [AB, ATTR_W] compute layout
    return sp_attr, ab._replace(pair_attr_t=None), seg_cum


def _bcp_fwd(statics, attr, means2d, depths, radii_b, col_offset):
    out = _bcp_impl(statics, attr, means2d, depths, radii_b, col_offset)
    _, aux, seg_cum = out
    return out, (aux.pair_gauss, seg_cum, attr.shape[0])


def _bcp_bwd(statics, res, cts):
    pair_gauss, seg_cum, n = res
    g_sp = cts[0]  # cotangent of sp_attr; aux/seg_cum are int (float0)
    d_attr = reduce_pair_grads(g_sp, pair_gauss, seg_cum, n + 1)[:n]
    return (d_attr, jnp.zeros((n, 2), _F32), jnp.zeros((n,), _F32),
            jnp.zeros((n,), _F32), jnp.zeros((), _F32))


bin_carry_pairs.defvjp(_bcp_fwd, _bcp_bwd)


class CompositeStatic(NamedTuple):
    """Static (hashable) compositing configuration — custom_vjp nondiff arg."""

    tiles_x: int
    tiles_y: int
    tile_w: int
    tile_h: int
    chunk: int
    tile_batch: int
    backend: str
    # Pallas kernel mode for THIS call: "chunk" | "tile" | None (= the
    # rasterize_pallas.KERNEL_MODE global). rasterize_tiled sets it
    # explicitly so the chunk-grid mode's SMEM budget can force the
    # tile-grid kernel at large pair buffers (see _pick_kernel_mode).
    kernel_mode: str | None = None


# v5e/v5p SMEM is 1 MiB; the chunk-grid kernels scalar-prefetch two
# int32[cap_chunks] visit tables plus int32[M] tile ids. Past this budget
# (headroom for Mosaic's own SMEM use) the compile fails "Ran out of memory
# in memory space smem" (measured round 4: 14.8M-pair heavy scene =
# 904 KiB/table), so rasterize_tiled statically falls back to the tile-grid
# kernels, which prefetch only [M]-sized starts/ends/ids.
_SMEM_TABLE_BUDGET = 700 * 1024


def _pick_kernel_mode(backend: str, pair_budget: int, chunk: int,
                      num_tiles: int) -> str | None:
    if backend != "pallas":
        return None
    from gs_tpu.ops import rasterize_pallas as rp

    mode = rp.KERNEL_MODE
    cap_chunks = pair_budget // chunk
    if mode == "chunk" and 4 * (2 * cap_chunks + num_tiles + 1) > \
            _SMEM_TABLE_BUDGET:
        mode = "tile"
    return mode


# ----------------------------------------------------------------------------
# shared chunk math
# ----------------------------------------------------------------------------


def _chunk_alpha(attr, px, py):
    """alpha/power for a chunk: attr[S, ATTR_W] vs px/py[P].

    Also returns g_exp = exp(power) so the backward reuses it instead of
    re-running the transcendental over the whole [S,P] block.
    """
    dx = attr[:, 0:1] - px[None, :]
    dy = attr[:, 1:2] - py[None, :]
    power = (
        -0.5 * (attr[:, 2:3] * dx * dx + attr[:, 4:5] * dy * dy)
        - attr[:, 3:4] * dx * dy
    )
    g_exp = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, attr[:, 8:9] * g_exp)
    return alpha, power, dx, dy, g_exp


def _tile_pixel_coords(tile_id, st: CompositeStatic):
    """Global pixel coordinates [P] for a (possibly traced) tile id."""
    p = jnp.arange(st.tile_w * st.tile_h, dtype=jnp.int32)
    x0 = (tile_id % st.tiles_x) * st.tile_w
    y0 = (tile_id // st.tiles_x) * st.tile_h
    px = (x0 + p % st.tile_w).astype(_F32)
    py = (y0 + p // st.tile_w).astype(_F32)
    return px, py


def _color_dot(w, rgb):
    """[S,P]^T @ [S,3] -> [P,3] in full fp32."""
    return jax.lax.dot_general(
        w, rgb, (((0,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=_F32,
    )


# ----------------------------------------------------------------------------
# exact-conservative tile truncation
# ----------------------------------------------------------------------------


def effective_ends(st: "CompositeStatic", sp_attr, tile_ids, starts, ends,
                   margin: float = 0.5):
    """Chunk-aligned per-tile range ends with the dead tail proven off.

    The reference kernel terminates a pixel at the first splat where
    T*(1-alpha) < T_EPS; splats past that point contribute nothing (and
    cannot move n_contrib). This computes, per tile, a *proof* that every
    pixel has terminated: alpha_j at any pixel of the tile is >= alpha_min_j
    := opac_j * exp(min over the tile rect of power_j) (the min of the
    concave power over a rect is at one of its 4 corners), and only splats
    whose alpha clears the ALPHA_SKIP test at EVERY pixel count, so

        T_pixel(s) <= T_ub(s) := prod_{j<=s} (1 - alpha'_j),
        alpha'_j = alpha_min_j if alpha_min_j >= ALPHA_SKIP else 0.

    Once T_ub < T_EPS * margin, every pixel's true transmittance is below
    T_EPS, i.e. already terminated — the remaining chunks are dead weight
    the CUDA reference also never renders. Truncating there is *exactly*
    output-preserving (color, T_final and n_contrib all unchanged); margin
    < 1 absorbs fp rounding of the log-space product.

    Works on any disjoint ascending (tile_ids, starts, ends) entry list
    (full grid or a device's tile shard). Cost: ~40 elementwise ops over
    the pair buffer + chunk-level scans. The proof can only fire through
    splats whose footprint covers a whole tile (alpha at the worst corner
    >= ALPHA_SKIP, i.e. sigma at least ~tile/4 for mid opacities) — dense
    clouds of large splats truncate hard; scenes of tiny splats keep
    ends_eff == ends and rely on the kernels' in-chunk death gating.

    Returns ends_eff with starts <= ends_eff <= ends, multiples of chunk.
    """
    s = st.chunk
    b = sp_attr.shape[0]
    nchunks = b // s
    m = tile_ids.shape[0]
    nonempty = ends > starts

    from gs_tpu.ops.binning import vec_cummax, vec_cumsum

    # owning entry per chunk (entries disjoint, ascending starts): scatter
    # each nonempty entry's INDEX at its first chunk and running-max fills
    # its range. (Counting nonempty marks instead indexes the nonempty
    # subsequence — off by one per preceding empty tile; caught round 2 by
    # scenes whose first tiles are empty.) f32 scatter: int scatters into
    # scalar-prefetch-feeding arrays lower to SMEM serial loops.
    buf = jnp.full((nchunks + 1,), -1.0, jnp.float32).at[
        jnp.where(nonempty, starts // s, nchunks)
    ].max(jnp.arange(m, dtype=jnp.float32), mode="drop")
    owner = vec_cummax(buf[:nchunks]).astype(jnp.int32)  # -1 before 1st entry
    owner_c = jnp.clip(owner, 0, max(m - 1, 0))
    chunk_pos = jnp.arange(nchunks, dtype=jnp.int32) * s
    covered = (owner >= 0) & (chunk_pos < ends[owner_c]) & nonempty[owner_c]

    # min power over the tile rect at the 4 corners, per pair
    tid = tile_ids[owner_c]  # [nchunks] small gather
    x0 = ((tid % st.tiles_x) * st.tile_w).astype(_F32)
    y0 = ((tid // st.tiles_x) * st.tile_h).astype(_F32)
    x1 = x0 + (st.tile_w - 1)
    y1 = y0 + (st.tile_h - 1)

    def per_slot(v):  # [nchunks] -> [nchunks, s]
        return jnp.broadcast_to(v[:, None], (nchunks, s))

    a2 = sp_attr.reshape(nchunks, s, ATTR_W)
    mx, my = a2[..., 0], a2[..., 1]
    ca, cb, cc = a2[..., 2], a2[..., 3], a2[..., 4]
    opac = a2[..., 8]

    def power_at(cx, cy):
        dx = per_slot(cx) - mx
        dy = per_slot(cy) - my
        return -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy

    min_power = jnp.minimum(
        jnp.minimum(power_at(x0, y0), power_at(x1, y0)),
        jnp.minimum(power_at(x0, y1), power_at(x1, y1)),
    )
    alpha_min = jnp.minimum(opac * jnp.exp(min_power), ALPHA_MAX)
    alpha_eff = jnp.where(alpha_min >= ALPHA_SKIP, alpha_min, 0.0)
    log_omb = jnp.log1p(-alpha_eff)  # <= 0

    chunk_log = jnp.sum(log_omb, axis=1)  # [nchunks]
    cum_incl = vec_cumsum(chunk_log)
    cum_excl = cum_incl - chunk_log
    entry_base = cum_excl[jnp.where(nonempty, starts // s, 0)]  # [m]
    t_enter_log = cum_excl - entry_base[owner_c]  # log T_ub entering chunk

    alive = covered & (t_enter_log > math.log(T_EPS * margin))
    needed = jnp.zeros((m + 1,), jnp.float32).at[
        jnp.where(covered, owner_c, m)
    ].add(alive.astype(jnp.float32), mode="drop")[:m]
    return starts + needed.astype(jnp.int32) * s


def ncon_trimmed_ends(st: "CompositeStatic", starts, ends, ncon_all):
    """Backward-only range ends: stop at each tile's last contributor.

    ``ncon`` values are global pair positions + 1 (the residual the forward
    saves), so chunks at or past max-over-pixels(ncon) have zero gradient
    for every pair — the reference backward's per-pixel
    ``contributor > last_contributor`` skip, hoisted to whole chunks.
    Exact: skipped chunks have no contributing pairs, so the reverse-walk
    carries (T, suffix sum) are unchanged across them.
    """
    s = st.chunk
    ncon_max = jnp.max(ncon_all, axis=tuple(range(1, ncon_all.ndim)))  # [m]
    ne = starts + -(-(jnp.maximum(ncon_max - starts, 0)) // s) * s
    return jnp.clip(ne, starts, ends)


# ----------------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------------


def _forward_one_tile(st, sp_attr, tile_id, start, end):
    """Composite one tile. Returns (color[P,3], T_final[P], n_contrib[P])."""
    S = st.chunk
    P = st.tile_w * st.tile_h
    px, py = _tile_pixel_coords(tile_id, st)
    n_chunks = jax.lax.div(end - start + S - 1, S)

    def cond(c):
        k, _, _, died, _ = c
        return (k < n_chunks) & ~jnp.all(died)

    def body(c):
        k, color, t_carry, died, ncon = c
        i0 = start + k * S
        attr = jax.lax.dynamic_slice(sp_attr, (i0, 0), (S, ATTR_W))
        rgb = attr[:, A_RGB]
        pos = i0 + jnp.arange(S, dtype=jnp.int32)

        alpha, power, _, _, _ = _chunk_alpha(attr, px, py)
        incl = (pos < end)[:, None] & (alpha >= ALPHA_SKIP) & (power <= 0.0)
        omb = jnp.where(incl, 1.0 - alpha, 1.0)  # "one minus alpha"
        t_before = t_carry[None, :] * (jnp.cumprod(omb, axis=0) / omb)
        stop = incl & (t_before * (1.0 - alpha) < T_EPS)
        died_within = jnp.cumsum(stop.astype(jnp.int32), axis=0) - stop.astype(jnp.int32)
        contrib = incl & ~died[None, :] & (died_within == 0) & ~stop

        w = jnp.where(contrib, alpha * t_before, 0.0)
        color = color + _color_dot(w, rgb)
        t_carry = t_carry * jnp.prod(jnp.where(contrib, omb, 1.0), axis=0)
        ncon = jnp.maximum(ncon, jnp.max(jnp.where(contrib, pos[:, None] + 1, 0), axis=0))
        died = died | jnp.any(stop, axis=0)
        return k + 1, color, t_carry, died, ncon

    init = (
        jnp.int32(0),
        jnp.zeros((P, 3), _F32),
        jnp.ones((P,), _F32),
        jnp.zeros((P,), bool),
        jnp.zeros((P,), jnp.int32),
    )
    _, color, t_final, _, ncon = jax.lax.while_loop(cond, body, init)
    return color, t_final, ncon


def _composite_fwd_xla(st, sp_attr, tile_ids, starts, ends):
    num_tiles = tile_ids.shape[0]

    fn = functools.partial(_forward_one_tile, st, sp_attr)
    # batch tiles to bound the [TB, S, P] temporaries
    tb = min(st.tile_batch, num_tiles)
    pad = (-num_tiles) % tb
    pad_args = [
        jnp.concatenate([a, jnp.zeros((pad,), a.dtype)]) for a in (tile_ids, starts, ends)
    ]
    grouped = [a.reshape(-1, tb) for a in pad_args]
    color, t_final, ncon = jax.lax.map(lambda xs: jax.vmap(fn)(*xs), tuple(grouped))
    flat = lambda a: a.reshape((-1,) + a.shape[2:])[:num_tiles]
    return flat(color), flat(t_final), flat(ncon)


# ----------------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------------


def _backward_chunk(st, px, py, attr, pos, end, ncon, g_color, g_t, t_end,
                    s_suffix):
    """Reverse-replay one chunk; returns (d_attr [S, ATTR_W], t_start, s_suffix').

    Derivation (per pixel; i over contributing splats):
      C = sum_i w_i c_i,  w_i = alpha_i T_i,  T_i = prod_{j<i} (1-alpha_j)
      T_fin = prod_i (1-alpha_i)
      b_i       := c_i . gC
      dL/dc_i    = w_i gC
      dL/dalpha_i = m_i [ T_i b_i - (S_after_i + T_fin*gT) / (1-alpha_i) ]
      with S_after_i = sum_{j>i} w_j b_j (suffix, accumulated across chunks)
      and m_i the contribution mask. The chain through
      alpha = min(0.99, opac*exp(power)) mirrors the reference CUDA backward,
      including its choice to ignore the 0.99 cap in the chain rule.

    ``g_t`` is pre-multiplied by T_fin by the caller (tfin_term).
    """
    rgb = attr[:, A_RGB]
    alpha, power, dx, dy, g_exp = _chunk_alpha(attr, px, py)
    incl = (pos < end)[:, None] & (alpha >= ALPHA_SKIP) & (power <= 0.0)
    contrib = incl & (pos[:, None] < ncon[None, :])
    omb = jnp.where(contrib, 1.0 - alpha, 1.0)

    # T before each splat, walked backward from the chunk-end carry by division
    # (identical to the reference backward's per-splat T /= (1-alpha) replay)
    rev_cumprod_incl = jnp.cumprod(omb[::-1], axis=0)[::-1]  # prod_{j>=i} omb_j
    t_before = t_end[None, :] / rev_cumprod_incl
    w = jnp.where(contrib, alpha * t_before, 0.0)  # [S,P]

    b = jax.lax.dot_general(
        rgb, g_color, (((1,), (1,)), ((), ())), precision=_HI,
        preferred_element_type=_F32,
    )  # [S,P] = c_i . gC_p
    wb = jnp.where(contrib, w * b, 0.0)
    # strict suffix sum of wb + cross-chunk carry
    s_after = s_suffix[None, :] + (
        jnp.cumsum(wb[::-1], axis=0)[::-1] - wb
    )

    d_alpha = jnp.where(
        contrib,
        t_before * b - (s_after + g_t[None, :]) / omb,
        0.0,
    )

    # chains (reference CUDA backward: dG ungated by the 0.99 cap)
    d_opac = jnp.sum(jnp.where(contrib, g_exp * d_alpha, 0.0), axis=1)  # [S]
    d_power = jnp.where(contrib, attr[:, 8:9] * g_exp * d_alpha, 0.0)
    d_conic = jnp.stack(
        [
            jnp.sum(-0.5 * dx * dx * d_power, axis=1),
            jnp.sum(-dx * dy * d_power, axis=1),
            jnp.sum(-0.5 * dy * dy * d_power, axis=1),
        ],
        axis=-1,
    )  # [S,3]
    d_mean = jnp.stack(
        [
            jnp.sum(-(attr[:, 2:3] * dx + attr[:, 3:4] * dy) * d_power, axis=1),
            jnp.sum(-(attr[:, 4:5] * dy + attr[:, 3:4] * dx) * d_power, axis=1),
        ],
        axis=-1,
    )  # [S,2]
    d_rgb = jax.lax.dot_general(
        w, g_color, (((1,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=_F32,
    )  # [S,P] @ [P,3] -> [S,3]
    pads = ([jnp.zeros((d_mean.shape[0], ATTR_W - 9), _F32)]
            if ATTR_W > 9 else [])
    d_attr = jnp.concatenate(
        [d_mean, d_conic, d_rgb, d_opac[:, None]] + pads, axis=1,
    )

    # carries stepped back over this chunk
    t_start = t_end / jnp.prod(omb, axis=0)
    s_suffix_new = s_suffix + jnp.sum(wb, axis=0)
    return d_attr, t_start, s_suffix_new


def _composite_bwd_xla(st, residuals, cotangents):
    (sp_attr, tile_ids_in, starts_in, ends_in, t_final, ncon_all) = residuals
    g_color_all, g_t_all, _ = cotangents  # cotangent of ncon output is ignored

    num_tiles = tile_ids_in.shape[0]
    S = st.chunk
    B = sp_attr.shape[0]

    tb = min(st.tile_batch, num_tiles)
    pad_t = (-num_tiles) % tb
    n_batches = (num_tiles + pad_t) // tb

    def pad_tiles(a):
        return jnp.concatenate([a, jnp.zeros((pad_t,) + a.shape[1:], a.dtype)])

    tile_ids = pad_tiles(tile_ids_in)
    starts = pad_tiles(starts_in)
    ends = pad_tiles(ends_in)  # padded tiles: start=end=0 -> no chunks
    g_color_t = pad_tiles(g_color_all)
    # tfin_term = T_fin * dL/dT_fin, constant per pixel
    g_t_t = pad_tiles(jnp.asarray(g_t_all) * t_final)
    t_fin_t = pad_tiles(t_final)
    ncon_t = pad_tiles(ncon_all)

    d_attr0 = jnp.zeros((B + S, ATTR_W), _F32)

    def batch_step(accs, bi):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, bi * tb, tb, axis=0)
        t_ids, t_start, t_end = sl(tile_ids), sl(starts), sl(ends)
        t_gc, t_gt, t_tf, t_ncon = sl(g_color_t), sl(g_t_t), sl(t_fin_t), sl(ncon_t)
        n_chunks = jax.lax.div(t_end - t_start + S - 1, S)  # [tb]
        max_chunks = jnp.max(n_chunks)

        pxs, pys = jax.vmap(lambda tid: _tile_pixel_coords(tid, st))(t_ids)

        def chunk_step(carry):
            k, t_run, s_suf, da = carry
            # reverse order: chunk index per tile counts down from its own top
            kk = n_chunks - 1 - k  # [tb]; negative => inactive this round
            active = kk >= 0
            i0 = t_start + jnp.maximum(kk, 0) * S

            def per_tile(i0_i, end_i, ncon_i, px, py, gc, gt, t_i, ss_i):
                attr = jax.lax.dynamic_slice(sp_attr, (i0_i, 0), (S, ATTR_W))
                pos = i0_i + jnp.arange(S, dtype=jnp.int32)
                return _backward_chunk(
                    st, px, py, attr, pos, end_i, ncon_i, gc, gt, t_i, ss_i,
                )

            dac, t_new, ss_new = jax.vmap(per_tile)(
                i0, t_end, t_ncon, pxs, pys, t_gc, t_gt, t_run, s_suf
            )
            # inactive tiles: zero grads, keep carries
            dac = jnp.where(active[:, None, None], dac, 0.0)
            t_run = jnp.where(active[:, None], t_new, t_run)
            s_suf = jnp.where(active[:, None], ss_new, s_suf)

            # scatter chunk grads into the flat pair-grad buffer
            rows = (i0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]).reshape(-1)
            rows = jnp.where(jnp.repeat(active, S), rows, B + S - 1)  # dump slot
            da = da.at[rows].add(dac.reshape(-1, ATTR_W))
            return k + 1, t_run, s_suf, da

        def chunk_cond(carry):
            return carry[0] < max_chunks

        (da,) = accs
        init = (
            jnp.int32(0),
            t_tf,  # per-pixel transmittance at the end of the tile
            jnp.zeros((tb, st.tile_w * st.tile_h), _F32),
            da,
        )
        _, _, _, da = jax.lax.while_loop(chunk_cond, chunk_step, init)
        return (da,), None

    (da,), _ = jax.lax.scan(
        batch_step, (d_attr0,), jnp.arange(n_batches, dtype=jnp.int32),
    )
    # no grads for the int tile descriptors
    return da[:B], None, None, None


# ----------------------------------------------------------------------------
# custom_vjp wrapper + public API
# ----------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def composite_tiles(st: CompositeStatic, sp_attr, tile_ids, starts, ends):
    """Composite an explicit tile set (supports tile sharding).

    ``sp_attr`` is the packed [B, ATTR_W] per-pair attribute array (see
    :func:`pack_attributes`). Returns (colors [M,P,3], T_final [M,P],
    ncon [M,P]) for the M tiles in ``tile_ids``; ``starts``/``ends`` are
    their pair ranges.
    """
    return _composite_dispatch_fwd(st, sp_attr, tile_ids, starts, ends)


def _composite_dispatch_fwd(st, sp_attr, tile_ids, starts, ends):
    if st.backend == "pallas":
        from gs_tpu.ops import rasterize_pallas

        return rasterize_pallas.composite_fwd_pallas(
            st, sp_attr, tile_ids, starts, ends
        )
    return _composite_fwd_xla(st, sp_attr, tile_ids, starts, ends)


def _composite_fwd_rule(st, sp_attr, tile_ids, starts, ends):
    color, t_final, ncon = _composite_dispatch_fwd(
        st, sp_attr, tile_ids, starts, ends
    )
    res = (sp_attr, tile_ids, starts, ends, t_final, ncon)
    return (color, t_final, ncon), res


def _composite_bwd_rule(st, residuals, cotangents):
    # walk each tile only to its last contributor (exact; the reference
    # backward's per-pixel contributor skip hoisted to whole chunks)
    (sp_attr, tile_ids, starts, ends, t_final, ncon) = residuals
    ends = ncon_trimmed_ends(st, starts, ends, ncon)
    residuals = (sp_attr, tile_ids, starts, ends, t_final, ncon)
    if st.backend == "pallas":
        from gs_tpu.ops import rasterize_pallas

        return rasterize_pallas.composite_bwd_pallas(st, residuals, cotangents)
    return _composite_bwd_xla(st, residuals, cotangents)


composite_tiles.defvjp(_composite_fwd_rule, _composite_bwd_rule)


def rasterize_tiled(
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    height: int,
    width: int,
    bg: jnp.ndarray,
    cfg: RasterizeConfig,
    pair_budget: int | None = None,
) -> RasterOut:
    """Full fast path: bin -> gather -> composite (custom VJP) -> untile + bg.

    Precondition: ``conics`` must be POSITIVE DEFINITE (a > 0, c > 0,
    a*c - b^2 > 0 for each [a, b, c] row). Conics from the projection
    pipeline always are (the +0.3 screen-space dilation bounds the
    eigenvalues away from 0). Callers constructing conics by hand must
    respect this: under the Pallas backend's POWER_MXU formulation (the
    default) the reference's ``power > 0`` cull is replaced by
    ``min(power, 0)`` — exactly equivalent for PD conics, but an INDEFINITE
    conic (which can make power > 0 at distance) would render its splat
    there while the XLA backend and the reference CUDA kernel cull it —
    silent backend-dependent output. Run with GS_TPU_POWER_MXU=0 if you
    truly need the legacy cull semantics for indefinite conics.
    """
    n = means2d.shape[0]
    tiles_x = -(-width // cfg.tile_w)
    tiles_y = -(-height // cfg.tile_h)
    num_tiles = tiles_x * tiles_y
    if pair_budget is None:
        pair_budget = max(int(cfg.pair_budget_factor * n), cfg.min_pair_budget)
    pair_budget = -(-pair_budget // cfg.chunk) * cfg.chunk

    # opacity-tightened binning radius: output-identical, fewer pairs
    # (see projection.bin_radii for the proof)
    from gs_tpu.ops.projection import bin_radii

    backend = resolve_backend(cfg.backend)
    kernel_mode = _pick_kernel_mode(backend, pair_budget, cfg.chunk, num_tiles)
    segsum = GRAD_REDUCE in ("segsum", "pallas")
    attr = pack_attributes(means2d, conics, colors, opacities)
    align = binning_align(cfg.chunk, backend, kernel_mode)
    use_carry = (PAIR_SOURCE == "carry" and pair_budget < (1 << 24)
                 and n < (1 << 24))
    if use_carry:
        # gather-free: attributes carried through the binning sorts +
        # interval-expand kernel; backward = sorted segment-reduce
        statics = (tiles_x, tiles_y, cfg.tile_w, cfg.tile_h, pair_budget,
                   align, 1)
        sp_attr, ab, _ = bin_carry_pairs(
            statics, attr, means2d, depths, bin_radii(radii, opacities))
    else:
        ab = binning.bin_gaussians_aligned(
            means2d, depths, bin_radii(radii, opacities), tiles_x, tiles_y,
            cfg.tile_w, cfg.tile_h, pair_budget, align,
            count_by_gauss=segsum,
        )

        # ONE packed gather per pair straight from the attribute table + one
        # zero NULL row (padding pairs index it -> zero opacity, no mask pass
        # over [AB, attrs]). Wide row gathers/scatters ARE the efficient
        # movers for differentiable data (the gather's autodiff is one wide
        # scatter-add): attrs as sort payload decomposed into nine 1.75 ms
        # [N] scatter-adds in the VJP (round 2); an intermediate depth-sorted
        # table cost an extra [N,9] gather + VJP scatter for nothing
        # (round-3 trace). GRAD_REDUCE="segsum" swaps the scatter-add VJP for
        # the sort-based segmented sum (see gather_pairs_segsum).
        attr_pad = jnp.concatenate([attr, jnp.zeros((1, ATTR_W), _F32)])
        if segsum:
            seg_cum = binning.vec_cumsum(ab.gauss_counts).astype(jnp.int32)
            sp_attr = gather_pairs_segsum(attr_pad, ab.pair_gauss, seg_cum)
        else:
            sp_attr = attr_pad[ab.pair_gauss]

    st = CompositeStatic(
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        tile_w=cfg.tile_w,
        tile_h=cfg.tile_h,
        chunk=cfg.chunk,
        tile_batch=cfg.tile_batch,
        backend=backend,
        kernel_mode=kernel_mode,
    )
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    ends = ab.ends
    if cfg.truncate_tiles:
        ends = effective_ends(st, jax.lax.stop_gradient(sp_attr), tile_ids,
                              ab.starts, ab.ends)
    tile_color, tile_t, _ = composite_tiles(
        st, sp_attr, tile_ids, ab.starts, ends,
    )

    tile_color = tile_color + tile_t[..., None] * bg[None, None, :]

    # untile [T, P, 3] -> [3, H, W]
    img = tile_color.reshape(tiles_y, tiles_x, cfg.tile_h, cfg.tile_w, 3)
    img = img.transpose(4, 0, 2, 1, 3).reshape(3, tiles_y * cfg.tile_h, tiles_x * cfg.tile_w)
    img = img[:, :height, :width]
    ft = tile_t.reshape(tiles_y, tiles_x, cfg.tile_h, cfg.tile_w)
    ft = ft.transpose(0, 2, 1, 3).reshape(tiles_y * cfg.tile_h, tiles_x * cfg.tile_w)
    ft = ft[:height, :width]
    return RasterOut(image=img, final_t=ft, num_pairs=ab.num_pairs)
