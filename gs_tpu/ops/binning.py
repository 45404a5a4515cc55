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

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

# pair-expansion implementation for bin_gaussians_aligned step 3 (the
# per-slot owner fields): "scatter" = 3 packed delta-scatters + [B]-cumsums
# (measured 6.9 ms at the bench shape — each scatter at the ~10 ns/row TPU
# floor); "pallas" = the pairmove interval-expand kernel (windowed
# interval-indicator MXU contraction over the monotone offsets — bitwise
# identical output, no scatter, no B-length cumsum). Trace-time global;
# callers can override per call.
EXPAND_IMPL = os.environ.get("GS_TPU_BIN_EXPAND", "scatter")


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

    Why not exact per-row circle coverage (round-3 measurement): cutting
    rect corners to the circle-row intersection drops only 8% of pairs at
    the bench shape and 11.7% at the hostile 1M-Gaussian shape (48x32
    tiles are coarse relative to typical radii), while the expansion would
    have to run at (gaussian, tile-row) granularity — 2.6-3.0 row entries
    per gaussian, i.e. ~2.7x the delta-scatter rows that currently
    dominate binning. Net loss at both shapes; the rect stays.
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


class AlignedBinningOut(NamedTuple):
    """Direct chunk-aligned binning result (single-sort fast path).

    ``pair_gauss`` indexes the original Gaussian arrays; padding / unused
    slots carry index N so one zero NULL row appended to the attribute
    table makes them inert with no mask pass (``valid`` is their mask).
    Tile t owns slots [starts[t], ends[t]) — a multiple of ``align`` long,
    depth-ordered.

    ``pair_gauss`` is materialized by the delta-scatter expansion itself
    (the scattered owner column carries depth_order VALUES, so its running
    cumsum IS the original index) — callers gather attributes directly as
    ``attr_pad[pair_gauss]``. Round-3 trace note: the previous two-level
    ``attr[depth_order][pair_slot]`` indirection cost an extra [N,9] gather
    + its VJP scatter (~5.9 ms at the bench shape) for nothing.
    ``sort_payload``/``payload_ds`` let extra columns ride the depth sort —
    forward-cheap, but NOTE: for *differentiable* payloads the sort's VJP
    decomposes into one [N] scatter-add per column (measured 1.75 ms each
    at N=262k), so carry only non-differentiated data this way and keep
    gradient-carrying tables on the wide-gather path.
    """

    pair_gauss: jnp.ndarray  # [AB] int32, original index (N = null row)
    depth_order: jnp.ndarray  # [N] int32
    valid: jnp.ndarray  # [AB] bool
    starts: jnp.ndarray  # [T] int32, multiples of align
    ends: jnp.ndarray  # [T] int32
    num_pairs: jnp.ndarray  # scalar int32 true (unclamped) pair count
    payload_ds: jnp.ndarray | None = None  # [N, K] sort_payload, depth order
    # per-ORIGINAL-gaussian surviving pair count (count_by_gauss=True only):
    # exactly the multiset of pair_gauss values < N. Feeds the segmented-sum
    # gradient reduction (rasterize_tiled.gather_pairs_segsum).
    gauss_counts: jnp.ndarray | None = None
    # carry_attr only: [K, AB] per-pair attribute columns, equal to
    # carry_attr[pair_gauss] with a zero NULL row — carried through the
    # interval-expand kernel and the pair sort instead of a B-row gather
    # (bitwise-identical values; see pairmove.expand_intervals).
    pair_attr_t: jnp.ndarray | None = None


def vec_cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """1-D inclusive cumsum as a [rows, 128] two-level scan.

    Small scans feeding Pallas scalar-prefetch operands inherit SMEM
    layouts and lower to ~1.7 ms serial loops each (round-2 trace, arrays
    of just a few thousand elements). The reshaped form keeps the work on
    full vector registers.
    """
    return _cumsum_cols([x])[0]


def vec_cummax(x: jnp.ndarray) -> jnp.ndarray:
    """1-D inclusive cummax, same vectorized 2-level structure."""
    n = x.shape[0]
    pad = (-n) % 128
    lo = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) \
        else -jnp.inf
    v = jnp.concatenate([x, jnp.full((pad,), lo, x.dtype)]) if pad else x
    v2 = v.reshape(-1, 128)
    within = jax.lax.cummax(v2, axis=1)
    carries = jax.lax.cummax(within[:, -1], axis=0)
    prev = jnp.concatenate([jnp.full((1,), lo, x.dtype), carries[:-1]])
    return jnp.maximum(within, prev[:, None]).reshape(-1)[:n]


def _cumsum_cols(x_cols):
    """Exact column-wise prefix sums, one [bo, 128] 2-level scan per column.

    A plain ``jnp.cumsum(x, axis=0)`` over [B, k] leaves the scan on the
    major axis with k (padded to 128) lanes — ~25x wasted bandwidth
    (measured ~70 ns/row round 2). Reshaping each column to [B/128, 128]
    runs the inner scan across full lanes and a small carry scan down rows.
    """
    outs = []
    for v in x_cols:
        b = v.shape[0]
        pad = (-b) % 128
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)])
        v2 = v.reshape(-1, 128)
        within = jnp.cumsum(v2, axis=1)
        carries = jnp.cumsum(within[:, -1])
        out = within + (carries - within[:, -1])[:, None]
        outs.append(out.reshape(-1)[:b])
    return outs


def bin_gaussians_aligned(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    pair_budget: int,
    align: int,
    col_stride: int = 1,
    col_offset=0,
    sort_payload: jnp.ndarray | None = None,
    count_by_gauss: bool = False,
    carry_attr: jnp.ndarray | None = None,
    expand_impl: str | None = None,
) -> AlignedBinningOut:
    """One-sort aligned binning, tuned for TPU gather/scatter costs.

    Strategy (vs sorting pairs then re-scattering to an aligned layout): B-length
    random gathers and scatters dominate on TPU (~25ms per 2M rows) while
    ``lax.sort`` is cheap (~10ms for 3M keys+payload). So instead of sorting
    pairs and then re-scattering into an aligned layout, per-tile alignment
    padding is materialized as *dummy pairs* that sort directly into place:
    key = 2*tile for real pairs, 2*tile+1 for dummies — one stable sort
    produces the final aligned, depth-ordered layout. Per-tile pair counts
    come from a corner-difference 2D cumsum over the tile grid (O(N + T)),
    not a B-length scatter.

    ``carry_attr`` [N, K<=9] rides the depth sort as payload and (on the
    pallas expand path) the interval-expand kernel + pair sort into
    ``pair_attr_t`` [K, AB] — the per-pair attribute table with NO B-row
    gather anywhere, bitwise equal to ``carry_attr[pair_gauss]`` (zero rows
    for padding). Requires ``expand_impl='pallas'``. ``expand_impl`` None
    reads the module global EXPAND_IMPL; the pallas path falls back to
    scatter when the budget or N exceed the kernel's exact-f32 id range
    (2^24).

    ``col_stride``/``col_offset`` restrict binning to every ``col_stride``-th
    tile COLUMN starting at ``col_offset`` (a traced device index is fine) —
    the de-replicated multi-device path: each device of a tile-sharded mesh
    bins only its own column strip, dividing every pair-proportional cost by
    the shard count. Tile ids in the result are then *compact*: tile
    ``t_local = ty * ceil(tiles_x/col_stride) + cx`` is global column
    ``col_offset + cx * col_stride`` (see
    :func:`gs_tpu.parallel.sharded.local_to_global_tiles`).
    """
    n = means2d.shape[0]
    if col_stride > 1:
        tiles_x_c = -(-tiles_x // col_stride)
    else:
        tiles_x_c = tiles_x
    num_tiles = tiles_x_c * tiles_y
    p_max = num_tiles * (align - 1)
    ab = -(-(pair_budget + p_max) // align) * align

    # 1. depth order + per-gaussian tile rects (all O(N))
    safe_depth = jnp.where(radii > 0, depths, jnp.inf)
    x0, y0, x1, y1 = tile_rect(means2d, radii, tiles_x, tiles_y, tile_w, tile_h)
    if col_stride > 1:
        # compact owned-column coordinates: cx = (tx - offset) / stride for
        # tx in {offset, offset+stride, ...}; a rect [x0, x1) covers the
        # compact range [ceil((x0-off)/stride), ceil((x1-off)/stride))
        off = jnp.asarray(col_offset, jnp.int32)
        x0 = -(-(x0 - off) // col_stride)
        x1 = -(-(x1 - off) // col_stride)
        x0 = jnp.clip(x0, 0, tiles_x_c)
        x1 = jnp.clip(x1, x0, tiles_x_c)
    # ONE depth sort carries every per-gaussian field as payload (plus the
    # caller's packed attribute table) — N narrow gathers through an argsort
    # permutation cost ~12 ns/row each on TPU while extra sort payloads are
    # nearly free, so this replaces 4-13 gathers with one sort
    if expand_impl is None:
        expand_impl = EXPAND_IMPL
    if expand_impl == "pallas" and (pair_budget >= (1 << 24)
                                    or n >= (1 << 24)):
        expand_impl = "scatter"  # ids must stay exact-integer f32
    assert carry_attr is None or expand_impl == "pallas", \
        "carry_attr requires the pallas interval-expand path"
    iota = jnp.arange(n, dtype=jnp.int32)
    payload_cols = () if sort_payload is None else tuple(
        sort_payload[:, c] for c in range(sort_payload.shape[1])
    )
    np_payload = len(payload_cols)
    carry_cols = () if carry_attr is None else tuple(
        carry_attr[:, c].astype(jnp.float32)
        for c in range(carry_attr.shape[1])
    )
    sorted_all = jax.lax.sort(
        (safe_depth, iota, x0, y0, x1 - x0, y1 - y0) + payload_cols
        + carry_cols,
        num_keys=1, is_stable=True,
    )
    depth_order = sorted_all[1]
    sx0, sy0, w, h = sorted_all[2], sorted_all[3], sorted_all[4], sorted_all[5]
    payload_ds = (
        jnp.stack(sorted_all[6:6 + np_payload], axis=1)
        if sort_payload is not None else None
    )
    carry_ds = sorted_all[6 + np_payload:]  # attr columns, depth order
    counts = (w * h).astype(jnp.int32)
    inc_cum = _cumsum_cols([counts])[0]  # inclusive
    offsets = inc_cum - counts
    num_pairs = inc_cum[-1] if n > 0 else jnp.int32(0)
    # budget overflow drops whole deepest gaussians (keeps tile_counts and the
    # sorted layout consistent); num_pairs still reports the true total so the
    # caller can grow the budget and retrace
    fit = inc_cum <= pair_budget  # [N] prefix mask in depth order

    # 2. per-tile pair counts as ONE separable MXU contraction. The rect
    #    membership factorizes: count[ty,tx] = sum_n rows[n,ty]*cols[n,tx]
    #    with interval indicators, i.e. rows^T @ cols. The corner-difference
    #    scatter + 2D-cumsum formulation this replaces serialized 4x N
    #    scatter-adds into a ~1.4k-cell grid — 7.6 ms at N=262k (round-3
    #    trace); the matmul is ~0.1 ms. Exact: 0/1 indicators are exact in
    #    bf16 and the f32 accumulation is integer-exact below 2^24.
    ey1 = sy0 + jnp.where(fit, h, 0)
    ex1 = sx0 + jnp.where(fit, w, 0)
    ty = jnp.arange(tiles_y, dtype=jnp.int32)
    tx = jnp.arange(tiles_x_c, dtype=jnp.int32)
    rows = ((sy0[:, None] <= ty) & (ty < ey1[:, None])).astype(jnp.bfloat16)
    cols = ((sx0[:, None] <= tx) & (tx < ex1[:, None])).astype(jnp.bfloat16)
    tile_counts = jax.lax.dot_general(
        rows, cols, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32).reshape(-1)  # [T]

    acnt = -(-tile_counts // align) * align
    astarts = (jnp.cumsum(acnt) - acnt).astype(jnp.int32)
    aends = (astarts + acnt).astype(jnp.int32)
    pad_t = acnt - tile_counts  # dummies needed per tile, < align each

    # 3. real pair keys/payloads. The per-slot owner fields are a monotone
    #    step-function expansion, so compute them as scattered row DELTAS +
    #    one [B,5] cumsum (~16ms at B=2M) instead of searchsorted (~300ms)
    #    or a per-slot gather (~27ms). Columns: offsets, x0, y0, max(w,1),
    #    owner index. Validity needs no per-slot fields: offsets are
    #    contiguous, the fit mask is a depth prefix, so a slot is real iff
    #    slot < total surviving pairs.
    slot = jnp.arange(pair_budget, dtype=jnp.int32)
    assert tiles_x_c < (1 << 9) and tiles_y < (1 << 9), (
        "pack width: widen packed coord fields for >512-tile grids")
    w1 = jnp.maximum(w, 1)
    attr_slots = None
    if expand_impl == "pallas":
        # interval-expand kernel: slot p's owner is the unique depth-sorted
        # gaussian with offsets[n] <= p < offsets[n] + fit-masked count —
        # a windowed interval-indicator MXU contraction (bitwise-exact,
        # see pairmove.expand_intervals) instead of delta scatters+cumsums.
        # carry_attr columns ride the same kernel call.
        from gs_tpu.ops import pairmove

        ends_fit = offsets + jnp.where(fit, counts, 0)
        cols = [offsets, depth_order, (sx0 << 9) + sy0, w1]
        cols += list(carry_ds)
        packed = pairmove.pack_interval_columns(offsets, ends_fit, cols)
        exp = pairmove.expand_intervals(packed, offsets, pair_budget)
        exp = exp[:, :pair_budget]
        vr = pairmove.VALS_ROW
        ex_off = exp[vr].astype(jnp.int32)
        ex_idx = exp[vr + 1].astype(jnp.int32)
        exy = exp[vr + 2].astype(jnp.int32)
        ex_w = jnp.maximum(exp[vr + 3].astype(jnp.int32), 1)
        ex_x0, ex_y0 = exy >> 9, exy & 0x1FF
        if carry_attr is not None:
            attr_slots = exp[vr + 4:vr + 4 + len(carry_ds)]
    else:
        # pack the five owner fields into THREE int32 columns (scatter-add
        # cost is per row x column; integer packing is delta/cumsum-exact):
        #   colA = pair offset, colB = the owner's ORIGINAL index
        #   (depth_order value — its cumsum is directly the gatherable
        #   Gaussian index, no depth_order[...] re-gather needed),
        #   colC = x0*2^18 + y0*2^9 + max(w,1)  (each field < 512 tiles)
        vals = jnp.stack(
            [offsets, depth_order,
             (sx0 << 18) + (sy0 << 9) + w1],
            axis=1,
        )  # [N,3]
        deltas = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
        # per-column 1-D scatters: a [B+1, 3] destination gets a padded-lane
        # (3 -> 128) tiled layout, making one wide scatter ~3x dearer than
        # three packed 1-D ones (trace round 2: 10.5 ms vs ~4)
        bufs = [
            jnp.zeros((pair_budget + 1,), jnp.int32).at[offsets].add(
                deltas[:, c], mode="drop"
            )[:pair_budget]
            for c in range(3)
        ]
        # per-slot owner fields via layout-friendly per-column scans
        ex_off, ex_idx, ex_c = _cumsum_cols(bufs)
        ex_w = ex_c & 0x1FF
        ex_x0 = ex_c >> 18
        ex_y0 = (ex_c >> 9) & 0x1FF
    orig = jnp.clip(ex_idx, 0, max(n - 1, 0)).astype(jnp.int32)
    local = slot - ex_off
    total_fit = jnp.max(jnp.where(fit, inc_cum, 0))
    real_valid = slot < total_fit
    tx = ex_x0 + local % ex_w
    ty = ex_y0 + local // ex_w
    real_tile = ty * tiles_x_c + tx
    real_key = jnp.where(real_valid, real_tile * 2, 2 * num_tiles + 2)

    # 4. dummy pair keys: dummy j belongs to the tile whose pad range holds j
    #    (same scatter+cumsum trick instead of searchsorted)
    dummy_slot = jnp.arange(p_max, dtype=jnp.int32)
    pad_cum = jnp.cumsum(pad_t)
    dmark = jnp.zeros(p_max + 1, jnp.int32).at[pad_cum].add(1, mode="drop")
    dummy_tile = _cumsum_cols([dmark[:p_max]])[0].astype(jnp.int32)
    dummy_key = jnp.where(
        dummy_slot < pad_cum[-1], jnp.minimum(dummy_tile, num_tiles - 1) * 2 + 1,
        2 * num_tiles + 2,
    )

    # 5. ONE stable sort of keys+payload -> final aligned layout (the
    #    carry_attr columns ride as extra payloads — nearly free)
    keys = jnp.concatenate([real_key, dummy_key]).astype(jnp.int32)
    payload = jnp.concatenate([orig, jnp.full((p_max,), -1, jnp.int32)])
    pad_to = ab - keys.shape[0]
    if pad_to > 0:
        keys = jnp.concatenate([keys, jnp.full((pad_to,), 2 * num_tiles + 2, jnp.int32)])
        payload = jnp.concatenate([payload, jnp.full((pad_to,), -1, jnp.int32)])
    attr_cols = () if attr_slots is None else tuple(
        jnp.concatenate(
            [attr_slots[c], jnp.zeros((p_max + max(pad_to, 0),), jnp.float32)])
        for c in range(attr_slots.shape[0])
    )
    sorted_pairs = jax.lax.sort((keys, payload) + attr_cols, num_keys=1,
                                is_stable=True)
    keys_sorted, orig_sorted = sorted_pairs[0], sorted_pairs[1]
    is_real = (keys_sorted % 2 == 0) & (keys_sorted < 2 * num_tiles)
    pair_attr_t = None
    if attr_slots is not None:
        # dummy/pad rows carried exact zeros; uncovered real-range slots
        # expanded to exact zeros — so no masking pass is needed (matches
        # the gather path's zero NULL row)
        pair_attr_t = jnp.stack(sorted_pairs[2:], axis=0)
    # invalid slots point at the NULL row n: gathering through an attribute
    # table padded with one zero row makes padding pairs zero-opacity with
    # no separate mask multiply over the [AB, attrs] buffer
    pair_gauss = jnp.where(is_real, jnp.maximum(orig_sorted, 0), n)
    gauss_counts = None
    if count_by_gauss:
        # surviving pair count per ORIGINAL gaussian index: un-permute the
        # depth-ordered fit-masked counts with one N-row sort (the unique
        # depth_order values ARE the destination indices; a sort at ~2 ns/row
        # beats an int scatter, which lowers to an SMEM serial loop here)
        cfit = jnp.where(fit, counts, 0)
        gauss_counts = jax.lax.sort((depth_order, cfit), num_keys=1)[1]
    return AlignedBinningOut(
        pair_gauss=pair_gauss,
        depth_order=depth_order,
        valid=is_real,
        starts=astarts,
        ends=aends,
        num_pairs=num_pairs,
        payload_ds=payload_ds,
        gauss_counts=gauss_counts,
        pair_attr_t=pair_attr_t,
    )


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
