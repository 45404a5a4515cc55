"""Unit tests for the pairmove windowed one-hot segment-reduce kernel.

The kernel replaces the gradient scatter-add of the rasterizer backward
(the reference CUDA backward's atomicAdd accumulation, SURVEY.md §2.2a
step 4) with a sort + Pallas MXU reduce; these tests pin its numerics
against an fp64 scatter reference across awkward shapes (zero-count
gaussians, n not a multiple of the window, empty input, huge segments).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gs_tpu.ops.pairmove import (
    EXPAND_W,
    VALS_ROW,
    expand_intervals,
    pack_interval_columns,
    pack_sorted_columns,
    segment_reduce_packed,
    segment_reduce_sorted,
)


def _ref(ids, g, n):
    out = np.zeros((n, g.shape[1]), np.float64)
    np.add.at(out, ids, g.astype(np.float64))
    return out


def _run_case(rng, b, n, window, rows, zero_frac=0.0):
    live = max(1, int(n * (1.0 - zero_frac)))
    pool = np.sort(rng.choice(n, size=live, replace=False))
    ids = np.sort(rng.choice(pool, size=b)).astype(np.int32) if b else \
        np.zeros((0,), np.int32)
    g = rng.normal(size=(b, 9)).astype(np.float32)
    counts = np.bincount(ids, minlength=n)
    seg_cum = jnp.asarray(np.cumsum(counts).astype(np.int32))
    out = np.asarray(segment_reduce_sorted(
        jnp.asarray(g), jnp.asarray(ids), seg_cum, n,
        window=window, rows=rows))
    ref = _ref(ids, g, n)
    # error bound: ~2^-17 hi/lo split rounding of each |value|, accumulated
    sabs = np.zeros((n, 9))
    np.add.at(sabs, ids, np.abs(g))
    assert np.max(np.abs(out - ref) / (sabs + 1.0)) < 2e-5


@pytest.mark.parametrize(
    "b,n,window,rows",
    [
        (5000, 1000, 256, 512),
        (3000, 777, 128, 256),  # n not a multiple of window
        (700, 65, 256, 128),  # single output block
        (100, 4000, 512, 512),  # mostly-empty segments
    ],
)
def test_matches_scatter_reference(b, n, window, rows):
    _run_case(np.random.default_rng(0), b, n, window, rows)


def test_zero_count_runs():
    # long runs of pair-less gaussians between live ones (culled splats)
    _run_case(np.random.default_rng(1), 2000, 3000, 256, 256, zero_frac=0.9)


def test_one_giant_segment():
    # one gaussian owning far more pairs than a DMA chunk
    rng = np.random.default_rng(2)
    b, n = 4000, 64
    ids = np.zeros((b,), np.int32)
    ids[b // 2:] = 7
    g = rng.normal(size=(b, 9)).astype(np.float32)
    counts = np.bincount(ids, minlength=n)
    seg_cum = jnp.asarray(np.cumsum(counts).astype(np.int32))
    out = np.asarray(segment_reduce_sorted(
        jnp.asarray(g), jnp.asarray(ids), seg_cum, n, window=128, rows=256))
    ref = _ref(ids, g, n)
    sabs = np.zeros((n, 9))
    np.add.at(sabs, ids, np.abs(g))
    assert np.max(np.abs(out - ref) / (sabs + 1.0)) < 2e-5


def test_padding_ids_are_inert():
    # rows with id >= n (the rasterizer's NULL-row pairs) must not land
    # anywhere, even when their values are nonzero
    rng = np.random.default_rng(3)
    n, b_real, b_pad = 200, 900, 300
    ids = np.concatenate([
        np.sort(rng.integers(0, n, size=b_real)),
        np.full((b_pad,), n),
    ]).astype(np.int32)
    g = rng.normal(size=(b_real + b_pad, 9)).astype(np.float32)
    counts = np.bincount(ids[:b_real], minlength=n)
    seg_cum = jnp.asarray(np.cumsum(counts).astype(np.int32))
    out = np.asarray(segment_reduce_sorted(
        jnp.asarray(g), jnp.asarray(ids), seg_cum, n, window=128, rows=128))
    ref = _ref(ids[:b_real], g[:b_real], n)
    sabs = np.zeros((n, 9))
    np.add.at(sabs, ids[:b_real], np.abs(g[:b_real]))
    assert np.max(np.abs(out - ref) / (sabs + 1.0)) < 2e-5


def test_packed_roundtrip_layout():
    rng = np.random.default_rng(4)
    b, n = 513, 97
    ids = np.sort(rng.integers(0, n, size=b)).astype(np.int32)
    cols = [jnp.asarray(rng.normal(size=(b,)).astype(np.float32))
            for _ in range(9)]
    packed = pack_sorted_columns(cols, jnp.asarray(ids), rows=128)
    assert packed.shape[0] == 16 and packed.shape[1] % 128 == 0
    counts = np.bincount(ids, minlength=n)
    seg_cum = jnp.asarray(np.cumsum(counts).astype(np.int32))
    out = np.asarray(segment_reduce_packed(
        packed, seg_cum, n, window=128, rows=128))[:, :9]
    g = np.stack([np.asarray(c) for c in cols], axis=1)
    ref = _ref(ids, g, n)
    sabs = np.zeros((n, 9))
    np.add.at(sabs, ids, np.abs(g))
    assert np.max(np.abs(out - ref) / (sabs + 1.0)) < 2e-5


# ----------------------------------------------------------------------------
# interval expand (the inverse movement: gaussian rows -> pair slots)
# ----------------------------------------------------------------------------


def _expand_ref(offsets, counts, cols, total):
    """fp-free python expansion: out[:, p] = cols[:, owner(p)], else 0."""
    k = len(cols)
    out = np.zeros((k, total), np.float64)
    for n in range(len(offsets)):
        lo, hi = offsets[n], offsets[n] + counts[n]
        for c in range(k):
            out[c, lo:min(hi, total)] = cols[c][n]
    return out


def _run_expand(rng, n, total, rblk, wchunk, zero_frac=0.5, gap_frac=0.0):
    counts = rng.integers(0, 9, size=n)
    counts[rng.random(n) < zero_frac] = 0
    gaps = (rng.random(n) < gap_frac) * rng.integers(1, 5, size=n)
    offsets = (np.cumsum(counts + gaps) - counts).astype(np.int32)
    ends = (offsets + counts).astype(np.int32)
    cols = [(rng.normal(size=(n,)) * 10.0 ** rng.integers(-6, 6, size=n))
            .astype(np.float32) for c in range(EXPAND_W - VALS_ROW)]
    packed = pack_interval_columns(
        jnp.asarray(offsets), jnp.asarray(ends),
        [jnp.asarray(c) for c in cols], wchunk=wchunk)
    out = np.asarray(expand_intervals(
        packed, jnp.asarray(offsets), total, rblk=rblk, wchunk=wchunk))
    ref = _expand_ref(offsets, counts, cols, total)
    # truncating 3-way bf16 split -> the expansion must be BITWISE exact
    np.testing.assert_array_equal(out[VALS_ROW:, :total],
                                  ref[VALS_ROW - 2:][: EXPAND_W - VALS_ROW])


def test_expand_exact_dense():
    _run_expand(np.random.default_rng(0), 700, 2000, 256, 128, zero_frac=0.3)


def test_expand_uncovered_slots_zero():
    # gaps between intervals (the rasterizer's fit-overflow tail) stay 0
    _run_expand(np.random.default_rng(1), 400, 1500, 128, 128, gap_frac=0.4)


def test_expand_many_empty_intervals():
    # long culled runs: many gaussians share one offset with count 0
    _run_expand(np.random.default_rng(2), 3000, 900, 256, 256, zero_frac=0.95)


def test_expand_integer_fields_exact():
    # exact-integer owner fields (offsets, indices, packed coords) survive
    rng = np.random.default_rng(3)
    n, total = 900, 2600
    counts = rng.integers(0, 7, size=n)
    offsets = (np.cumsum(counts) - counts).astype(np.int32)
    ends = (offsets + counts).astype(np.int32)
    idx = rng.integers(0, (1 << 24) - 1, size=n).astype(np.int32)
    cols = [jnp.asarray(offsets), jnp.asarray(idx)]
    packed = pack_interval_columns(jnp.asarray(offsets), jnp.asarray(ends),
                                   cols, wchunk=128)
    out = np.asarray(expand_intervals(packed, jnp.asarray(offsets), total,
                                      rblk=128, wchunk=128))
    ref = _expand_ref(offsets, counts,
                      [offsets.astype(np.float64), idx.astype(np.float64)],
                      total)
    np.testing.assert_array_equal(out[VALS_ROW, :total], ref[0])
    np.testing.assert_array_equal(out[VALS_ROW + 1, :total], ref[1])


def test_expand_one_giant_interval():
    # a single splat spanning many output blocks (huge foreground gaussian)
    offsets = np.array([0, 5000], np.int32)
    ends = np.array([5000, 5003], np.int32)
    cols = [jnp.asarray(np.array([3.25, -7.5], np.float32))]
    packed = pack_interval_columns(jnp.asarray(offsets), jnp.asarray(ends),
                                   cols, wchunk=128)
    out = np.asarray(expand_intervals(packed, jnp.asarray(offsets), 5003,
                                      rblk=256, wchunk=128))
    assert np.all(out[VALS_ROW, :5000] == 3.25)
    assert np.all(out[VALS_ROW, 5000:5003] == -7.5)
