"""Microbenchmarks for the data-movement primitives that bound the hot path.

The rasterizer's cost outside the compositing kernels is dominated by a few
primitive shapes (measured round 1: random row gather/scatter ~13 ns/row,
lax.sort ~1.4 ns/row for key+payload, axis-0 cumsum over [B, k] poorly laid
out). This file measures the candidate replacements so kernel-architecture
decisions are data-driven:

  - random gather [AB] rows from [N, 9]   (current fwd pair gather)
  - monotone (repeat-style) gather        (depth-order expansion)
  - scatter-add [AB, 9] -> [N, 9]         (current bwd pair-grad reduction)
  - lax.sort with 1 / 4 / 9 payloads      (sort-carries-attributes option)
  - [B, k] axis-0 cumsum vs 2-level reshaped scan

MEASUREMENT CAVEAT (learned the hard way, round 2): through the axon TPU
tunnel, (a) a host sync (float()/np.asarray) costs ~38 ms round-trip, and
(b) ``block_until_ready`` on the last of several identical queued calls can
return without reflecting their device time. Single-op timings below are
therefore only trustworthy on a locally-attached device. For tunnel
benchmarking, chain K *dependent* copies of the op inside ONE jit (with the
full output feeding the next copy — consuming one element lets XLA rewrite
e.g. sort+slice into argmin) and report the marginal cost (T(K)-T(1))/(K-1).
Validated marginal numbers on the v5e (2026-08, 2.6M rows):
random row gather ~10.3 ns/row; scatter-add ~10 ns/row; the ~12 ns/row wall
applies to every data-reordering primitive.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 262_144
AB = 2_621_440  # ~10 pairs/gaussian


def bench(name, fn, *args, iters=10):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N + 1, 9)).astype(np.float32))
    idx_rand = jnp.asarray(rng.integers(0, N, size=AB).astype(np.int32))
    idx_mono = jnp.asarray(np.sort(rng.integers(0, N, size=AB)).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(AB, 9)).astype(np.float32))
    keys = jnp.asarray(rng.integers(0, 1 << 20, size=AB).astype(np.int32))

    print(f"N={N}, AB={AB}")
    d = bench("gather rand [AB]<-[N,9]", lambda t, i: t[i], table, idx_rand)
    print(f"    = {d/AB*1e9:.2f} ns/row")
    d = bench("gather monotone [AB]<-[N,9]", lambda t, i: t[i], table, idx_mono)
    print(f"    = {d/AB*1e9:.2f} ns/row")
    d = bench("gather rand width 1", lambda t, i: t[i], table[:, :1], idx_rand)
    print(f"    = {d/AB*1e9:.2f} ns/row")
    d = bench("gather rand, lane-major [9,N] take ax1",
              lambda t, i: jnp.take(t, i, axis=1), table.T, idx_rand)
    print(f"    = {d/AB*1e9:.2f} ns/row")

    d = bench("scatter-add [AB,9]->[N,9] rand",
              lambda t, i, r: jnp.zeros_like(t).at[i].add(r), table, idx_rand,
              rows)
    print(f"    = {d/AB*1e9:.2f} ns/row")
    d = bench("scatter-add [AB,9]->[N,9] mono",
              lambda t, i, r: jnp.zeros_like(t).at[i].add(r), table, idx_mono,
              rows)
    print(f"    = {d/AB*1e9:.2f} ns/row")
    d = bench("segment_sum [AB,9]->[N] mono",
              lambda i, r: jax.ops.segment_sum(r, i, num_segments=N + 1),
              idx_mono, rows)
    print(f"    = {d/AB*1e9:.2f} ns/row")

    for npay in (1, 2, 4, 9):
        pays = tuple(rows[:, i] for i in range(npay))
        d = bench(f"lax.sort key+{npay} f32 payloads [AB]",
                  lambda k, *p: jax.lax.sort((k,) + p, num_keys=1,
                                             is_stable=True), keys, *pays)
        print(f"    = {d/AB*1e9:.2f} ns/row")

    ints = jnp.asarray(rng.integers(0, 100, size=(AB, 5)).astype(np.int32))

    d = bench("cumsum [AB,5] axis0 (naive)",
              lambda x: jnp.cumsum(x, axis=0), ints)

    def cum2(x):
        # 2-level scan: [AB,5] -> [AB//128, 128, 5]
        bo = x.shape[0] // 128
        x2 = x.reshape(bo, 128, 5)
        within = jnp.cumsum(x2, axis=1)
        carries = jnp.cumsum(within[:, -1, :], axis=0)  # [bo,5]
        out = within + (carries - within[:, -1, :])[:, None, :]
        return out.reshape(-1, 5)

    x = jax.jit(cum2)(ints)
    assert jnp.array_equal(x, jnp.cumsum(ints, axis=0)), "cum2 wrong"
    d = bench("cumsum [AB,5] 2-level reshape", cum2, ints)

    f32s = rows[:, :1]
    d = bench("cumsum [AB,1] f32 naive", lambda x: jnp.cumsum(x, axis=0), f32s)

    # argsort vs sort-with-iota
    depths = jnp.asarray(rng.normal(size=N).astype(np.float32))
    d = bench("argsort [N] f32", lambda x: jnp.argsort(x), depths)


if __name__ == "__main__":
    main()
