"""Hardware component costs for the pair-movement pipeline (round 5).

The round-4 floor analysis (PERF_NOTES.md) puts ~28 ms of the 67.6 ms
fwd+bwd step in XLA per-pair data movement at measured per-row floors
(scatter-add 11.3, binning scatters 6.9, gather 4.5, sorts 2.8). The round-5
plan replaces those stages with sort + Pallas windowed one-hot-MXU kernels;
this bench measures each candidate component at the REAL bench shape
(B pairs, N gaussians from bench.py's scene) so the design is sized by
hardware numbers, not estimates.

Chained dependent dispatches (timed_chain) per the round-2 tunnel caveat.

Usage: python benchmarks/micro_reduce.py [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

N = 262_144
B = 762_475  # bench-shape pair count (round 4)


def timed_chain(fn, iters, rtt):
    s = fn(jnp.float32(0.0))
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    jax.block_until_ready(s)
    return max((time.perf_counter() - t0) / iters - rtt, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="",
                    help="substring filter over bench names (compiles are "
                         "minutes each on the 1-core box — skip the rest)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # pair ids with a realistic segment profile (~2.9 pairs/gaussian)
    ids = np.sort(rng.integers(0, N, size=B)).astype(np.int32)
    ids_unsorted = rng.permutation(ids).astype(np.int32)
    grads = jnp.asarray(rng.normal(size=(B, 9)).astype(np.float32))
    ids_s = jnp.asarray(ids)
    ids_u = jnp.asarray(ids_unsorted)
    counts = jnp.zeros((N,), jnp.int32).at[ids_s].add(1)
    seg_cum = jnp.cumsum(counts).astype(jnp.int32)

    rtt_fn = jax.jit(lambda p: p * 0.5 + 1.0)
    rtt = timed_chain(lambda p: rtt_fn(p), 20, 0.0)
    print(f"rtt {rtt*1e3:.2f} ms   (B={B}, N={N})")

    def bench(name, fn):
        if args.only and args.only not in name:
            return None
        dt = timed_chain(fn, args.iters, rtt)
        print(f"{name:52s} {dt*1e3:8.2f} ms   {dt/B*1e9:6.2f} ns/pair-row",
              flush=True)
        return dt

    # 1. current: XLA scatter-add [B,9] -> [N,9], unsorted ids
    def scatter(p):
        g = grads + p
        out = jnp.zeros((N, 9), jnp.float32).at[ids_u].add(g)
        return out[0, 0] + jnp.float32(0.0) * out.sum()

    bench("scatter-add [B,9]->[N,9] (unsorted ids)", jax.jit(scatter))

    # 2. sort cost: key + k payloads at B rows
    for k in (1, 9, 10, 12):
        def srt(p, k=k):
            cols = tuple(grads[:, i % 9] + p for i in range(k))
            out = jax.lax.sort((ids_u,) + cols, num_keys=1, is_stable=False)
            return out[1][0] + 0.0 * sum(o.sum() for o in out[1:])

        bench(f"lax.sort key+{k} f32 payloads [B] (unstable)", jax.jit(srt))

    def srt_stable(p):
        cols = tuple(grads[:, i] + p for i in range(9))
        out = jax.lax.sort((ids_u,) + cols, num_keys=1, is_stable=True)
        return out[1][0] + 0.0 * sum(o.sum() for o in out[1:])

    bench("lax.sort key+9 f32 payloads [B] (stable)", jax.jit(srt_stable))

    # 3. existing segsum components: blocked-MXU cumsum + boundary gather
    from gs_tpu.ops.rasterize_tiled import _cumsum_rows_mxu

    def cs(p):
        out = _cumsum_rows_mxu(grads + p)
        return out[0, 0] + 0.0 * out.sum()

    bench("_cumsum_rows_mxu [B,9]", jax.jit(cs))

    def bg(p):
        csum = grads + p  # stand-in, same shape
        idx = jnp.clip(seg_cum - 1, 0, B - 1)
        at_end = jnp.where((seg_cum > 0)[:, None], csum[idx], 0.0)
        d = at_end - jnp.concatenate([jnp.zeros((1, 9), jnp.float32),
                                      at_end[:-1]])
        return d[0, 0] + 0.0 * d.sum()

    bench("boundary gather+diff [N rows from B,9]", jax.jit(bg))

    # 4. gather (fwd direction): [B,9] from [N+1,9]
    table = jnp.asarray(rng.normal(size=(N + 1, 9)).astype(np.float32))

    def gth(p):
        out = (table + p)[ids_u]
        return out[0, 0] + 0.0 * out.sum()

    bench("gather [B,9] <- [N+1,9] (unsorted ids)", jax.jit(gth))

    def gth_mono(p):
        out = (table + p)[ids_s]
        return out[0, 0] + 0.0 * out.sum()

    bench("gather [B,9] <- [N+1,9] (monotone ids)", jax.jit(gth_mono))

    # 5. Pallas windowed segment-reduce (if present)
    try:
        from gs_tpu.ops import pairmove
    except ImportError:
        print("pairmove kernels not present yet")
        return

    for w, r in ((512, 512), (256, 512), (512, 1024), (1024, 512),
                 (256, 1024), (1024, 1024)):
        def red(p, w=w, r=r):
            out = pairmove.segment_reduce_sorted(
                grads + p, ids_s, seg_cum, N, window=w, rows=r)
            return out[0, 0] + 0.0 * out.sum()

        bench(f"pallas segment_reduce W={w} R={r} (sorted ids)",
              jax.jit(red))

    def full(p):
        cols = tuple(grads[:, i] + p for i in range(9))
        s = jax.lax.sort((ids_u,) + cols, num_keys=1, is_stable=False)
        gs = jnp.stack(s[1:], axis=1)
        out = pairmove.segment_reduce_sorted(gs, s[0], seg_cum, N,
                                             window=512, rows=512)
        return out[0, 0] + 0.0 * out.sum()

    bench("FULL sort+pallas reduce (vs scatter-add above)", jax.jit(full))


if __name__ == "__main__":
    main()
