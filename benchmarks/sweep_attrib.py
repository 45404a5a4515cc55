"""Staged attribution sweep for the kernel formulation knobs (on hardware).

Runs the fwd+bwd bench leg (bench.py's machinery) across the variants the
round-3 default flip shipped unmeasured: legacy-VPU vs MXU defaults, each
knob off singly, scan-precision, chunk size, kernel mode, and the tile-size
ladder from PERF_NOTES.md §"Round-4 floors". Each variant retraces with the
requested rasterize_pallas globals; results print as one JSON line per
variant plus a final summary table (also appended to a --out file so a
dropped tunnel mid-sweep loses nothing).

Usage:
    python benchmarks/sweep_attrib.py [--iters 10] [--heavy] [--only a,b,c]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402  (reuses make_scene/timed_chain/bench_fwd_bwd)
from gs_tpu.ops import rasterize_pallas as rp  # noqa: E402


def variants():
    """(name, rp-global overrides, cfg overrides) — order = measurement order."""
    V = []
    base = dict(SCAN_MXU=True, POWER_MXU=True, MOMENT_MXU=True,
                _SCAN_PREC="highest", _MOMENT_PREC="high", _DOT_PREC="high",
                KERNEL_MODE="chunk", SUF_MXU=False)
    def v(name, rpo=None, cfgo=None):
        d = dict(base)
        d.update(rpo or {})
        V.append((name, d, cfgo or {}))
    v("default")
    v("vpu-legacy", dict(SCAN_MXU=False, POWER_MXU=False, MOMENT_MXU=False,
                         _DOT_PREC="highest"))
    v("scan_off", dict(SCAN_MXU=False))
    v("power_off", dict(POWER_MXU=False))
    v("moment_off", dict(MOMENT_MXU=False))
    v("dot_highest", dict(_DOT_PREC="highest"))
    v("sphigh", dict(_SCAN_PREC="high"))
    v("chunk32", cfgo=dict(chunk=32))
    v("chunk128", cfgo=dict(chunk=128))
    v("sphigh-c32", dict(_SCAN_PREC="high"), dict(chunk=32))
    v("tilegrid", dict(KERNEL_MODE="tile"))
    v("t64x32", cfgo=dict(tile_w=64, tile_h=32))
    v("t64x64", cfgo=dict(tile_w=64, tile_h=64))
    v("t96x64-c32", cfgo=dict(tile_w=96, tile_h=64, chunk=32))
    v("t128x64-c32", cfgo=dict(tile_w=128, tile_h=64, chunk=32))
    v("sphigh-t64x32", dict(_SCAN_PREC="high"), dict(tile_w=64, tile_h=32))
    # phase 2 (hardware session 2026-08-19): the all-MXU defaults measured
    # 30% SLOWER than vpu-legacy, but dot_prec=high beat highest by ~5 ms —
    # probe the legacy-VPU formulation with just the dot knob, then its
    # chunk/tile/kernel-mode neighborhood, and single-MXU-knob-on combos.
    legacy = dict(SCAN_MXU=False, POWER_MXU=False, MOMENT_MXU=False,
                  _DOT_PREC="highest")
    ldh = dict(legacy, _DOT_PREC="high")
    v("legacy-dh", ldh)
    v("legacy-dh-c32", ldh, dict(chunk=32))
    v("legacy-dh-c128", ldh, dict(chunk=128))
    v("legacy-dh-t64x32", ldh, dict(tile_w=64, tile_h=32))
    v("legacy-dh-t64x64", ldh, dict(tile_w=64, tile_h=64))
    v("legacy-dh-t32x32", ldh, dict(tile_w=32, tile_h=32))
    v("legacy-dh-tile", dict(ldh, KERNEL_MODE="tile"))
    v("legacy-dh+power", dict(ldh, POWER_MXU=True))
    v("legacy-dh+scanhigh", dict(ldh, SCAN_MXU=True, _SCAN_PREC="high"))
    v("legacy-dh+moment", dict(ldh, MOMENT_MXU=True, _MOMENT_PREC="high"))
    # phase 3: gradient-reduction A/B at the phase-2 winner (keys prefixed
    # RT_ set rasterize_tiled globals — see apply_globals)
    v("legacy-dh-segsum", dict(ldh, RT_GRAD_REDUCE="segsum"))
    # phase 4 (round 5): pairmove windowed one-hot MXU segment-reduce — the
    # sort+pallas-reduce replacement for the [AB,9]->[N,9] scatter-add
    v("legacy-dh-plred", dict(ldh, RT_GRAD_REDUCE="pallas"))
    # phase 5 (round 5): gather-free carry pipeline (attrs ride the binning
    # sorts + interval-expand kernel; kills the pair gather AND the binning
    # delta scatters) x the three gradient reductions, plus the expand
    # kernel alone under the gather path
    v("legacy-dh-carry", dict(ldh, RT_PAIR_SOURCE="carry"))
    v("legacy-dh-carry-seg", dict(ldh, RT_PAIR_SOURCE="carry",
                                  RT_GRAD_REDUCE="segsum"))
    v("legacy-dh-carry-pl", dict(ldh, RT_PAIR_SOURCE="carry",
                                 RT_GRAD_REDUCE="pallas"))
    v("legacy-dh-binexp", dict(ldh, BIN_EXPAND="pallas"))
    # carry at smaller tiles: the pair-count growth that used to kill small
    # tiles now costs only sort rows, while kernel pixel-pair work shrinks
    v("legacy-dh-carry-t32", dict(ldh, RT_PAIR_SOURCE="carry"),
      dict(tile_w=32, tile_h=32))
    v("legacy-dh-carry-t32x16", dict(ldh, RT_PAIR_SOURCE="carry"),
      dict(tile_w=32, tile_h=16))
    v("legacy-dh-carry-t32-tile", dict(ldh, RT_PAIR_SOURCE="carry",
                                       KERNEL_MODE="tile"),
      dict(tile_w=32, tile_h=32))
    v("legacy-dh-carry-t16", dict(ldh, RT_PAIR_SOURCE="carry"),
      dict(tile_w=16, tile_h=16))
    v("legacy-dh-carry-t16-tile", dict(ldh, RT_PAIR_SOURCE="carry",
                                       KERNEL_MODE="tile"),
      dict(tile_w=16, tile_h=16))
    # phase 6: the backward suffix sum alone as a 2-pass exact-mask MXU
    # tri contraction (no transcendentals — unlike the full SCAN_MXU flip)
    v("legacy-dh-sufmxu", dict(ldh, SUF_MXU=True))
    v("legacy-dh-carry-sufmxu", dict(ldh, SUF_MXU=True,
                                     RT_PAIR_SOURCE="carry"))
    return V


def apply_rt(d):
    from gs_tpu.ops import binning
    from gs_tpu.ops import rasterize_tiled as rt

    for k, val in d.items():
        if k.startswith("RT_"):
            setattr(rt, k[3:], val)
        elif k == "BIN_EXPAND":
            binning.EXPAND_IMPL = val


def apply_globals(d):
    for k, val in d.items():
        if k.startswith("RT_") or k == "BIN_EXPAND":
            continue  # rasterize_tiled / binning globals, see apply_rt
        setattr(rp, k, val)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--heavy", action="store_true",
                    help="also run each variant on the hostile 1M scene")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant names to run")
    ap.add_argument("--out", type=str, default="/tmp/sweep_attrib.jsonl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    platform = jax.devices()[0].platform
    print(f"# platform: {platform}", flush=True)

    state, cam = bench.make_scene(bench.N_GAUSS, heavy=False)
    target = jnp.zeros((3, bench.H, bench.W), jnp.float32)
    scenes = [("", state, cam)]
    if args.heavy:
        hstate, hcam = bench.make_scene(bench.N_HEAVY, heavy=True)
        scenes.append(("heavy:", hstate, hcam))

    tiny = jax.jit(lambda i, prev: prev * 0.5 + i)
    rtt = bench.timed_chain(lambda i, prev: tiny(i, prev), iters=20)
    print(f"# tunnel rtt: {rtt*1e3:.2f} ms", flush=True)

    from gs_tpu.config import RasterizeConfig
    only = set(args.only.split(",")) if args.only else None
    snap = {k: getattr(rp, k) for k in
            ("SCAN_MXU", "POWER_MXU", "MOMENT_MXU", "_SCAN_PREC",
             "_MOMENT_PREC", "_DOT_PREC", "KERNEL_MODE", "SUF_MXU")}
    from gs_tpu.ops import rasterize_tiled as rt
    from gs_tpu.ops import binning as _binning
    rt_snap = {"RT_GRAD_REDUCE": rt.GRAD_REDUCE,
               "RT_PAIR_SOURCE": rt.PAIR_SOURCE,
               "BIN_EXPAND": _binning.EXPAND_IMPL}
    rows = []
    try:
        for name, rpo, cfgo in variants():
            if only and name not in only:
                continue
            apply_globals(rpo)
            apply_rt({**rt_snap, **rpo})
            base_cfg = RasterizeConfig(
                backend="pallas", chunk=cfgo.get("chunk", bench.CHUNK),
                tile_w=cfgo.get("tile_w", bench.TILE_W),
                tile_h=cfgo.get("tile_h", bench.TILE_H),
                pair_budget_factor=1.0)
            for pfx, st, cm in scenes:
                n = bench.N_HEAVY if pfx else bench.N_GAUSS
                t0 = time.perf_counter()
                cfg, pairs = bench.grown_cfg(st, cm, base_cfg, n)
                dt = bench.bench_fwd_bwd(st, cm, cfg, target, rtt,
                                         iters=args.iters)
                row = {"variant": pfx + name, "ms": round(dt * 1e3, 2),
                       "mpx_per_s": round(bench.H * bench.W / dt / 1e6, 2),
                       "pairs": pairs,
                       "compile_plus_run_s": round(time.perf_counter() - t0, 1)}
                rows.append(row)
                line = json.dumps(row)
                print(line, flush=True)
                with open(args.out, "a") as f:
                    f.write(line + "\n")
    finally:
        apply_globals(snap)
        apply_rt(rt_snap)

    print("\n# variant                 ms      Mpx/s   pairs")
    for r in sorted(rows, key=lambda r: r["ms"]):
        print(f"# {r['variant']:<22} {r['ms']:>7.2f} {r['mpx_per_s']:>7.2f}"
              f"   {r['pairs']}")


if __name__ == "__main__":
    main()
