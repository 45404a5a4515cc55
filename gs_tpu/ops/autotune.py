"""Startup kernel-formulation autotune: measure, don't guess.

The Pallas compositing kernels ship two formulation families (MXU
contractions vs legacy VPU scans — ``rasterize_pallas.SCAN_MXU`` et al.)
and two kernel modes (chunk-grid BlockSpec pipelining vs tile-grid manual
DMA — ``rasterize_pallas.KERNEL_MODE``). Which wins depends on the scene
shape (chunk size, pairs-per-splat, tile occupancy); round 3 shipped a
default flipped on analysis alone while the dev TPU was unreachable. This
module removes that class of risk: at training start, time each candidate
on the REAL scene for a few steps and set the module globals to the
winner. Cost: one extra jit compile per non-default candidate (~1 min on
TPU, amortized over a 30k-iteration run); skipped entirely off-TPU or for
non-Pallas backends.

No reference analog (the CUDA rasterizer has one formulation); this is
the TPU-native answer to "defaults regress on some shapes".
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

# (name, mxu_formulation, kernel_mode) — the same candidate set bench.py
# A/Bs for its headline
CANDIDATES = (
    ("mxu-chunk", True, "chunk"),
    ("vpu-chunk", False, "chunk"),
    ("mxu-tile", True, "tile"),
)


def _default_timer(state, camera, raster_cfg, steps: int) -> float:
    """Median-free chained timing of fwd+bwd at the real scene shape.

    Chained dependent dispatches (each step consumes the previous loss) so
    the measurement is robust to the dev tunnel's ~38 ms host-sync RTT;
    returns seconds/step including neither compile nor the first warmup
    step.
    """
    from gs_tpu.renderer import render
    from gs_tpu.utils import losses

    target = jnp.zeros((3, camera.height, camera.width), jnp.float32)

    @jax.jit
    def fwd_bwd(state, prev):
        bg = jnp.zeros((3,), jnp.float32) + 1e-30 * prev

        def loss_fn(params):
            out = render(camera, state.with_params(params),
                         active_sh_degree=state.max_sh_degree,
                         bg_color=bg, cfg=raster_cfg)
            return losses.l1_loss(out.image, target)

        loss, grads = jax.value_and_grad(loss_fn)(state.params())
        return loss + 1e-30 * sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    s = fwd_bwd(state, jnp.float32(0.0))
    float(s)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        s = fwd_bwd(state, s)
    float(s)
    return (time.perf_counter() - t0) / steps


def autotune_formulation(
    state,
    camera,
    raster_cfg,
    *,
    steps: int = 3,
    timer: Callable | None = None,
    force: bool = False,
    tune_chunk: bool = True,
    tune_movement: bool = True,
    log: Callable[[str], None] = print,
) -> dict | None:
    """Time each kernel candidate at the real scene shape; keep the winner.

    Phase 1 picks the formulation (MXU/VPU x chunk-grid/tile-grid); phase 2
    sweeps the chunk size {32, 128} around the configured one on the
    winning formulation (SCAN_MXU's triangular contraction grows with the
    chunk, so the optimum moves with the formulation). Sets the
    ``rasterize_pallas`` globals to the fastest candidate (they are
    consumed at trace time, so the training step built afterwards picks
    them up) and returns ``{candidate: seconds}`` plus ``"winner"`` and
    ``"cfg"`` (the raster config to train with — differs from the input
    only in ``chunk``). Returns None when skipped (non-Pallas backend, or
    not on a real TPU — interpret-mode timings are meaningless).

    ``timer``/``force`` exist for the plumbing test: inject a fake timer
    and bypass the backend gate.
    """
    import dataclasses

    from gs_tpu.ops import rasterize_pallas as rp
    from gs_tpu.ops.rasterize_tiled import resolve_backend

    if not force:
        if resolve_backend(raster_cfg.backend) != "pallas":
            return None
        if jax.default_backend() != "tpu":
            return None
    timer = timer or _default_timer

    snap = rp.get_formulation()
    snap_mode = rp.KERNEL_MODE

    def try_time(name, ccfg):
        """Time one candidate; a compile/run failure disqualifies it only.

        A candidate that fails to compile on some scene shape must not
        kill a 30k-iteration run at startup (VERDICT r4 item 4): record it
        as +inf (never the winner), warn, and keep probing the rest.
        """
        try:
            return timer(state, camera, ccfg, steps)
        except Exception as e:  # noqa: BLE001 — any candidate failure
            log(f"[autotune] candidate {name} failed ({type(e).__name__}: "
                f"{e}); skipping it")
            return float("inf")

    results: dict = {}
    for name, mxu, mode in CANDIDATES:
        rp.set_formulation(mxu)
        rp.KERNEL_MODE = mode
        results[name] = try_time(name, raster_cfg)
    winner = min(results, key=results.get)
    if results[winner] == float("inf"):
        # every candidate failed — restore the configured formulation and
        # train with it rather than dying at startup
        rp.apply_formulation(snap)
        rp.KERNEL_MODE = snap_mode
        log("[autotune] every candidate failed; keeping the configured "
            "formulation")
        return None
    _, mxu, mode = next(c for c in CANDIDATES if c[0] == winner)
    rp.set_formulation(mxu)
    rp.KERNEL_MODE = mode
    best_cfg = raster_cfg
    # phase 1.5: scan-contraction precision on an MXU winner. _tri_dot
    # "high" is the same triangular matmul in 2 exact-mask bf16 passes
    # instead of HIGHEST's 6-pass fp32 emulation (x-split error ~2^-17,
    # far inside training tolerances; parity combo in
    # tests/test_pallas_variants.py) — 3 tri contractions per fwd+bwd
    # make this one of the larger single knobs.
    if mxu and rp._SCAN_PREC == "highest":
        rp._SCAN_PREC = "high"
        name = f"{winner}-sphigh"
        results[name] = try_time(name, raster_cfg)
        if results[name] < results[winner]:
            winner = name
        else:
            rp._SCAN_PREC = "highest"
    # phase 1.6: standalone MXU suffix sum on a VPU winner (SCAN_MXU
    # already contracts it on an MXU winner — see rasterize_pallas.SUF_MXU);
    # gated with tune_movement (the round-5 add-on probes)
    if tune_movement and not mxu and not rp.SUF_MXU:
        rp.SUF_MXU = True
        name = f"{winner}-suf"
        results[name] = try_time(name, raster_cfg)
        if results[name] < results[winner]:
            winner = name
        else:
            rp.SUF_MXU = False
    if tune_chunk:
        for chunk in (32, 128):
            if chunk == raster_cfg.chunk:
                continue
            ccfg = dataclasses.replace(raster_cfg, chunk=chunk)
            name = f"{winner}-c{chunk}"
            results[name] = try_time(name, ccfg)
            if results[name] < results[winner]:
                winner, best_cfg = name, ccfg
    if tune_movement:
        # phase 3 (round 5): pair-movement pipeline. The carry path (attrs
        # through the binning sorts + interval-expand kernel, sorted
        # segment-reduce backward — rasterize_tiled.PAIR_SOURCE) removes
        # the pair gather and binning scatters; which side wins depends on
        # scene shape, so measure at the winner formulation/chunk.
        from gs_tpu.ops import rasterize_tiled as rt

        other = "carry" if rt.PAIR_SOURCE == "gather" else "gather"
        snap_src = rt.PAIR_SOURCE
        rt.PAIR_SOURCE = other
        name = f"{winner}+{other}"
        results[name] = try_time(name, best_cfg)
        if results[name] < results[winner]:
            winner = name
        else:
            rt.PAIR_SOURCE = snap_src
    results["winner"] = winner
    results["cfg"] = best_cfg
    log("[autotune] kernel formulation: "
        + ", ".join(f"{k}={v * 1e3:.1f}ms" for k, v in results.items()
                    if k not in ("winner", "cfg"))
        + f" -> {winner}")
    return results
