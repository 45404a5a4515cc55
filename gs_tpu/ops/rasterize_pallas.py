"""Pallas TPU compositing kernels (forward + hand-derived backward).

TPU-native core of the differentiable tile rasterizer (the role CUDA kernels
play in the reference's diff-gaussian-rasterization; SURVEY.md §2.2a steps
3-4). Same math as the XLA backend in rasterize_tiled.py, restated as a
single fused Pallas kernel each way:

  grid = one step per chunk of splat pairs; chunks of a tile are consecutive
  grid steps. Packed [S,9] splat blocks stream HBM->VMEM via BlockSpecs
  whose index maps read scalar-prefetched chunk->block tables (tile pair
  ranges are chunk-aligned by binning, so every block is full — no
  partial-chunk masking). The tile's color/transmittance/ncon accumulators
  live in the revisited output block in VMEM and flush to HBM once per tile.

  forward, per chunk:   the exponent quadratic and depth cumprod run as
  VPU log-step scans and the color accumulation rides the MXU at HIGH
  (the round-4 hardware-measured winner; the GS_TPU_*_MXU knobs below
  restate each block as an MXU contraction for A/B — measured slower at
  this shape, see the SCAN_MXU note); early-skip of whole chunks once
  every pixel's transmittance died.

  backward, per chunk (tiles walked in reverse chunk order via a second
  prefetched visit table): transmittance reconstructed by division from the
  running tail product, strict suffix-sums for dL/dalpha, per-pair [S,9]
  gradient blocks written straight to their slots (each block is owned by
  exactly one tile, so writes never race).

Residuals match the reference CUDA kernel's: final per-pixel transmittance
and the last-contributor index, nothing else.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gs_tpu.ops.rasterize_oracle import ALPHA_MAX, ALPHA_SKIP, T_EPS

_F32 = jnp.float32
_HI = jax.lax.Precision.HIGHEST
ATTR_W = 9

# transposed pair buffers pad ATTR_W=9 rows to a sublane-aligned 16 (Mosaic
# slices must be 8-row aligned); the 7 pad rows are never read
ATTR_WP = 16
# tile-grid kernels: chunks fetched per manual DMA superstep (bandwidth
# amortization; compute stays gated at single-chunk granularity)
DMA_SUBCHUNKS = int(os.environ.get("GS_TPU_PALLAS_DMA_CHUNKS", "4"))
# "chunk" = one grid step per chunk via BlockSpec pipelining (default —
# measured compute-bound, the pipeline overhead is negligible);
# "tile" = one grid step per tile w/ manual double-buffered DMA (A/B
# candidate: whole-tile early exit, no visit tables, needs 128-aligned
# binning)
KERNEL_MODE = os.environ.get("GS_TPU_PALLAS_KERNEL", "chunk")
# scan-to-MXU: restate the [S,P] depth scans (cumprod via log-domain
# cumsum, the backward's strict suffix sum) as triangular-matrix matmuls.
# The round-3 pass-count analysis argued the kernels are VPU-pass-bound and
# the contraction should win; the round-4 HARDWARE attribution sweep
# (benchmarks/sweep_attrib.py, v5e, 1080p/262k/762k-pair shape) measured the
# opposite for every contraction knob: all-MXU 90.5 ms vs all-VPU 69.3 ms
# fwd+bwd; scan alone +13.4 ms (HIGHEST) / +3 ms (bf16 "high"), power
# +13.4..28 ms, moment +1.5..4.5 ms. The S=64-row contractions pad to the
# 128-wide MXU and the fp32 emulation multiplies passes; Mosaic's VPU scans
# are simply better at this shape. Defaults are the measured winner
# ("legacy-dh": VPU scans + HIGH color dots); the knobs remain for A/B and
# for shapes where the trade could flip (bench.py re-probes each run).
SCAN_MXU = os.environ.get("GS_TPU_SCAN_MXU", "0") == "1"
# tri-matmul precision: the 0/1 mask operand is exact in bf16, so "high"
# (a 2-pass exact-mask split, see _tri_dot) only perturbs the x-operand
# split — ~1e-6 on the scan output.
# Note the tri contraction is S^2*P MACs per chunk of S pairs (grows with
# S per pair), the opposite of the log-step scans — SCAN_MXU pairs best
# with SMALLER chunks.
_SCAN_PREC = os.environ.get("GS_TPU_SCAN_PREC", "highest")
# power-to-MXU: the exponent quadratic evaluated as ONE [S,8]@[8,P]
# contraction of per-splat polynomial coefficients against a tile-local
# monomial basis, replacing ~11 [S,P] VPU passes. Recentred at the TILE
# CENTER the fp32 expansion error stays inside even the fp64-golden
# tolerances (tests/test_pallas_variants.py asserts it). Under this flag
# the reference's power>0 cull becomes min(power, 0): expansion noise at
# a splat's exact center must not exclude its peak pixel, and a true
# positive power only arises from an indefinite conic, which the +0.3
# dilation precludes. Round-4 hardware sweep: SLOWER (see SCAN_MXU note);
# default off.
POWER_MXU = os.environ.get("GS_TPU_POWER_MXU", "0") == "1"
# moment-to-MXU (backward): the five dx/dy moment reductions as one
# [S,P]@[P,8] contraction (_moment_grads). Round-3 note: measured 10%
# SLOWER at HIGHEST (6-pass fp32 emulation + padded-N output); retried
# at "high" (bf16x3, ~1e-6 contraction error) — still +1.5..4.5 ms slower
# on hardware (round-4 sweep), default off.
# Values: "0" off, "1" HIGHEST, "high" HIGH.
_MM = os.environ.get("GS_TPU_MOMENT_MXU", "0")
MOMENT_MXU = _MM != "0"
# "0" leaves the better-measured "high" in place so a set_formulation(True)
# A/B flip runs the mxu formulation at its best-known precision
_MOMENT_PREC = "highest" if _MM == "1" else "high"
# suffix-sum-to-MXU alone: the backward's strict suffix sum of w*b as ONE
# upper-triangular contraction (2 exact-mask bf16 passes at "high" — the
# 0/1 mask is bf16-exact, only the ~2^-17 hi/lo split of wb rounds),
# replacing ~12 VPU log-step passes. Separate from SCAN_MXU because the
# round-4 sweep could only flip BOTH scans together: the forward/backward
# cumPRODUCTS pay log1p+exp transcendentals in the MXU formulation (the
# suspected regression), while the suffix SUM is a plain tri-matmul with
# no transcendentals. Default off until measured (bench.py/sweep A/B).
SUF_MXU = os.environ.get("GS_TPU_SUF_MXU", "0") == "1"
# precision of the compositing color contractions (fwd color accumulate,
# backward bdot / d_rgb): fp32 on the MXU is emulated in bf16 passes —
# HIGHEST = 6, HIGH = 3 (~1e-6 contraction error; passes the fp64 golden
# bundle, asserted in tests/test_pallas_variants.py). The fwd dot's M=3
# pads to the full systolic dimension, so its cost is pure emulation-pass
# count — HIGH is the same op with strictly fewer passes, hence default.
_DOT_PREC = ("highest"
             if os.environ.get("GS_TPU_DOT_PREC", "high") == "highest"
             else "high")

# env-derived values captured at import so set_formulation can restore the
# exact requested configuration (not hardcoded defaults) after an A/B flip
_ENV_FORMULATION = dict(SCAN_MXU=SCAN_MXU, POWER_MXU=POWER_MXU,
                        MOMENT_MXU=MOMENT_MXU, _SCAN_PREC=_SCAN_PREC,
                        _MOMENT_PREC=_MOMENT_PREC, _DOT_PREC=_DOT_PREC)


def set_formulation(mxu: bool) -> None:
    """Switch the kernel formulation globals at runtime (A/B harnesses).

    The flags are consumed at TRACE time, so flipping them and building a
    fresh ``jax.jit`` retraces with the other formulation. Tests and
    benches only — training code should pick one via env and stay there
    (mixing formulations across a custom_vjp pair is still consistent,
    both are parity-exact, but invalidates perf attribution).

    ``mxu=True`` forces the three contraction gates on with the env-derived
    precisions captured at import (so a user's GS_TPU_*_PREC overrides
    survive an A/B round-trip); ``mxu=False`` is the VPU formulation (the
    round-4 measured winner and shipped default). The color-dot precision
    is NOT part of the A/B: the compositing dots ride the MXU under both
    formulations, so _DOT_PREC stays at its env-derived value either way.
    """
    global SCAN_MXU, POWER_MXU, MOMENT_MXU
    global _SCAN_PREC, _MOMENT_PREC, _DOT_PREC
    _DOT_PREC = _ENV_FORMULATION["_DOT_PREC"]
    if mxu:
        SCAN_MXU = POWER_MXU = MOMENT_MXU = True
        _SCAN_PREC = _ENV_FORMULATION["_SCAN_PREC"]
        _MOMENT_PREC = _ENV_FORMULATION["_MOMENT_PREC"]
    else:
        SCAN_MXU = POWER_MXU = MOMENT_MXU = False
        _SCAN_PREC = "highest"
        _MOMENT_PREC = "highest"


def get_formulation() -> dict:
    """Snapshot the live formulation globals (pair with apply_formulation)."""
    return dict(SCAN_MXU=SCAN_MXU, POWER_MXU=POWER_MXU,
                MOMENT_MXU=MOMENT_MXU, _SCAN_PREC=_SCAN_PREC,
                _MOMENT_PREC=_MOMENT_PREC, _DOT_PREC=_DOT_PREC,
                SUF_MXU=SUF_MXU)


def apply_formulation(snap: dict) -> None:
    """Restore a get_formulation() snapshot exactly (A/B harness restore)."""
    global SCAN_MXU, POWER_MXU, MOMENT_MXU
    global _SCAN_PREC, _MOMENT_PREC, _DOT_PREC, SUF_MXU
    SCAN_MXU = snap["SCAN_MXU"]
    POWER_MXU = snap["POWER_MXU"]
    MOMENT_MXU = snap["MOMENT_MXU"]
    _SCAN_PREC = snap["_SCAN_PREC"]
    _MOMENT_PREC = snap["_MOMENT_PREC"]
    _DOT_PREC = snap["_DOT_PREC"]
    SUF_MXU = snap.get("SUF_MXU", SUF_MXU)


def _interpret() -> bool:
    """Interpret-mode heuristic, overridable via GS_TPU_PALLAS_INTERPRET.

    Default: interpret unless running on a real TPU backend. The "0"
    override exists for AOT compile checks against a local TPU topology
    (jax.experimental.topologies): there jax.default_backend() is "cpu",
    which would silently lower the kernels as interpret-mode XLA while
    loops — compiling those proves nothing about Mosaic. Forcing "0" makes
    pallas_call emit the real tpu_custom_call so .compile() exercises the
    actual Mosaic kernel compiler.
    """
    force = os.environ.get("GS_TPU_PALLAS_INTERPRET")
    if force is not None:
        return force == "1"
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------------------
# in-kernel matmul precision (Mosaic-lowerable only)
# ----------------------------------------------------------------------------


def _bf16_split(x):
    """x (f32) -> (hi, lo) bf16 halves with x ~= hi + lo (~2^-17 relative)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(_F32)).astype(jnp.bfloat16)
    return hi, lo


def _mxu_dot(a, b, dims, prec):
    """dot_general at a Mosaic-lowerable precision.

    Mosaic's dot_general lowering accepts only DEFAULT (one native-bf16
    MXU pass) and HIGHEST (#tpu.contract_precision<fp32>, 6-pass fp32
    emulation); ``lax.Precision.HIGH`` raises NotImplementedError — found
    by an AOT Mosaic compile (round 3); interpret-mode tests can't see it.
    ``prec == "high"`` is therefore emulated by hand: bf16 hi/lo operand
    splits and three native-bf16 passes accumulated in f32 — the same
    ah@bh + ah@bl + al@bh decomposition XLA's HIGH uses (the dropped al@bl
    term is ~2^-34 relative). bf16 x bf16 products are exact in the f32
    accumulator, so the only error is the ~2^-17 operand-split rounding.
    """
    if prec == "highest":
        return jax.lax.dot_general(a, b, dims, precision=_HI,
                                   preferred_element_type=_F32)
    d = lambda x, y: jax.lax.dot_general(x, y, dims,
                                         preferred_element_type=_F32)
    ah, al = _bf16_split(a)
    bh, bl = _bf16_split(b)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


# ----------------------------------------------------------------------------
# in-kernel scan helpers (axis 0 = sublanes, static size -> unrolled log-steps)
# ----------------------------------------------------------------------------


def _shift_down(x, k, fill):
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _shift_up(x, k, fill):
    pad = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[k:], pad], axis=0)


def _cumprod_incl(x):
    """Inclusive cumprod along axis 0 (log-step shifted multiplies)."""
    s, k = x.shape[0], 1
    while k < s:
        x = x * _shift_down(x, k, 1.0)
        k *= 2
    return x


def _cumprod_excl(x):
    """Exclusive cumprod along axis 0: out[i] = prod_{j<i} x[j]."""
    return _cumprod_incl(_shift_down(x, 1, 1.0))


def _suffix_sum_strict(x):
    """Strict suffix sum along axis 0: out[i] = sum_{j>i} x[j]."""
    if SCAN_MXU:
        return _tri_dot(x, lower=False, strict=True)
    if SUF_MXU:
        # standalone MXU suffix sum at exact-mask bf16 (see SUF_MXU note)
        return _tri_dot(x, lower=False, strict=True, prec="high")
    x = _shift_up(x, 1, 0.0)
    s, k = x.shape[0], 1
    while k < s:
        x = x + _shift_up(x, k, 0.0)
        k *= 2
    return x


def _tri_dot(x, *, lower, strict, prec=None):
    """Prefix/suffix sum of x [S,P] along axis 0 as one [S,S]@[S,P] matmul.

    lower+strict=False -> inclusive cumsum; lower+strict -> exclusive;
    upper+strict -> strict suffix sum. The 0/1 triangular constant is built
    in-kernel from two iotas (4 tiny [S,S] vector ops, hoistable); HIGHEST
    precision keeps the contraction fp32-faithful. "high" exploits the
    mask being bf16-EXACT: two native-bf16 passes (mask @ x_hi + mask @
    x_lo) whose products are all exact in the f32 accumulator — the only
    error is the ~2^-17 hi/lo split of x, tighter than a generic HIGH.
    ``prec`` None reads the _SCAN_PREC global (SUF_MXU passes "high").
    """
    s = x.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    m = ((c < r) if strict else (c <= r)) if lower else \
        ((c > r) if strict else (c >= r))
    dims = (((1,), (0,)), ((), ()))
    if (prec or _SCAN_PREC) == "highest":
        return jax.lax.dot_general(
            m.astype(_F32), x, dims, precision=_HI,
            preferred_element_type=_F32,
        )
    mb = m.astype(jnp.bfloat16)
    xh, xl = _bf16_split(x)
    d = lambda y: jax.lax.dot_general(mb, y, dims,
                                      preferred_element_type=_F32)
    return d(xh) + d(xl)


def _cumprod_omb_any(alpha, incl, omb=None, *, strict):
    """Prefix product of omb = where(incl, 1-alpha, 1) along axis 0.

    MXU variant (SCAN_MXU): exp of a triangular-matmul cumsum of
    log1p(-alpha_masked) — log1p on the UNROUNDED -alpha keeps the small-
    alpha precision that forming 1-alpha first would discard, and masked
    rows contribute an exact 0.0 (prefixes stay exactly 1).

    ``omb`` may be omitted by callers that don't otherwise need it (the
    forward under SCAN_MXU): the legacy path builds it on demand, the MXU
    path never touches it — saving its two [S,P] passes.
    """
    if SCAN_MXU:
        la = jnp.log1p(jnp.where(incl, -alpha, 0.0))
        return jnp.exp(_tri_dot(la, lower=True, strict=strict))
    if omb is None:
        omb = jnp.where(incl, 1.0 - alpha, 1.0)
    return _cumprod_excl(omb) if strict else _cumprod_incl(omb)


def _chunk_alpha(attr, px, py):
    """alpha/power for one chunk: attr[S, ATTR_W] vs px/py[1,P].

    Also returns g_exp = exp(power) and au = opac * g_exp (the unclamped
    alpha): the backward chain needs both and recomputing either is a
    whole wasted [S,P] pass.
    """
    dx = attr[:, 0:1] - px
    dy = attr[:, 1:2] - py
    power = (
        -0.5 * (attr[:, 2:3] * dx * dx + attr[:, 4:5] * dy * dy)
        - attr[:, 3:4] * dx * dy
    )
    g_exp = jnp.exp(power)
    au = attr[:, 8:9] * g_exp
    alpha = jnp.minimum(ALPHA_MAX, au)
    return alpha, power, dx, dy, g_exp, au



def _chunk_alpha_mxu(attr, px, py):
    """(alpha, power) for one chunk via an [S,8]@[8,P] MXU contraction.

    power = -0.5(ca dx^2 + cc dy^2) - cb dx dy with dx = ddx - xl
    (ddx = mean_x - tile origin, xl the tile-local pixel coordinate)
    expands over the monomials (1, xl, yl, xl^2, xl yl, yl^2); the six
    coefficient columns are [S,1]-thin VPU ops. See POWER_MXU note.
    """
    s = attr.shape[0]
    p = px.shape[1]
    # recenter at the TILE CENTER (any shared constant is algebraically
    # exact; the center quarters the |xl^2| term magnitudes vs the origin,
    # and the fp32 cancellation error shrinks with them)
    x0 = 0.5 * (px[0:1, 0:1] + px[0:1, p - 1:p])
    y0 = 0.5 * (py[0:1, 0:1] + py[0:1, p - 1:p])
    xl = px - x0  # [1,P]
    yl = py - y0
    one = jnp.ones((1, p), _F32)
    zero = jnp.zeros((1, p), _F32)
    basis = jnp.concatenate(
        [one, xl, yl, xl * xl, xl * yl, yl * yl, zero, zero], axis=0)
    ddx = attr[:, 0:1] - x0
    ddy = attr[:, 1:2] - y0
    ca, cb, cc = attr[:, 2:3], attr[:, 3:4], attr[:, 4:5]
    coeffs = jnp.concatenate(
        [
            -0.5 * ca * ddx * ddx - 0.5 * cc * ddy * ddy - cb * ddx * ddy,
            ca * ddx + cb * ddy,
            cc * ddy + cb * ddx,
            jnp.broadcast_to(-0.5 * ca, (s, 1)),
            jnp.broadcast_to(-cb, (s, 1)),
            jnp.broadcast_to(-0.5 * cc, (s, 1)),
            jnp.zeros((s, 2), _F32),
        ],
        axis=1,
    )
    power = jnp.minimum(
        jax.lax.dot_general(
            coeffs, basis, (((1,), (0,)), ((), ())), precision=_HI,
            preferred_element_type=_F32,
        ),
        0.0,
    )
    g_exp = jnp.exp(power)
    au = attr[:, 8:9] * g_exp
    alpha = jnp.minimum(ALPHA_MAX, au)
    return alpha, g_exp, au


def _fwd_chunk_math(attr, px, py, t_in, died_in):
    """Shared forward-chunk compositing algebra (math of _forward_chunk).

    Pass-count-tuned (rounds 3-4); every rewrite below is value-EXACT
    (same products, same rounding) vs the naive formulation:
      * the per-pixel "died strictly before splat i" test rides the
        FIRST-stop row index (one masked min-reduce) instead of an
        exclusive [S,P] cumsum over stop flags (7 log-step passes);
      * t_before is t_after shifted down one row with a t_in fill
        (t_before_i = t_in * cp_{i-1} either way) — drops a shift+mul;
      * ``contrib = incl & (riota < fsp)``: rows before the first stop
        can't be stop rows (fsp is the min), the row at fsp is excluded
        by <, so the explicit ``~stop &`` term is redundant;
      * t_stop selects on riota == fsp alone (that row IS the first stop
        whenever one exists; when none does, died_now gates it off);
      * the last-contributor index reduces riota itself ([S,P] once) and
        adds the chunk's base offset on the [1,P] result — see callers.
      * omb is never materialized under SCAN_MXU (log-domain scan).

    Returns (w [S,P] blend weights, contrib mask, chunk_prod [1,P],
    t_stop [1,P], died_now [1,P], last_c [1,P] last contributing row
    index within the chunk, -1 where none).
    """
    s = attr.shape[0]
    if POWER_MXU:
        alpha, _, _ = _chunk_alpha_mxu(attr, px, py)
        incl = alpha >= ALPHA_SKIP  # power clamped <= 0 inside
    else:
        alpha, power, _, _, _, _ = _chunk_alpha(attr, px, py)
        incl = (alpha >= ALPHA_SKIP) & (power <= 0.0)
    cp = _cumprod_omb_any(alpha, incl, strict=False)
    t_after = t_in * cp
    t_before = jnp.concatenate([t_in, t_after[:-1]], axis=0)
    stop = incl & (t_after < T_EPS)
    riota = jax.lax.broadcasted_iota(jnp.int32, (s, alpha.shape[1]), 0)
    fsp = jnp.min(jnp.where(stop, riota, s), axis=0, keepdims=True)
    alive_in = died_in < 0.5
    contrib = incl & (riota < fsp) & alive_in
    w = jnp.where(contrib, alpha * t_before, 0.0)
    # T after the chunk without a second cumprod: a stopping pixel ends at
    # T BEFORE its first stop; otherwise T *= full chunk product. Pixels
    # dead on entry keep their T (caller's outer select).
    t_stop = jnp.max(jnp.where(riota == fsp, t_before, 0.0),
                     axis=0, keepdims=True)
    died_now = (fsp < s).astype(_F32)
    last_c = jnp.max(jnp.where(contrib, riota, -1), axis=0, keepdims=True)
    return w, contrib, cp[s - 1:s], t_stop, died_now, last_c


def _bwd_chunk_math(attr, px, py, base, ncon, gc, gt_term, trun, ssuf):
    """Shared reverse-chunk gradient algebra (math of _backward_chunk).

    Pass-count-tuned (rounds 3-4): the per-splat conic constants factor out
    of the pixel reductions (sum_P (ca*dx+cb*dy)*d_power = ca*sum(dx*d_power)
    + cb*sum(dy*d_power) since ca/cb are constant along P) — 5 multiply
    passes + 5 reductions instead of ~16 passes; the [S,P] transmittance
    division becomes a prefix-product multiply (one [1,P] division); factors
    that are already zero skip their selects; the chunk's wb total reuses
    the suffix sum's first row. Round 4: the contribution test compares the
    row iota against the [1,P] local threshold ncon - base instead of
    building pos = base + iota (drops an [S,P] int add — ``base`` is the
    chunk's first global pair index); d_power multiplies the unclamped
    alpha au = opac*g_exp against d_alpha directly (one pass instead of
    two; same chain — the reference also ignores the 0.99 cap here);
    dx/dy are only formed on the non-MOMENT path that consumes them.
    Bitwise output differs only in rounding order; same derivation.

    Returns ([7 gradient column blocks], new_trun [1,P], new_ssuf [1,P]).
    """
    s = attr.shape[0]
    if POWER_MXU:
        # the mask must reconstruct the forward's EXACT incl (same power
        # rounding), so the same MXU contraction
        alpha, g_exp, au = _chunk_alpha_mxu(attr, px, py)
        incl = alpha >= ALPHA_SKIP
        if not MOMENT_MXU:
            dx = attr[:, 0:1] - px
            dy = attr[:, 1:2] - py
    else:
        alpha, power, dx, dy, g_exp, au = _chunk_alpha(attr, px, py)
        incl = (alpha >= ALPHA_SKIP) & (power <= 0.0)
    riota = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 0)
    contrib = incl & (riota < ncon - base)
    omb = jnp.where(contrib, 1.0 - alpha, 1.0)

    pe = _cumprod_omb_any(alpha, contrib, omb, strict=True)  # prod_{j<i}
    chunk_prod = pe[s - 1:s] * omb[s - 1:s]
    t_in = trun / chunk_prod  # [1,P] transmittance entering the chunk
    t_before = t_in * pe
    w = jnp.where(contrib, alpha * t_before, 0.0)

    bdot = _mxu_dot(
        attr[:, 5:8], gc, (((1,), (0,)), ((), ())), _DOT_PREC,
    )  # [S,P]
    wb = w * bdot  # w is already 0 where ~contrib
    s_after = ssuf + _suffix_sum_strict(wb)
    d_alpha = jnp.where(
        contrib, t_before * bdot - (s_after + gt_term) / omb, 0.0)

    sum1 = lambda x: jnp.sum(x, axis=1, keepdims=True)
    d_power = au * d_alpha  # zeroed with d_alpha
    d_rgb = _mxu_dot(
        w, gc, (((1,), (1,)), ((), ())), _DOT_PREC,
    )  # [S,P] x [3,P] -> [S,3]
    if MOMENT_MXU:
        x0 = px[0:1, 0:1]
        y0 = py[0:1, 0:1]
        xl = px - x0
        yl = py - y0
        p = px.shape[1]
        basis = jnp.concatenate(
            [jnp.ones((1, p), _F32), xl, yl, xl * xl, xl * yl, yl * yl,
             jnp.zeros((2, p), _F32)], axis=0)
        gm = _moment_grads(attr, d_power, x0, y0, basis)
        grads = [gm[0], gm[1], gm[2], gm[3], gm[4], d_rgb, gm[5]]
    else:
        d_opac = sum1(g_exp * d_alpha)
        dxp = dx * d_power
        dyp = dy * d_power
        sx, sy = sum1(dxp), sum1(dyp)
        grads = [
            -(attr[:, 2:3] * sx + attr[:, 3:4] * sy),
            -(attr[:, 4:5] * sy + attr[:, 3:4] * sx),
            -0.5 * sum1(dx * dxp),
            -sum1(dy * dxp),
            -0.5 * sum1(dy * dyp),
            d_rgb,
            d_opac,
        ]
    new_ssuf = s_after[0:1] + wb[0:1]  # = ssuf + sum over the whole chunk
    return grads, t_in, new_ssuf


def _tile_basis(tile_w, tile_h, p):
    """[8, P] tile-local monomial basis (1, xl, yl, xl2, xl*yl, yl2, 0, 0)."""
    pcol = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    xl = (pcol % tile_w).astype(_F32)
    yl = (pcol // tile_w).astype(_F32)
    one = jnp.ones((1, p), _F32)
    zero = jnp.zeros((1, p), _F32)
    return jnp.concatenate(
        [one, xl, yl, xl * xl, xl * yl, yl * yl, zero, zero], axis=0)


def _moment_grads(attr, d_power, x0f, y0f, basis):
    """(d_mean_x, d_mean_y, d_conic a/b/c, d_opac) via ONE moment matmul.

    sum_P f(dx,dy)*d_power for f in {dx, dy, dx2, dxdy, dy2} decomposes over
    the fixed tile-local monomials (dx = ddx - xl with ddx = mean_x - tile
    origin), so five masked multiply + cross-lane-reduce passes collapse
    into a single MXU contraction M = d_power @ basis^T. d_opac falls out
    free as M0 / opacity (d_power = opac * g_exp * d_alpha). Accuracy: the
    recentred expansion cancels at ~eps*(ddx/dx)^2 — <= ~5e-4 relative on
    d_conic for 3-sigma-supported splats, well inside the 2e-3 gradient
    parity tolerances and far below training noise.
    """
    M = _mxu_dot(
        d_power, basis, (((1,), (1,)), ((), ())), _MOMENT_PREC,
    )  # [S, 8]
    M0, Mx, My = M[:, 0:1], M[:, 1:2], M[:, 2:3]
    Mxx, Mxy, Myy = M[:, 3:4], M[:, 4:5], M[:, 5:6]
    ddx = attr[:, 0:1] - x0f
    ddy = attr[:, 1:2] - y0f
    ca, cb, cc = attr[:, 2:3], attr[:, 3:4], attr[:, 4:5]
    Sx = ddx * M0 - Mx
    Sy = ddy * M0 - My
    Sxx = ddx * ddx * M0 - 2.0 * ddx * Mx + Mxx
    Sxy = ddx * ddy * M0 - ddx * My - ddy * Mx + Mxy
    Syy = ddy * ddy * M0 - 2.0 * ddy * My + Myy
    opac = attr[:, 8:9]
    d_opac = jnp.where(opac > 0.0, M0 / jnp.where(opac > 0.0, opac, 1.0), 0.0)
    return (-(ca * Sx + cb * Sy), -(cc * Sy + cb * Sx),
            -0.5 * Sxx, -Sxy, -0.5 * Syy, d_opac)


def _pixel_coords(tid, tiles_x, tile_w, tile_h, p):
    pcol = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    x0 = (tid % tiles_x) * tile_w
    y0 = (tid // tiles_x) * tile_h
    px = (x0 + pcol % tile_w).astype(_F32)
    py = (y0 + pcol // tile_w).astype(_F32)
    return px, py


# ----------------------------------------------------------------------------
# chunk visit tables (plain JAX, shared by fwd/bwd)
# ----------------------------------------------------------------------------


def _visit_tables(starts, ends, chunk, cap_chunks, reverse, dead_blk=None):
    """Per-grid-step (row, block) tables for chunked tile traversal.

    Tiles are visited in list order; within a tile, chunks run forward
    (``reverse=False``) or backward. Grid steps beyond the true total get
    row == M (dummy) and block == ``dead_blk`` (default: the extra dump
    slot cap_chunks; the forward pass uses 0 since its compute is gated
    and it never writes pair-indexed outputs — saving the dump-block pad).

    The step->row map is a monotone step function, so it's built with the
    scatter+cumsum idiom rather than ``searchsorted`` (which costs ~7 ms at
    this size on TPU, measured via trace round 2).
    """
    from gs_tpu.ops.binning import vec_cummax, vec_cumsum

    if dead_blk is None:
        dead_blk = cap_chunks
    ncks = (ends - starts) // chunk  # [M], ranges are chunk-aligned
    m = starts.shape[0]
    inc = vec_cumsum(ncks)
    offs = inc - ncks  # [M] exclusive
    total = inc[-1] if m > 0 else jnp.int32(0)

    j = jnp.arange(cap_chunks, dtype=jnp.int32)
    # row[j] = the (nonempty) row whose chunk range contains step j: scatter
    # each nonempty row's index at its first step, then a running max fills
    # the range (for live steps this equals searchsorted(offs, j, "right")-1,
    # which always lands on a nonempty row). vec_* scans keep these small
    # scalar-prefetch-feeding arrays on the VPU (see binning.vec_cumsum),
    # and the scatter itself runs in f32 — int scatters into these arrays
    # get an SMEM layout and a ~1.7 ms serial loop (trace round 2); exact
    # for values < 2^24
    buf = jnp.full((cap_chunks + 1,), -1.0, jnp.float32).at[
        jnp.where(ncks > 0, offs, cap_chunks)
    ].max(jnp.arange(m, dtype=jnp.float32), mode="drop")
    row = vec_cummax(buf[:cap_chunks]).astype(jnp.int32)
    row = jnp.clip(row, 0, max(m - 1, 0))
    k = j - offs[row]
    if reverse:
        k = ncks[row] - 1 - k
    blk = starts[row] // chunk + k
    live = j < total
    row = jnp.where(live, row, m).astype(jnp.int32)
    blk = jnp.where(live, blk, dead_blk).astype(jnp.int32)
    return row, blk


# ----------------------------------------------------------------------------
# tile-grid kernels: one grid step per tile, manual double-buffered DMA
# ----------------------------------------------------------------------------
#
# The chunk-grid kernels below pay a fixed per-grid-step cost (~1 µs: block
# index maps, pipeline bookkeeping, [S,9]-sized DMAs) on EVERY chunk — at
# ~10-40k chunks per frame that overhead rivals the actual VPU compute. The
# tile-grid formulation makes the grid one step per TILE: the kernel streams
# the tile's pair rows itself (double-buffered `make_async_copy` supersteps
# of DMA_SUBCHUNKS chunks — bandwidth-amortized loads, compute still gated
# per chunk), keeps the accumulators resident in the tile's output block,
# and early-exits the whole remaining range once every pixel's transmittance
# died. Binning stays chunk-aligned (no alignment padding growth), and no
# step->(row, block) visit tables are needed at all.


def _fwd_tile_kernel(starts_ref, ends_ref, tid_ref, attr_hbm,
                     color_ref, t_ref, ncon_ref,
                     abuf, died_ref, sem, *, st, kc):
    j = pl.program_id(0)
    s = st.chunk
    p = st.tile_w * st.tile_h
    sup = kc * s
    start = starts_ref[j]
    end = ends_ref[j]
    nsup = jax.lax.div(end - start + sup - 1, sup)

    color_ref[:] = jnp.zeros_like(color_ref)
    t_ref[:] = jnp.ones_like(t_ref)
    ncon_ref[:] = jnp.zeros_like(ncon_ref)
    died_ref[:] = jnp.zeros_like(died_ref)

    px, py = _pixel_coords(tid_ref[j], st.tiles_x, st.tile_w, st.tile_h, p)

    def dma(i):
        slot = jax.lax.rem(i, 2)
        # HBM refs of [B, 9] arrays get a lane-padded (1,128) tiling that
        # forbids row-sliced DMA; the buffer is stored TRANSPOSED [9, B]
        # (minor dim 128-aligned: binning aligns starts to 128) and small
        # per-chunk transposes restore the [S, 9] compute layout in VMEM.
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(pl.multiple_of(start + i * sup, 128), sup)],
            abuf.at[slot], sem.at[slot],
        )

    @pl.when(nsup > 0)
    def _():
        dma(jnp.int32(0)).start()

        def cond(c):
            i, alive = c
            return (i < nsup) & alive

        def body(c):
            i, _ = c

            @pl.when(i + 1 < nsup)
            def _():
                dma(i + 1).start()

            dma(i).wait()
            slot = jax.lax.rem(i, 2)
            for ci in range(kc):
                sub = start + i * sup + ci * s

                @pl.when((sub < end) & (jnp.min(died_ref[:]) < 0.5))
                def _(ci=ci, sub=sub, slot=slot):
                    attr = abuf[slot, :, ci * s:(ci + 1) * s].T
                    w, _, chunk_prod, t_stop, died_now, last_c = \
                        _fwd_chunk_math(attr, px, py, t_ref[0], died_ref[:])
                    color_ref[0] += _mxu_dot(
                        attr[:, 5:8], w, (((0,), (0,)), ((), ())), _DOT_PREC,
                    )
                    t_ref[0] = jnp.where(
                        died_ref[:] > 0.5, t_ref[0],
                        jnp.where(died_now > 0.5, t_stop,
                                  t_ref[0] * chunk_prod))
                    # last contributor: [1,P] arithmetic on the in-chunk row
                    # index (exactly max(where(contrib, pos+1, 0)))
                    ncon_ref[0] = jnp.maximum(
                        ncon_ref[0],
                        jnp.where(last_c >= 0, sub + 1 + last_c, 0),
                    )
                    died_ref[:] = jnp.maximum(died_ref[:], died_now)

            return i + 1, jnp.min(died_ref[:]) < 0.5

        i_f, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), True))

        # early exit leaves the prefetched superstep's DMA in flight
        @pl.when(i_f < nsup)
        def _():
            dma(i_f).wait()


def _dma_subchunks(s: int) -> int:
    """Chunks per DMA superstep; superstep length must be a 128-multiple
    (transposed-buffer column DMA alignment)."""
    kc = max(1, DMA_SUBCHUNKS)
    while (kc * s) % 128:
        kc *= 2
    return kc


def _composite_fwd_pallas_tile(st, sp_attr, tile_ids, starts, ends):
    s = st.chunk
    kc = _dma_subchunks(s)
    sup = kc * s
    p = st.tile_w * st.tile_h
    b = sp_attr.shape[0]
    assert b % s == 0, "pair buffer must be chunk-aligned"
    m = tile_ids.shape[0]
    # transposed [ATTR_W, B] buffer (see _fwd_tile_kernel dma note); the
    # last superstep's DMA may read up to sup-1 columns past a tile's range
    # end; pad so it never leaves the buffer (rows are compute-gated)
    attr_pad = jnp.zeros((ATTR_WP, b + sup), _F32).at[:ATTR_W, :b].set(
        sp_attr.T)

    kernel = functools.partial(_fwd_tile_kernel, st=st, kc=kc)
    out_row = lambda j, st_, en_, ti_: (j, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # starts, ends, tile_ids
        grid=(m,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, 3, p), out_row),
            pl.BlockSpec((1, 1, p), out_row),
            pl.BlockSpec((1, 1, p), out_row),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_WP, sup), _F32),  # double-buffered pair cols
            pltpu.VMEM((1, p), _F32),  # died mask
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    color, t_final, ncon = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, 3, p), _F32),
            jax.ShapeDtypeStruct((m, 1, p), _F32),
            jax.ShapeDtypeStruct((m, 1, p), jnp.int32),
        ],
        interpret=_interpret(),
    )(starts, ends, tile_ids, attr_pad)
    return color.transpose(0, 2, 1), t_final[:, 0], ncon[:, 0]


def _bwd_tile_kernel(starts_ref, ends_ref, tid_ref, attr_hbm,
                     gc_ref, gt_ref, tfin_ref, ncon_ref, dattr_hbm,
                     abuf, obuf, trun_ref, ssuf_ref, lsem, ssem, *, st, kc):
    """Reverse tile walk; math identical to _bwd_kernel / _backward_chunk.

    Stores: each superstep's [sup, ATTR_W] gradient block DMAs back to its
    own rows. A tile's topmost (partial) superstep may write zero rows a few
    chunks past its range — those rows belong to LATER tiles (contiguous
    layout, ascending grid order) which rewrite them, or to dead space the
    caller masks; all stores are drained before the grid step ends, so
    cross-step DMA ordering never races.
    """
    j = pl.program_id(0)
    s = st.chunk
    p = st.tile_w * st.tile_h
    sup = kc * s
    start = starts_ref[j]
    end = ends_ref[j]  # ncon-trimmed, multiple of s
    nsup = jax.lax.div(end - start + sup - 1, sup)

    trun_ref[:] = tfin_ref[0]
    ssuf_ref[:] = jnp.zeros_like(ssuf_ref)
    px, py = _pixel_coords(tid_ref[j], st.tiles_x, st.tile_w, st.tile_h, p)

    def ldma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            attr_hbm.at[:, pl.ds(pl.multiple_of(start + i * sup, 128), sup)],
            abuf.at[slot], lsem.at[slot],
        )

    def sdma(i):
        slot = jax.lax.rem(i, 2)
        return pltpu.make_async_copy(
            obuf.at[slot],
            dattr_hbm.at[:, pl.ds(pl.multiple_of(start + i * sup, 128), sup)],
            ssem.at[slot],
        )

    @pl.when(nsup > 0)
    def _():
        ldma(nsup - 1).start()

        def body(k, _):
            i = nsup - 1 - k  # reverse superstep order

            @pl.when(i - 1 >= 0)
            def _():
                ldma(i - 1).start()

            ldma(i).wait()
            slot = jax.lax.rem(i, 2)

            # this obuf slot's previous store (2 supersteps ago) must land
            # before we overwrite the buffer
            @pl.when(k >= 2)
            def _():
                sdma(i + 2).wait()

            obuf[slot] = jnp.zeros((ATTR_WP, sup), _F32)
            for ci in reversed(range(kc)):
                sub = start + i * sup + ci * s

                @pl.when(sub < end)
                def _(ci=ci, sub=sub, slot=slot):
                    attr = abuf[slot, :, ci * s:(ci + 1) * s].T
                    grads, new_trun, new_ssuf = _bwd_chunk_math(
                        attr, px, py, sub, ncon_ref[0], gc_ref[0], gt_ref[0],
                        trun_ref[:], ssuf_ref[:])
                    obuf[slot, :, ci * s:(ci + 1) * s] = jnp.concatenate(
                        grads + [jnp.zeros((s, ATTR_WP - 9), _F32)],
                        axis=1,
                    ).T
                    trun_ref[:] = new_trun
                    ssuf_ref[:] = new_ssuf

            sdma(i).start()
            return 0

        jax.lax.fori_loop(0, nsup, body, 0)

        # drain the (up to two) outstanding stores before the step ends
        @pl.when(nsup >= 2)
        def _():
            sdma(jnp.int32(1)).wait()

        sdma(jnp.int32(0)).wait()


def _composite_bwd_pallas_tile(st, residuals, cotangents):
    (sp_attr, tile_ids, starts, ends, t_final, ncon_all) = residuals
    g_color_all, g_t_all, _ = cotangents

    s = st.chunk
    kc = _dma_subchunks(s)
    sup = kc * s
    p = st.tile_w * st.tile_h
    b = sp_attr.shape[0]
    assert b % s == 0
    m = tile_ids.shape[0]

    attr_pad = jnp.zeros((ATTR_WP, b + sup), _F32).at[:ATTR_W, :b].set(
        sp_attr.T)
    gc = jnp.asarray(g_color_all).transpose(0, 2, 1)  # [M,3,P]
    gt = (jnp.asarray(g_t_all) * t_final)[:, None, :]  # tfin_term
    tf = t_final[:, None, :]
    nc = ncon_all[:, None, :]

    kernel = functools.partial(_bwd_tile_kernel, st=st, kc=kc)
    tile_row = lambda j, st_, en_, ti_: (j, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, p), tile_row),
            pl.BlockSpec((1, 1, p), tile_row),
            pl.BlockSpec((1, 1, p), tile_row),
            pl.BlockSpec((1, 1, p), tile_row),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, ATTR_WP, sup), _F32),  # load double buffer
            pltpu.VMEM((2, ATTR_WP, sup), _F32),  # store double buffer
            pltpu.VMEM((1, p), _F32),  # running tail transmittance
            pltpu.VMEM((1, p), _F32),  # suffix sum of w*b
            pltpu.SemaphoreType.DMA((2,)),  # load sems
            pltpu.SemaphoreType.DMA((2,)),  # store sems
        ],
    )
    d_attr_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ATTR_WP, b + sup), _F32)],
        interpret=_interpret(),
    )(starts, ends, tile_ids, attr_pad, gc, gt, tf, nc)[0]
    d_attr = d_attr_t[:ATTR_W, :b].T

    # rows past each tile's trimmed end (skipped supersteps) and rows owned
    # by no listed tile are never stored -> uninitialized; mask them off
    from gs_tpu.ops.binning import vec_cummax

    nchunks = b // s
    nonempty = ends > starts
    buf = jnp.full((nchunks + 1,), -1.0, jnp.float32).at[
        jnp.where(nonempty, starts // s, nchunks)
    ].max(jnp.arange(m, dtype=jnp.float32), mode="drop")
    owner = vec_cummax(buf[:nchunks]).astype(jnp.int32)
    owner_c = jnp.clip(owner, 0, max(m - 1, 0))
    chunk_pos = jnp.arange(nchunks, dtype=jnp.int32) * s
    covered = (owner >= 0) & nonempty[owner_c] & (chunk_pos < ends[owner_c])
    rmask = jnp.repeat(covered, s)[:, None]
    return (jnp.where(rmask, d_attr, 0.0), None, None, None)


# ----------------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------------


def _fwd_kernel(row_ref, blk_ref, tid_ref, attr_ref,
                color_ref, t_ref, ncon_ref, died_ref, *, st, m):
    j = pl.program_id(0)
    s = attr_ref.shape[0]
    p = st.tile_w * st.tile_h
    row = row_ref[j]
    first = jnp.where(j > 0, row_ref[jnp.maximum(j - 1, 0)] != row, True)

    @pl.when(first)
    def _():
        color_ref[:] = jnp.zeros_like(color_ref)
        t_ref[:] = jnp.ones_like(t_ref)
        ncon_ref[:] = jnp.zeros_like(ncon_ref)
        died_ref[:] = jnp.zeros_like(died_ref)

    live = row < m
    any_alive = jnp.min(died_ref[:]) < 0.5

    @pl.when(live & any_alive)
    def _():
        tid = tid_ref[jnp.minimum(row, m - 1)]
        px, py = _pixel_coords(tid, st.tiles_x, st.tile_w, st.tile_h, p)
        w, _, chunk_prod, t_stop, died_now, last_c = _fwd_chunk_math(
            attr_ref[:], px, py, t_ref[0], died_ref[:])
        color_ref[0] += _mxu_dot(
            attr_ref[:, 5:8], w, (((0,), (0,)), ((), ())), _DOT_PREC,
        )
        t_ref[0] = jnp.where(
            died_ref[:] > 0.5, t_ref[0],
            jnp.where(died_now > 0.5, t_stop, t_ref[0] * chunk_prod))
        # last contributor via [1,P] arithmetic on the in-chunk row index
        # (exactly max over contrib rows of global pos + 1, 0 when none)
        ncon_ref[0] = jnp.maximum(
            ncon_ref[0],
            jnp.where(last_c >= 0, blk_ref[j] * s + 1 + last_c, 0),
        )
        died_ref[:] = jnp.maximum(died_ref[:], died_now)


def _kernel_mode(st) -> str:
    """Per-call kernel mode (CompositeStatic.kernel_mode, global fallback)."""
    return getattr(st, "kernel_mode", None) or KERNEL_MODE


def composite_fwd_pallas(st, sp_attr, tile_ids, starts, ends):
    """Pallas forward. Returns (color [M,P,3], t_final [M,P], ncon [M,P])."""
    if _kernel_mode(st) == "tile":
        return _composite_fwd_pallas_tile(st, sp_attr, tile_ids, starts, ends)
    s = st.chunk
    p = st.tile_w * st.tile_h
    b = sp_attr.shape[0]
    assert b % s == 0, "pair buffer must be chunk-aligned"
    cap_chunks = b // s
    m = tile_ids.shape[0]

    # dead chunks read block 0 (their compute is @pl.when-gated) — no pad
    row, blk = _visit_tables(starts, ends, s, cap_chunks, reverse=False,
                             dead_blk=0)

    kernel = functools.partial(_fwd_kernel, st=st, m=m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # row, blk, tile_ids
        grid=(cap_chunks,),
        in_specs=[
            pl.BlockSpec((s, ATTR_W), lambda j, row, blk, tid: (blk[j], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda j, row, blk, tid: (row[j], 0, 0)),
            pl.BlockSpec((1, 1, p), lambda j, row, blk, tid: (row[j], 0, 0)),
            pl.BlockSpec((1, 1, p), lambda j, row, blk, tid: (row[j], 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((1, p), _F32)],  # died mask
    )
    color, t_final, ncon = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m + 1, 3, p), _F32),
            jax.ShapeDtypeStruct((m + 1, 1, p), _F32),
            jax.ShapeDtypeStruct((m + 1, 1, p), jnp.int32),
        ],
        interpret=_interpret(),
    )(row, blk, tile_ids, sp_attr)
    # tiles with zero chunks are never visited -> their output blocks are
    # uninitialized; give them the empty-tile result (color 0, T 1, ncon 0)
    visited = (ends > starts)[:, None]
    color = jnp.where(visited[..., None], color[:m], 0.0)
    t_final = jnp.where(visited, t_final[:m, 0], 1.0)
    ncon = jnp.where(visited, ncon[:m, 0], 0)
    return color.transpose(0, 2, 1), t_final, ncon


# ----------------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------------


def _bwd_kernel(row_ref, blk_ref, tid_ref, attr_ref,
                gc_ref, gt_ref, tfin_ref, ncon_ref,
                dattr_ref, trun_ref, ssuf_ref, *, st, m):
    """One reverse-order chunk of the compositing backward.

    Math identical to rasterize_tiled._backward_chunk (see its docstring for
    the derivation); carries (running tail transmittance, suffix sum of w*b)
    live in VMEM scratch across the tile's grid steps.
    """
    j = pl.program_id(0)
    s = attr_ref.shape[0]
    p = st.tile_w * st.tile_h
    row = row_ref[j]
    first = jnp.where(j > 0, row_ref[jnp.maximum(j - 1, 0)] != row, True)
    live = row < m

    @pl.when(first)
    def _():
        trun_ref[:] = tfin_ref[0]
        ssuf_ref[:] = jnp.zeros_like(ssuf_ref)

    dattr_ref[:] = jnp.zeros_like(dattr_ref)

    # skip chunks entirely past the tile's last contributor: every pair in
    # them has pos >= ncon (zero grads, identity carries), and with early
    # termination most of a deep tile's pairs are in that tail
    has_work = blk_ref[j] * s < jnp.max(ncon_ref[:])

    @pl.when(live & has_work)
    def _():
        tid = tid_ref[jnp.minimum(row, m - 1)]
        px, py = _pixel_coords(tid, st.tiles_x, st.tile_w, st.tile_h, p)
        # NOTE (round 3, measured): collapsing the five dx/dy reductions
        # into one [S,P]@[P,8] moment matmul over a tile-local monomial
        # basis is ~10% SLOWER at fp32-HIGHEST (bwd 31.3 -> 34.3 ms at the
        # bench shape) — Mosaic's cross-lane reductions are cheaper than a
        # 6-pass fp32-emulated MXU contraction with a 8->128 padded output.
        # _moment_grads retained for reference; _bwd_chunk_math instead
        # factors the per-splat constants out of the reductions directly.
        grads, new_trun, new_ssuf = _bwd_chunk_math(
            attr_ref[:], px, py, blk_ref[j] * s, ncon_ref[0], gc_ref[0],
            gt_ref[0], trun_ref[:], ssuf_ref[:])
        dattr_ref[:] = jnp.concatenate(
            grads + ([jnp.zeros((s, ATTR_W - 9), _F32)] if ATTR_W > 9 else []),
            axis=1,
        )
        trun_ref[:] = new_trun
        ssuf_ref[:] = new_ssuf


def composite_bwd_pallas(st, residuals, cotangents):
    if _kernel_mode(st) == "tile":
        return _composite_bwd_pallas_tile(st, residuals, cotangents)
    (sp_attr, tile_ids, starts, ends, t_final, ncon_all) = residuals
    g_color_all, g_t_all, _ = cotangents

    s = st.chunk
    p = st.tile_w * st.tile_h
    b = sp_attr.shape[0]
    assert b % s == 0
    cap_chunks = b // s
    m = tile_ids.shape[0]

    row, blk = _visit_tables(starts, ends, s, cap_chunks, reverse=True)
    # Assign every UNCOVERED pair block (past a tile's ncon-trimmed end, or
    # owned by no listed tile) to one of the dead grid steps: the kernel
    # zeroes its output block unconditionally, so dead steps zero-fill
    # exactly the blocks no live step writes. This replaces a post-kernel
    # [B,9] mask pass + a [B,9] pad copy (2.8 ms at the bench shape) with a
    # few [nchunks] vector ops. Counts match exactly: #dead steps =
    # cap_chunks - sum(live chunks) = #uncovered blocks.
    from gs_tpu.ops.binning import vec_cummax, vec_cumsum

    nonempty = ends > starts
    cbuf = jnp.full((cap_chunks + 1,), -1.0, jnp.float32).at[
        jnp.where(nonempty, starts // s, cap_chunks)
    ].max(jnp.arange(m, dtype=jnp.float32), mode="drop")
    owner = vec_cummax(cbuf[:cap_chunks]).astype(jnp.int32)
    owner_c = jnp.clip(owner, 0, max(m - 1, 0))
    chunk_pos = jnp.arange(cap_chunks, dtype=jnp.int32) * s
    covered = (owner >= 0) & nonempty[owner_c] & (chunk_pos < ends[owner_c])
    unc = (~covered).astype(jnp.int32)
    unc_rank = vec_cumsum(unc) - unc  # rank among uncovered blocks
    total_live = cap_chunks - jnp.sum(unc)
    # uncovered_blocks[r] = block index of the r-th uncovered block
    ublk = jnp.zeros((cap_chunks + 1,), jnp.float32).at[
        jnp.where(covered, cap_chunks, unc_rank)
    ].max(jnp.arange(cap_chunks, dtype=jnp.float32), mode="drop")
    j_idx = jnp.arange(cap_chunks, dtype=jnp.int32)
    dead = j_idx >= total_live
    blk = jnp.where(
        dead,
        ublk[jnp.where(dead, j_idx - total_live, 0)].astype(jnp.int32),
        blk,
    )
    # defense-in-depth: the counts-match argument above requires disjoint,
    # ascending, chunk-aligned tile ranges (every current caller builds them
    # that way via binning). If a future caller violated that, a stray
    # blk == cap_chunks would index one block past the unpadded [b, ATTR_W]
    # output — clamp so the failure mode is a doubly-written block (wrong
    # grads, caught by parity tests), never an out-of-bounds write.
    blk = jnp.minimum(blk, cap_chunks - 1)

    # per-tile cotangents, padded with a dummy row for dead chunks
    gc = jnp.concatenate(
        [jnp.asarray(g_color_all).transpose(0, 2, 1), jnp.zeros((1, 3, p), _F32)]
    )
    gt = jnp.concatenate(
        [jnp.asarray(g_t_all) * t_final, jnp.zeros((1, p), _F32)]
    )[:, None, :]  # tfin_term = T_fin * dL/dT_fin
    tf = jnp.concatenate([t_final, jnp.ones((1, p), _F32)])[:, None, :]
    nc = jnp.concatenate([ncon_all, jnp.zeros((1, p), jnp.int32)])[:, None, :]

    kernel = functools.partial(_bwd_kernel, st=st, m=m)
    tile_row3 = lambda j, row, blk, tid: (jnp.minimum(row[j], m), 0, 0)
    pair_blk = lambda j, row, blk, tid: (blk[j], 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap_chunks,),
        in_specs=[
            pl.BlockSpec((s, ATTR_W), pair_blk),
            pl.BlockSpec((1, 3, p), tile_row3),
            pl.BlockSpec((1, 1, p), tile_row3),
            pl.BlockSpec((1, 1, p), tile_row3),
            pl.BlockSpec((1, 1, p), tile_row3),
        ],
        out_specs=[
            pl.BlockSpec((s, ATTR_W), pair_blk),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, p), _F32),  # running tail transmittance
            pltpu.VMEM((1, p), _F32),  # suffix sum of w*b
        ],
    )
    d_attr = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, ATTR_W), _F32),
        ],
        interpret=_interpret(),
    )(row, blk, tile_ids, sp_attr, gc, gt, tf, nc)[0]
    return (d_attr, None, None, None)
