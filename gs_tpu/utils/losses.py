"""Training losses: L1 + windowed SSIM.

Behavioral parity: reference ``utils/loss_utils.py:17-108`` — 11x11 separable
Gaussian window, sigma 1.5, C1=0.01^2, C2=0.03^2, SAME zero padding. The total
training loss is ``(1-lambda)*L1 + lambda*(1-SSIM)`` with lambda_dssim=0.2
(``train.py:103-104``).

TPU notes: the separable 11-tap window blur is NOT a conv op here. A
depthwise ``conv_general_dilated`` has no contraction dimension for the MXU,
so XLA lowers it through conv-specific layouts — measured 19.8 ms of the
94 ms train step at 1080p (round-4 device trace), ~7 ms of it pure
relayout copies plus bf16 round-trips. An 11-tap blur is instead expressed
as 11 statically-shifted multiply-adds over the image in its native layout:
XLA fuses all taps into one vectorized pass per axis, no layout changes,
full fp32. Same math, same SAME-zero-padding semantics.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

SSIM_WINDOW = 11
SSIM_SIGMA = 1.5
SSIM_C1 = 0.01**2
SSIM_C2 = 0.03**2

# full-image blur backend: "shift" = 11 statically-shifted multiply-adds
# (exact fp32, ~12.5 ms fwd+bwd in the 1080p train step, round-4 trace) or
# "matmul" = banded [H,H]/[W,W] blur matrices on the MXU in 3 bf16 hi/lo
# passes (~2^-17 operand-split error, far inside loss tolerances; the band
# is 11/1920 nonzero but dense MXU MACs are cheap enough to win anyway).
SSIM_BLUR = os.environ.get("GS_TPU_SSIM_BLUR", "shift")


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> tuple[float, ...]:
    g = [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    s = sum(g)
    return tuple(v / s for v in g)


def _blur_axis(x: jnp.ndarray, win, axis: int, pad: tuple[int, int]):
    """1-D windowed blur along ``axis`` via static-shift multiply-adds.

    ``pad`` (lo, hi) zero-pads the axis first; the output keeps the padded
    length minus (win.size - 1) — so (r, r) gives SAME-zero-padding, (0, 0)
    gives VALID. Every tap is a static slice of one padded buffer: XLA
    fuses the whole tap sum into a single vectorized pass in the input's
    native layout (vs conv lowering: ~10x in layout copies, trace round 4).
    Taps accumulate in index order — the same order the reference's conv
    sums — in full fp32.
    """
    k = len(win)
    if pad != (0, 0):
        spec = [(0, 0)] * x.ndim
        spec[axis] = pad
        x = jnp.pad(x, spec)
    out_len = x.shape[axis] - (k - 1)
    acc = None
    for i in range(k):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + out_len)
        term = win[i] * x[tuple(sl)]
        acc = term if acc is None else acc + term
    return acc


def _band_matrix(n: int, win: jnp.ndarray) -> jnp.ndarray:
    """[n, n] symmetric banded blur matrix: B[i, j] = win[j - i + r].

    Multiplying by B along an axis IS the SAME-zero-padded window blur
    (rows truncated at the edges contribute exactly zero, matching the
    zero padding); the Gaussian window's symmetry makes B symmetric, so
    the same matrix serves both contraction directions.
    """
    k = win.size
    r = k // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = j - i + r
    return jnp.where((d >= 0) & (d < k), win[jnp.clip(d, 0, k - 1)], 0.0)


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _blur_matmul(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """MXU-path blur: two banded matmuls in 3 bf16 hi/lo passes each."""
    c, h, w = img.shape
    bh = _band_matrix(h, win)
    bw = _band_matrix(w, win)

    def mm3(a, b, dims):
        ah, al = _bf16_split(a)
        bhh, bl = _bf16_split(b)
        d = lambda x, y: jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32)
        return d(ah, bhh) + d(ah, bl) + d(al, bhh)

    # rows: out[c,h,w] = sum_k B[h,k] x[c,k,w]
    x = mm3(bh, img, (((1,), (1,)), ((), ())))  # [h, c, w]
    x = x.transpose(1, 0, 2)
    # cols: out[c,h,w] = sum_k x[c,h,k] B[k,w]
    return mm3(x, bw, (((2,), (0,)), ((), ())))


def _depthwise_blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """[C,H,W] -> [C,H,W] separable Gaussian blur with SAME zero padding.

    All C channels ride the same fused tap passes — SSIM's five statistics
    are stacked into a single [5*3,H,W] call by :func:`ssim`.
    """
    if SSIM_BLUR == "matmul":
        return _blur_matmul(img, win)
    r = win.size // 2
    x = _blur_axis(img, win, axis=1, pad=(r, r))
    return _blur_axis(x, win, axis=2, pad=(r, r))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = SSIM_WINDOW) -> jnp.ndarray:
    """Mean SSIM over a [C,H,W] pair in [0,1] (reference ``_ssim`` semantics)."""
    win = jnp.asarray(_gaussian_window(window_size, SSIM_SIGMA), jnp.float32)
    c = img1.shape[0]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0
    )
    blurred = _depthwise_blur(stacked, win)
    mu1, mu2 = blurred[:c], blurred[c:2 * c]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blurred[2 * c:3 * c] - mu1_sq
    sigma2_sq = blurred[3 * c:4 * c] - mu2_sq
    sigma12 = blurred[4 * c:] - mu1_mu2
    ssim_map = ((2.0 * mu1_mu2 + SSIM_C1) * (2.0 * sigma12 + SSIM_C2)) / (
        (mu1_sq + mu2_sq + SSIM_C1) * (sigma1_sq + sigma2_sq + SSIM_C2)
    )
    return jnp.mean(ssim_map)


def photometric_loss(
    pred: jnp.ndarray, target: jnp.ndarray, lambda_dssim: float
) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM): reference ``train.py:103-104``."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )


def _depthwise_blur_rows_valid(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """[C,H+2p,W] -> [C,H,W] blur: VALID rows (halo supplied), SAME cols."""
    r = win.size // 2
    x = _blur_axis(img, win, axis=1, pad=(0, 0))
    return _blur_axis(x, win, axis=2, pad=(r, r))


def banded_photometric_terms(
    pred: jnp.ndarray, target: jnp.ndarray, band_lo, band_rows: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Partial (L1 sum, SSIM-map sum) over ``band_rows`` image rows.

    Exact row-partition of :func:`photometric_loss`'s reductions: summing
    the returned terms over a disjoint cover of [0, H) and dividing by
    C*H*W reproduces ``l1_loss`` / ``ssim`` (the SSIM window's SAME zero
    padding is replicated by the manual halo, and band rows past H
    contribute exactly zero). Built for sharded training: each device
    reduces only H/D (+10 halo) rows instead of redundantly recomputing
    the full-image SSIM on every shard device (SURVEY §2.4 scaling; the
    full-image loss was a fixed serial cost every added shard paid again).

    ``band_lo`` may be traced (a device-index-derived row offset);
    ``band_rows`` must be static.
    """
    c, h, w = pred.shape
    halo = SSIM_WINDOW // 2
    pad_hi = halo + band_rows  # covers any band_lo <= h
    pp = jnp.pad(pred, ((0, 0), (halo, pad_hi), (0, 0)))
    tt = jnp.pad(target, ((0, 0), (halo, pad_hi), (0, 0)))
    band_lo = jnp.asarray(band_lo, jnp.int32)
    ps = jax.lax.dynamic_slice(
        pp, (jnp.int32(0), band_lo, jnp.int32(0)),
        (c, band_rows + 2 * halo, w))
    ts = jax.lax.dynamic_slice(
        tt, (jnp.int32(0), band_lo, jnp.int32(0)),
        (c, band_rows + 2 * halo, w))

    interior = lambda x: x[:, halo:halo + band_rows]
    # rows past the true image height are zero-zero pairs for L1 but give
    # ssim_map == 1 (0/0 regularized by C1*C2) — mask them out of the sum
    row_valid = (band_lo + jnp.arange(band_rows) < h)[None, :, None]
    l1_sum = jnp.sum(jnp.abs(interior(ps) - interior(ts)))

    win = jnp.asarray(_gaussian_window(SSIM_WINDOW, SSIM_SIGMA), jnp.float32)
    stacked = jnp.concatenate([ps, ts, ps * ps, ts * ts, ps * ts], axis=0)
    blurred = _depthwise_blur_rows_valid(stacked, win)
    mu1, mu2 = blurred[:c], blurred[c:2 * c]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blurred[2 * c:3 * c] - mu1_sq
    sigma2_sq = blurred[3 * c:4 * c] - mu2_sq
    sigma12 = blurred[4 * c:] - mu1_mu2
    ssim_map = ((2.0 * mu1_mu2 + SSIM_C1) * (2.0 * sigma12 + SSIM_C2)) / (
        (mu1_sq + mu2_sq + SSIM_C1) * (sigma1_sq + sigma2_sq + SSIM_C2)
    )
    ssim_sum = jnp.sum(jnp.where(row_valid, ssim_map, 0.0))
    return l1_sum, ssim_sum
