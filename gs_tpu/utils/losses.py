"""Training losses: L1 + windowed SSIM.

Behavioral parity: reference ``utils/loss_utils.py:17-108`` — 11x11 separable
Gaussian window, sigma 1.5, C1=0.01^2, C2=0.03^2, SAME zero padding. The total
training loss is ``(1-lambda)*L1 + lambda*(1-SSIM)`` with lambda_dssim=0.2
(``train.py:103-104``).

TPU notes: the window conv is a depthwise 11x11 conv — two fused
``lax.conv_general_dilated`` calls per statistic; XLA maps these onto the MXU.
fp32 to keep loss parity with the reference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

SSIM_WINDOW = 11
SSIM_SIGMA = 1.5
SSIM_C1 = 0.01**2
SSIM_C2 = 0.03**2


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> tuple[float, ...]:
    g = [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    s = sum(g)
    return tuple(v / s for v in g)


def _depthwise_blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """[C,H,W] -> [C,H,W] separable Gaussian blur with SAME zero padding.

    All C channels ride ONE depthwise conv per axis — SSIM's five statistics
    are stacked into a single [5*3,H,W] call by :func:`ssim` (ten separate
    2-3 channel convs cost ~2x in launch/fusion overhead, trace round 2).
    """
    c = img.shape[0]
    x = img[None]  # [1,C,H,W]
    kh = win.reshape(1, 1, -1, 1)
    kw = win.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, win.size, 1), ("NCHW", "OIHW", "NCHW"))
    pad = win.size // 2
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (c, 1, 1, 1)), (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=c,
    )
    return x[0]


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
    c = img.shape[0]
    x = img[None]
    kh = win.reshape(1, 1, -1, 1)
    kw = win.reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (1, 1, win.size, 1), ("NCHW", "OIHW", "NCHW"))
    pad = win.size // 2
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn, feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, jnp.tile(kw, (c, 1, 1, 1)), (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=dn, feature_group_count=c,
    )
    return x[0]


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
