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
