"""Image quality metrics: PSNR (SSIM lives in losses; LPIPS in utils.lpips).

Behavioral parity: reference ``utils/image_utils.py:14-19`` — per-image MSE
over flattened pixels, PSNR = 20 log10(1/sqrt(mse)).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    flat1 = img1.reshape(img1.shape[0], -1) if img1.ndim > 3 else img1.reshape(1, -1)
    flat2 = img2.reshape(img2.shape[0], -1) if img2.ndim > 3 else img2.reshape(1, -1)
    return jnp.mean((flat1 - flat2) ** 2, axis=1, keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """[ (B,)3,H,W ] pair in [0,1] -> per-image PSNR [B,1] (or [1,1])."""
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))
