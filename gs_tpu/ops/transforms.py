"""Quaternion / covariance math for anisotropic 3D Gaussians.

Behavioral parity: reference ``utils/general_utils.py:72-128`` (quaternion to
rotation matrix, L = R diag(s), symmetric 6-pack) and
``scene/gaussian_model.py:26-43`` (Sigma = L L^T).

All functions are batched, pure, fp32, and autodiff-friendly. Quaternions use
(w, x, y, z) ordering as in the reference and the 3DGS PLY ecosystem.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalize quaternions ``[..., 4]`` (w,x,y,z) and return ``[..., 3, 3]``."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - w * z), 2.0 * (x * z + w * y)], axis=-1
    )
    r1 = jnp.stack(
        [2.0 * (x * y + w * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - w * x)], axis=-1
    )
    r2 = jnp.stack(
        [2.0 * (x * z - w * y), 2.0 * (y * z + w * x), 1.0 - 2.0 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def build_covariance(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """3D covariance ``Sigma = (R S)(R S)^T`` with ``S = diag(scale)``.

    Args:
      scale: ``[..., 3]`` *activated* (positive) scales, already multiplied by
        any scaling modifier.
      quat: ``[..., 4]`` raw quaternions (normalized internally).

    Returns:
      ``[..., 3, 3]`` symmetric covariance.
    """
    r = quat_to_rotmat(quat)
    l = r * scale[..., None, :]  # R @ diag(s): scale columns of R
    return l @ jnp.swapaxes(l, -1, -2)


def build_covariance_packed(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Symmetric 6-pack (xx,xy,xz,yy,yz,zz) of ``Sigma = (R S)(R S)^T``.

    Fully expanded elementwise form — batched [3,3] matmuls lower poorly on
    TPU; this is the hot-path variant of :func:`build_covariance` (same
    math, packed output).
    """
    r = quat_to_rotmat(quat)  # [...,3,3] (built from elementwise stacks)
    s2 = scale * scale  # [...,3]
    # Sigma_ij = sum_k s_k^2 R_ik R_jk
    def entry(i, j):
        return (
            s2[..., 0] * r[..., i, 0] * r[..., j, 0]
            + s2[..., 1] * r[..., i, 1] * r[..., j, 1]
            + s2[..., 2] * r[..., i, 2] * r[..., j, 2]
        )

    return jnp.stack(
        [entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2),
         entry(2, 2)],
        axis=-1,
    )


def pack_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular 6-pack (xx, xy, xz, yy, yz, zz) of ``[..., 3, 3]``.

    Matches the packing order the reference rasterizer consumes
    (``utils/general_utils.py:72-81``).
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_symmetric`."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    r0 = jnp.stack([xx, xy, xz], axis=-1)
    r1 = jnp.stack([xy, yy, yz], axis=-1)
    r2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([r0, r1, r2], axis=-2)


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Logit: reference ``utils/general_utils.py:18-19``."""
    return jnp.log(x / (1.0 - x))
