"""Per-Gaussian preprocess: frustum cull, EWA projection, SH color.

This re-derives the preprocess stage of the reference CUDA rasterizer
(diff-gaussian-rasterization; call-site contract at
``gaussian_renderer/__init__.py:47-106``, algorithm per SURVEY.md §2.2a):

  1. transform center to camera space, cull z <= 0.2
  2. 2D covariance by EWA splatting: cov2d = J W Sigma W^T J^T + 0.3*I,
     with J the affine Jacobian of the perspective map and the camera-space
     x/y clamped to 1.3*tan(fov/2) before differentiating
  3. conic (inverse 2D covariance), screen radius = ceil(3 sqrt(lambda_max))
  4. SH -> RGB for the view direction, clamped at 0 (matches
     ``gaussian_renderer/__init__.py:90``)

Everything here is plain JAX on purpose: it is elementwise/small-matrix VPU
work over N Gaussians that XLA fuses into a handful of kernels, and JAX
autodiff provides exact gradients (the hot compositing stage has the
hand-written Pallas VJP instead). fp32 throughout — the conic inversion is
ill-conditioned and must not drop to bf16.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gs_tpu.cameras import Camera
from gs_tpu.ops import sh as sh_ops
from gs_tpu.ops import transforms

FRUSTUM_NEAR_Z = 0.2  # hard near-cull of the reference preprocess
COV2D_DILATION = 0.3  # low-pass dilation added to the 2D covariance diagonal


class ProjectedSplats(NamedTuple):
    """Per-Gaussian screen-space splat parameters (all [N, ...])."""

    means2d: jnp.ndarray  # [N,2] pixel coords of projected center
    depths: jnp.ndarray  # [N] camera-space z
    conics: jnp.ndarray  # [N,3] (a, b, c): inverse 2D covariance packing
    radii: jnp.ndarray  # [N] int32 pixel radius (0 => culled/invisible)
    mask: jnp.ndarray  # [N] bool, visible after frustum + degeneracy culls


def bin_radii(radii: jnp.ndarray, opacities: jnp.ndarray) -> jnp.ndarray:
    """Opacity-tightened binning radius — output-identical, strictly less work.

    The reference bins each splat into every tile its 3-sigma rect touches
    (radii). But compositing skips any pixel where alpha = opac*exp(power)
    < 1/255 (ALPHA_SKIP), and alpha falls below that at
    r = sigma*sqrt(2 ln(255*opac)). For opac < ~0.46 that radius is tighter
    than 3 sigma, so the extra tiles the reference visits contain only
    skipped pixels: binning with min(3sigma, cutoff) renders the exact same
    image with fewer (tile, splat) pairs. Splats with opac <= 1/255 never
    pass the skip test anywhere -> radius 0.

    Reported radii (visibility filter + max_radii2D densify stat) keep the
    reference's 3-sigma semantics; this is for binning only.
    """
    scale = jnp.sqrt(
        jnp.maximum(2.0 * jnp.log(255.0 * jnp.maximum(opacities, 1e-12)), 0.0)
    ) / 3.0  # cutoff radius as a fraction of the 3-sigma radius
    r = jnp.ceil(radii.astype(jnp.float32) * jnp.minimum(scale, 1.0))
    return jnp.where(opacities > 1.0 / 255.0, r, 0.0).astype(jnp.int32)


def project_gaussians(
    xyz: jnp.ndarray,
    cov3d: jnp.ndarray,
    camera: Camera,
) -> ProjectedSplats:
    """Project N 3D Gaussians into screen space for one camera.

    Args:
      xyz: [N,3] world-space centers.
      cov3d: [N,6] symmetric-packed world covariance (already scale-modified).
      camera: target viewpoint.

    Returns:
      :class:`ProjectedSplats`. Invalid entries have radius 0 and mask False;
      their numeric fields are safe (no NaN/Inf) so downstream math stays
      finite under jit.
    """
    view = camera.view
    n = xyz.shape[0]

    # --- camera-space transform & frustum cull ------------------------------
    t = xyz @ view[:3, :3].T + view[:3, 3]  # [N,3]
    in_front = t[:, 2] > FRUSTUM_NEAR_Z
    tz = jnp.where(in_front, t[:, 2], 1.0)  # safe divisor

    # --- full projection to pixel coords ------------------------------------
    p_hom = xyz @ camera.full_proj[:, :3].T + camera.full_proj[:, 3]  # [N,4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :2] * p_w[:, None]
    mean_x = ((ndc[:, 0] + 1.0) * camera.width - 1.0) * 0.5
    mean_y = ((ndc[:, 1] + 1.0) * camera.height - 1.0) * 0.5
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # --- EWA: 2D covariance ---------------------------------------------------
    focal_x = camera.focal_x
    focal_y = camera.focal_y
    lim_x = 1.3 * camera.tan_fovx
    lim_y = 1.3 * camera.tan_fovy
    txz = jnp.clip(t[:, 0] / tz, -lim_x, lim_x)
    tyz = jnp.clip(t[:, 1] / tz, -lim_y, lim_y)

    # J rows (2x3 Jacobian of (x,y) pixel-plane coords wrt camera space)
    inv_tz = 1.0 / tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * txz * inv_tz
    j11 = focal_y * inv_tz
    j12 = -focal_y * tyz * inv_tz

    w_rot = view[:3, :3]  # world->cam rotation
    # T = J @ W_rot : [N,2,3]; then cov2d = T Sigma T^T with Sigma as the
    # symmetric 6-pack, fully expanded elementwise (batched [3,3] matmuls
    # lower poorly on TPU)
    t0 = j00[:, None] * w_rot[0] + j02[:, None] * w_rot[2]  # [N,3]
    t1 = j11[:, None] * w_rot[1] + j12[:, None] * w_rot[2]  # [N,3]
    xx, xy, xz = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    yy, yz, zz = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]

    def quad(a, b):  # a . Sigma . b for [N,3] row vectors
        return (
            xx * a[:, 0] * b[:, 0] + yy * a[:, 1] * b[:, 1]
            + zz * a[:, 2] * b[:, 2]
            + xy * (a[:, 0] * b[:, 1] + a[:, 1] * b[:, 0])
            + xz * (a[:, 0] * b[:, 2] + a[:, 2] * b[:, 0])
            + yz * (a[:, 1] * b[:, 2] + a[:, 2] * b[:, 1])
        )

    c_xx = quad(t0, t0) + COV2D_DILATION
    c_xy = quad(t0, t1)
    c_yy = quad(t1, t1) + COV2D_DILATION

    # --- conic & radius ---------------------------------------------------------
    det = c_xx * c_yy - c_xy * c_xy
    valid = in_front & (det > 0.0)
    inv_det = jnp.where(valid, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    conics = jnp.stack([c_yy * inv_det, -c_xy * inv_det, c_xx * inv_det], axis=-1)

    mid = 0.5 * (c_xx + c_yy)
    lambda_max = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda_max))
    radii = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    means2d = jnp.where(valid[:, None], means2d, 0.0)
    depths = jnp.where(valid, t[:, 2], jnp.inf)
    return ProjectedSplats(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        mask=valid,
    )


def sh_colors(
    xyz: jnp.ndarray,
    features_dc: jnp.ndarray,
    features_rest: jnp.ndarray,
    cam_pos: jnp.ndarray,
    active_degree: int,
) -> jnp.ndarray:
    """View-dependent RGB from SH coefficients, clamped at 0.

    ``features_dc`` [N,1,3] + ``features_rest`` [N,K-1,3] in the reference
    layout (``scene/gaussian_model.py:119-122``). Contracted as ONE
    [N,K] x [N,K,3] reduction: round-2 traces showed the per-coefficient
    accumulation loop's BACKWARD materializing 15 separate [N,15,3]
    add-any/layout-copy passes (~15 ms at N=262k); a single contraction
    keeps the whole chain in two fused passes.
    """
    k = sh_ops.num_sh_coeffs(active_degree)
    dirs = xyz - cam_pos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    basis = jnp.concatenate(sh_ops.eval_sh_basis(active_degree, dirs),
                            axis=-1)  # [N,K]
    feats = jnp.concatenate([features_dc, features_rest], axis=1)[:, :k]
    rgb = jnp.einsum("nk,nkc->nc", basis, feats)
    return jnp.maximum(rgb + 0.5, 0.0)


def compute_cov3d(
    log_scale: jnp.ndarray, quat: jnp.ndarray, scale_modifier: float | jnp.ndarray = 1.0
) -> jnp.ndarray:
    """Activated 3D covariance 6-pack from raw params
    (``scene/gaussian_model.py:27-32``; packing per utils/general_utils.py:72-81)."""
    return transforms.build_covariance_packed(
        jnp.exp(log_scale) * scale_modifier, quat
    )
