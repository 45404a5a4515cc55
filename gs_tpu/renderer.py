"""Differentiable render API: one camera view of a GaussianState.

Contract parity with the reference ``gaussian_renderer/__init__.py:20-112``:
``render`` returns the image, per-Gaussian screen radii and the visibility
filter, and exposes the screen-space positional gradient side-channel that
densification consumes (``train.py:99,128``).

The reference achieves the side-channel imperatively: a zeros ``means2D``
tensor with ``retain_grad`` that the CUDA backward writes into
(``gaussian_renderer/__init__.py:35-39``). Functionally we take an explicit
``means2d_offset`` argument added to the projected pixel centers; the caller
differentiates the loss with respect to it. Gradients arrive in *pixel* units;
multiply by (0.5*W, 0.5*H) to recover the reference's NDC-scaled gradients
before comparing against densify_grad_threshold (the CUDA backward emits
NDC-scaled means2D grads: dL/d_ndc = dL/d_pixel * 0.5 * extent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gs_tpu.cameras import Camera
from gs_tpu.config import RasterizeConfig
from gs_tpu.models.gaussians import GaussianState
from gs_tpu.ops import projection
from gs_tpu.ops.rasterize_oracle import rasterize_oracle

_DEFAULT_CFG = RasterizeConfig()


class RenderOut(NamedTuple):
    image: jnp.ndarray  # [3,H,W]
    radii: jnp.ndarray  # [C] int32 screen radii (0 = invisible)
    visibility: jnp.ndarray  # [C] bool, radii > 0
    final_t: jnp.ndarray  # [H,W] remaining transmittance
    num_pairs: jnp.ndarray | None = None  # true (tile,splat) pair count


def render(
    camera: Camera,
    state: GaussianState,
    *,
    active_sh_degree: int,
    bg_color: jnp.ndarray,
    scaling_modifier: float | jnp.ndarray = 1.0,
    override_color: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    means2d_offset: jnp.ndarray | None = None,
    convert_shs_python: bool = False,
    compute_cov3d_python: bool = False,
    cfg: RasterizeConfig = _DEFAULT_CFG,
) -> RenderOut:
    """Render ``state`` from ``camera``. Fully traceable and differentiable.

    Args:
      active_sh_degree: static int; the SH degree schedule lives in the
        training loop (``train.py:82-83``).
      bg_color: [3] background composited against remaining transmittance.
      means2d_offset: optional [C,2] zeros; its cotangent is the screen-space
        positional gradient (densification signal).
      convert_shs_python / compute_cov3d_python: the reference's pipeline
        fallback toggles (``gaussian_renderer/__init__.py:74-94``): select an
        independently-formulated SH / covariance path (reference tensor
        layouts, dense matmuls) instead of the fused TPU-layout one. Same
        outputs (tested allclose) — the built-in cross-checking tool, and
        live-toggleable from the SIBR viewer (``train.py:66``).
      cfg: rasterizer tuning (tile size, pair budget, backend).
    """
    # cov3d_precomp mirrors the reference rasterizer's cov3D_precomp input
    # (gaussian_renderer/__init__.py:80-94): exactly one of {scale+rotation,
    # precomputed 6-pack covariance} feeds the projection. override_color
    # likewise replaces the SH path (colors_precomp).
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    elif compute_cov3d_python:
        # the reference's get_covariance route (scene/gaussian_model.py:27-43):
        # L = R diag(s), Sigma = L L^T as dense [3,3] matmuls, then strip to
        # the 6-pack — structurally independent of the fused elementwise path
        from gs_tpu.ops import transforms

        cov3d = transforms.pack_symmetric(
            transforms.build_covariance(
                jnp.exp(state.log_scale) * scaling_modifier, state.quat
            )
        )
    else:
        cov3d = projection.compute_cov3d(state.log_scale, state.quat,
                                         scaling_modifier)
    splats = projection.project_gaussians(state.xyz, cov3d, camera)

    means2d = splats.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    # dead padding slots are hard-culled
    alive = state.alive
    radii = jnp.where(alive, splats.radii, 0)
    opacities = jnp.where(alive[:, None], state.opacity, 0.0)[:, 0]

    if override_color is not None:
        colors = override_color
    elif convert_shs_python:
        # the reference's convert_SHs_python route (gaussian_renderer/
        # __init__.py:74-79): materialize [N,K,3] features, transpose to the
        # [N,3,K] eval_sh layout, evaluate the full hardcoded polynomial
        from gs_tpu.ops import sh as sh_ops

        dirs = state.xyz - camera.cam_pos
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
        shs_view = jnp.swapaxes(state.features, 1, 2)  # [N,3,K]
        colors = jnp.maximum(
            sh_ops.eval_sh(active_sh_degree, shs_view, dirs) + 0.5, 0.0
        )
    else:
        colors = projection.sh_colors(
            state.xyz, state.features_dc, state.features_rest, camera.cam_pos,
            active_sh_degree,
        )

    from gs_tpu.ops.rasterize_tiled import resolve_backend

    backend = resolve_backend(cfg.backend)
    if backend == "oracle":
        out = rasterize_oracle(
            means2d,
            splats.conics,
            colors,
            opacities,
            splats.depths,
            radii,
            camera.height,
            camera.width,
            jnp.asarray(bg_color, jnp.float32),
            tile_w=cfg.tile_w,
            tile_h=cfg.tile_h,
        )
    elif backend in ("xla", "pallas"):
        from gs_tpu.ops.rasterize_tiled import rasterize_tiled

        out = rasterize_tiled(
            means2d,
            splats.conics,
            colors,
            opacities,
            splats.depths,
            radii,
            camera.height,
            camera.width,
            jnp.asarray(bg_color, jnp.float32),
            cfg,
        )
    else:
        raise ValueError(f"unknown rasterizer backend {backend!r}")

    return RenderOut(
        image=out.image,
        radii=radii,
        visibility=radii > 0,
        final_t=out.final_t,
        num_pairs=out.num_pairs,
    )
