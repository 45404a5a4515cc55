"""Gaussian-sharded training: model state + Adam sharded over the mesh.

SURVEY.md §2.4 rows 2-4 — the layout for N beyond one chip's memory:

  - **Gaussian (model-state) sharding**: every [capacity, ...] leaf of the
    GaussianState / AdamState / DensifyStats pytrees is sharded on its
    leading axis over the ``shard`` mesh axis. Parameters + moments are the
    dominant memory (59 + 118 floats per Gaussian vs 11 communicated), so
    this is where capacity scales.
  - **Visible-splat all-gather**: each device projects only its own shard
    (projection/SH work divided by D), packs the 11 per-splat floats the
    rasterizer needs (attr9 | depth | bin radius), and ``all_gather``s the
    compact splat table. Binning + compositing of the device's interleaved
    tile shard then proceed exactly as in the replicated path.
  - **Gradient reduce-scatter overlapped with backward**: the splat
    all_gather is differentiated by shard_map autodiff — its VJP is a
    ``psum_scatter``, so each device receives exactly its shard's summed
    splat gradient, which then chains through its local projection to its
    local parameter shard. No explicit collective code in the backward.

Factor bookkeeping: the photometric loss is BANDED — each shard device
reduces only its H/n_shard row band of the reassembled image (+SSIM halo)
and partial sums psum into the exact full-image loss — so every pixel's
cotangent originates on exactly one device and the splat psum_scatter's
over-devices sum IS the exact single-device gradient (verified against the
single-device train_step in tests/test_sharding.py).

Optional: ``visible_budget`` enables :func:`compact_visible` so only
radii>0 splats (up to a fixed per-shard budget) are communicated; the step
reports ``num_visible_max`` so the trainer can grow the budget on overflow.
Densify/prune on this layout and post-densify shard rebalancing live in
:mod:`gs_tpu.parallel.densify_sharded`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gs_tpu.config import OptimizationParams, RasterizeConfig
from gs_tpu.models import densify, optim
from gs_tpu.ops import projection
from gs_tpu.ops.rasterize_tiled import (ATTR_W, CompositeStatic,
                                        pack_attributes, resolve_backend)
from gs_tpu.parallel.mesh import DATA_AXIS, SHARD_AXIS
from gs_tpu.utils import losses, schedules

SPLAT_W = ATTR_W + 2  # attr9 | depth | bin radius


def shard_specs(template, capacity: int):
    """P(SHARD_AXIS) for [capacity, ...] leaves, replicated otherwise."""
    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return P(SHARD_AXIS)
        return P()

    return jax.tree.map(spec, template)


def compact_visible(packed: jnp.ndarray, budget: int):
    """Stream-compact visible splats into a fixed ``budget`` of rows.

    The visible-splat all-gather optimization (SURVEY.md §2.4 row 4): most
    Gaussians are frustum-culled or opacity-culled for any one view (bin
    radius 0), so communicating only the survivors shrinks the all_gather
    by the visibility ratio. Classic cumsum+scatter compaction — rows beyond
    the budget are dropped (callers watch ``num_visible`` and grow, the same
    contract as the pair budget). Dropped/empty rows are all-zero: radius 0,
    opacity 0 — inert in binning.

    Returns (compacted [budget, SPLAT_W], num_visible scalar).
    """
    visible = packed[:, ATTR_W + 1] > 0  # bin radius column
    pos = jnp.cumsum(visible.astype(jnp.int32)) - 1
    num_visible = pos[-1] + 1 if packed.shape[0] > 0 else jnp.int32(0)
    dest = jnp.where(visible, jnp.minimum(pos, budget), budget)  # drop row
    out = jnp.zeros((budget + 1, SPLAT_W), packed.dtype).at[dest].set(packed)
    return out[:budget], num_visible


def _project_local(state, camera, active_sh_degree, means2d_offset):
    """Project this device's Gaussian shard -> packed [local, 11] splats."""
    cov3d = projection.compute_cov3d(state.log_scale, state.quat, 1.0)
    splats = projection.project_gaussians(state.xyz, cov3d, camera)
    means2d = splats.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset
    radii = jnp.where(state.alive, splats.radii, 0)
    opac = jnp.where(state.alive[:, None], state.opacity, 0.0)[:, 0]
    colors = projection.sh_colors(state.xyz, state.features_dc,
                                  state.features_rest, camera.cam_pos,
                                  active_sh_degree)
    attr = pack_attributes(means2d, splats.conics, colors, opac)
    brad = projection.bin_radii(radii, opac).astype(jnp.float32)
    packed = jnp.concatenate(
        [attr, splats.depths[:, None], brad[:, None]], axis=1
    )
    return packed, radii


def _render_from_gathered(splat_table, camera, bg, st, n_shard, pair_budget,
                          truncate=True):
    """Composite my tile-column strip of the gathered splat table.

    De-replicated like the tile-sharded layout: each device bins/gathers/
    composites only its own strip (gs_tpu.parallel.sharded.composite_strip),
    so the post-all_gather work also divides by the shard count.
    """
    from gs_tpu.parallel.sharded import composite_strip, reassemble_strips

    me = jax.lax.axis_index(SHARD_AXIS)
    means2d = splat_table[:, 0:2]
    depths = splat_table[:, ATTR_W]
    brad = splat_table[:, ATTR_W + 1].astype(jnp.int32)
    attr = splat_table[:, :ATTR_W]

    tile_color, tile_t, num_pairs = composite_strip(
        st, means2d, depths, brad, attr, n_shard, me, pair_budget, truncate,
    )
    tile_color = tile_color + tile_t[..., None] * bg[None, None, :]
    img = reassemble_strips(st, n_shard, tile_color, camera.height,
                            camera.width)
    return img, num_pairs


def make_gauss_sharded_train_step(
    mesh,
    opt_cfg: OptimizationParams,
    raster_cfg: RasterizeConfig,
    height: int,
    width: int,
    capacity: int,
    active_sh_degree: int,
    pair_budget: int | None = None,
    visible_budget: int | None = None,
):
    """Jitted train step with Gaussian state + Adam sharded over ``shard``.

    Inputs: (state, adam, stats) sharded on their leading [capacity] axis,
    camera batch sharded over ``data``, replicated bg/iteration/lr-scale.
    Outputs keep the same shardings. Every device touches only
    capacity / n_shard Gaussians of parameter + optimizer memory.

    ``visible_budget`` (per-shard rows) enables visible-splat compaction
    before the all_gather: communication and the gathered table shrink from
    capacity to n_shard * visible_budget. Splats beyond the budget on any
    one shard are dropped for that step (size it to the worst-case
    visibility ratio; None = gather everything, exact).
    """
    n_data, n_shard = mesh.shape[DATA_AXIS], mesh.shape[SHARD_AXIS]
    if capacity % n_shard != 0:
        raise ValueError(f"capacity {capacity} not divisible by shard={n_shard}")
    local_cap = capacity // n_shard
    tiles_x = -(-width // raster_cfg.tile_w)
    tiles_y = -(-height // raster_cfg.tile_h)
    if pair_budget is None:
        pair_budget = max(
            int(raster_cfg.pair_budget_factor * capacity), raster_cfg.min_pair_budget
        )
    pair_budget = -(-pair_budget // raster_cfg.chunk) * raster_cfg.chunk
    st = CompositeStatic(
        tiles_x=tiles_x, tiles_y=tiles_y, tile_w=raster_cfg.tile_w,
        tile_h=raster_cfg.tile_h, chunk=raster_cfg.chunk,
        tile_batch=raster_cfg.tile_batch,
        backend=resolve_backend(raster_cfg.backend),
    )

    def _local_step(state, adam, stats, cam_batch, bg, iteration,
                    spatial_lr_scale, apply_update):
        cam = jax.tree.map(
            lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x, cam_batch
        )
        params = state.params()  # local shard's leaves
        offset0 = jnp.zeros((local_cap, 2), jnp.float32)

        band_rows = -(-height // n_shard)

        def loss_fn(p, offset):
            s = state.with_params(p)
            packed, radii = _project_local(s, cam, active_sh_degree, offset)
            if visible_budget is not None:
                packed, num_vis = compact_visible(packed, visible_budget)
            else:
                num_vis = jnp.sum((packed[:, ATTR_W + 1] > 0).astype(jnp.int32))
            table = jax.lax.all_gather(packed, SHARD_AXIS, axis=0, tiled=True)
            img, num_pairs = _render_from_gathered(
                table, cam, bg, st, n_shard, pair_budget,
                truncate=raster_cfg.truncate_tiles)
            # banded loss (see parallel/sharded.py): each device reduces
            # only its H/n_shard row band; local contributions psum OUTSIDE
            # the grad (in-loss psum transposes to psum under
            # check_vma=False and over-counts) into the exact full-image
            # loss, so the per-device replicated loss cost drops with the
            # shard count
            me = jax.lax.axis_index(SHARD_AXIS)
            l1_sum, ssim_sum = losses.banded_photometric_terms(
                img, cam.image, me * band_rows, band_rows)
            denom = 3.0 * height * width
            contrib = ((1.0 - opt_cfg.lambda_dssim) * l1_sum
                       - opt_cfg.lambda_dssim * ssim_sum) / denom
            return contrib, (radii, num_vis, num_pairs)

        (contrib, (radii, num_vis, num_pairs)), (g_params, g_offset) = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, offset0))
        loss = jax.lax.psum(contrib, SHARD_AXIS) + opt_cfg.lambda_dssim

        # with the banded loss each pixel's cotangent originates on exactly
        # one device; the splat psum_scatter performs the over-devices sum,
        # so the local shard's gradient is already exact. Camera batch
        # averages over data.
        g_params = jax.lax.pmean(g_params, DATA_AXIS)
        g_offset_cam = g_offset
        loss = jax.lax.pmean(loss, DATA_AXIS)

        xyz_lr = schedules.expon_lr(
            iteration,
            lr_init=opt_cfg.position_lr_init,
            lr_final=opt_cfg.position_lr_final,
            lr_delay_mult=opt_cfg.position_lr_delay_mult,
            max_steps=opt_cfg.position_lr_max_steps,
        ) * spatial_lr_scale
        upd_params, upd_adam = optim.update(
            params, g_params, adam, optim.group_lrs(opt_cfg, xyz_lr)
        )
        # final-iteration parity (train.py:139-141): traced gate on the
        # optimizer update, matching the single-device step's apply_update
        sel = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(apply_update, a, b), new, old)
        new_params = sel(upd_params, params)
        new_adam = optim.AdamState(
            mu=sel(upd_adam.mu, adam.mu), nu=sel(upd_adam.nu, adam.nu),
            step=sel(upd_adam.step, adam.step),
        )

        vis = radii > 0
        g_ndc = g_offset_cam * jnp.array([0.5 * width, 0.5 * height], jnp.float32)
        d_accum = jax.lax.psum(
            jnp.where(vis, jnp.linalg.norm(g_ndc, axis=-1), 0.0), DATA_AXIS
        )
        d_denom = jax.lax.psum(vis.astype(jnp.float32), DATA_AXIS)
        r_max = jax.lax.pmax(
            jnp.where(vis, radii.astype(jnp.float32), 0.0), DATA_AXIS
        )
        new_stats = densify.DensifyStats(
            xyz_grad_accum=stats.xyz_grad_accum + d_accum,
            denom=stats.denom + d_denom,
            max_radii2d=jnp.maximum(stats.max_radii2d, r_max),
        )
        # num_visible_max: worst per-shard visible count — the caller watches
        # it and grows visible_budget on overflow, the same contract as the
        # pair budget (silent truncation otherwise)
        metrics = {
            "loss": loss,
            "num_visible_max": jax.lax.pmax(
                jax.lax.pmax(num_vis, SHARD_AXIS), DATA_AXIS
            ),
            "num_pairs_max": jax.lax.pmax(
                jax.lax.pmax(num_pairs, SHARD_AXIS), DATA_AXIS
            ),
        }
        return state.with_params(new_params), new_adam, new_stats, metrics

    # shard every [capacity]-leading leaf; replicate scalars (Adam steps)
    from gs_tpu.models import gaussians as gmod

    state_t = gmod.empty_state(capacity, 3)
    adam_t = optim.init(state_t.params())
    stats_t = densify.DensifyStats.zeros(capacity)
    in_specs = (
        shard_specs(state_t, capacity),
        shard_specs(adam_t, capacity),
        shard_specs(stats_t, capacity),
        P(DATA_AXIS), P(), P(), P(), P(),
    )
    out_specs = (
        shard_specs(state_t, capacity),
        shard_specs(adam_t, capacity),
        shard_specs(stats_t, capacity),
        {"loss": P(), "num_visible_max": P(), "num_pairs_max": P()},
    )
    smapped = jax.shard_map(
        _local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(smapped)
