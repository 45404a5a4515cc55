"""Sharded render + train step over a (data, shard) mesh.

TPU-native parallelization of the reference's single-GPU training loop
(SURVEY.md §2.4), expressed as ONE ``shard_map``-decorated step:

  forward:
    - every device projects all Gaussians and bins (tiny, replicated)
    - image tiles are INTERLEAVED over the ``shard`` axis (tile t belongs to
      device t % n_shard) — splat density is wildly non-uniform across the
      screen, and interleaving is what keeps tile-shard load within ~10-20%
      instead of the 2-3x imbalance of block partitioning
    - each device composites its tile subset with the custom-VJP kernel, then
      ``all_gather`` over ``shard`` reassembles the full image (needed anyway:
      SSIM's 11x11 window crosses tile borders)
  backward (autodiff through the shard_map):
    - the all_gather's VJP routes each tile's pixel cotangents back to its
      owner; per-pair grads flow through the compositing VJP and scatter-add
      onto Gaussian params
    - parameter grads are ``psum``'d over ``shard`` (each device holds only
      its tiles' contribution) and ``pmean``'d over ``data`` (camera batch)
  optimizer: Adam on replicated params — identical on every device.

This module is the replicated-parameter layout (tiles + cameras sharded);
for N beyond one chip's memory use gs_tpu.parallel.gauss_sharded, which
shards the Gaussian state + Adam moments over the mesh and all_gathers
compact visible splats instead (SURVEY.md §2.4 rows 2-4).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


from gs_tpu.config import OptimizationParams, RasterizeConfig
from gs_tpu.models import densify, optim

from gs_tpu.ops import binning, projection
from gs_tpu.ops.rasterize_tiled import (ATTR_W, CompositeStatic,
                                        composite_tiles, pack_attributes,
                                        resolve_backend)
from gs_tpu.parallel.mesh import DATA_AXIS, SHARD_AXIS
from gs_tpu.utils import losses, schedules


def _tile_grid(height, width, cfg):
    tiles_x = -(-width // cfg.tile_w)
    tiles_y = -(-height // cfg.tile_h)
    return tiles_x, tiles_y


def local_to_global_tiles(st, n_shard, me):
    """Global tile ids for a device's column strip (compact local order).

    Tile column ownership: global column ``gx`` belongs to device
    ``gx % n_shard``; device ``me`` owns compact columns ``cx`` with
    ``gx = me + cx * n_shard``. Returns (global_ids [T_local], valid).
    """
    tiles_x_c = -(-st.tiles_x // n_shard)
    local = jnp.arange(st.tiles_y * tiles_x_c, dtype=jnp.int32)
    ty = local // tiles_x_c
    gx = me + (local % tiles_x_c) * n_shard
    valid = gx < st.tiles_x
    return ty * st.tiles_x + jnp.minimum(gx, st.tiles_x - 1), valid


def local_pair_budget(pair_budget: int, n_shard: int, chunk: int) -> int:
    """Per-device strip pair budget (the exact value composite_strip uses).

    Exposed so overflow watchers compare ``num_pairs_max`` against the real
    threshold — a recomputed approximation can sit up to ~chunk lower and
    trigger spurious budget growth + recompiles.
    """
    return max(-(-(pair_budget // n_shard) // chunk) * chunk, chunk)


def composite_strip(st, means2d, depths, bin_radii_v, attr, n_shard, me,
                    pair_budget, truncate):
    """Bin + gather + composite ONE device's tile-column strip.

    The de-replicated kernel of both sharded layouts (SURVEY.md §2.4 row 3):
    every pair-proportional stage runs on the local strip only, dividing the
    pre-composite cost by the shard count. Returns
    (tile_color [T_local,P,3] with bg NOT applied, tile_t, local num_pairs).
    """
    from gs_tpu.ops import rasterize_tiled as rt
    from gs_tpu.ops.rasterize_tiled import binning_align

    local_budget = local_pair_budget(pair_budget, n_shard, st.chunk)
    align = binning_align(st.chunk, st.backend, st.kernel_mode)
    n = means2d.shape[0]
    if (rt.PAIR_SOURCE == "carry" and local_budget < (1 << 24)
            and n < (1 << 24)):
        # gather-free carry pipeline on the local strip (see
        # rasterize_tiled.bin_carry_pairs); backward = sorted segment-reduce
        statics = (st.tiles_x, st.tiles_y, st.tile_w, st.tile_h,
                   local_budget, align, n_shard)
        sp_attr, ab, _ = rt.bin_carry_pairs(
            statics, attr, means2d, depths,
            bin_radii_v.astype(jnp.float32), me.astype(jnp.float32))
    else:
        ab = binning.bin_gaussians_aligned(
            means2d, depths, bin_radii_v,
            st.tiles_x, st.tiles_y, st.tile_w, st.tile_h, local_budget,
            align, col_stride=n_shard, col_offset=me,
        )
        # ONE packed gather per local pair straight from the attribute
        # table + zero NULL row (padding pairs index it; no mask pass
        # needed); see rasterize_tiled for why attrs do NOT ride the sort
        # as payload on this path
        attr_pad = jnp.concatenate(
            [attr, jnp.zeros((1, ATTR_W), jnp.float32)]
        )
        sp_attr = attr_pad[ab.pair_gauss]

    my_tiles, _ = local_to_global_tiles(st, n_shard, me)
    ends = ab.ends
    if truncate:
        from gs_tpu.ops.rasterize_tiled import effective_ends

        ends = effective_ends(st, jax.lax.stop_gradient(sp_attr),
                              my_tiles, ab.starts, ab.ends)

    tile_color, tile_t, _ = composite_tiles(
        st, sp_attr, my_tiles, ab.starts, ends
    )
    return tile_color, tile_t, ab.num_pairs


def reassemble_strips(st, n_shard, tile_color, height, width):
    """all_gather every device's column strip into the full [3,H,W] image."""
    p = st.tile_w * st.tile_h
    tiles_x_c = -(-st.tiles_x // n_shard)
    all_tiles = jax.lax.all_gather(tile_color, SHARD_AXIS, axis=0, tiled=False)
    # [D, ty*cxm, P, 3] -> [ty, cxm, D, P, 3]: global column gx = cx*D + d
    by_col = all_tiles.reshape(n_shard, st.tiles_y, tiles_x_c, p, 3)
    full = by_col.transpose(1, 2, 0, 3, 4).reshape(
        st.tiles_y, tiles_x_c * n_shard, p, 3
    )[:, : st.tiles_x]
    img = full.reshape(st.tiles_y, st.tiles_x, st.tile_h, st.tile_w, 3)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        3, st.tiles_y * st.tile_h, st.tiles_x * st.tile_w
    )
    return img[:, :height, :width]


def _sharded_render_image(state, camera, bg, st, cfg, active_sh_degree, n_shard,
                          pair_budget, means2d_offset=None):
    """Render one camera inside shard_map; returns full [3,H,W] image.

    Projection/SH is cheap and stays replicated; binning/gather/compositing
    run per-strip (:func:`composite_strip`); one image all_gather
    reassembles (needed anyway: SSIM's 11x11 window crosses tile borders).
    Also returns the device's true local pair count for overflow watching.
    """
    me = jax.lax.axis_index(SHARD_AXIS)

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
    tile_color, tile_t, num_pairs = composite_strip(
        st, means2d, splats.depths, projection.bin_radii(radii, opac), attr,
        n_shard, me, pair_budget, cfg.truncate_tiles,
    )
    tile_color = tile_color + tile_t[..., None] * bg[None, None, :]
    img = reassemble_strips(st, n_shard, tile_color, camera.height,
                            camera.width)
    return img, radii, num_pairs


def make_sharded_train_step(
    mesh,
    opt_cfg: OptimizationParams,
    raster_cfg: RasterizeConfig,
    height: int,
    width: int,
    capacity: int,
    active_sh_degree: int,
    pair_budget: int | None = None,
):
    """Build the jitted multi-device train step.

    Inputs: replicated (state, adam, stats), camera batch sharded over
    ``data`` (leading axis = mesh data size), replicated bg/iteration.
    Outputs: replicated updated (state, adam, stats) + scalar metrics.
    """
    n_data, n_shard = mesh.shape[DATA_AXIS], mesh.shape[SHARD_AXIS]
    tiles_x, tiles_y = _tile_grid(height, width, raster_cfg)
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
        # my camera: this device's slice of the data axis has batch 1
        cam = jax.tree.map(
            lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x, cam_batch
        )
        params = state.params()
        offset0 = jnp.zeros((capacity, 2), jnp.float32)
        band_rows = -(-height // n_shard)

        def loss_fn(p, offset):
            s = state.with_params(p)
            img, radii, num_pairs = _sharded_render_image(
                s, cam, bg, st, raster_cfg, active_sh_degree, n_shard, pair_budget,
                means2d_offset=offset,
            )
            # BANDED loss: each shard device reduces only its H/n_shard row
            # band (+SSIM halo); the local contributions psum (OUTSIDE the
            # grad: under check_vma=False the transpose of an in-loss psum
            # is psum again, which over-counts cotangents n_shard-fold)
            # into the exact full-image photometric loss. The previous
            # full-image loss on every device was a fixed serial cost each
            # added shard paid again (replicated-fraction shrink).
            me = jax.lax.axis_index(SHARD_AXIS)
            l1_sum, ssim_sum = losses.banded_photometric_terms(
                img, cam.image, me * band_rows, band_rows)
            denom = 3.0 * height * width
            contrib = ((1.0 - opt_cfg.lambda_dssim) * l1_sum
                       - opt_cfg.lambda_dssim * ssim_sum) / denom
            return contrib, (radii, num_pairs)

        (contrib, (radii, num_pairs)), (g_params, g_offset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offset0)
        loss = (jax.lax.psum(contrib, SHARD_AXIS)
                + opt_cfg.lambda_dssim)  # + lambda*(1 - .) constant term

        # reduce tile-shard contributions. With the banded loss each pixel's
        # cotangent originates on exactly ONE device (its band owner), so
        # the true gradient is the SUM over shard devices; then average over
        # the camera batch.
        g_params = jax.lax.pmean(
            jax.lax.psum(g_params, SHARD_AXIS), DATA_AXIS
        )
        # per-camera screen-space gradient (reduced over tile shards only):
        # densify stats accumulate each camera's own gradient norm, like the
        # reference's per-iteration add_densification_stats
        g_offset_cam = jax.lax.psum(g_offset, SHARD_AXIS)
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
        # final-iteration parity: the reference gates optimizer.step() on
        # iteration < opt.iterations (train.py:139-141); apply_update is a
        # traced bool so the last step selects the un-updated state
        sel = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(apply_update, a, b), new, old)
        new_params = sel(upd_params, params)
        new_adam = optim.AdamState(
            mu=sel(upd_adam.mu, adam.mu), nu=sel(upd_adam.nu, adam.nu),
            step=sel(upd_adam.step, adam.step),
        )

        # densify stats: sum each camera's contribution over the data axis so
        # the replicated-output contract holds (one batch = n_data reference
        # iterations' worth of stats)
        vis = radii > 0
        g_ndc = g_offset_cam * jnp.array([0.5 * width, 0.5 * height], jnp.float32)
        d_accum = jax.lax.psum(
            jnp.where(vis, jnp.linalg.norm(g_ndc, axis=-1), 0.0), DATA_AXIS
        )
        d_denom = jax.lax.psum(vis.astype(jnp.float32), DATA_AXIS)
        r_max = jax.lax.pmax(
            jnp.where(vis, radii.astype(jnp.float32), 0.0), DATA_AXIS
        )
        stats = densify.DensifyStats(
            xyz_grad_accum=stats.xyz_grad_accum + d_accum,
            denom=stats.denom + d_denom,
            max_radii2d=jnp.maximum(stats.max_radii2d, r_max),
        )
        # worst per-device LOCAL pair count vs the local budget: callers grow
        # pair_budget_factor on overflow (same contract as single-device)
        metrics = {
            "loss": loss,
            "num_pairs_max": jax.lax.pmax(
                jax.lax.pmax(num_pairs, SHARD_AXIS), DATA_AXIS
            ),
        }
        return state.with_params(new_params), new_adam, stats, metrics

    smapped = jax.shard_map(
        _local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), {"loss": P(), "num_pairs_max": P()}),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_sharded_render(
    mesh,
    raster_cfg: RasterizeConfig,
    height: int,
    width: int,
    capacity: int,
    active_sh_degree: int,
    pair_budget: int | None = None,
):
    """Inference-only sharded render of one camera (replicated in/out)."""
    n_shard = mesh.shape[SHARD_AXIS]
    tiles_x, tiles_y = _tile_grid(height, width, raster_cfg)
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

    def _render(state, camera, bg):
        img, _, _ = _sharded_render_image(
            state, camera, bg, st, raster_cfg, active_sh_degree, n_shard, pair_budget
        )
        return img

    smapped = jax.shard_map(
        _render, mesh=mesh, in_specs=(P(), P(), P()), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(smapped)
