"""Multi-device tests on the virtual 8-CPU mesh: sharded render == single-device."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_tpu import cameras
from gs_tpu.config import OptimizationParams, RasterizeConfig
from gs_tpu.models import densify, gaussians, optim
from gs_tpu.parallel import mesh as mesh_mod
from gs_tpu.parallel.sharded import make_sharded_render, make_sharded_train_step
from gs_tpu.renderer import render

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

H = W = 32
RCFG = RasterizeConfig(backend="xla", chunk=32, tile_w=16, tile_h=16)


def _scene(n=48, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    st = gaussians.create_from_pcd(pts, cols, max_sh_degree=1, capacity=cap)
    cam = cameras.make_camera(
        np.eye(3), np.array([0.0, 0, 4.0]), fovx=math.radians(60),
        fovy=math.radians(60), width=W, height=H,
        image=rng.uniform(0, 1, (3, H, W)).astype(np.float32),
    )
    return st, cam


class TestShardedRender:
    def test_matches_single_device(self):
        st, cam = _scene()
        mesh = mesh_mod.make_mesh(data=1)  # 1x8: all devices on tile shard
        bg = jnp.array([0.3, 0.2, 0.1])
        sharded = make_sharded_render(mesh, RCFG, H, W, st.capacity, 1)
        img_multi = sharded(st, cam, bg)
        img_single = render(cam, st, active_sh_degree=1, bg_color=bg, cfg=RCFG).image
        np.testing.assert_allclose(img_multi, img_single, rtol=1e-4, atol=1e-5)


class TestShardedTrainStep:
    def test_matches_single_device_step(self):
        from gs_tpu.training import train_step

        st, cam = _scene()
        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=1)
        step = make_sharded_train_step(mesh, opt_cfg, RCFG, H, W, st.capacity, 1)

        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        cam_batch = cameras.stack_cameras([cam])

        s_state, s_adam, s_stats, s_loss = step(
            st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0)
        )
        r_state, r_adam, r_stats, m = train_step(
            st, adam, stats, cam, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            active_sh_degree=1, opt_cfg=opt_cfg, raster_cfg=RCFG,
            accumulate_stats=True,
        )
        np.testing.assert_allclose(float(s_loss), float(m["loss"]), rtol=1e-5)
        np.testing.assert_allclose(s_state.xyz, r_state.xyz, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            s_stats.xyz_grad_accum, r_stats.xyz_grad_accum, rtol=1e-3, atol=1e-7
        )
        np.testing.assert_allclose(
            s_adam.nu["opacity"], r_adam.nu["opacity"], rtol=1e-3, atol=1e-10
        )

class TestGaussianSharded:
    """Model-state-sharded step (gauss_sharded): params + Adam over shard."""

    def test_matches_single_device_step(self):
        from gs_tpu.parallel.gauss_sharded import make_gauss_sharded_train_step
        from gs_tpu.training import train_step

        st, cam = _scene()
        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=1)  # 1x8: gaussians sharded 8 ways
        step = make_gauss_sharded_train_step(
            mesh, opt_cfg, RCFG, H, W, st.capacity, 1
        )
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        cam_batch = cameras.stack_cameras([cam])

        s_state, s_adam, s_stats, s_loss = step(
            st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0)
        )
        r_state, r_adam, r_stats, m = train_step(
            st, adam, stats, cam, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            active_sh_degree=1, opt_cfg=opt_cfg, raster_cfg=RCFG,
            accumulate_stats=True,
        )
        np.testing.assert_allclose(float(s_loss), float(m["loss"]), rtol=1e-5)
        np.testing.assert_allclose(s_state.xyz, r_state.xyz, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            s_state.logit_opacity, r_state.logit_opacity, rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            s_stats.xyz_grad_accum, r_stats.xyz_grad_accum, rtol=1e-3, atol=1e-7
        )
        np.testing.assert_allclose(
            s_adam.nu["opacity"], r_adam.nu["opacity"], rtol=1e-3, atol=1e-10
        )
        # outputs keep the sharded layout (leading axis over 'shard')
        assert s_state.xyz.sharding.spec[0] == mesh_mod.SHARD_AXIS

    def test_visible_compaction_exact_when_budget_suffices(self):
        from gs_tpu.parallel.gauss_sharded import make_gauss_sharded_train_step
        from gs_tpu.training import train_step

        st, cam = _scene()
        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=1)
        # local_cap = 64/8 = 8; budget 8 holds every possibly-visible splat
        step = make_gauss_sharded_train_step(
            mesh, opt_cfg, RCFG, H, W, st.capacity, 1, visible_budget=8
        )
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        s_state, _, _, s_loss = step(
            st, adam, stats, cameras.stack_cameras([cam]), jnp.zeros(3),
            jnp.int32(0), jnp.float32(1.0)
        )
        _, _, _, m = train_step(
            st, adam, stats, cam, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            active_sh_degree=1, opt_cfg=opt_cfg, raster_cfg=RCFG,
            accumulate_stats=True,
        )
        np.testing.assert_allclose(float(s_loss), float(m["loss"]), rtol=1e-5)

    def test_visible_compaction_lossy_budget_still_runs(self):
        from gs_tpu.parallel.gauss_sharded import make_gauss_sharded_train_step

        st, cam = _scene()
        mesh = mesh_mod.make_mesh(data=1)
        step = make_gauss_sharded_train_step(
            mesh, OptimizationParams(), RCFG, H, W, st.capacity, 1,
            visible_budget=2,  # deliberately too small: splats dropped
        )
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        s_state, _, _, loss = step(
            st, adam, stats, cameras.stack_cameras([cam]), jnp.zeros(3),
            jnp.int32(0), jnp.float32(1.0)
        )
        assert np.isfinite(float(loss))
        assert bool(jnp.all(jnp.isfinite(s_state.xyz)))

    def test_compact_visible_semantics(self):
        from gs_tpu.parallel.gauss_sharded import SPLAT_W, compact_visible

        rng = np.random.default_rng(0)
        packed = rng.normal(size=(16, SPLAT_W)).astype(np.float32)
        vis = np.zeros(16, bool)
        vis[[1, 4, 5, 11]] = True
        packed[:, -1] = np.where(vis, 3.0, 0.0)  # bin radius column
        out, n = compact_visible(jnp.asarray(packed), budget=8)
        assert int(n) == 4
        np.testing.assert_array_equal(np.asarray(out[:4]), packed[vis])
        assert not np.any(np.asarray(out[4:]))  # tail rows inert zeros
        # overflow: budget 2 keeps the first two visibles
        out2, n2 = compact_visible(jnp.asarray(packed), budget=2)
        assert int(n2) == 4
        np.testing.assert_array_equal(np.asarray(out2), packed[vis][:2])

    def test_state_specs_shard_every_array_leaf(self):
        from jax.sharding import PartitionSpec as P

        from gs_tpu.parallel.gauss_sharded import shard_specs

        st, _ = _scene()
        flat, _ = jax.tree_util.tree_flatten(shard_specs(st, st.capacity))
        assert flat and all(s == P(mesh_mod.SHARD_AXIS) for s in flat)

    def test_data_parallel_two_cameras(self):
        st, cam0 = _scene(seed=0)
        _, cam1 = _scene(seed=1)
        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=2)  # 2x4
        step = make_sharded_train_step(mesh, opt_cfg, RCFG, H, W, st.capacity, 1)
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        batch = cameras.stack_cameras([cam0, cam1])
        s_state, _, s_stats, loss = step(
            st, adam, stats, batch, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0)
        )
        assert np.isfinite(float(loss))
        assert float(jnp.abs(s_state.xyz - st.xyz).max()) > 0
        # stats counted both cameras
        assert float(s_stats.denom.max()) >= 2.0
