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

        s_state, s_adam, s_stats, sm = step(
            st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            jnp.bool_(True),
        )
        s_loss = sm["loss"]
        assert int(sm["num_pairs_max"]) > 0
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

        s_state, s_adam, s_stats, s_m = step(
            st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            jnp.bool_(True),
        )
        s_loss = s_m["loss"]
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
        # every shard's splats fit: num_visible_max <= local capacity
        assert 0 < int(s_m["num_visible_max"]) <= st.capacity // 8
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
        s_state, _, _, s_m = step(
            st, adam, stats, cameras.stack_cameras([cam]), jnp.zeros(3),
            jnp.int32(0), jnp.float32(1.0), jnp.bool_(True),
        )
        s_loss = s_m["loss"]
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
        s_state, _, _, s_m = step(
            st, adam, stats, cameras.stack_cameras([cam]), jnp.zeros(3),
            jnp.int32(0), jnp.float32(1.0), jnp.bool_(True),
        )
        assert np.isfinite(float(s_m["loss"]))
        # budget 2 is deliberately too small: overflow must be REPORTED
        assert int(s_m["num_visible_max"]) > 2
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
        s_state, _, s_stats, sm = step(
            st, adam, stats, batch, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            jnp.bool_(True),
        )
        assert np.isfinite(float(sm["loss"]))
        assert float(jnp.abs(s_state.xyz - st.xyz).max()) > 0
        # stats counted both cameras
        assert float(s_stats.denom.max()) >= 2.0


class TestPallasUnderShardMap:
    """Pallas kernels INSIDE the shard_map'd steps (interpret mode on CPU).

    On real TPU hardware ``resolve_backend('auto')`` places pallas_call
    inside the sharded train step — a composition none of the
    backend='xla' mesh tests exercise. Run it here in interpret mode so the
    first multi-chip hardware run is not its first test anywhere. (Mosaic
    lowering of the same composition is covered by
    ``benchmarks/aot_check.py --sharded``.) Interpret-mode pallas is
    Python-speed: keep the scene tiny.
    """

    PCFG = RasterizeConfig(backend="pallas", chunk=32, tile_w=16, tile_h=16)

    def _run(self, make_step, cfg):
        st, cam = _scene()
        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=1)
        step = make_step(mesh, opt_cfg, cfg, H, W, st.capacity, 1)
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        cam_batch = cameras.stack_cameras([cam])
        s, a, d, m = step(st, adam, stats, cam_batch, jnp.zeros(3),
                          jnp.int32(0), jnp.float32(1.0), jnp.bool_(True))
        return s, a, d, m

    def test_gauss_sharded_pallas_matches_xla(self):
        from gs_tpu.parallel.gauss_sharded import make_gauss_sharded_train_step

        p_state, p_adam, p_stats, p_m = self._run(
            make_gauss_sharded_train_step, self.PCFG)
        x_state, x_adam, x_stats, x_m = self._run(
            make_gauss_sharded_train_step, RCFG)
        np.testing.assert_allclose(float(p_m["loss"]), float(x_m["loss"]),
                                   rtol=2e-4)
        np.testing.assert_allclose(p_state.xyz, x_state.xyz,
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(p_stats.xyz_grad_accum,
                                   x_stats.xyz_grad_accum,
                                   rtol=2e-3, atol=1e-7)
        assert p_state.xyz.sharding.spec[0] == mesh_mod.SHARD_AXIS

    def test_tile_sharded_pallas_matches_xla(self):
        p = self._run(make_sharded_train_step, self.PCFG)
        x = self._run(make_sharded_train_step, RCFG)
        np.testing.assert_allclose(float(p[3]["loss"]), float(x[3]["loss"]),
                                   rtol=2e-4)
        np.testing.assert_allclose(p[0].xyz, x[0].xyz, rtol=1e-3, atol=1e-6)

    def test_tile_sharded_carry_matches_gather(self):
        # the gather-free carry pipeline inside shard_map (strip binning
        # with col_stride + traced col_offset through the expand kernel)
        from gs_tpu.ops import rasterize_tiled as rt

        g = self._run(make_sharded_train_step, self.PCFG)
        old = rt.PAIR_SOURCE
        try:
            rt.PAIR_SOURCE = "carry"
            c = self._run(make_sharded_train_step, self.PCFG)
        finally:
            rt.PAIR_SOURCE = old
        # identical pair attributes -> identical forward/backward numerics
        # up to the gradient-reduction reassociation
        np.testing.assert_allclose(float(c[3]["loss"]), float(g[3]["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(c[0].xyz, g[0].xyz, rtol=1e-4, atol=1e-7)


class TestShardedDensify:
    """Densify/prune on the gauss-sharded layout == replicated densify."""

    def _hot_stats(self, st, round_idx):
        # densify signal as a function of row CONTENT (not slot index):
        # replicated and sharded layouts place children in different slots,
        # so only content-keyed stats select the same Gaussians in both
        h = np.sin(np.asarray(st.xyz).sum(axis=1) * 977.13 + round_idx)
        hot = (h > 0.6) & np.asarray(st.alive)
        cap = st.capacity
        return densify.DensifyStats(
            xyz_grad_accum=jnp.asarray(hot.astype(np.float32)),
            denom=jnp.ones(cap, jnp.float32),
            max_radii2d=jnp.zeros(cap, jnp.float32),
        )

    def _sorted_alive_rows(self, st):
        alive = np.asarray(st.alive)
        rows = np.concatenate(
            [np.asarray(st.xyz)[alive], np.asarray(st.log_scale)[alive],
             np.asarray(st.logit_opacity)[alive]], axis=1,
        )
        order = np.lexsort(rows.T[::-1])
        return rows[order]

    def test_three_rounds_match_replicated(self):
        from gs_tpu.parallel.densify_sharded import make_sharded_densify

        st, _ = _scene(n=40, cap=128)
        # small scales -> clone branch (1 child per hot slot); cap 128 leaves
        # every shard enough free slots that neither path drops children
        st = st.replace(log_scale=jnp.full_like(st.log_scale, math.log(0.005)))
        # spread alive rows round-robin over the 8 shards (local_cap 16) so
        # every shard starts with free slots — the balanced layout rebalance
        # maintains in real runs; packed-at-the-front would overflow shard 0
        perm = np.argsort([(i % 8) * 16 + i // 8 for i in range(128)])
        st = jax.tree.map(lambda a: a[jnp.asarray(perm)], st)
        opt_cfg = OptimizationParams(densify_grad_threshold=2e-4)
        mesh = mesh_mod.make_mesh(data=1)  # 1x8: local_cap 16
        sh_densify = make_sharded_densify(mesh, opt_cfg, st.capacity, 1,
                                          use_size_prune=False)

        s_state, s_adam = st, optim.init(st.params())
        r_state, r_adam = st, optim.init(st.params())
        for rnd in range(3):
            key = jax.random.PRNGKey(rnd)
            s_state, s_adam, _, s_rep = sh_densify(
                s_state, s_adam, self._hot_stats(s_state, rnd), key,
                jnp.float32(10.0)
            )
            r_state, r_adam, _, r_rep = densify.densify_and_prune(
                r_state, r_adam, self._hot_stats(r_state, rnd), key,
                max_grad=2e-4, min_opacity=0.005,
                extent=10.0, percent_dense=0.01, use_size_prune=False,
            )
            assert int(s_rep.n_dropped) == 0, "test sized to avoid local overflow"
            assert int(r_rep.n_dropped) == 0
            # identical alive counts every round (VERDICT item 3 contract)
            assert int(s_state.num_alive) == int(r_state.num_alive)
            # identical *children values* (split noise is per-global-slot)
            np.testing.assert_allclose(
                self._sorted_alive_rows(s_state),
                self._sorted_alive_rows(r_state), rtol=1e-5, atol=1e-6,
            )
        # layout stayed sharded
        assert s_state.xyz.sharding.spec[0] == mesh_mod.SHARD_AXIS

        # a 4th round through the SPLIT branch: force big scales; counts and
        # parent-derived fields must still agree (split noise is parent-slot
        # keyed, and child *placement* differs by design, so xyz of split
        # children is compared only in distribution here)
        big = jnp.full_like(s_state.log_scale, math.log(0.5))
        s_state = s_state.replace(log_scale=big)
        r_state = r_state.replace(log_scale=big)
        key = jax.random.PRNGKey(99)
        s_state, s_adam, _, s_rep = sh_densify(
            s_state, s_adam, self._hot_stats(s_state, 9), key, jnp.float32(10.0))
        r_state, r_adam, _, r_rep = densify.densify_and_prune(
            r_state, r_adam, self._hot_stats(r_state, 9), key,
            max_grad=2e-4, min_opacity=0.005, extent=10.0, percent_dense=0.01,
            use_size_prune=False)
        assert int(s_rep.n_split) == int(r_rep.n_split) > 0
        # shards near capacity may drop children the replicated layout can
        # still place (and vice versa); the reports must reconcile exactly
        assert (int(s_state.num_alive) + int(s_rep.n_dropped)
                == int(r_state.num_alive) + int(r_rep.n_dropped))

    def test_local_overflow_reports_drops(self):
        from gs_tpu.parallel.densify_sharded import make_sharded_densify

        # all 64 slots alive and hot on one shard-size scene: every shard is
        # full, every clone drops; replicated would also drop (cap full)
        st, _ = _scene(n=64, cap=64)
        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=1)
        sh_densify = make_sharded_densify(mesh, opt_cfg, 64, 1, False)
        stats = densify.DensifyStats(
            xyz_grad_accum=jnp.ones(64), denom=jnp.ones(64),
            max_radii2d=jnp.zeros(64),
        )
        s_state, _, _, rep = sh_densify(
            st, optim.init(st.params()), stats, jax.random.PRNGKey(0),
            jnp.float32(10.0),
        )
        assert int(rep.n_dropped) > 0
        assert int(s_state.num_alive) == 64


class TestShardRebalance:
    def test_balances_and_preserves_rows(self):
        from gs_tpu.parallel.densify_sharded import (make_sharded_rebalance,
                                                     shard_occupancy)

        cap, n_shard = 64, 8
        mesh = mesh_mod.make_mesh(data=1)
        rng = np.random.default_rng(0)
        st = gaussians.empty_state(cap, 1)
        # skew: shards 0-1 full (slots 0..15 alive), rest empty
        alive = np.zeros(cap, bool)
        alive[:16] = True
        xyz = rng.normal(size=(cap, 3)).astype(np.float32)
        st = st.replace(xyz=jnp.asarray(xyz), alive=jnp.asarray(alive))
        adam = optim.init(st.params())
        # tag moments per row so we can check they migrate with their row
        adam = adam._replace(mu={**adam.mu, "xyz": jnp.asarray(xyz) * 0.5})
        stats = densify.DensifyStats.zeros(cap)

        reb = make_sharded_rebalance(mesh, cap, 1, migration_budget=4)
        s, a, t = st, adam, stats
        for _ in range(4):
            s, a, t, moved = reb(s, a, t)
        occ = np.asarray(shard_occupancy(s, n_shard))
        assert occ.sum() == 16
        assert occ.max() <= 2  # 16 alive / 8 shards = 2 each
        # every alive row kept its (xyz, mu) pairing
        alive2 = np.asarray(s.alive)
        got = np.asarray(s.xyz)[alive2]
        want = xyz[alive]
        np.testing.assert_allclose(
            got[np.lexsort(got.T[::-1])], want[np.lexsort(want.T[::-1])],
            rtol=0, atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(a.mu["xyz"])[alive2], np.asarray(s.xyz)[alive2] * 0.5,
            rtol=0, atol=0,
        )

    def test_never_destroys_rows_when_senders_exceed_intake(self):
        # Regression (round-2 advisor, high): 7 overfull shards each send
        # min(excess, k) rows but the single underfull shard only absorbs
        # min(deficit, k); the unabsorbed pool rows used to be silently
        # destroyed (alive 56 -> 53 with budget 4). Total alive must be
        # invariant under rebalance, always.
        from gs_tpu.parallel.densify_sharded import (make_sharded_rebalance,
                                                     shard_occupancy)

        cap, n_shard = 64, 8
        mesh = mesh_mod.make_mesh(data=1)
        st = gaussians.empty_state(cap, 1)
        alive = np.zeros(cap, bool)
        alive[:56] = True  # shards 0-6 full (8 each), shard 7 empty
        rng = np.random.default_rng(1)
        xyz = rng.normal(size=(cap, 3)).astype(np.float32)
        st = st.replace(xyz=jnp.asarray(xyz), alive=jnp.asarray(alive))
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(cap)
        reb = make_sharded_rebalance(mesh, cap, 1, migration_budget=4)
        s, a, t = st, adam, stats
        for _ in range(3):
            s, a, t, moved = reb(s, a, t)
            assert int(jnp.sum(s.alive.astype(jnp.int32))) == 56
        occ = np.asarray(shard_occupancy(s, n_shard))
        assert occ.sum() == 56
        assert occ.max() - occ.min() <= 1
        # row contents survived the shuffle
        got = np.asarray(s.xyz)[np.asarray(s.alive)]
        want = xyz[alive]
        np.testing.assert_allclose(
            got[np.lexsort(got.T[::-1])], want[np.lexsort(want.T[::-1])],
            rtol=0, atol=0,
        )

    def test_balanced_input_is_noop(self):
        from gs_tpu.parallel.densify_sharded import (make_sharded_rebalance,
                                                     shard_occupancy)

        cap = 64
        mesh = mesh_mod.make_mesh(data=1)
        st, _ = _scene(n=64, cap=cap)  # uniformly full
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(cap)
        reb = make_sharded_rebalance(mesh, cap, 1, migration_budget=4)
        s, a, t, moved = reb(st, adam, stats)
        assert int(moved) == 0
        np.testing.assert_array_equal(np.asarray(s.xyz), np.asarray(st.xyz))


class TestRebalanceLoop:
    def test_one_call_matches_iterated_rounds(self):
        from gs_tpu.parallel.densify_sharded import (
            make_sharded_rebalance, make_sharded_rebalance_loop,
            shard_occupancy)

        cap, n_shard = 64, 8
        mesh = mesh_mod.make_mesh(data=1)
        st = gaussians.empty_state(cap, 1)
        alive = np.zeros(cap, bool)
        alive[:16] = True  # shards 0-1 full, rest empty
        rng = np.random.default_rng(2)
        xyz = rng.normal(size=(cap, 3)).astype(np.float32)
        st = st.replace(xyz=jnp.asarray(xyz), alive=jnp.asarray(alive))
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(cap)

        loop = make_sharded_rebalance_loop(mesh, cap, 1, migration_budget=4,
                                           max_rounds=8)
        ls, la, lt, moved = loop(st, adam, stats, jnp.float32(1.1))
        assert int(moved) > 0
        occ = np.asarray(shard_occupancy(ls, n_shard))
        assert occ.sum() == 16 and occ.max() <= 2

        reb = make_sharded_rebalance(mesh, cap, 1, migration_budget=4)
        s, a, t = st, adam, stats
        for _ in range(8):
            s, a, t, m1 = reb(s, a, t)
            if int(m1) == 0:
                break
        np.testing.assert_array_equal(np.asarray(ls.xyz), np.asarray(s.xyz))
        np.testing.assert_array_equal(np.asarray(ls.alive), np.asarray(s.alive))

    def test_below_skew_is_noop_single_dispatch(self):
        from gs_tpu.parallel.densify_sharded import make_sharded_rebalance_loop

        cap = 64
        mesh = mesh_mod.make_mesh(data=1)
        st, _ = _scene(n=64, cap=cap)
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(cap)
        loop = make_sharded_rebalance_loop(mesh, cap, 1, migration_budget=4)
        s, _, _, moved = loop(st, adam, stats, jnp.float32(1.5))
        assert int(moved) == 0
        np.testing.assert_array_equal(np.asarray(s.xyz), np.asarray(st.xyz))


class TestFinalIterationSkip:
    def test_apply_update_false_freezes_params(self):
        st, cam = _scene()
        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=1)
        step = make_sharded_train_step(mesh, opt_cfg, RCFG, H, W, st.capacity, 1)
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        cam_batch = cameras.stack_cameras([cam])
        s_state, s_adam, _, sm = step(
            st, adam, stats, cam_batch, jnp.zeros(3), jnp.int32(0),
            jnp.float32(1.0), jnp.bool_(False),
        )
        # the reference's final iteration: loss/stats computed, no Adam step
        assert np.isfinite(float(sm["loss"]))
        np.testing.assert_array_equal(np.asarray(s_state.xyz), np.asarray(st.xyz))
        np.testing.assert_array_equal(
            np.asarray(s_adam.mu["xyz"]), np.asarray(adam.mu["xyz"]))


class TestMultiprocessBatchPath:
    """The real multi-process data contract, exercised single-process."""

    def test_assembled_batch_matches_stacked(self):
        from gs_tpu.data import multihost

        st, cam0 = _scene(seed=0)
        _, cam1 = _scene(seed=1)
        mesh = mesh_mod.make_mesh(data=2)  # 2x4
        g = multihost.assemble_global_batch(mesh, [cam0, cam1])
        s = cameras.stack_cameras([cam0, cam1])
        for name in ("view", "full_proj", "cam_pos", "tan_fovx", "image"):
            np.testing.assert_array_equal(
                np.asarray(getattr(g, name)), np.asarray(getattr(s, name)),
                err_msg=name)
        # the image really is laid out over the data axis
        assert g.image.sharding.spec[0] == mesh_mod.DATA_AXIS

    def test_assembled_batch_drives_step_identically(self):
        st, cam0 = _scene(seed=0)
        _, cam1 = _scene(seed=1)
        from gs_tpu.data import multihost

        opt_cfg = OptimizationParams()
        mesh = mesh_mod.make_mesh(data=2)
        step = make_sharded_train_step(mesh, opt_cfg, RCFG, H, W, st.capacity, 1)
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        args = (jnp.zeros(3), jnp.int32(0), jnp.float32(1.0), jnp.bool_(True))
        g_state, _, _, gm = step(
            st, adam, stats, multihost.assemble_global_batch(mesh, [cam0, cam1]),
            *args)
        r_state, _, _, rm = step(
            st, adam, stats, cameras.stack_cameras([cam0, cam1]), *args)
        np.testing.assert_allclose(float(gm["loss"]), float(rm["loss"]),
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(g_state.xyz),
                                      np.asarray(r_state.xyz))

    def test_unowned_fed_slot_raises(self):
        from gs_tpu.data import multihost

        _, cam0 = _scene(seed=0)
        cam_noimg = cam0.replace(image=None)  # params-only (unowned) camera
        mesh = mesh_mod.make_mesh(data=2)
        with pytest.raises(RuntimeError, match="does not own"):
            jax.block_until_ready(
                multihost.assemble_global_batch(mesh, [cam0, cam_noimg]).image)

    def test_sampler_feeds_slots_from_owner_pools(self):
        import random as pyrandom

        from gs_tpu.data import multihost

        # simulate 2 processes feeding data rows [0, 1]; 8 cameras with
        # round-robin ownership (gi % 2). Each host holds images only for
        # its owned cameras; the sampler must draw IDENTICAL global batches
        # on both hosts and give slot i only cameras owned by feeder i.
        base = []
        for i in range(8):
            _, c = _scene(seed=i)
            base.append(c)

        def host_run(host):
            pyrandom.seed(123)
            view = [c if i % 2 == host else c.replace(image=None)
                    for i, c in enumerate(base)]
            by_id = {id(c): i for i, c in enumerate(view)}
            sampler = multihost.BatchSampler(view, feeders=[0, 1],
                                             process_count=2)
            seqs = []
            for _ in range(6):
                batch = sampler.next_batch()
                idx = [by_id[id(b)] for b in batch]
                seqs.append(idx)
                for slot, (gi, b) in enumerate(zip(idx, batch)):
                    assert gi % 2 == slot  # slot fed by its owner process
                    if slot == host:
                        assert b.image is not None  # pixels present locally
            return seqs

        assert host_run(0) == host_run(1)  # identical global draws
