"""Fast tiled rasterizer (XLA backend) vs the oracle: forward + custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_tpu.config import RasterizeConfig
from gs_tpu.ops import binning
from gs_tpu.ops.rasterize_oracle import rasterize_oracle
from gs_tpu.ops.rasterize_tiled import rasterize_tiled
from tests.reference_raster import random_scene

CFG = RasterizeConfig(tile_w=16, tile_h=16, chunk=32, backend="xla")


class TestBinning:
    def test_pairs_cover_tile_rects(self):
        args = random_scene(jax.random.PRNGKey(0), 50, 64, 96)
        means2d, _, _, _, depths, radii = args
        tx, ty, tw, th = 6, 4, 16, 16
        b = binning.bin_gaussians(means2d, depths, radii, tx, ty, tw, th, 4096)
        x0, y0, x1, y1 = binning.tile_rect(means2d, radii, tx, ty, tw, th)
        expected = int(jnp.sum((x1 - x0) * (y1 - y0)))
        assert int(b.num_pairs) == expected
        # every tile's range holds pairs whose rect covers that tile, in depth order
        off = np.asarray(b.tile_offsets)
        pg = np.asarray(b.pair_gauss)
        d = np.asarray(depths)
        for t in range(tx * ty):
            idx = pg[off[t]:off[t + 1]]
            tile_x, tile_y = t % tx, t // tx
            assert np.all(np.asarray(x0)[idx] <= tile_x)
            assert np.all(np.asarray(x1)[idx] > tile_x)
            assert np.all(np.asarray(y0)[idx] <= tile_y)
            assert np.all(np.asarray(y1)[idx] > tile_y)
            assert np.all(np.diff(d[idx]) >= 0)  # depth-sorted within tile

    def test_aligned_binning_matches_reference_binning(self):
        args = random_scene(jax.random.PRNGKey(0), 50, 64, 96)
        means2d, _, _, _, depths, radii = args
        tx, ty, tw, th, align = 6, 4, 16, 16, 8
        b = binning.bin_gaussians(means2d, depths, radii, tx, ty, tw, th, 4096)
        ab = binning.bin_gaussians_aligned(
            means2d, depths, radii, tx, ty, tw, th, 4096, align
        )
        assert int(ab.num_pairs) == int(b.num_pairs)
        off = np.asarray(b.tile_offsets)
        starts, ends = np.asarray(ab.starts), np.asarray(ab.ends)
        pg, valid = np.asarray(ab.pair_gauss), np.asarray(ab.valid)
        for t in range(tx * ty):
            ref = np.asarray(b.pair_gauss)[off[t]:off[t + 1]]
            assert starts[t] % align == 0 and ends[t] % align == 0
            got_valid = valid[starts[t]:ends[t]]
            got = pg[starts[t]:ends[t]][got_valid]
            np.testing.assert_array_equal(got, ref)  # same splats, same order
            # all padding sits at the tail of the tile's range
            n_real = got_valid.sum()
            assert not got_valid[n_real:].any()
        # nothing valid outside tile ranges
        outside = np.ones(len(valid), bool)
        for t in range(tx * ty):
            outside[starts[t]:ends[t]] = False
        assert not valid[outside].any()

    def test_aligned_binning_overflow_drops_whole_gaussians(self):
        args = random_scene(jax.random.PRNGKey(3), 64, 64, 96)
        means2d, _, _, _, depths, radii = args
        tx, ty = 6, 4
        full = binning.bin_gaussians_aligned(
            means2d, depths, radii, tx, ty, 16, 16, 4096, 8
        )
        budget = max(int(full.num_pairs) // 2, 8)
        ab = binning.bin_gaussians_aligned(
            means2d, depths, radii, tx, ty, 16, 16, budget, 8
        )
        assert int(ab.num_pairs) == int(full.num_pairs)  # reports true total
        # surviving pair count <= budget; layout still aligned + consistent
        assert int(ab.valid.sum()) <= budget
        starts, ends = np.asarray(ab.starts), np.asarray(ab.ends)
        valid = np.asarray(ab.valid)
        counts = np.array([valid[s:e].sum() for s, e in zip(starts, ends)])
        assert counts.sum() == int(ab.valid.sum())

    @pytest.mark.parametrize("budget_frac", [1.0, 0.5])
    def test_expand_impl_pallas_matches_scatter(self, budget_frac):
        # the interval-expand kernel path must be BITWISE identical to the
        # delta-scatter path, including overflow truncation; carried attrs
        # must equal the gather attr_pad[pair_gauss] exactly
        args = random_scene(jax.random.PRNGKey(5), 300, 96, 128)
        means2d, _, _, _, depths, radii = args
        tx, ty, tw, th, align = 8, 6, 16, 16, 8
        full = binning.bin_gaussians_aligned(
            means2d, depths, radii, tx, ty, tw, th, 8192, align)
        budget = max(int(int(full.num_pairs) * budget_frac), 8)
        attr = jax.random.normal(jax.random.PRNGKey(6), (300, 9),
                                 jnp.float32)
        a = binning.bin_gaussians_aligned(
            means2d, depths, radii, tx, ty, tw, th, budget, align,
            count_by_gauss=True, expand_impl="scatter")
        b = binning.bin_gaussians_aligned(
            means2d, depths, radii, tx, ty, tw, th, budget, align,
            count_by_gauss=True, expand_impl="pallas", carry_attr=attr)
        for name in ("pair_gauss", "valid", "starts", "ends", "num_pairs",
                     "depth_order", "gauss_counts"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                err_msg=name)
        attr_pad = jnp.concatenate([attr, jnp.zeros((1, 9), jnp.float32)])
        ref = np.asarray(attr_pad)[np.asarray(b.pair_gauss)].T
        np.testing.assert_array_equal(np.asarray(b.pair_attr_t), ref)

    def test_budget_sentinel_padding(self):
        args = random_scene(jax.random.PRNGKey(1), 10, 32, 32)
        means2d, _, _, _, depths, radii = args
        b = binning.bin_gaussians(means2d, depths, radii, 2, 2, 16, 16, 1024)
        npairs = int(b.num_pairs)
        assert np.all(np.asarray(b.pair_tile)[npairs:] == 4)  # sentinel
        assert int(b.tile_offsets[-1]) == npairs


class TestTiledVsOracle:
    @pytest.mark.parametrize("seed,n,h,w", [(0, 128, 48, 48), (1, 512, 64, 80)])
    def test_forward(self, seed, n, h, w):
        args = random_scene(jax.random.PRNGKey(seed), n, h, w)
        bg = jnp.array([0.2, 0.4, 0.6])
        img_o, t_o, _ = rasterize_oracle(*args, h, w, bg, tile_w=16, tile_h=16)
        out = rasterize_tiled(*args, h, w, bg, CFG)
        np.testing.assert_allclose(out.image, img_o, rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(out.final_t, t_o, rtol=1e-3, atol=2e-4)

    def test_gradients(self):
        h, w, n = 48, 48, 192
        args = random_scene(jax.random.PRNGKey(2), n, h, w)
        means2d, conics, colors, opac, depths, radii = args
        bg = jnp.array([0.1, 0.1, 0.1])
        target = jax.random.uniform(jax.random.PRNGKey(3), (3, h, w))

        def loss_fn(raster_fn):
            def f(m, c, col, o):
                out = raster_fn(m, c, col, o)
                return jnp.mean((out - target) ** 2)
            return f

        def oracle_raster(m, c, col, o):
            return rasterize_oracle(m, c, col, o, depths, radii, h, w, bg).image

        def tiled_raster(m, c, col, o):
            return rasterize_tiled(m, c, col, o, depths, radii, h, w, bg, CFG).image

        go = jax.grad(loss_fn(oracle_raster), argnums=(0, 1, 2, 3))(
            means2d, conics, colors, opac
        )
        gt = jax.grad(loss_fn(tiled_raster), argnums=(0, 1, 2, 3))(
            means2d, conics, colors, opac
        )
        for a, b, name in zip(go, gt, ["means2d", "conics", "colors", "opacity"]):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3 * scale,
                err_msg=name,
            )

    def test_final_t_gradient_path(self):
        # gradient must flow through final_t into bg compositing
        h = w = 32
        args = random_scene(jax.random.PRNGKey(4), 64, h, w)
        means2d, conics, colors, opac, depths, radii = args

        def f(o, bg):
            out = rasterize_tiled(means2d, conics, colors, o, depths, radii, h, w, bg, CFG)
            return jnp.sum(out.image)

        g_opac, g_bg = jax.grad(f, argnums=(0, 1))(opac, jnp.ones(3) * 0.5)
        assert bool(jnp.all(jnp.isfinite(g_opac)))
        assert float(jnp.abs(g_opac).sum()) > 0
        assert bool(jnp.all(g_bg > 0))  # bg visible somewhere


class TestTruncation:
    """effective_ends / ncon-trim are EXACTLY output-preserving."""

    def _deep_scene(self, n=512, seed=3):
        # many big opaque splats stacked on few tiles. The tile-death proof
        # needs splats whose footprint covers a whole tile (alpha at the
        # worst corner >= 1/255), so sigma ~ 10px vs 16px tiles here;
        # smaller splats keep ends_eff == ends (bound correctly never fires)
        rng = np.random.default_rng(seed)
        means2d = jnp.asarray(
            rng.uniform(2, 30, (n, 2)).astype(np.float32))
        conics = jnp.tile(jnp.asarray([[0.01, 0.0, 0.01]], jnp.float32), (n, 1))
        colors = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
        opac = jnp.full((n,), 0.95, jnp.float32)
        depths = jnp.asarray(rng.uniform(1, 5, (n,)).astype(np.float32))
        radii = jnp.full((n,), 33, jnp.int32)
        return means2d, conics, colors, opac, depths, radii

    def test_effective_ends_truncates_and_preserves_output(self):
        from gs_tpu.config import RasterizeConfig
        from gs_tpu.ops.rasterize_tiled import rasterize_tiled

        args = self._deep_scene()
        h = w = 32
        bg = jnp.asarray([0.2, 0.3, 0.4])
        base = dict(backend="xla", chunk=32, tile_w=16, tile_h=16,
                    min_pair_budget=1 << 12)
        on = rasterize_tiled(*args, h, w, bg, RasterizeConfig(**base))
        off = rasterize_tiled(*args, h, w, bg,
                              RasterizeConfig(**base, truncate_tiles=False))
        np.testing.assert_array_equal(np.asarray(on.image),
                                      np.asarray(off.image))
        np.testing.assert_array_equal(np.asarray(on.final_t),
                                      np.asarray(off.final_t))

    def test_gradients_identical_with_truncation(self):
        from gs_tpu.config import RasterizeConfig
        from gs_tpu.ops.rasterize_tiled import rasterize_tiled

        args = self._deep_scene(n=256)
        h = w = 32
        bg = jnp.zeros(3)
        base = dict(backend="xla", chunk=32, tile_w=16, tile_h=16,
                    min_pair_budget=1 << 12)

        def loss(means2d, colors, opac, cfg):
            out = rasterize_tiled(means2d, args[1], colors, opac, args[4],
                                  args[5], h, w, bg, cfg)
            return jnp.sum(out.image * out.image) + jnp.sum(out.final_t)

        g_on = jax.grad(loss, argnums=(0, 1, 2))(
            args[0], args[2], args[3], RasterizeConfig(**base))
        g_off = jax.grad(loss, argnums=(0, 1, 2))(
            args[0], args[2], args[3],
            RasterizeConfig(**base, truncate_tiles=False))
        for a, b in zip(g_on, g_off):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_truncation_actually_trims(self):
        from gs_tpu.config import RasterizeConfig
        from gs_tpu.ops import binning
        from gs_tpu.ops.rasterize_tiled import (CompositeStatic,
                                                effective_ends,
                                                pack_attributes)
        from gs_tpu.ops.projection import bin_radii

        means2d, conics, colors, opac, depths, radii = self._deep_scene()
        st = CompositeStatic(tiles_x=2, tiles_y=2, tile_w=16, tile_h=16,
                             chunk=32, tile_batch=64, backend="xla")
        ab = binning.bin_gaussians_aligned(
            means2d, depths, bin_radii(radii, opac), 2, 2, 16, 16,
            1 << 12, 32)
        attr = pack_attributes(means2d, conics, colors, opac)
        attr_pad = jnp.concatenate([attr, jnp.zeros((1, 9), jnp.float32)])
        sp = attr_pad[ab.pair_gauss]
        ends_eff = effective_ends(st, sp, jnp.arange(4, dtype=jnp.int32),
                                  ab.starts, ab.ends)
        assert bool(jnp.all(ends_eff >= ab.starts))
        assert bool(jnp.all(ends_eff <= ab.ends))
        # 512 splats with opacity .95 on 4 tiles: the tail must be provably
        # dead well before the true ends
        assert int(jnp.sum(ab.ends - ends_eff)) > 0



class TestTruncationEmptyTiles:
    def test_empty_leading_tiles_do_not_shift_owners(self):
        """Regression (round 2): effective_ends mapped chunks to the wrong
        entry when earlier tiles were empty, truncating every tile to its
        predecessor's range (black images in orbit-camera scenes)."""
        from gs_tpu.config import RasterizeConfig
        from gs_tpu.ops.rasterize_tiled import rasterize_tiled

        rng = np.random.default_rng(0)
        n = 128
        # splats only in the right half: left tile column stays empty
        means2d = jnp.asarray(np.stack([
            rng.uniform(34, 62, n), rng.uniform(2, 62, n)], 1).astype(np.float32))
        conics = jnp.tile(jnp.asarray([[0.2, 0.0, 0.2]], jnp.float32), (n, 1))
        colors = jnp.asarray(rng.uniform(0.2, 1, (n, 3)).astype(np.float32))
        opac = jnp.full((n,), 0.8, jnp.float32)
        depths = jnp.asarray(rng.uniform(1, 5, (n,)).astype(np.float32))
        radii = jnp.full((n,), 8, jnp.int32)
        base = dict(backend="xla", chunk=32, tile_w=16, tile_h=16,
                    min_pair_budget=1 << 11)
        on = rasterize_tiled(means2d, conics, colors, opac, depths, radii,
                             64, 64, jnp.zeros(3), RasterizeConfig(**base))
        off = rasterize_tiled(means2d, conics, colors, opac, depths, radii,
                              64, 64, jnp.zeros(3),
                              RasterizeConfig(**base, truncate_tiles=False))
        assert float(off.image.mean()) > 0.01  # scene actually renders
        np.testing.assert_array_equal(np.asarray(on.image),
                                      np.asarray(off.image))


class TestKernelModeSelection:
    """SMEM-aware static kernel-mode fallback (round 4: the 14.8M-pair heavy
    scene's chunk-grid visit tables are 2x a v5e's 1 MiB SMEM)."""

    def test_small_budget_keeps_chunk_mode(self):
        from gs_tpu.ops.rasterize_tiled import _pick_kernel_mode

        assert _pick_kernel_mode("pallas", 1_000_000, 64, 1360) == "chunk"

    def test_huge_budget_falls_back_to_tile_mode(self):
        from gs_tpu.ops.rasterize_tiled import _pick_kernel_mode

        assert _pick_kernel_mode("pallas", 14_795_840, 64, 1360) == "tile"

    def test_xla_backend_uses_global(self):
        from gs_tpu.ops.rasterize_tiled import _pick_kernel_mode

        assert _pick_kernel_mode("xla", 14_795_840, 64, 1360) is None

    def test_binning_align_follows_explicit_mode(self):
        from gs_tpu.ops.rasterize_tiled import binning_align

        assert binning_align(64, "pallas", "tile") == 128
        assert binning_align(64, "pallas", "chunk") == 64
        assert binning_align(96, "pallas", "tile") == 384

    def test_tile_fallback_matches_oracle(self):
        # end-to-end: force the fallback with a tiny SMEM budget and check
        # the render still matches the oracle (interpret mode on CPU)
        from gs_tpu.ops import rasterize_tiled as rt

        means2d, conics, colors, opac, depths, radii = random_scene(
            jax.random.key(3), 64, 48, 48)
        bg = jnp.zeros(3)
        cfg = RasterizeConfig(backend="pallas", chunk=8, tile_w=16,
                              tile_h=16, pair_budget_factor=6.0)
        ref = rasterize_oracle(means2d, conics, colors, opac, depths, radii,
                               48, 48, bg).image
        old = rt._SMEM_TABLE_BUDGET
        rt._SMEM_TABLE_BUDGET = 64  # force tile mode
        try:
            out = rasterize_tiled(means2d, conics, colors, opac, depths,
                                  radii, 48, 48, bg, cfg)
        finally:
            rt._SMEM_TABLE_BUDGET = old
        np.testing.assert_allclose(out.image, ref, atol=1e-3, rtol=1e-3)


class TestSegsumGradReduce:
    """GRAD_REDUCE="segsum": sort+cumsum gradient reduction == scatter-add."""

    def test_gather_pairs_segsum_vjp_matches_plain_gather(self):
        from gs_tpu.ops.binning import vec_cumsum
        from gs_tpu.ops.rasterize_tiled import gather_pairs_segsum

        n, ab, k = 37, 256, 9
        key = jax.random.PRNGKey(7)
        k1, k2, k3 = jax.random.split(key, 3)
        attr = jax.random.normal(k1, (n + 1, k))
        # random per-gaussian counts (some zero), padding rows index n
        counts = jax.random.randint(k2, (n,), 0, 9)
        total = int(jnp.sum(counts))
        assert total < ab
        pair_gauss = np.full((ab,), n, np.int32)
        pair_gauss[:total] = np.repeat(np.arange(n), np.asarray(counts))
        # scatter the real pairs into random slots (tile-sorted order proxy)
        perm = np.asarray(jax.random.permutation(k3, ab))
        pair_gauss = jnp.asarray(pair_gauss[np.argsort(perm)])
        seg_cum = vec_cumsum(counts.astype(jnp.int32))

        cot = jax.random.normal(jax.random.PRNGKey(8), (ab, k))
        # zero the padding cotangents (real pipelines produce exact zeros
        # there: padding pairs gathered the zero NULL row)
        cot = jnp.where((pair_gauss < n)[:, None], cot, 0.0)

        f_seg = lambda a: jnp.vdot(gather_pairs_segsum(a, pair_gauss, seg_cum), cot)
        f_ref = lambda a: jnp.vdot(a[pair_gauss], cot)
        # tolerance: the blocked cumsum's bf16 hi/lo operand split rounds at
        # ~2^-17 of the CUMSUM magnitude (not the segment sum) — ~1e-4 here
        np.testing.assert_allclose(
            jax.grad(f_seg)(attr), jax.grad(f_ref)(attr), rtol=1e-4, atol=1e-4)

    def test_rasterize_grads_match_across_reduce_modes(self):
        from gs_tpu.ops import rasterize_tiled as rt

        h, w, n = 48, 64, 160
        args = random_scene(jax.random.PRNGKey(11), n, h, w)
        means2d, conics, colors, opac, depths, radii = args
        bg = jnp.array([0.3, 0.2, 0.1])
        target = jax.random.uniform(jax.random.PRNGKey(12), (3, h, w))

        def loss(m, c, col, o):
            out = rasterize_tiled(m, c, col, o, depths, radii, h, w, bg, CFG)
            return jnp.mean((out.image - target) ** 2)

        old = rt.GRAD_REDUCE
        try:
            rt.GRAD_REDUCE = "scatter"
            g_sc = jax.grad(loss, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
            rt.GRAD_REDUCE = "segsum"
            g_ss = jax.grad(loss, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
            rt.GRAD_REDUCE = "pallas"
            g_pl = jax.grad(loss, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
        finally:
            rt.GRAD_REDUCE = old
        for g_alt, tag in ((g_ss, "segsum"), (g_pl, "pallas")):
            for a, b, name in zip(g_sc, g_alt,
                                  ["means2d", "conics", "colors", "opacity"]):
                scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5 * scale,
                    err_msg=f"{tag}:{name}")


class TestPairCarry:
    """PAIR_SOURCE="carry": gather-free pair attributes == the gather path."""

    @pytest.mark.parametrize("grad_reduce", ["segsum", "pallas"])
    def test_forward_bitwise_and_grads_match_gather(self, grad_reduce):
        from gs_tpu.ops import rasterize_tiled as rt

        h, w, n = 48, 64, 160
        args = random_scene(jax.random.PRNGKey(21), n, h, w)
        means2d, conics, colors, opac, depths, radii = args
        bg = jnp.array([0.3, 0.2, 0.1])
        target = jax.random.uniform(jax.random.PRNGKey(22), (3, h, w))

        def run(m, c, col, o):
            out = rasterize_tiled(m, c, col, o, depths, radii, h, w, bg, CFG)
            return jnp.mean((out.image - target) ** 2), out.image

        old_src, old_red = rt.PAIR_SOURCE, rt.GRAD_REDUCE
        try:
            rt.PAIR_SOURCE, rt.GRAD_REDUCE = "gather", "scatter"
            (l0, img0), g0 = jax.value_and_grad(run, argnums=(0, 1, 2, 3),
                                                has_aux=True)(
                means2d, conics, colors, opac)
            rt.PAIR_SOURCE, rt.GRAD_REDUCE = "carry", grad_reduce
            (l1, img1), g1 = jax.value_and_grad(run, argnums=(0, 1, 2, 3),
                                                has_aux=True)(
                means2d, conics, colors, opac)
        finally:
            rt.PAIR_SOURCE, rt.GRAD_REDUCE = old_src, old_red
        # the carried attributes are bitwise equal to the gathered ones, so
        # the forward image must be IDENTICAL
        np.testing.assert_array_equal(np.asarray(img1), np.asarray(img0))
        for a, b, name in zip(g0, g1,
                              ["means2d", "conics", "colors", "opacity"]):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5 * scale,
                err_msg=name)

    def test_carry_pallas_backend_matches_oracle(self):
        # the full pallas-kernel compositing on top of carried pairs
        from gs_tpu.ops import rasterize_tiled as rt
        from gs_tpu.ops.rasterize_oracle import rasterize_oracle

        h, w, n = 48, 48, 96
        args = random_scene(jax.random.PRNGKey(23), n, h, w)
        bg = jnp.array([0.1, 0.5, 0.9])
        ref = rasterize_oracle(*args, h, w, bg).image
        cfg = RasterizeConfig(backend="pallas", chunk=8, tile_w=16,
                              tile_h=16, pair_budget_factor=6.0)
        old_src = rt.PAIR_SOURCE
        try:
            rt.PAIR_SOURCE = "carry"
            out = rasterize_tiled(*args, h, w, bg, cfg)
        finally:
            rt.PAIR_SOURCE = old_src
        np.testing.assert_allclose(out.image, ref, atol=1e-3, rtol=1e-3)
