"""Pallas compositing kernels vs the oracle (interpret mode on CPU).

Same parity bars as the XLA backend tests (test_tiled.py); on CPU the
kernels run through the Pallas interpreter, on TPU (GS_TPU_TEST_PLATFORM=tpu)
they compile via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_tpu.config import RasterizeConfig
from gs_tpu.ops.rasterize_oracle import rasterize_oracle
from gs_tpu.ops.rasterize_tiled import rasterize_tiled
from tests.reference_raster import random_scene

CFG = RasterizeConfig(tile_w=16, tile_h=16, chunk=32, backend="pallas")
CFG_XLA = RasterizeConfig(tile_w=16, tile_h=16, chunk=32, backend="xla")


class TestPallasVsOracle:
    @pytest.mark.parametrize("seed,n,h,w", [(0, 128, 48, 48), (1, 512, 64, 80)])
    def test_forward(self, seed, n, h, w):
        args = random_scene(jax.random.PRNGKey(seed), n, h, w)
        bg = jnp.array([0.2, 0.4, 0.6])
        img_o, t_o, _ = rasterize_oracle(*args, h, w, bg, tile_w=16, tile_h=16)
        out = rasterize_tiled(*args, h, w, bg, CFG)
        np.testing.assert_allclose(out.image, img_o, rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(out.final_t, t_o, rtol=1e-3, atol=2e-4)

    def test_gradients_vs_xla_backend(self):
        # the two fast backends share binning; grads should agree very tightly
        h, w, n = 48, 48, 192
        args = random_scene(jax.random.PRNGKey(2), n, h, w)
        means2d, conics, colors, opac, depths, radii = args
        bg = jnp.array([0.1, 0.1, 0.1])
        target = jax.random.uniform(jax.random.PRNGKey(3), (3, h, w))

        def make_loss(cfg):
            def f(m, c, col, o):
                out = rasterize_tiled(m, c, col, o, depths, radii, h, w, bg, cfg)
                return jnp.mean((out.image - target) ** 2)
            return f

        gp = jax.grad(make_loss(CFG), argnums=(0, 1, 2, 3))(
            means2d, conics, colors, opac
        )
        gx = jax.grad(make_loss(CFG_XLA), argnums=(0, 1, 2, 3))(
            means2d, conics, colors, opac
        )
        for a, b, name in zip(gx, gp, ["means2d", "conics", "colors", "opacity"]):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5 * scale,
                err_msg=name,
            )

    def test_gradients_vs_oracle(self):
        h, w, n = 48, 48, 192
        args = random_scene(jax.random.PRNGKey(2), n, h, w)
        means2d, conics, colors, opac, depths, radii = args
        bg = jnp.array([0.1, 0.1, 0.1])
        target = jax.random.uniform(jax.random.PRNGKey(3), (3, h, w))

        def loss_oracle(m, c, col, o):
            out = rasterize_oracle(m, c, col, o, depths, radii, h, w, bg)
            return jnp.mean((out.image - target) ** 2)

        def loss_pallas(m, c, col, o):
            out = rasterize_tiled(m, c, col, o, depths, radii, h, w, bg, CFG)
            return jnp.mean((out.image - target) ** 2)

        go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(means2d, conics, colors, opac)
        for a, b, name in zip(go, gp, ["means2d", "conics", "colors", "opacity"]):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3 * scale,
                err_msg=name,
            )


class TestSufMxu:
    """GS_TPU_SUF_MXU: the backward suffix sum as an exact-mask MXU tri dot."""

    def test_grads_match_vpu_suffix_sum(self):
        from gs_tpu.ops import rasterize_pallas as rp

        h, w, n = 48, 48, 128
        args = random_scene(jax.random.PRNGKey(9), n, h, w)
        means2d, conics, colors, opac, depths, radii = args
        bg = jnp.array([0.1, 0.2, 0.3])
        target = jax.random.uniform(jax.random.PRNGKey(10), (3, h, w))

        def loss(m, c, col, o):
            out = rasterize_tiled(m, c, col, o, depths, radii, h, w, bg, CFG)
            return jnp.mean((out.image - target) ** 2)

        g0 = jax.grad(loss, argnums=(0, 1, 2, 3))(means2d, conics, colors,
                                                  opac)
        old = rp.SUF_MXU
        try:
            rp.SUF_MXU = True
            g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(means2d, conics,
                                                      colors, opac)
        finally:
            rp.SUF_MXU = old
        for a, b, name in zip(g0, g1,
                              ["means2d", "conics", "colors", "opacity"]):
            scale = np.maximum(np.abs(np.asarray(a)).max(), 1e-3)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4 * scale,
                err_msg=name)
