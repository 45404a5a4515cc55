"""Oracle rasterizer vs the sequential-scan reference: forward + gradients."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_tpu import cameras
from gs_tpu.models import gaussians
from gs_tpu.ops.rasterize_oracle import rasterize_oracle
from gs_tpu.renderer import render
from tests.reference_raster import random_scene, rasterize_scan


def _run_both(key, n, h, w, bg):
    args = random_scene(key, n, h, w)
    img_o, t_o, _ = rasterize_oracle(*args, h, w, bg)
    img_s, t_s = rasterize_scan(*args, h, w, bg)
    return (img_o, t_o), (img_s, t_s), args


class TestOracleVsScan:
    @pytest.mark.parametrize("seed,n", [(0, 64), (2, 1024)])
    def test_forward_matches(self, seed, n):
        bg = jnp.array([0.0, 0.0, 0.0])
        (img_o, t_o), (img_s, t_s), _ = _run_both(jax.random.PRNGKey(seed), n, 64, 64, bg)
        # exp(cumsum(log1p)) vs sequential products differ by fp32 rounding only
        np.testing.assert_allclose(img_o, img_s, rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(t_o, t_s, rtol=1e-3, atol=2e-4)

    def test_forward_matches_white_bg(self):
        bg = jnp.array([1.0, 1.0, 1.0])
        (img_o, _), (img_s, _), _ = _run_both(jax.random.PRNGKey(3), 512, 48, 80, bg)
        np.testing.assert_allclose(img_o, img_s, rtol=1e-3, atol=2e-4)

    def test_gradients_match(self):
        bg = jnp.array([0.1, 0.2, 0.3])
        h = w = 32
        args = random_scene(jax.random.PRNGKey(4), 128, h, w)
        means2d, conics, colors, opac, depths, radii = args
        target = jax.random.uniform(jax.random.PRNGKey(5), (3, h, w))

        def loss_fn(raster):
            def f(m, c, col, o):
                img = raster(m, c, col, o, depths, radii, h, w, bg)[0]
                return jnp.mean((img - target) ** 2)
            return f

        lo = jax.grad(loss_fn(rasterize_oracle), argnums=(0, 1, 2, 3))(
            means2d, conics, colors, opac
        )
        ls = jax.grad(loss_fn(rasterize_scan), argnums=(0, 1, 2, 3))(
            means2d, conics, colors, opac
        )
        for go, gs, name in zip(lo, ls, ["means2d", "conics", "colors", "opacity"]):
            np.testing.assert_allclose(go, gs, rtol=1e-3, atol=1e-6, err_msg=name)


class TestOracleSemantics:
    def test_single_gaussian_peak_alpha(self):
        # isotropic conic with sigma^2 = 4 at pixel (16,16), opacity 0.8
        h = w = 33
        means2d = jnp.array([[16.0, 16.0]])
        conics = jnp.array([[0.25, 0.0, 0.25]])
        colors = jnp.array([[1.0, 0.0, 0.0]])
        img, t, _ = rasterize_oracle(
            means2d, conics, colors, jnp.array([0.8]), jnp.array([1.0]),
            jnp.array([6], jnp.int32), h, w, jnp.zeros(3),
        )
        assert abs(float(img[0, 16, 16]) - 0.8) < 1e-5  # alpha at center = opacity
        assert abs(float(t[16, 16]) - 0.2) < 1e-5
        # one sigma away: alpha = 0.8 * exp(-0.5)
        expected = 0.8 * math.exp(-0.5 * 0.25 * 4.0)
        assert abs(float(img[0, 16, 18]) - expected) < 1e-5

    def test_front_to_back_ordering(self):
        h = w = 8
        means2d = jnp.array([[4.0, 4.0], [4.0, 4.0]])
        conics = jnp.tile(jnp.array([[0.25, 0.0, 0.25]]), (2, 1))
        colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        opac = jnp.array([0.6, 0.6])
        radii = jnp.array([20, 20], jnp.int32)
        # red in front (depth 1), green behind (depth 2)
        img, _, _ = rasterize_oracle(
            means2d, conics, colors, opac, jnp.array([1.0, 2.0]), radii, h, w, jnp.zeros(3)
        )
        center = np.asarray(img[:, 4, 4])
        np.testing.assert_allclose(center[0], 0.6, atol=1e-5)  # front: alpha*1
        np.testing.assert_allclose(center[1], 0.6 * 0.4, atol=1e-5)  # behind: alpha*T

    def test_background_composites_remainder(self):
        img, t, _ = rasterize_oracle(
            jnp.zeros((1, 2)), jnp.array([[1.0, 0.0, 1.0]]), jnp.ones((1, 3)),
            jnp.array([0.0]), jnp.array([1.0]), jnp.array([0], jnp.int32),
            4, 4, jnp.array([0.25, 0.5, 0.75]),
        )
        np.testing.assert_allclose(t, np.ones((4, 4)), atol=1e-7)
        np.testing.assert_allclose(img[0], np.full((4, 4), 0.25), atol=1e-7)


class TestRenderEndToEnd:
    def _scene(self, n=200, seed=0):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        state = gaussians.create_from_pcd(pts, cols, max_sh_degree=3, capacity=256)
        cam = cameras.make_camera(
            np.eye(3), np.array([0.0, 0, 4.0]),
            fovx=math.radians(60), fovy=math.radians(60), width=64, height=64,
        )
        return state, cam

    def test_render_shapes_and_finite(self):
        state, cam = self._scene()
        out = render(cam, state, active_sh_degree=0, bg_color=jnp.zeros(3))
        assert out.image.shape == (3, 64, 64)
        assert bool(jnp.all(jnp.isfinite(out.image)))
        assert out.radii.shape == (256,)
        assert int(jnp.sum(out.visibility)) > 0
        # dead padding slots must be invisible
        assert not bool(jnp.any(out.visibility[200:]))

    def test_render_is_differentiable_with_offset_channel(self):
        state, cam = self._scene()
        target = jnp.zeros((3, 64, 64))

        def loss(params, offset):
            out = render(
                cam, state.with_params(params), active_sh_degree=0,
                bg_color=jnp.zeros(3), means2d_offset=offset,
            )
            return jnp.mean(jnp.abs(out.image - target))

        offset = jnp.zeros((state.capacity, 2))
        gs_grad, off_grad = jax.grad(loss, argnums=(0, 1))(state.params(), offset)
        assert bool(jnp.all(jnp.isfinite(off_grad)))
        assert float(jnp.abs(off_grad).sum()) > 0  # side-channel carries signal
        assert bool(jnp.all(jnp.isfinite(gs_grad["xyz"])))
        # dead slots receive no positional gradient
        assert float(jnp.abs(off_grad[200:]).sum()) == 0.0
