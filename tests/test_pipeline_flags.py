"""Pipeline fallback toggles + parity burrs.

The reference's ``pipe.convert_SHs_python`` / ``pipe.compute_cov3D_python``
select genuinely different code paths through ``render()``
(``gaussian_renderer/__init__.py:74-94``) and are its only built-in
cross-checking tool; the SIBR viewer flips them live (``train.py:66``).
These tests pin: (a) the fallback paths are allclose to the fused ones,
(b) the toggles actually switch the computation, (c) the reference's
final-iteration optimizer skip (``train.py:139-141``), (d) degree-4 SH
constants (``utils/sh_utils.py:45-54``), (e) the debug snapshot dump.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gs_tpu import cameras
from gs_tpu.config import (OptimizationParams, PipelineParams, RasterizeConfig)
from gs_tpu.models import densify, gaussians, optim
from gs_tpu.ops import sh as sh_ops
from gs_tpu.renderer import render


def _scene(n=64, seed=0, sh_degree=3):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    st = gaussians.create_from_pcd(pts, cols, max_sh_degree=sh_degree)
    st = st.replace(
        log_scale=jnp.clip(st.log_scale, -4.0, -1.5),
        features_rest=jnp.asarray(
            rng.normal(0, 0.3, st.features_rest.shape).astype(np.float32)
        ),
        quat=jnp.asarray(
            rng.normal(0, 1, st.quat.shape).astype(np.float32)
        ) + jnp.array([2.0, 0, 0, 0]),
    )
    cam = cameras.make_camera(
        np.eye(3), np.array([0.0, 0.0, 4.0]),
        fovx=math.radians(60), fovy=math.radians(60), width=64, height=64,
    )
    return st, cam


CFG = RasterizeConfig(backend="xla", min_pair_budget=1 << 12)


class TestPythonFallbacks:
    def test_convert_shs_python_allclose(self):
        st, cam = _scene()
        a = render(cam, st, active_sh_degree=3, bg_color=jnp.zeros(3), cfg=CFG)
        b = render(cam, st, active_sh_degree=3, bg_color=jnp.zeros(3), cfg=CFG,
                   convert_shs_python=True)
        np.testing.assert_allclose(a.image, b.image, rtol=1e-5, atol=1e-5)

    def test_compute_cov3d_python_allclose(self):
        st, cam = _scene()
        a = render(cam, st, active_sh_degree=1, bg_color=jnp.zeros(3), cfg=CFG)
        b = render(cam, st, active_sh_degree=1, bg_color=jnp.zeros(3), cfg=CFG,
                   compute_cov3d_python=True)
        np.testing.assert_allclose(a.image, b.image, rtol=1e-5, atol=1e-5)

    def test_toggles_switch_computation(self):
        """The flags must actually reroute (not be parsed-and-ignored)."""
        st, cam = _scene()
        # poison the layout-optimized path's inputs via a state whose
        # features_rest is NaN only where the fused path would read it with
        # degree 0 active: degree 0 never touches rest coefficients, so both
        # paths must agree; then check the flag path is exercised by jaxpr
        fused = jax.make_jaxpr(
            lambda s: render(cam, s, active_sh_degree=3,
                             bg_color=jnp.zeros(3), cfg=CFG).image
        )(st)
        fallback = jax.make_jaxpr(
            lambda s: render(cam, s, active_sh_degree=3,
                             bg_color=jnp.zeros(3), cfg=CFG,
                             convert_shs_python=True,
                             compute_cov3d_python=True).image
        )(st)
        assert str(fused) != str(fallback)

    def test_train_step_accepts_pipe(self):
        from gs_tpu.training import train_step

        st, cam = _scene(sh_degree=1)
        cam = cam.replace(image=jnp.zeros((3, 64, 64), jnp.float32))
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        opt = OptimizationParams(iterations=10)
        pipe = PipelineParams(convert_SHs_python=True,
                              compute_cov3D_python=True)
        s1, a1, _, m1 = train_step(
            st, adam, stats, cam, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            active_sh_degree=1, opt_cfg=opt, raster_cfg=CFG,
            accumulate_stats=True, pipe=pipe)
        s2, a2, _, m2 = train_step(
            st, adam, stats, cam, jnp.zeros(3), jnp.int32(0), jnp.float32(1.0),
            active_sh_degree=1, opt_cfg=opt, raster_cfg=CFG,
            accumulate_stats=True)
        assert np.allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        np.testing.assert_allclose(s1.xyz, s2.xyz, rtol=1e-4, atol=1e-6)


class TestFinalIterationSkip:
    def test_apply_update_false_freezes_params(self):
        """train.py:139-141: no optimizer.step() at iteration == iterations."""
        from gs_tpu.training import train_step

        st, cam = _scene(sh_degree=1)
        cam = cam.replace(image=jnp.zeros((3, 64, 64), jnp.float32))
        adam = optim.init(st.params())
        stats = densify.DensifyStats.zeros(st.capacity)
        opt = OptimizationParams(iterations=10)
        s, a, stats2, m = train_step(
            st, adam, stats, cam, jnp.zeros(3), jnp.int32(9), jnp.float32(1.0),
            active_sh_degree=1, opt_cfg=opt, raster_cfg=CFG,
            accumulate_stats=True, apply_update=False)
        np.testing.assert_array_equal(s.xyz, st.xyz)
        np.testing.assert_array_equal(a.mu["xyz"], adam.mu["xyz"])
        assert int(a.step["xyz"]) == int(adam.step["xyz"])
        # stats still accumulate (reference accumulates before the step gate)
        assert float(stats2.denom.sum()) > 0


class TestDegree4SH:
    def test_eval_sh_deg4_matches_basis(self):
        rng = np.random.default_rng(0)
        dirs = rng.normal(size=(32, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        coeffs = rng.normal(size=(32, 3, 25)).astype(np.float32)
        out = sh_ops.eval_sh(4, jnp.asarray(coeffs), jnp.asarray(dirs))
        basis = sh_ops.eval_sh_basis(4, jnp.asarray(dirs))
        assert len(basis) == 25
        ref = sum(np.asarray(b) * coeffs[:, :, k] for k, b in enumerate(basis))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_deg4_band_integrates_to_zero_mean(self):
        # real SH bands >0 integrate to 0 over the sphere: Monte-Carlo sanity
        rng = np.random.default_rng(1)
        dirs = rng.normal(size=(200_000, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        basis = sh_ops.eval_sh_basis(4, jnp.asarray(dirs.astype(np.float32)))
        for k in range(16, 25):
            assert abs(float(jnp.mean(basis[k]))) < 5e-3

    def test_deg4_orthonormality(self):
        # E[b_i b_j] over uniform sphere = delta_ij / (4 pi) * 4 pi = delta_ij
        rng = np.random.default_rng(2)
        dirs = rng.normal(size=(400_000, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        basis = sh_ops.eval_sh_basis(4, jnp.asarray(dirs.astype(np.float32)))
        b = jnp.concatenate(basis[16:25], axis=1)  # [M, 9]
        gram = np.asarray(4 * np.pi * (b.T @ b) / b.shape[0])
        np.testing.assert_allclose(gram, 4 * np.pi * np.eye(9) / (4 * np.pi),
                                   atol=0.05)


class TestDebugDump:
    def test_debug_dump_writes_snapshot(self, tmp_path):
        from gs_tpu.training import TrainState, debug_dump, init_train_state

        st, cam = _scene(sh_degree=1)
        ts = init_train_state(st, 1.0, 1)
        ts.iteration = 123
        out = debug_dump(str(tmp_path), ts, cam, float("nan"))
        data = np.load(out)
        assert data["iteration"] == 123
        assert data["param_xyz"].shape == (st.capacity, 3)
        assert data["cam_view"].shape == (4, 4)


class TestDataDevice:
    def test_cpu_data_device_keeps_numpy(self):
        img = np.zeros((3, 8, 8), np.float32)
        cam = cameras.make_camera(
            np.eye(3), np.zeros(3), 1.0, 1.0, 8, 8, image=img,
            data_device="cpu")
        assert isinstance(cam.image, np.ndarray)
        cam2 = cameras.make_camera(
            np.eye(3), np.zeros(3), 1.0, 1.0, 8, 8, image=img)
        assert isinstance(cam2.image, jax.Array)
