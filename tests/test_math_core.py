"""Unit tests: SH evaluation, quaternion/covariance math, cameras, schedules."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from gs_tpu import cameras
from gs_tpu.ops import sh, transforms
from gs_tpu.utils import schedules


class TestSH:
    def test_degree0_is_constant(self):
        coeffs = jnp.ones((5, 3, 16))
        dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, sh.C0 * np.ones((5, 3)), rtol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-6)

    def test_matches_independent_numpy_eval(self):
        # independent: real SH basis evaluated from the closed-form polynomials
        rng = np.random.default_rng(1)
        coeffs = rng.normal(size=(7, 3, 16)).astype(np.float32)
        d = rng.normal(size=(7, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        x, y, z = d[:, 0], d[:, 1], d[:, 2]
        basis = np.stack(
            [
                np.full_like(x, 0.28209479177387814),
                -0.4886025119029199 * y,
                0.4886025119029199 * z,
                -0.4886025119029199 * x,
                1.0925484305920792 * x * y,
                -1.0925484305920792 * y * z,
                0.31539156525252005 * (2 * z * z - x * x - y * y),
                -1.0925484305920792 * x * z,
                0.5462742152960396 * (x * x - y * y),
                -0.5900435899266435 * y * (3 * x * x - y * y),
                2.890611442640554 * x * y * z,
                -0.4570457994644658 * y * (4 * z * z - x * x - y * y),
                0.3731763325901154 * z * (2 * z * z - 3 * x * x - 3 * y * y),
                -0.4570457994644658 * x * (4 * z * z - x * x - y * y),
                1.445305721320277 * z * (x * x - y * y),
                -0.5900435899266435 * x * (x * x - 3 * y * y),
            ],
            axis=-1,
        )  # [7,16]
        expected = np.einsum("nck,nk->nc", coeffs, basis)
        got = sh.eval_sh(3, jnp.asarray(coeffs), jnp.asarray(d))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestTransforms:
    def test_identity_quat(self):
        q = jnp.array([[1.0, 0, 0, 0]])
        np.testing.assert_allclose(transforms.quat_to_rotmat(q)[0], np.eye(3), atol=1e-7)

    def test_rotmat_orthonormal(self):
        q = jax.random.normal(jax.random.PRNGKey(2), (10, 4))
        r = transforms.quat_to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), np.ones(10), atol=1e-5)

    def test_known_z_rotation(self):
        # 90 degrees about z: q = (cos45, 0, 0, sin45)
        q = jnp.array([[math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)]])
        r = transforms.quat_to_rotmat(q)[0]
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        np.testing.assert_allclose(r, expected, atol=1e-6)

    def test_covariance_psd_and_eigvals(self):
        key = jax.random.PRNGKey(3)
        s = jax.random.uniform(key, (8, 3), minval=0.1, maxval=2.0)
        q = jax.random.normal(key, (8, 4))
        cov = transforms.build_covariance(s, q)
        np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), -1, -2), atol=1e-6)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        np.testing.assert_allclose(np.sort(eig, -1), np.sort(np.asarray(s) ** 2, -1), rtol=1e-4)

    def test_pack_unpack(self):
        cov = transforms.build_covariance(
            jnp.ones((4, 3)), jax.random.normal(jax.random.PRNGKey(4), (4, 4))
        )
        np.testing.assert_allclose(
            transforms.unpack_symmetric(transforms.pack_symmetric(cov)), cov, atol=1e-7
        )


class TestCameras:
    def _simple_cam(self, w=64, h=48):
        R = np.eye(3)
        T = np.array([0.0, 0.0, 4.0])  # camera 4 units behind origin, looking +z
        return cameras.make_camera(R, T, fovx=math.radians(60), fovy=math.radians(45),
                                   width=w, height=h)

    def test_camera_center(self):
        cam = self._simple_cam()
        np.testing.assert_allclose(cam.cam_pos, [0, 0, -4.0], atol=1e-6)

    def test_center_point_projects_to_image_center(self):
        cam = self._simple_cam()
        p = jnp.array([0.0, 0.0, 0.0, 1.0])
        clip = cam.full_proj @ p
        ndc = clip[:3] / clip[3]
        np.testing.assert_allclose(ndc[:2], [0.0, 0.0], atol=1e-6)

    def test_depth_range_maps_to_01(self):
        cam = self._simple_cam()
        view = np.asarray(cam.view)
        proj = np.asarray(cam.full_proj) @ np.linalg.inv(view)
        for z, expected in [(cameras.DEFAULT_ZNEAR, 0.0), (cameras.DEFAULT_ZFAR, 1.0)]:
            clip = proj @ np.array([0, 0, z, 1.0])
            assert abs(clip[2] / clip[3] - expected) < 1e-4

    def test_view_matrix_scene_normalization(self):
        R = np.eye(3)
        T = np.array([1.0, 2.0, 3.0])
        v = cameras.make_view_matrix(R, T, translate=np.array([0.5, 0, 0]), scale=2.0)
        c2w = np.linalg.inv(v)
        base = np.linalg.inv(cameras.make_view_matrix(R, T))
        np.testing.assert_allclose(c2w[:3, 3], (base[:3, 3] + [0.5, 0, 0]) * 2.0, atol=1e-5)

    def test_stack_cameras(self):
        cams = [self._simple_cam(), self._simple_cam()]
        batch = cameras.stack_cameras(cams)
        assert batch.view.shape == (2, 4, 4)
        assert batch.width == 64


class TestSchedules:
    def test_endpoints_and_midpoint(self):
        lr0 = schedules.expon_lr(0, 1e-2, 1e-4, max_steps=100)
        lr_end = schedules.expon_lr(100, 1e-2, 1e-4, max_steps=100)
        lr_mid = schedules.expon_lr(50, 1e-2, 1e-4, max_steps=100)
        # fp32 exp/log roundtrip: ~6e-5 relative noise vs the reference's f64 host math
        np.testing.assert_allclose(lr0, 1e-2, rtol=2e-4)
        np.testing.assert_allclose(lr_end, 1e-4, rtol=2e-4)
        np.testing.assert_allclose(lr_mid, 1e-3, rtol=2e-4)  # log-linear midpoint

    def test_delay_mult(self):
        # matches reference formula at step 0 with delay: lr * delay_mult
        lr = schedules.expon_lr(0, 1e-2, 1e-4, lr_delay_steps=10, lr_delay_mult=0.01,
                                max_steps=100)
        np.testing.assert_allclose(lr, 1e-4, rtol=2e-4)

    def test_negative_step_disabled(self):
        assert float(schedules.expon_lr(-1, 1e-2, 1e-4, max_steps=100)) == 0.0
