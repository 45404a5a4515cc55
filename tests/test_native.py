"""Native data-plane (native/gs_native.cpp) vs the pure-python parsers."""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE_DIR = os.path.join(REPO, "native")


@pytest.fixture(scope="module")
def native_mod():
    if not os.path.exists(os.path.join(NATIVE_DIR, "libgs_native.so")):
        if shutil.which("make") is None or shutil.which("g++") is None:
            pytest.skip("no C++ toolchain")
        subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                       capture_output=True)
    from gs_tpu.data import native

    if not native.available():
        pytest.skip("libgs_native.so failed to load")
    return native


@pytest.fixture
def colmap_files(tmp_path):
    from gs_tpu.data import colmap

    rng = np.random.default_rng(0)
    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                               np.array([500.0, 501.0, 320.0, 240.0])),
        3: colmap.ColmapCamera(3, "SIMPLE_PINHOLE", 800, 600,
                               np.array([450.0, 400.0, 300.0])),
    }
    images = {
        i: colmap.ColmapImage(
            i, rng.normal(size=4), rng.normal(size=3), 1 + 2 * (i % 2),
            f"frame_{i:04d}.jpg",
        )
        for i in range(1, 6)
    }
    xyz = rng.normal(size=(37, 3))
    rgb = rng.integers(0, 255, (37, 3)).astype(np.uint8)
    colmap.write_cameras_binary(cams, str(tmp_path / "cameras.bin"))
    colmap.write_images_binary(images, str(tmp_path / "images.bin"))
    colmap.write_points3d_binary(xyz, rgb, str(tmp_path / "points3D.bin"))
    return tmp_path, cams, images, xyz, rgb


class TestColmapNative:
    def test_points3d_parity(self, native_mod, colmap_files):
        path, _, _, xyz, rgb = colmap_files
        nx, nr, ne = native_mod.read_points3d_binary(str(path / "points3D.bin"))
        np.testing.assert_array_equal(nx, xyz)
        np.testing.assert_array_equal(nr, rgb)
        assert ne.shape == (37,)

    def test_images_parity(self, native_mod, colmap_files):
        path, _, images, _, _ = colmap_files
        got = native_mod.read_images_binary(str(path / "images.bin"))
        assert len(got) == len(images)
        for image_id, qvec, tvec, camera_id, name in got:
            ref = images[image_id]
            np.testing.assert_array_equal(qvec, ref.qvec)
            np.testing.assert_array_equal(tvec, ref.tvec)
            assert camera_id == ref.camera_id
            assert name == ref.name

    def test_cameras_parity(self, native_mod, colmap_files):
        path, cams, _, _, _ = colmap_files
        from gs_tpu.data import colmap

        got = native_mod.read_cameras_binary(str(path / "cameras.bin"))
        assert len(got) == len(cams)
        for cam_id, model_id, w, h, params in got:
            ref = cams[cam_id]
            assert colmap.CAMERA_MODELS[model_id][0] == ref.model
            assert (w, h) == (ref.width, ref.height)
            np.testing.assert_array_equal(params, ref.params)

    def test_dispatch_through_colmap_module(self, native_mod, colmap_files):
        # the public readers route through native when available
        path, cams, images, xyz, _ = colmap_files
        from gs_tpu.data import colmap

        rcams = colmap.read_cameras_binary(str(path / "cameras.bin"))
        rimgs = colmap.read_images_binary(str(path / "images.bin"))
        rxyz, _, _ = colmap.read_points3d_binary(str(path / "points3D.bin"))
        assert set(rcams) == set(cams) and set(rimgs) == set(images)
        np.testing.assert_array_equal(rxyz, xyz)


class TestPlyNative:
    def test_gaussian_ply_roundtrip(self, native_mod, tmp_path):
        rng = np.random.default_rng(1)
        names = ["x", "y", "z", "opacity"]
        data = rng.normal(size=(11, 4)).astype(np.float32)
        p = str(tmp_path / "g.ply")
        native_mod.write_ply_f32(p, names, data)
        got_names, got = native_mod.read_ply_f32(p)
        assert got_names == names
        np.testing.assert_array_equal(got, data)
        # python reader agrees on the same bytes
        from gs_tpu.data import ply

        v = ply.read_ply(p)
        assert list(v.dtype.names) == names
        np.testing.assert_array_equal(
            np.stack([v[n] for n in names], 1), data
        )

    def test_native_reads_python_written_snapshot(self, native_mod, tmp_path):
        from gs_tpu.data import ply

        n, k1 = 7, 3
        rng = np.random.default_rng(2)
        p = str(tmp_path / "snap.ply")
        ply.save_gaussian_ply(
            p,
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(n, 1, 3)).astype(np.float32),
            rng.normal(size=(n, k1, 3)).astype(np.float32),
            rng.normal(size=(n, 1)).astype(np.float32),
            rng.normal(size=(n, 3)).astype(np.float32),
            rng.normal(size=(n, 4)).astype(np.float32),
        )
        names, data = native_mod.read_ply_f32(p)
        ref = ply.read_ply(p)
        assert names == list(ref.dtype.names)
        np.testing.assert_array_equal(
            data, np.stack([ref[nm] for nm in names], 1)
        )
