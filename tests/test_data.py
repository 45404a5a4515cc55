"""Data layer: COLMAP parsers, PLY roundtrips, Blender loader, scene assembly."""

import json
import math
import os

import numpy as np
import pytest
from PIL import Image

from gs_tpu.config import ModelParams
from gs_tpu.data import colmap, images, ply, readers
from gs_tpu.scene import Scene


@pytest.fixture
def colmap_scene(tmp_path):
    """Synthetic COLMAP dataset: 10 cameras on a circle + random points."""
    rng = np.random.default_rng(0)
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    img_dir = tmp_path / "images"
    img_dir.mkdir()

    cams = {
        1: colmap.ColmapCamera(1, "PINHOLE", 64, 48, np.array([60.0, 60.0, 32.0, 24.0]))
    }
    imgs = {}
    for i in range(10):
        ang = 2 * math.pi * i / 10
        # camera on a circle of radius 4, looking at origin
        qvec = np.array([math.cos(ang / 2), 0.0, math.sin(ang / 2), 0.0])
        tvec = np.array([0.0, 0.0, 4.0])
        name = f"img_{i:03d}.png"
        imgs[i + 1] = colmap.ColmapImage(i + 1, qvec, tvec, 1, name)
        Image.fromarray(
            (rng.uniform(0, 255, (48, 64, 3))).astype(np.uint8)
        ).save(img_dir / name)

    colmap.write_cameras_binary(cams, str(sparse / "cameras.bin"))
    colmap.write_images_binary(imgs, str(sparse / "images.bin"))
    xyz = rng.uniform(-1, 1, (500, 3))
    rgb = rng.integers(0, 255, (500, 3))
    colmap.write_points3d_binary(xyz, rgb, str(sparse / "points3D.bin"))
    return tmp_path, xyz, rgb


class TestColmap:
    def test_binary_roundtrip(self, colmap_scene):
        path, xyz, rgb = colmap_scene
        sparse = os.path.join(path, "sparse", "0")
        cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        assert cams[1].model == "PINHOLE"
        assert cams[1].width == 64
        imgs = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
        assert len(imgs) == 10
        assert imgs[1].name == "img_000.png"
        pts, cols, _ = colmap.read_points3d_binary(os.path.join(sparse, "points3D.bin"))
        np.testing.assert_allclose(pts, xyz, atol=1e-12)
        np.testing.assert_array_equal(cols, rgb.astype(np.uint8))

    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.default_rng(1)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec_to_rotmat(q)
        np.testing.assert_allclose(colmap.rotmat_to_qvec(R), q, atol=1e-8)

    def test_scene_info_split_and_norm(self, colmap_scene):
        path, _, _ = colmap_scene
        info = readers.read_colmap_scene(str(path), eval_split=True)
        assert len(info.test_cameras) == 2  # every 8th of 10 -> idx 0, 8
        assert len(info.train_cameras) == 8
        # cameras on a radius-4 circle; norm uses the (asymmetric) train split
        assert 4.0 < info.nerf_normalization["radius"] < 5.5
        assert os.path.exists(info.ply_path)  # bin -> ply conversion happened

    def test_text_parsers(self, tmp_path):
        (tmp_path / "cameras.txt").write_text(
            "# comment\n1 SIMPLE_PINHOLE 100 80 90.0 50.0 40.0\n"
        )
        (tmp_path / "images.txt").write_text(
            "# hdr\n1 1 0 0 0 0.5 0.5 2.0 1 foo.png\n0 0 -1\n"
        )
        (tmp_path / "points3D.txt").write_text("7 1.0 2.0 3.0 10 20 30 0.5\n")
        cams = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
        assert cams[1].model == "SIMPLE_PINHOLE" and cams[1].params[0] == 90.0
        imgs = colmap.read_images_text(str(tmp_path / "images.txt"))
        assert imgs[1].name == "foo.png"
        np.testing.assert_allclose(imgs[1].tvec, [0.5, 0.5, 2.0])
        pts, cols, _ = colmap.read_points3d_text(str(tmp_path / "points3D.txt"))
        np.testing.assert_allclose(pts[0], [1, 2, 3])


class TestPly:
    def test_gaussian_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(2)
        n, deg = 17, 3
        k1 = (deg + 1) ** 2 - 1
        arrs = dict(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
            features_rest=rng.normal(size=(n, k1, 3)).astype(np.float32),
            logit_opacity=rng.normal(size=(n, 1)).astype(np.float32),
            log_scale=rng.normal(size=(n, 3)).astype(np.float32),
            quat=rng.normal(size=(n, 4)).astype(np.float32),
        )
        p = str(tmp_path / "pc.ply")
        ply.save_gaussian_ply(p, arrs["xyz"], arrs["features_dc"], arrs["features_rest"],
                              arrs["logit_opacity"], arrs["log_scale"], arrs["quat"])
        out = ply.load_gaussian_ply(p)
        assert out["max_sh_degree"] == deg
        for k in arrs:
            np.testing.assert_array_equal(out[k], arrs[k], err_msg=k)

    def test_schema_matches_reference_property_order(self, tmp_path):
        """Byte-level: header property names/order = gaussian_model.py:218-238."""
        p = str(tmp_path / "pc.ply")
        z = np.zeros((2, 1), np.float32)
        ply.save_gaussian_ply(
            p, np.zeros((2, 3), np.float32), np.zeros((2, 1, 3), np.float32),
            np.zeros((2, 15, 3), np.float32), z, np.zeros((2, 3), np.float32),
            np.zeros((2, 4), np.float32),
        )
        header = open(p, "rb").read().split(b"end_header")[0].decode()
        got = [l.split()[-1] for l in header.splitlines() if l.startswith("property")]
        expected = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(45)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert got == expected
        assert "format binary_little_endian 1.0" in header
        assert all("float" == l.split()[1] for l in header.splitlines()
                   if l.startswith("property"))

    def test_pointcloud_roundtrip(self, tmp_path):
        pts = np.random.default_rng(3).normal(size=(9, 3)).astype(np.float32)
        cols = np.random.default_rng(4).integers(0, 255, (9, 3))
        p = str(tmp_path / "pts.ply")
        ply.write_pointcloud_ply(p, pts, cols)
        rp, rc, rn = ply.read_pointcloud_ply(p)
        np.testing.assert_array_equal(rp, pts)
        np.testing.assert_allclose(rc, cols / 255.0, atol=1e-6)
        np.testing.assert_array_equal(rn, 0)


class TestBlender:
    @pytest.fixture
    def blender_scene(self, tmp_path):
        rng = np.random.default_rng(5)
        for split, count in [("train", 6), ("test", 3)]:
            frames = []
            d = tmp_path / split
            d.mkdir()
            for i in range(count):
                c2w = np.eye(4)
                c2w[:3, 3] = [0, 0, 3.0 + i * 0.1]
                frames.append(
                    {"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()}
                )
                rgba = rng.integers(0, 255, (40, 50, 4)).astype(np.uint8)
                Image.fromarray(rgba, "RGBA").save(d / f"r_{i}.png")
            with open(tmp_path / f"transforms_{split}.json", "w") as f:
                json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
        return tmp_path

    def test_blender_load(self, blender_scene):
        info = readers.read_blender_scene(str(blender_scene), white_background=True,
                                          eval_split=True)
        assert len(info.train_cameras) == 6
        assert len(info.test_cameras) == 3
        assert info.point_cloud[0].shape == (100_000, 3)
        assert np.abs(info.point_cloud[0]).max() <= 1.3
        cam = info.train_cameras[0]
        assert cam.fovx == 0.8
        # fovy from aspect ratio
        expected_fovy = 2 * math.atan(math.tan(0.4) * 40 / 50)
        assert abs(cam.fovy - expected_fovy) < 1e-9

    def test_scene_end_to_end(self, blender_scene, tmp_path):
        args = ModelParams(
            source_path=str(blender_scene), model_path=str(tmp_path / "out"),
            white_background=True, eval=True, sh_degree=2, resolution=2,
        )
        scene = Scene(args, shuffle=False)
        assert scene.gaussians.capacity >= 100_000
        assert int(scene.gaussians.num_alive) == 100_000
        cams = scene.get_train_cameras()
        assert cams[0].image.shape == (3, 20, 25)  # resolution 2 halves 40x50
        assert os.path.exists(tmp_path / "out" / "cameras.json")
        assert os.path.exists(tmp_path / "out" / "input.ply")
        # snapshot + reload
        scene.save(7)
        args2 = ModelParams(**{**args.__dict__})
        scene2 = Scene(args2, load_iteration=-1, shuffle=False, load_images=False)
        assert scene2.loaded_iter == 7
        assert int(scene2.gaussians.num_alive) == 100_000


class TestResolutionPolicy:
    def test_divisor_flags(self):
        assert images.target_resolution(1600, 1200, 2) == (800, 600)
        assert images.target_resolution(1600, 1200, 1, resolution_scale=2.0) == (800, 600)

    def test_auto_cap_1600(self):
        w, h = images.target_resolution(3200, 2400, -1)
        assert w == 1600 and h == 1200

    def test_native_below_cap(self):
        assert images.target_resolution(800, 600, -1) == (800, 600)

    def test_custom_width(self):
        assert images.target_resolution(1000, 500, 250) == (250, 125)


class TestMultihostPipeline:
    """Per-host camera ownership (SURVEY.md §2.4 row 7): each mocked host
    reads only its owned train images; test images load everywhere."""

    @pytest.fixture
    def blender_scene(self, tmp_path):
        rng = np.random.default_rng(5)
        for split, count in [("train", 6), ("test", 2)]:
            frames = []
            d = tmp_path / split
            d.mkdir()
            for i in range(count):
                c2w = np.eye(4)
                c2w[:3, 3] = [0, 0, 3.0 + i * 0.1]
                frames.append(
                    {"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()}
                )
                rgba = rng.integers(0, 255, (20, 20, 4)).astype(np.uint8)
                Image.fromarray(rgba, "RGBA").save(d / f"r_{i}.png")
            with open(tmp_path / f"transforms_{split}.json", "w") as f:
                json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
        return tmp_path

    def test_owned_indices_partition(self):
        from gs_tpu.data import multihost

        a = multihost.owned_indices(10, 0, 2)
        b = multihost.owned_indices(10, 1, 2)
        assert sorted(a + b) == list(range(10))
        assert not set(a) & set(b)
        assert multihost.owned_indices(10, 0, 1) == list(range(10))

    def test_each_host_reads_only_its_files(self, blender_scene, tmp_path,
                                            monkeypatch):
        from gs_tpu.data import images as img_mod
        from gs_tpu.data import multihost
        from gs_tpu.scene import Scene

        loads_by_host = {}
        real_load = img_mod.load_image

        for host in (0, 1):
            opened = []
            monkeypatch.setattr(
                "gs_tpu.scene.multihost.process_info", lambda h=host: (h, 2)
            )

            def recording_load(path, _opened=opened):
                # split-qualified name: train/ and test/ reuse basenames
                _opened.append("/".join(path.replace("\\", "/").split("/")[-2:]))
                return real_load(path)

            monkeypatch.setattr("gs_tpu.scene.img_mod.load_image",
                                recording_load)
            args = ModelParams(
                source_path=str(blender_scene),
                model_path=str(tmp_path / f"out{host}"), eval=True,
            )
            scene = Scene(args, shuffle=False)
            cams = scene.get_train_cameras()
            # owned cameras carry images; the rest are params-only
            with_img = [i for i, c in enumerate(cams) if c.image is not None]
            assert with_img == multihost.owned_indices(len(cams), host, 2)
            for c in scene.get_test_cameras():
                assert c.image is not None  # test split loads everywhere
            loads_by_host[host] = set(opened)

        # the two hosts' TRAIN reads are disjoint; only test images overlap
        overlap = loads_by_host[0] & loads_by_host[1]
        assert overlap == {"test/r_0.png", "test/r_1.png"}
        # and together they read all 6 train images exactly once
        train_only = (loads_by_host[0] | loads_by_host[1]) - overlap
        assert len(train_only) == 6
        assert all(f.startswith("train/") for f in train_only)
