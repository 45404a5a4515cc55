"""End-to-end CLI tests: train -> render -> metrics on a tiny Blender scene.

Mirrors the reference's driver stack (train.py / render.py / metrics.py) at
toy scale on the CPU test mesh.
"""

import json
import math
import os

import numpy as np
import pytest
from PIL import Image

from gs_tpu.cli import args as args_mod
from gs_tpu.config import ModelParams


@pytest.fixture(autouse=True)
def restore_stdout():
    # the CLIs install the reference-parity safe_state stdout wrapper
    # (timestamping / --quiet silencing); undo it between tests
    import sys

    orig = sys.stdout
    yield
    sys.stdout = orig


@pytest.fixture
def blender_scene(tmp_path):
    rng = np.random.default_rng(5)
    for split, count in [("train", 4), ("test", 2)]:
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


class TestArgsSystem:
    def test_shorthands_and_defaults(self):
        from argparse import ArgumentParser

        parser = ArgumentParser()
        args_mod.add_group(parser, ModelParams, "Model Parameters")
        ns = parser.parse_args(["-s", "/data", "-m", "/out", "-w", "--eval"])
        assert ns.source_path == "/data"
        assert ns.model_path == "/out"
        assert ns.white_background is True
        assert ns.eval is True
        assert ns.sh_degree == 0  # fork deviation default (arguments/__init__.py:53)
        assert ns.resolution == -1

    def test_cfg_args_roundtrip(self, tmp_path):
        mp = ModelParams(source_path="/some/data", sh_degree=3, eval=True)
        args_mod.save_cfg_args(str(tmp_path), mp)
        text = (tmp_path / "cfg_args").read_text()
        ns = args_mod.parse_saved_namespace(text)
        assert ns.source_path == "/some/data"
        assert ns.sh_degree == 3
        assert ns.eval is True

    def test_saved_namespace_rejects_code(self):
        with pytest.raises((ValueError, SyntaxError)):
            args_mod.parse_saved_namespace("__import__('os').system('true')")
        with pytest.raises((ValueError, SyntaxError)):
            args_mod.parse_saved_namespace("Namespace(x=__import__('os'))")


@pytest.fixture
def colmap_scene(tmp_path):
    import math as _math

    from gs_tpu.data import colmap

    rng = np.random.default_rng(0)
    root = tmp_path / "colmap"
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    img_dir = root / "images"
    img_dir.mkdir()
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60.0, 32.0, 24.0]))}
    imgs = {}
    for i in range(9):
        ang = 2 * _math.pi * i / 9
        qvec = np.array([_math.cos(ang / 2), 0.0, _math.sin(ang / 2), 0.0])
        name = f"img_{i:03d}.png"
        imgs[i + 1] = colmap.ColmapImage(i + 1, qvec, np.array([0.0, 0.0, 4.0]),
                                         1, name)
        Image.fromarray(rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)).save(
            img_dir / name
        )
    colmap.write_cameras_binary(cams, str(sparse / "cameras.bin"))
    colmap.write_images_binary(imgs, str(sparse / "images.bin"))
    colmap.write_points3d_binary(
        rng.uniform(-1, 1, (400, 3)), rng.integers(0, 255, (400, 3)),
        str(sparse / "points3D.bin"),
    )
    return root


class TestTrainRenderMetrics:
    def test_colmap_train_path(self, colmap_scene, tmp_path):
        """train CLI end-to-end on a COLMAP-layout dataset (binary sparse)."""
        from gs_tpu.cli import train as train_cli

        out = str(tmp_path / "colmap_model")
        train_cli.main([
            "-s", str(colmap_scene), "-m", out, "--eval",
            "--iterations", "3", "--test_iterations", "-1",
            "--save_iterations", "3", "--quiet", "--disable_viewer",
            "--raster_backend", "xla",
        ])
        assert os.path.exists(
            os.path.join(out, "point_cloud", "iteration_3", "point_cloud.ply")
        )
        assert os.path.exists(os.path.join(out, "input.ply"))
        assert os.path.exists(os.path.join(out, "cameras.json"))

    def test_end_to_end(self, blender_scene, tmp_path):
        from gs_tpu.cli import metrics as metrics_cli
        from gs_tpu.cli import render as render_cli
        from gs_tpu.cli import train as train_cli

        out = str(tmp_path / "model")
        train_cli.main([
            "-s", str(blender_scene), "-m", out, "-r", "8", "-w", "--eval",
            "--iterations", "4", "--test_iterations", "2",
            "--save_iterations", "4", "--checkpoint_iterations", "4",
            "--quiet", "--disable_viewer", "--raster_backend", "xla",
        ])
        assert os.path.exists(os.path.join(out, "cfg_args"))
        assert os.path.exists(
            os.path.join(out, "point_cloud", "iteration_4", "point_cloud.ply")
        )
        assert os.path.exists(os.path.join(out, "chkpnt4.npz"))

        render_cli.main(["-m", out, "--iteration", "4", "--quiet",
                         "--raster_backend", "xla"])
        test_dir = os.path.join(out, "test", "ours_4")
        renders = os.listdir(os.path.join(test_dir, "renders"))
        assert len(renders) == 2  # eval split: 2 test cameras
        assert len(os.listdir(os.path.join(test_dir, "gt"))) == 2

        metrics_cli.main(["-m", out])
        with open(os.path.join(out, "results.json")) as f:
            results = json.load(f)
        (method_metrics,) = results.values()
        assert 0.0 < method_metrics["PSNR"] < 60.0
        assert -1.0 <= method_metrics["SSIM"] <= 1.0
        assert os.path.exists(os.path.join(out, "per_view.json"))
