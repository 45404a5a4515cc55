"""Scene orchestration: dataset -> cameras + initial GaussianState + snapshots.

Behavioral parity: reference ``scene/__init__.py:21-105`` — scene type
detection, camera loading at resolution scales, extent computation, init from
SfM point cloud vs. loading a saved iteration, PLY snapshot saving, and the
``cameras.json`` / ``input.ply`` / ``cfg_args`` artifacts the viewer ecosystem
expects.
"""

from __future__ import annotations

import json
import os
import random
import shutil

import numpy as np

from gs_tpu import cameras as cam_mod
from gs_tpu.config import ModelParams
from gs_tpu.data import images as img_mod
from gs_tpu.data import multihost
from gs_tpu.data import ply as ply_mod
from gs_tpu.data import readers
from gs_tpu.models import gaussians


def search_max_iteration(point_cloud_dir: str) -> int:
    """Largest saved iteration (``utils/system_utils.py:26-29`` analog)."""
    iters = [
        int(d.split("_")[-1])
        for d in os.listdir(point_cloud_dir)
        if d.startswith("iteration_")
    ]
    return max(iters)


def camera_to_json(idx: int, cam: readers.CameraInfo) -> dict:
    """Viewer-facing camera description (``utils/camera_utils.py:99-126``)."""
    rt = np.zeros((4, 4))
    rt[:3, :3] = cam.R.transpose()
    rt[:3, 3] = cam.T
    rt[3, 3] = 1.0
    w2c = np.linalg.inv(rt)
    pos = w2c[:3, 3]
    rot = w2c[:3, :3]
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": pos.tolist(),
        "rotation": [r.tolist() for r in rot],
        "fy": cam_mod.fov_to_focal(cam.fovy, cam.height),
        "fx": cam_mod.fov_to_focal(cam.fovx, cam.width),
    }


def load_camera(
    info: readers.CameraInfo,
    resolution_flag: int,
    resolution_scale: float,
    load_image: bool = True,
    data_device: str = "tpu",
) -> cam_mod.Camera:
    """CameraInfo -> device Camera with gt image (``utils/camera_utils.py:19-86``)."""
    if load_image:
        with img_mod.load_image(info.image_path) as pil:
            gt = img_mod.load_camera_image(
                pil, resolution_flag, resolution_scale, bg=info.bg_composite
            )
        height, width = gt.shape[1], gt.shape[2]
    else:
        gt = None
        width, height = img_mod.target_resolution(
            info.width, info.height, resolution_flag, resolution_scale
        )
    return cam_mod.make_camera(
        info.R, info.T, info.fovx, info.fovy, width, height, image=gt,
        data_device=data_device,
    )


class Scene:
    """Holds cameras + the model path; initializes or restores Gaussian state."""

    def __init__(
        self,
        args: ModelParams,
        load_iteration: int | None = None,
        shuffle: bool = True,
        resolution_scales: tuple[float, ...] = (1.0,),
        load_images: bool = True,
    ):
        self.model_path = args.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = search_max_iteration(
                    os.path.join(self.model_path, "point_cloud")
                )
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        info = readers.load_scene_info(
            args.source_path,
            images=args.images,
            white_background=args.white_background,
            eval_split=args.eval,
        )
        self.scene_info = info

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            shutil.copyfile(info.ply_path, os.path.join(self.model_path, "input.ply"))
            cam_json = [
                camera_to_json(i, c)
                for i, c in enumerate(info.test_cameras + info.train_cameras)
            ]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(info.train_cameras)  # scene/__init__.py:68-70
            random.shuffle(info.test_cameras)

        self.cameras_extent = info.nerf_normalization["radius"]

        self.train_cameras: dict[float, list[cam_mod.Camera]] = {}
        self.test_cameras: dict[float, list[cam_mod.Camera]] = {}
        data_device = getattr(args, "data_device", "tpu")
        # multi-host input pipeline (SURVEY.md §2.4 row 7): each host reads
        # ground-truth images only for its owned train cameras; params-only
        # cameras are built for the rest. Ownership indexes the post-shuffle
        # order, which is identical on every host (safe_state seeds RNGs).
        pid, pcount = multihost.process_info()
        for scale in resolution_scales:
            print("Loading Training Cameras")
            self.train_cameras[scale] = [
                load_camera(
                    c, args.resolution, scale,
                    load_images and multihost.should_load_image(i, pid, pcount),
                    data_device,
                )
                for i, c in enumerate(info.train_cameras)
            ]
            print("Loading Test Cameras")
            self.test_cameras[scale] = [
                load_camera(
                    c, args.resolution, scale,
                    load_images and multihost.should_load_image(
                        i, pid, pcount, is_test=True),
                    data_device,
                )
                for i, c in enumerate(info.test_cameras)
            ]

        if self.loaded_iter:
            params = ply_mod.load_gaussian_ply(
                os.path.join(
                    self.model_path, "point_cloud",
                    f"iteration_{self.loaded_iter}", "point_cloud.ply",
                )
            )
            n = params["xyz"].shape[0]
            cap = gaussians.round_capacity(n)
            st = gaussians.empty_state(cap, params["max_sh_degree"])
            self.gaussians = st.replace(
                xyz=st.xyz.at[:n].set(params["xyz"]),
                features_dc=st.features_dc.at[:n].set(params["features_dc"]),
                features_rest=st.features_rest.at[:n].set(params["features_rest"]),
                log_scale=st.log_scale.at[:n].set(params["log_scale"]),
                quat=st.quat.at[:n].set(params["quat"]),
                logit_opacity=st.logit_opacity.at[:n].set(params["logit_opacity"]),
                alive=st.alive.at[:n].set(True),
            )
        else:
            pts, cols, _ = info.point_cloud
            print("Number of points at initialisation : ", pts.shape[0])
            self.gaussians = gaussians.create_from_pcd(pts, cols, args.sh_degree)

    def save(self, iteration: int, state=None) -> None:
        """PLY snapshot of alive Gaussians (``scene/__init__.py:97-99``)."""
        st = self.gaussians if state is None else state
        alive = np.asarray(st.alive)
        path = os.path.join(
            self.model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
        )
        ply_mod.save_gaussian_ply(
            path,
            np.asarray(st.xyz)[alive],
            np.asarray(st.features_dc)[alive],
            np.asarray(st.features_rest)[alive],
            np.asarray(st.logit_opacity)[alive],
            np.asarray(st.log_scale)[alive],
            np.asarray(st.quat)[alive],
        )

    def get_train_cameras(self, scale: float = 1.0):
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0):
        return self.test_cameras[scale]
