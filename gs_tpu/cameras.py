"""Camera model: pytree camera + matrix builders.

Behavioral parity: reference ``scene/cameras.py:30-164`` and
``utils/graphics_utils.py:34-157``. Differences by design:

- The reference stores *transposed* (row-vector convention) matrices because
  the CUDA rasterizer multiplies ``p @ M``. We keep standard column-vector
  matrices (``p' = M @ p``) and only transpose at external protocol boundaries
  (viewer socket, saved cameras.json).
- ``Camera`` is a JAX pytree: all per-camera numerics are arrays so a jitted
  step never retraces when the viewpoint changes; only the image dimensions
  are static. A batch of cameras is just a stacked pytree.

Conventions (identical to the reference / COLMAP):
- ``R`` is the camera-to-world rotation (COLMAP qvec2rotmat transposed),
  ``T`` the world-to-camera translation, as produced by the data readers.
- view matrix ``W``: ``p_cam = W @ [p_world, 1]``; camera looks down +z.
- projection ``P`` maps camera space to clip space with z in [0, 1] after
  perspective divide (``utils/graphics_utils.py:97-133``); clip w = z_cam.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

DEFAULT_ZNEAR = 0.01  # scene/cameras.py:96
DEFAULT_ZFAR = 100.0  # scene/cameras.py:95


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def make_view_matrix(
    R: np.ndarray,
    T: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """World-to-camera 4x4 with optional scene recentering/rescaling.

    Mirrors ``getWorld2View2`` (``utils/graphics_utils.py:49-87``): the camera
    center is moved to ``(C + translate) * scale`` while the rotation is kept.
    """
    R = np.asarray(R, dtype=np.float64)
    T = np.asarray(T, dtype=np.float64)
    w2c = np.eye(4, dtype=np.float64)
    w2c[:3, :3] = R.T
    w2c[:3, 3] = T
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate, dtype=np.float64)
        c2w = np.linalg.inv(w2c)
        c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
        w2c = np.linalg.inv(c2w)
    return w2c.astype(np.float32)


def make_projection_matrix(
    znear: float, zfar: float, fovx: float, fovy: float
) -> np.ndarray:
    """Symmetric perspective projection, z mapped to [0,1] after divide.

    Mirrors ``getProjectionMatrix`` (``utils/graphics_utils.py:97-133``).
    """
    tan_x = math.tan(fovx / 2.0)
    tan_y = math.tan(fovy / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@struct.dataclass
class Camera:
    """A renderable viewpoint. Pytree of arrays + static image dims.

    ``image`` (ground truth, [3,H,W] in [0,1]) is optional and only present on
    training cameras; rendering never touches it.
    """

    view: jnp.ndarray  # [4,4] world->camera
    full_proj: jnp.ndarray  # [4,4] world->clip (P @ W)
    cam_pos: jnp.ndarray  # [3] camera center in world space
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    image: Any = None  # optional [3,H,W] ground truth
    znear: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(DEFAULT_ZNEAR))
    zfar: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(DEFAULT_ZFAR))

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    image: np.ndarray | None = None,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
    znear: float = DEFAULT_ZNEAR,
    zfar: float = DEFAULT_ZFAR,
    data_device: str = "tpu",
) -> Camera:
    """Build a :class:`Camera` from COLMAP-convention extrinsics.

    Mirrors ``Camera.__init__`` (``scene/cameras.py:30-121``): view matrix via
    ``getWorld2View2``, projection via ``getProjectionMatrix``, camera center
    from the inverse view matrix.

    ``data_device`` is the reference's ``--data_device`` staging policy
    (``arguments/__init__.py:59``, ``scene/cameras.py:70-77``): ``"cpu"``
    keeps the ground-truth image host-side (numpy) and lets each jitted step
    transfer it on use — trades per-step H2D copies for device memory on
    large datasets. Any other value stages the image onto the default device.
    """
    view = make_view_matrix(R, T, translate, scale)
    proj = make_projection_matrix(znear, zfar, fovx, fovy)
    full = (proj @ view).astype(np.float32)
    cam_pos = np.linalg.inv(view)[:3, 3].astype(np.float32)
    return Camera(
        view=jnp.asarray(view),
        full_proj=jnp.asarray(full),
        cam_pos=jnp.asarray(cam_pos),
        tan_fovx=jnp.float32(math.tan(fovx / 2.0)),
        tan_fovy=jnp.float32(math.tan(fovy / 2.0)),
        width=int(width),
        height=int(height),
        image=(None if image is None
               else np.asarray(image, dtype=np.float32) if data_device == "cpu"
               else jnp.asarray(image, dtype=jnp.float32)),
        znear=jnp.float32(znear),
        zfar=jnp.float32(zfar),
    )


def camera_from_matrices(
    view: np.ndarray,
    full_proj: np.ndarray,
    fovx: float,
    fovy: float,
    width: int,
    height: int,
    znear: float = DEFAULT_ZNEAR,
    zfar: float = DEFAULT_ZFAR,
) -> Camera:
    """Matrices-only camera, the ``MiniCam`` analog (``scene/cameras.py:123-164``)."""
    view = np.asarray(view, dtype=np.float32)
    cam_pos = np.linalg.inv(view)[:3, 3].astype(np.float32)
    return Camera(
        view=jnp.asarray(view),
        full_proj=jnp.asarray(np.asarray(full_proj, dtype=np.float32)),
        cam_pos=jnp.asarray(cam_pos),
        tan_fovx=jnp.float32(math.tan(fovx / 2.0)),
        tan_fovy=jnp.float32(math.tan(fovy / 2.0)),
        width=int(width),
        height=int(height),
        znear=jnp.float32(znear),
        zfar=jnp.float32(zfar),
    )


def stack_cameras(cams: list[Camera]) -> Camera:
    """Stack same-resolution cameras into one batched pytree (leading axis)."""
    if not cams:
        raise ValueError("empty camera list")
    if len({(c.width, c.height) for c in cams}) != 1:
        raise ValueError("stack_cameras requires uniform resolution")
    has_img = all(c.image is not None for c in cams)
    base = cams[0]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *(
        c if has_img else c.replace(image=None) for c in cams
    )) if has_img else Camera(
        view=jnp.stack([c.view for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        cam_pos=jnp.stack([c.cam_pos for c in cams]),
        tan_fovx=jnp.stack([c.tan_fovx for c in cams]),
        tan_fovy=jnp.stack([c.tan_fovy for c in cams]),
        width=base.width,
        height=base.height,
        znear=jnp.stack([c.znear for c in cams]),
        zfar=jnp.stack([c.zfar for c in cams]),
    )
