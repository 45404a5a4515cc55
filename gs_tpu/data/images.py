"""Image loading + the reference's resolution policy.

Behavioral parity: ``utils/camera_utils.py:19-86`` and
``utils/general_utils.py:21-27``:

- ``resolution`` flag in {1,2,4,8}: divide by resolution * resolution_scale
- ``-1``: auto-cap width at 1600 px (warn once), else native
- any other positive value: treat as target width
- images resized with PIL, converted to [C,H,W] float in [0,1]
- RGBA inputs: RGB premultiplied by alpha (background separation,
  ``scene/cameras.py:84-88``); the alpha mask multiplies the gt image.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

_warned_big = False


def load_image(path: str) -> Image.Image:
    return Image.open(path)


def pil_to_array(pil_image: Image.Image, resolution: tuple[int, int]) -> np.ndarray:
    """Resize then convert to [C,H,W] float32 in [0,1] (PILtoTorch analog)."""
    resized = pil_image.resize(resolution)
    arr = np.asarray(resized, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return np.transpose(arr, (2, 0, 1))


def target_resolution(
    orig_w: int, orig_h: int, resolution_flag: int, resolution_scale: float = 1.0
) -> tuple[int, int]:
    """The loadCam resolution policy (``utils/camera_utils.py:44-63``)."""
    global _warned_big
    if resolution_flag in (1, 2, 4, 8):
        scale = resolution_scale * resolution_flag
        return round(orig_w / scale), round(orig_h / scale)
    if resolution_flag == -1:
        if orig_w > 1600:
            if not _warned_big:
                print(
                    "[ INFO ] Encountered quite large input images (>1.6K pixels width), "
                    "rescaling to 1.6K.\n If this is not desired, please explicitly "
                    "specify '--resolution/-r' as 1"
                )
                _warned_big = True
            global_down = orig_w / 1600
        else:
            global_down = 1.0
    else:
        global_down = orig_w / resolution_flag
    scale = global_down * resolution_scale
    return int(orig_w / scale), int(orig_h / scale)


def load_camera_image(
    pil_image: Image.Image,
    resolution_flag: int,
    resolution_scale: float = 1.0,
    bg: np.ndarray | None = None,
) -> np.ndarray:
    """Load a ground-truth image: [3,H,W] in [0,1].

    RGBA handling: with ``bg`` (Blender datasets) alpha-composite over it
    (``dataset_readers.py:281-287``); otherwise multiply by the alpha mask
    (``scene/cameras.py:84-88``).
    """
    res = target_resolution(pil_image.width, pil_image.height, resolution_flag,
                            resolution_scale)
    arr = pil_to_array(pil_image, res)
    if arr.shape[0] == 4:
        rgb, alpha = arr[:3], arr[3:4]
        if bg is not None:
            rgb = rgb * alpha + bg.reshape(3, 1, 1) * (1.0 - alpha)
        else:
            rgb = rgb * alpha
        return np.clip(rgb, 0.0, 1.0)
    return np.clip(arr[:3], 0.0, 1.0)
