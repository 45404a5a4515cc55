"""Metrics CLI — parity with the reference ``metrics.py:24-103``.

For each ``<model>/test/ours_*`` directory, loads render/gt PNG pairs and
computes SSIM / PSNR / LPIPS, writing ``results.json`` + ``per_view.json``.
LPIPS uses the from-scratch JAX VGG16 port (gs_tpu.utils.lpips); when its
weights file is unavailable in this offline environment the LPIPS column is
reported as null rather than downloaded (reference downloads from GitHub at
first use, lpipsPyTorch/modules/utils.py:11-30).
"""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def read_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr.transpose(2, 0, 1)  # [3,H,W]


def read_images(renders_dir: Path, gt_dir: Path):
    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        renders.append(read_image(str(renders_dir / fname)))
        gts.append(read_image(str(gt_dir / fname)))
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths):
    import jax.numpy as jnp

    from gs_tpu.utils import losses
    from gs_tpu.utils import metrics as metrics_mod
    from gs_tpu.utils.lpips import lpips_fn

    lpips = lpips_fn()  # None if VGG weights unavailable offline
    full_dict, per_view_dict = {}, {}
    for scene_dir in model_paths:
        try:
            print("Scene:", scene_dir)
            full_dict[scene_dir] = {}
            per_view_dict[scene_dir] = {}
            test_dir = Path(scene_dir) / "test"

            for method in sorted(os.listdir(test_dir)):
                print("Method:", method)
                method_dir = test_dir / method
                renders, gts, names = read_images(
                    method_dir / "renders", method_dir / "gt"
                )
                ssims, psnrs, lpipss = [], [], []
                for r, g in zip(renders, gts):
                    rj, gj = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(losses.ssim(rj, gj)))
                    psnrs.append(float(metrics_mod.psnr(rj, gj)[0, 0]))
                    if lpips is not None:
                        lpipss.append(float(lpips(rj, gj)))
                print(f"  SSIM : {np.mean(ssims):>12.7f}")
                print(f"  PSNR : {np.mean(psnrs):>12.7f}")
                if lpipss:
                    print(f"  LPIPS: {np.mean(lpipss):>12.7f}")

                full_dict[scene_dir][method] = {
                    "SSIM": float(np.mean(ssims)),
                    "PSNR": float(np.mean(psnrs)),
                    "LPIPS": float(np.mean(lpipss)) if lpipss else None,
                }
                per_view_dict[scene_dir][method] = {
                    "SSIM": dict(zip(names, map(float, ssims))),
                    "PSNR": dict(zip(names, map(float, psnrs))),
                    "LPIPS": dict(zip(names, map(float, lpipss))) if lpipss else {},
                }

            with open(os.path.join(scene_dir, "results.json"), "w") as f:
                json.dump(full_dict[scene_dir], f, indent=True)
            with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
                json.dump(per_view_dict[scene_dir], f, indent=True)
        except Exception as e:
            print(f"Unable to compute metrics for model {scene_dir}: {e}")
    return full_dict


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+", type=str)
    args = parser.parse_args(sys.argv[1:] if argv is None else argv)
    evaluate(args.model_paths)


if __name__ == "__main__":
    main()
