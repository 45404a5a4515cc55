"""Offline render CLI — parity with the reference ``render.py:24-66``.

Loads a trained iteration and renders every train/test camera to PNG under
``<model>/{train,test}/ours_<iter>/{renders,gt}``.
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np


def save_png(path: str, img: np.ndarray) -> None:
    """[3,H,W] float in [0,1] -> 8-bit PNG."""
    from PIL import Image

    arr = (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)


def render_set(model_path, name, iteration, views, state, sh_degree, bg,
               raster_cfg):
    """Per-camera render + gt dump (``render_set``, render.py:24-35)."""
    import jax.numpy as jnp

    from gs_tpu.training import eval_render

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)

    for idx, view in enumerate(views):
        img = eval_render(state, view, bg, active_sh_degree=sh_degree,
                          raster_cfg=raster_cfg)
        save_png(os.path.join(render_path, f"{idx:05d}.png"), img)
        if view.image is not None:
            save_png(os.path.join(gts_path, f"{idx:05d}.png"),
                     np.clip(np.asarray(view.image), 0.0, 1.0))


def main(argv=None):
    from gs_tpu.cli import args as args_mod
    from gs_tpu.config import ModelParams, PipelineParams, RasterizeConfig

    parser = ArgumentParser(description="Testing script parameters")
    args_mod.add_group(parser, ModelParams, "Model Parameters", sentinel=True)
    args_mod.add_group(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--raster_backend", type=str, default="auto")
    args = args_mod.get_combined_args(parser, sys.argv[1:] if argv is None else argv)
    print("Rendering " + args.model_path)

    from gs_tpu.utils.console import safe_state
    safe_state(args.quiet)

    import jax.numpy as jnp

    from gs_tpu.scene import Scene

    model = args_mod.extract(ModelParams, args)
    scene = Scene(model, load_iteration=args.iteration, shuffle=False)
    state = scene.gaussians
    sh_degree = state.max_sh_degree
    bg = jnp.asarray([1.0, 1.0, 1.0] if model.white_background else [0.0, 0.0, 0.0])
    raster_cfg = RasterizeConfig(backend=args.raster_backend)

    if not args.skip_train:
        render_set(model.model_path, "train", scene.loaded_iter,
                   scene.get_train_cameras(), state, sh_degree, bg, raster_cfg)
    if not args.skip_test:
        render_set(model.model_path, "test", scene.loaded_iter,
                   scene.get_test_cameras(), state, sh_degree, bg, raster_cfg)


if __name__ == "__main__":
    main()
