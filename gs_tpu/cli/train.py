"""Training CLI — parity with the reference ``train.py:295-327`` flag set.

Usage: ``python train.py -s <dataset> [-m <model_dir>] [--eval] ...``
"""

from __future__ import annotations

import os
import sys
import uuid
from argparse import ArgumentParser

from gs_tpu.cli import args as args_mod
from gs_tpu.config import (ModelParams, OptimizationParams, PipelineParams,
                           RasterizeConfig)


def prepare_output(model_params: ModelParams) -> str:
    """Model dir + cfg_args dump (``prepare_output_and_logger``, train.py:148-168)."""
    if not model_params.model_path:
        unique = os.getenv("OAR_JOB_ID", str(uuid.uuid4()))
        model_params.model_path = os.path.join("./output/", unique[0:10])
    print("Output folder:", model_params.model_path)
    args_mod.save_cfg_args(model_params.model_path, model_params)
    return model_params.model_path


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    args_mod.add_group(parser, ModelParams, "Model Parameters")
    args_mod.add_group(parser, OptimizationParams, "Optimization Parameters")
    args_mod.add_group(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--disable_viewer", action="store_true", default=False)
    parser.add_argument("--raster_backend", type=str, default="auto",
                        choices=["auto", "pallas", "xla", "oracle"])
    parser.add_argument("--kernel_autotune", type=str, default="on",
                        choices=["on", "off"],
                        help="time the kernel formulations on the real "
                             "scene at startup and keep the winner "
                             "(TPU+pallas only; see gs_tpu.ops.autotune)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of iterations 50-60")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="mesh data axis: cameras per step")
    parser.add_argument("--shard_parallel", type=int, default=1,
                        help="mesh shard axis: tiles or gaussians")
    parser.add_argument("--parallel_layout", type=str, default="tile",
                        choices=["tile", "gauss"],
                        help="shard axis meaning (see ParallelConfig)")
    parser.add_argument("--visible_budget", type=int, default=None,
                        help="gauss layout: per-shard visible-splat budget")
    args = parser.parse_args(sys.argv[1:] if argv is None else argv)
    args.save_iterations.append(args.iterations)

    print("Optimizing " + (args.model_path or "<auto>"))

    from gs_tpu.utils.console import safe_state
    safe_state(args.quiet)

    # multi-host runtime: initialize from env before any jax device use
    # (SURVEY.md §2.4 device-mesh row; no-op single-process)
    n_proc = int(os.environ.get("GS_TPU_NUM_PROCESSES", "1"))
    if n_proc > 1:
        from gs_tpu.parallel.mesh import init_distributed

        init_distributed(
            coordinator=os.environ.get("GS_TPU_COORDINATOR", "127.0.0.1:8476"),
            num_processes=n_proc,
            process_id=int(os.environ.get("GS_TPU_PROCESS_ID", "0")),
        )

    if args.detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)  # the TPU-side anomaly mode

    from gs_tpu.scene import Scene
    from gs_tpu.training import run_training

    model = args_mod.extract(ModelParams, args)
    opt = args_mod.extract(OptimizationParams, args)
    pipe = args_mod.extract(PipelineParams, args)
    prepare_output(model)
    args.model_path = model.model_path

    gui_server = None
    if not args.disable_viewer:
        try:
            from gs_tpu.viewer.network_gui import GuiServer
            gui_server = GuiServer(args.ip, args.port, model.source_path)
        except OSError as e:
            print(f"Viewer server disabled ({e})")

    scene = Scene(model)
    test_iters = [] if args.test_iterations == [-1] else args.test_iterations

    def progress(it, m):
        if not args.quiet:
            print(f"[{it:6d}] loss {m['ema_loss']:.5f}  "
                  f"visible {int(m.get('n_visible', 0))}", flush=True)

    parallel = None
    if args.data_parallel * args.shard_parallel > 1:
        from gs_tpu.config import ParallelConfig

        parallel = ParallelConfig(
            data_parallel=args.data_parallel,
            shard_parallel=args.shard_parallel,
            layout=args.parallel_layout,
            visible_budget=args.visible_budget,
        )

    raster_cfg = RasterizeConfig(backend=args.raster_backend,
                                 autotune=args.kernel_autotune == "on")
    run_training(
        scene,
        opt,
        pipe,
        raster_cfg=raster_cfg,
        white_background=model.white_background,
        test_iterations=tuple(test_iters),
        save_iterations=tuple(args.save_iterations),
        checkpoint_iterations=tuple(args.checkpoint_iterations),
        start_checkpoint=args.start_checkpoint,
        progress=progress,
        gui_server=gui_server,
        profile_dir=args.profile_dir,
        debug_from=args.debug_from,
        parallel=parallel,
    )
    if gui_server is not None:
        gui_server.close()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
