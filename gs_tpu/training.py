"""Training: the jitted step + the outer optimization loop.

Rebuild of the reference training driver (``train.py:31-146``) with the whole
per-iteration computation — render, loss, backward, Adam, densify-stat
accumulation — fused into ONE jitted function per (sh_degree, capacity)
combination. The Python loop only orchestrates: camera sampling, the densify
/ opacity-reset / save schedule, logging, and capacity growth (which retraces,
boundedly, on occupancy watermarks).

Schedule parity (train.py):
  - loss = 0.8 L1 + 0.2 (1-SSIM)                       (:103-104)
  - xyz lr log-lerp schedule per step                   (:80; gaussian_model.py:207-213)
  - SH degree +1 every 1000 iters up to max             (:82-83)
  - densify every 100 iters in [500, 15000], grad threshold 2e-4,
    min opacity 0.005, size pruning only after the first opacity reset
                                                        (:125-133)
  - opacity reset every 3000 iters (+ at densify start on white bg)
                                                        (:135-136)
"""

from __future__ import annotations

import dataclasses
import random
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from gs_tpu.cameras import Camera
from gs_tpu.config import OptimizationParams, PipelineParams, RasterizeConfig
from gs_tpu.models import densify, gaussians, optim
from gs_tpu.models.gaussians import GaussianState
from gs_tpu.renderer import render
from gs_tpu.utils import losses, profiling, schedules

GROW_WATERMARK = 0.9  # grow capacity when alive exceeds this fraction
GROW_FACTOR = 2.0


def current_pair_budget(cfg: RasterizeConfig, capacity: int) -> int:
    """The static pair budget rasterize_tiled derives from cfg + capacity."""
    budget = max(int(cfg.pair_budget_factor * capacity), cfg.min_pair_budget)
    return -(-budget // cfg.chunk) * cfg.chunk


@dataclass
class TrainState:
    """Everything that evolves during training (a host-side container)."""

    state: GaussianState
    adam: optim.AdamState
    stats: densify.DensifyStats
    iteration: int = 0
    spatial_lr_scale: float = 1.0
    max_sh_degree: int = 0

    @property
    def active_sh_degree(self) -> int:
        # oneupSHdegree schedule (train.py:82-83)
        return min(self.iteration // 1000, self.max_sh_degree)


def init_train_state(
    state: GaussianState, spatial_lr_scale: float, max_sh_degree: int
) -> TrainState:
    return TrainState(
        state=state,
        adam=optim.init(state.params()),
        stats=densify.DensifyStats.zeros(state.capacity),
        spatial_lr_scale=spatial_lr_scale,
        max_sh_degree=max_sh_degree,
    )


@partial(
    jax.jit,
    static_argnames=("active_sh_degree", "opt_cfg", "raster_cfg",
                     "accumulate_stats", "pipe", "apply_update"),
)
def train_step(
    state: GaussianState,
    adam: optim.AdamState,
    stats: densify.DensifyStats,
    camera: Camera,
    bg: jnp.ndarray,
    iteration: jnp.ndarray,
    spatial_lr_scale: jnp.ndarray,
    *,
    active_sh_degree: int,
    opt_cfg: OptimizationParams,
    raster_cfg: RasterizeConfig,
    accumulate_stats: bool,
    pipe: PipelineParams = PipelineParams(),
    apply_update: bool = True,
):
    """One fused optimization step. Returns (state, adam, stats, metrics).

    ``apply_update=False`` computes loss/grads/stats but skips the Adam step —
    the reference's final iteration (``train.py:139-141`` gates
    ``optimizer.step()`` on ``iteration < opt.iterations``).
    """
    params = state.params()
    offset0 = jnp.zeros((state.capacity, 2), jnp.float32)

    def loss_fn(params, offset):
        st = state.with_params(params)
        out = render(
            camera,
            st,
            active_sh_degree=active_sh_degree,
            bg_color=bg,
            means2d_offset=offset,
            convert_shs_python=pipe.convert_SHs_python,
            compute_cov3d_python=pipe.compute_cov3D_python,
            cfg=raster_cfg,
        )
        loss = losses.photometric_loss(out.image, camera.image, opt_cfg.lambda_dssim)
        return loss, out

    (loss, out), (g_params, g_offset) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, offset0)

    xyz_lr = schedules.expon_lr(
        iteration,
        lr_init=opt_cfg.position_lr_init,
        lr_final=opt_cfg.position_lr_final,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    ) * spatial_lr_scale
    lrs = optim.group_lrs(opt_cfg, xyz_lr)
    if apply_update:
        new_params, new_adam = optim.update(params, g_params, adam, lrs)
    else:
        new_params, new_adam = params, adam
    new_state = state.with_params(new_params)

    if accumulate_stats:
        stats = densify.add_stats(
            stats, g_offset, out.radii, out.visibility, camera.width, camera.height
        )

    metrics = {
        "loss": loss,
        "n_visible": jnp.sum(out.visibility.astype(jnp.int32)),
        "xyz_lr": xyz_lr,
    }
    if out.num_pairs is not None:
        metrics["num_pairs"] = out.num_pairs
    return new_state, new_adam, stats, metrics


@partial(jax.jit, static_argnames=("active_sh_degree", "raster_cfg", "pipe"))
def eval_render(state, camera, bg, *, active_sh_degree, raster_cfg,
                pipe: PipelineParams = PipelineParams()):
    out = render(camera, state, active_sh_degree=active_sh_degree, bg_color=bg,
                 convert_shs_python=pipe.convert_SHs_python,
                 compute_cov3d_python=pipe.compute_cov3D_python,
                 cfg=raster_cfg)
    return jnp.clip(out.image, 0.0, 1.0)


def debug_dump(path: str, ts: "TrainState", camera: Camera, loss: float) -> str:
    """Dump the rasterizer inputs for failure forensics (``pipe.debug``).

    The reference rasterizer snapshots its input tensors when the CUDA kernel
    fails under ``--debug`` (arguments/__init__.py:72, README ~160). The TPU
    analog: on a non-finite loss, persist everything needed to replay the
    failing step offline.
    """
    import os

    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, f"snapshot_debug_iter{ts.iteration}.npz")
    payload = {f"param_{k}": np.asarray(v) for k, v in ts.state.params().items()}
    payload.update(
        alive=np.asarray(ts.state.alive),
        cam_view=np.asarray(camera.view),
        cam_full_proj=np.asarray(camera.full_proj),
        cam_pos=np.asarray(camera.cam_pos),
        tan_fovx=np.asarray(camera.tan_fovx),
        tan_fovy=np.asarray(camera.tan_fovy),
        width=np.int32(camera.width),
        height=np.int32(camera.height),
        iteration=np.int32(ts.iteration),
        loss=np.float32(loss),
    )
    np.savez_compressed(out, **payload)
    return out


def maybe_grow(ts: TrainState) -> TrainState:
    """Grow capacity (outside jit; one retrace) at the occupancy watermark."""
    alive = int(ts.state.num_alive)
    if alive <= GROW_WATERMARK * ts.state.capacity:
        return ts
    new_cap = gaussians.round_capacity(int(ts.state.capacity * GROW_FACTOR))
    ts.state = gaussians.grow_capacity(ts.state, new_cap)
    ts.adam = optim.grow(ts.adam, new_cap)
    pad = new_cap - ts.stats.xyz_grad_accum.shape[0]
    ts.stats = densify.DensifyStats(
        *(jnp.concatenate([s, jnp.zeros((pad,), s.dtype)]) for s in ts.stats)
    )
    return ts


def run_training(
    scene,
    opt_cfg: OptimizationParams,
    pipe: PipelineParams,
    raster_cfg: RasterizeConfig | None = None,
    white_background: bool = False,
    test_iterations: tuple[int, ...] = (7000, 30000),
    save_iterations: tuple[int, ...] = (7000, 30000),
    checkpoint_iterations: tuple[int, ...] = (),
    start_checkpoint: str | None = None,
    log_every: int = 10,
    progress: Callable[[int, dict], None] | None = None,
    seed: int = 0,
    gui_server=None,
    profile_dir: str | None = None,
    profile_iters: tuple[int, int] = (50, 60),
    debug_from: int = -1,
    parallel=None,
):
    """The full optimization loop (``training``, train.py:31-146).

    ``parallel``: optional :class:`~gs_tpu.config.ParallelConfig`; when its
    mesh spans more than one device the loop delegates to the shard_map'd
    trainer (gs_tpu.parallel.trainer) — same schedules, sharded steps.
    """
    from gs_tpu.utils import ckpt as ckpt_mod
    from gs_tpu.utils import metrics as metrics_mod

    if parallel is not None and parallel.data_parallel * parallel.shard_parallel > 1:
        from gs_tpu.parallel.trainer import run_training_parallel

        return run_training_parallel(
            scene, opt_cfg, pipe, parallel, raster_cfg=raster_cfg,
            white_background=white_background, test_iterations=test_iterations,
            save_iterations=save_iterations,
            checkpoint_iterations=checkpoint_iterations,
            start_checkpoint=start_checkpoint, log_every=log_every,
            progress=progress, seed=seed, gui_server=gui_server,
            profile_dir=profile_dir, profile_iters=profile_iters,
            debug_from=debug_from,
        )

    if raster_cfg is None:
        raster_cfg = RasterizeConfig(backend="xla")
    random.seed(seed)
    np.random.seed(seed)

    ts = init_train_state(
        scene.gaussians, scene.cameras_extent, scene.gaussians.max_sh_degree
    )
    first_iter = 0
    if start_checkpoint:
        ts = ckpt_mod.load_train_state(start_checkpoint)
        first_iter = ts.iteration
        print(f"Restored checkpoint at iteration {first_iter}")

    bg_fixed = jnp.asarray(
        [1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0], jnp.float32
    )

    if raster_cfg.autotune:
        from gs_tpu.ops.autotune import autotune_formulation

        tune_cams = list(scene.get_train_cameras())
        if tune_cams:
            # no-op off-TPU / non-pallas; sets the rasterize_pallas globals
            # to the measured winner before the step below first traces
            tuned = autotune_formulation(ts.state, tune_cams[0], raster_cfg)
            if tuned is not None:
                raster_cfg = tuned["cfg"]

    viewpoint_stack: list = []
    key = jax.random.PRNGKey(seed)
    ema_loss: float | None = None
    t_start = time.time()
    timer = profiling.StepTimer()

    if gui_server is not None:
        # CLI pipeline flags seed the live-toggleable state (train.py:66)
        gui_server.convert_SHs_python = pipe.convert_SHs_python
        gui_server.compute_cov3D_python = pipe.compute_cov3D_python

    for iteration in range(first_iter + 1, opt_cfg.iterations + 1):
        ts.iteration = iteration
        if gui_server is not None:
            gui_server.poll(ts, raster_cfg, iterations=opt_cfg.iterations)
            # viewer messages overwrite the pipeline toggles for training too,
            # exactly like the reference's in-place pipe mutation (train.py:66)
            pipe = dataclasses.replace(
                pipe,
                convert_SHs_python=gui_server.convert_SHs_python,
                compute_cov3D_python=gui_server.compute_cov3D_python,
            )
        if debug_from >= 0 and iteration == debug_from and not pipe.debug:
            # --debug_from flips pipe.debug on mid-run (train.py:91-92)
            pipe = dataclasses.replace(pipe, debug=True)
        if profile_dir is not None and iteration == profile_iters[0]:
            jax.profiler.start_trace(profile_dir)
        timer.start()

        if not viewpoint_stack:
            viewpoint_stack = list(scene.get_train_cameras())
        cam = viewpoint_stack.pop(random.randint(0, len(viewpoint_stack) - 1))

        if opt_cfg.random_background:
            key, sub = jax.random.split(key)
            bg = jax.random.uniform(sub, (3,), jnp.float32)
        else:
            bg = bg_fixed

        in_densify_phase = iteration < opt_cfg.densify_until_iter
        ts.state, ts.adam, ts.stats, m = train_step(
            ts.state, ts.adam, ts.stats, cam, bg,
            jnp.int32(iteration - 1),
            jnp.float32(ts.spatial_lr_scale),
            active_sh_degree=ts.active_sh_degree,
            opt_cfg=opt_cfg,
            raster_cfg=raster_cfg,
            accumulate_stats=in_densify_phase,
            pipe=pipe,
            # the reference skips the optimizer step at the final iteration
            # (train.py:139-141); one extra retrace, exact parity
            apply_update=iteration < opt_cfg.iterations,
        )

        # Sync host<->device only every log_every iterations (plus at
        # densify/report points below). Pulling float(loss) every step
        # serializes dispatch and dominates small-scene wall time; JAX's
        # async dispatch pipelines the in-between steps. The EMA is sampled
        # at sync points (cosmetic parity with the reference's tqdm EMA).
        sync = (
            iteration % log_every == 0
            or iteration == opt_cfg.iterations
            or iteration in test_iterations
        )
        if sync:
            # pair-budget overflow: the rasterizer dropped the deepest splats;
            # raise the budget factor (one retrace, like capacity growth)
            if "num_pairs" in m:
                budget = current_pair_budget(raster_cfg, ts.state.capacity)
                if int(m["num_pairs"]) > budget:
                    raster_cfg = dataclasses.replace(
                        raster_cfg,
                        pair_budget_factor=raster_cfg.pair_budget_factor * 1.5,
                    )
                    print(
                        f"[iter {iteration}] pair budget overflow "
                        f"({int(m['num_pairs'])} > {budget}); factor -> "
                        f"{raster_cfg.pair_budget_factor:.1f}"
                    )
            loss = float(m["loss"])  # device sync
            if pipe.debug and not np.isfinite(loss):
                out = debug_dump(scene.model_path or ".", ts, cam, loss)
                raise RuntimeError(
                    f"[iter {iteration}] non-finite loss {loss}; rasterizer "
                    f"inputs dumped to {out} (pipe.debug snapshot)"
                )
            ema_loss = (
                loss if ema_loss is None else 0.4 * loss + 0.6 * ema_loss
            )
        timer.stop(synced=sync)
        if profile_dir is not None and iteration == profile_iters[1]:
            jax.profiler.stop_trace()
            print(f"[iter {iteration}] wrote profiler trace to {profile_dir}")
        if progress is not None and iteration % log_every == 0:
            progress(iteration, {
                "ema_loss": ema_loss,
                "step_s": timer.ema_s,
                "pix_per_s": timer.pixels_per_s(cam.width * cam.height),
                **{k: float(v) for k, v in m.items()},
            })

        # --- densification schedule (train.py:125-136) ----------------------
        if in_densify_phase:
            if (
                iteration > opt_cfg.densify_from_iter
                and iteration % opt_cfg.densification_interval == 0
            ):
                ts = maybe_grow(ts)
                key, sub = jax.random.split(key)
                use_size_prune = iteration > opt_cfg.opacity_reset_interval
                ts.state, ts.adam, ts.stats, rep = densify_step(
                    ts, sub, opt_cfg, use_size_prune
                )
                if int(rep.n_dropped) > 0:
                    print(
                        f"[iter {iteration}] capacity overflow: dropped "
                        f"{int(rep.n_dropped)} children; growing next round"
                    )
            if iteration % opt_cfg.opacity_reset_interval == 0 or (
                white_background and iteration == opt_cfg.densify_from_iter
            ):
                ts.state, ts.adam = reset_opacity_step(ts.state, ts.adam)

        # --- reporting / persistence ---------------------------------------
        if iteration in test_iterations:
            evaluate_and_report(scene, ts, bg_fixed, raster_cfg, iteration,
                                metrics_mod, pipe=pipe)
        if iteration in save_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, ts.state)
        if iteration in checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            ckpt_mod.save_train_state(
                f"{scene.model_path}/chkpnt{iteration}.npz", ts
            )

    return ts


@partial(jax.jit, static_argnames=("opt_cfg", "use_size_prune"))
def _densify_jit(state, adam, stats, key, extent, opt_cfg, use_size_prune):
    return densify.densify_and_prune(
        state, adam, stats, key,
        max_grad=opt_cfg.densify_grad_threshold,
        min_opacity=0.005,  # train.py:133
        extent=extent,
        percent_dense=opt_cfg.percent_dense,
        use_size_prune=use_size_prune,
    )


def densify_step(ts: TrainState, key, opt_cfg, use_size_prune):
    return _densify_jit(
        ts.state, ts.adam, ts.stats, key,
        jnp.float32(ts.spatial_lr_scale), opt_cfg, use_size_prune
    )


@jax.jit
def reset_opacity_step(state, adam):
    return densify.reset_opacity(state, adam)


def evaluate_and_report(scene, ts, bg, raster_cfg, iteration, metrics_mod,
                        pipe: PipelineParams = PipelineParams(),
                        tb_writer=None):
    """In-training eval (``training_report``, train.py:173-260).

    ``tb_writer`` mirrors the reference's tensorboard hook: scalars per eval
    config plus the opacity histogram and total point count
    (``train.py:246-257``). The fork ships with the writer disabled
    (``train.py:165`` sets it to None); pass one to enable.
    """
    train_cams = scene.get_train_cameras()
    configs = [
        ("test", scene.get_test_cameras()),
        ("train", [train_cams[idx % len(train_cams)] for idx in range(5, 30, 5)]),
    ]
    for name, cams in configs:
        if not cams:
            continue
        l1s, psnrs = [], []
        for cam in cams:
            img = eval_render(ts.state, cam, bg,
                              active_sh_degree=ts.active_sh_degree,
                              raster_cfg=raster_cfg, pipe=pipe)
            gt = jnp.clip(cam.image, 0.0, 1.0)
            l1s.append(float(losses.l1_loss(img, gt)))
            psnrs.append(float(metrics_mod.psnr(img, gt)[0, 0]))
        print(
            f"\n[ITER {iteration}] Evaluating {name}: "
            f"L1 {np.mean(l1s):.5f} PSNR {np.mean(psnrs):.2f}"
        )
        if tb_writer is not None:
            tb_writer.add_scalar(f"{name}/loss_viewpoint - l1_loss",
                                 float(np.mean(l1s)), iteration)
            tb_writer.add_scalar(f"{name}/loss_viewpoint - psnr",
                                 float(np.mean(psnrs)), iteration)
    if tb_writer is not None:
        alive = np.asarray(ts.state.alive)
        opac = np.asarray(ts.state.opacity[:, 0])[alive]
        tb_writer.add_histogram("scene/opacity_histogram", opac, iteration)
        tb_writer.add_scalar("total_points", int(alive.sum()), iteration)
