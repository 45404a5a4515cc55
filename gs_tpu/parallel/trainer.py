"""Multi-device training loop: the reference trainer semantics over a mesh.

``run_training`` (gs_tpu.training) delegates here when a
:class:`~gs_tpu.config.ParallelConfig` with more than one device is given.
The loop mirrors ``train.py:58-146`` — camera sampling, densify / opacity
reset / save schedule, eval reporting — but drives the shard_map'd steps:

  - layout "tile": :func:`gs_tpu.parallel.sharded.make_sharded_train_step`
    (replicated params, tiles + cameras sharded). Densify/reset reuse the
    single-device jitted ops — state is replicated, GSPMD keeps it so.
  - layout "gauss": :func:`gs_tpu.parallel.gauss_sharded
    .make_gauss_sharded_train_step` (params + Adam + stats sharded over
    Gaussians), with densification via
    :func:`gs_tpu.parallel.densify_sharded.make_sharded_densify` and
    occupancy-triggered :func:`...make_sharded_rebalance` — nothing ever
    materializes the full model on one device.

Batching semantics: each step consumes ``data_parallel`` cameras (gradients
pmean'd like a batch; densify stats psum'd so one batched step accumulates
one iteration's worth per camera, matching ``add_densification_stats`` per
view). One loop iteration == one reference iteration for every schedule
(lr, SH degree, densify cadence); the extra cameras per step are additional
signal, the natural data-parallel reading of the reference's one-camera
loop.

Multi-host: call :func:`gs_tpu.parallel.mesh.init_distributed` first (the
train CLI does when GS_TPU_NUM_PROCESSES is set); per-host camera ownership
for the input pipeline lives in :mod:`gs_tpu.data.multihost`.
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np

from gs_tpu.config import (OptimizationParams, ParallelConfig, PipelineParams,
                           RasterizeConfig)
from gs_tpu.data import multihost
from gs_tpu.models import densify, gaussians, optim
from gs_tpu.parallel import mesh as mesh_mod
from gs_tpu.parallel.densify_sharded import (make_sharded_densify,
                                             make_sharded_rebalance_loop,
                                             shard_occupancy)
from gs_tpu.parallel.gauss_sharded import (make_gauss_sharded_train_step,
                                           shard_specs)
from gs_tpu.parallel.sharded import local_pair_budget, make_sharded_train_step
from gs_tpu.utils import profiling


class _StepCache:
    """One compiled sharded step per (resolution, capacity, sh_degree)."""

    def __init__(self, mesh, opt_cfg, raster_cfg, parallel):
        self.mesh = mesh
        self.opt_cfg = opt_cfg
        self.raster_cfg = raster_cfg
        self.parallel = parallel
        self._cache = {}

    def step(self, h, w, capacity, sh_degree):
        key = (h, w, capacity, sh_degree)
        if key not in self._cache:
            make = (make_gauss_sharded_train_step
                    if self.parallel.layout == "gauss"
                    else make_sharded_train_step)
            kw = {}
            if self.parallel.layout == "gauss":
                kw["visible_budget"] = self.parallel.visible_budget
            self._cache[key] = make(
                self.mesh, self.opt_cfg, self.raster_cfg, h, w, capacity,
                sh_degree, **kw,
            )
        return self._cache[key]


def run_training_parallel(
    scene,
    opt_cfg: OptimizationParams,
    pipe: PipelineParams,
    parallel: ParallelConfig,
    raster_cfg: RasterizeConfig | None = None,
    white_background: bool = False,
    test_iterations: tuple[int, ...] = (7000, 30000),
    save_iterations: tuple[int, ...] = (7000, 30000),
    checkpoint_iterations: tuple[int, ...] = (),
    start_checkpoint: str | None = None,
    log_every: int = 10,
    progress=None,
    seed: int = 0,
    gui_server=None,
    profile_dir: str | None = None,
    profile_iters: tuple[int, int] = (50, 60),
    debug_from: int = -1,
):
    """The reference training loop over a (data, shard) mesh.

    Feature parity with the single-device ``run_training``: checkpoint
    resume (``start_checkpoint``; gauss layout re-shards the restored
    leaves), SIBR viewer polling (``gui_server``), ``profile_dir`` tracing,
    and the ``pipe.debug`` non-finite-loss input dump
    (``/root/reference/train.py:39-41,60-74,91-92``).
    """
    import dataclasses

    from gs_tpu.training import (debug_dump, evaluate_and_report, GROW_FACTOR,
                                 GROW_WATERMARK, TrainState)
    from gs_tpu.utils import ckpt as ckpt_mod
    from gs_tpu.utils import metrics as metrics_mod

    if raster_cfg is None:
        raster_cfg = RasterizeConfig()
    random.seed(seed)
    np.random.seed(seed)

    mesh = mesh_mod.make_mesh(data=parallel.data_parallel,
                              shard=parallel.shard_parallel)
    n_data = mesh.shape[mesh_mod.DATA_AXIS]
    n_shard = mesh.shape[mesh_mod.SHARD_AXIS]
    gauss_layout = parallel.layout == "gauss"
    cap_quantum = 4096 * n_shard  # keep capacity divisible by the shard axis

    state = scene.gaussians
    if state.capacity % n_shard:
        state = gaussians.grow_capacity(
            state, -(-state.capacity // cap_quantum) * cap_quantum
        )
    max_sh_degree = state.max_sh_degree
    ts = TrainState(
        state=state,
        adam=optim.init(state.params()),
        stats=densify.DensifyStats.zeros(state.capacity),
        spatial_lr_scale=scene.cameras_extent,
        max_sh_degree=max_sh_degree,
    )

    if raster_cfg.autotune and jax.process_count() == 1:
        # same kernels run per-device inside the shard_map'd step; a
        # single-device timing at the real scene shape picks the right
        # formulation (skipped multi-process: the timing render would run
        # un-synchronized on each host)
        from gs_tpu.ops.autotune import autotune_formulation

        tune_cams = list(scene.get_train_cameras())
        if tune_cams:
            tuned = autotune_formulation(state, tune_cams[0], raster_cfg)
            if tuned is not None:
                raster_cfg = tuned["cfg"]
    first_iter = 0
    if start_checkpoint:
        ts = ckpt_mod.load_train_state(start_checkpoint)
        if ts.state.capacity % n_shard:
            new_cap = -(-ts.state.capacity // cap_quantum) * cap_quantum
            ts.state = gaussians.grow_capacity(ts.state, new_cap)
            ts.adam = optim.grow(ts.adam, new_cap)
            pad = new_cap - ts.stats.xyz_grad_accum.shape[0]
            ts.stats = densify.DensifyStats(
                *(jnp.concatenate([s, jnp.zeros((pad,), s.dtype)])
                  for s in ts.stats))
        first_iter = ts.iteration
        print(f"Restored checkpoint at iteration {first_iter}")
    if gauss_layout:
        _place_sharded(ts, mesh)

    steps = _StepCache(mesh, opt_cfg, raster_cfg, parallel)
    densify_cache: dict[tuple, object] = {}
    bg_fixed = jnp.asarray(
        [1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0], jnp.float32
    )

    # deterministic multi-host batching over the GLOBAL camera list: every
    # process draws identical batches (shared RNG); slot i only ever takes a
    # camera owned by the process feeding data-row i, so assemble_global_batch
    # always finds the pixels it needs locally
    feeders = multihost.data_row_feeders(mesh)
    _, process_count = multihost.process_info()
    sampler = multihost.BatchSampler(scene.get_train_cameras(), feeders,
                                     process_count)
    key = jax.random.PRNGKey(seed)
    ema_loss = None
    timer = profiling.StepTimer()

    if gui_server is not None:
        gui_server.convert_SHs_python = pipe.convert_SHs_python
        gui_server.compute_cov3D_python = pipe.compute_cov3D_python

    for iteration in range(first_iter + 1, opt_cfg.iterations + 1):
        ts.iteration = iteration
        if gui_server is not None:
            gui_server.poll(ts, raster_cfg, iterations=opt_cfg.iterations)
            pipe = dataclasses.replace(
                pipe,
                convert_SHs_python=gui_server.convert_SHs_python,
                compute_cov3D_python=gui_server.compute_cov3D_python,
            )
        if debug_from >= 0 and iteration == debug_from and not pipe.debug:
            pipe = dataclasses.replace(pipe, debug=True)
        if profile_dir is not None and iteration == profile_iters[0]:
            jax.profiler.start_trace(profile_dir)
        timer.start()

        batch = sampler.next_batch()
        cam_batch = multihost.assemble_global_batch(mesh, batch)
        w, h = batch[0].width, batch[0].height

        if opt_cfg.random_background:
            key, sub = jax.random.split(key)
            bg = jax.random.uniform(sub, (3,), jnp.float32)
        else:
            bg = bg_fixed

        in_densify_phase = iteration < opt_cfg.densify_until_iter
        step = steps.step(h, w, ts.state.capacity, ts.active_sh_degree)
        ts.state, ts.adam, new_stats, m = step(
            ts.state, ts.adam, ts.stats, cam_batch, bg,
            jnp.int32(iteration - 1), jnp.float32(ts.spatial_lr_scale),
            jnp.bool_(iteration < opt_cfg.iterations),
        )
        metrics = m if isinstance(m, dict) else {"loss": m}
        if in_densify_phase:
            ts.stats = new_stats

        # sync points include every densify boundary: overflow metrics must
        # be inspected before acting on a possibly-truncated densify round,
        # not only at log cadence
        at_densify = (in_densify_phase
                      and iteration % opt_cfg.densification_interval == 0)
        sync = (iteration % log_every == 0 or iteration == opt_cfg.iterations
                or iteration in test_iterations or at_densify)
        if sync:
            loss = float(metrics["loss"])
            if pipe.debug and not np.isfinite(loss):
                out = debug_dump(scene.model_path or ".", ts, batch[0], loss)
                raise RuntimeError(
                    f"[iter {iteration}] non-finite loss {loss}; rasterizer "
                    f"inputs dumped to {out} (pipe.debug snapshot)"
                )
            if "num_visible_max" in metrics and parallel.visible_budget:
                if int(metrics["num_visible_max"]) > parallel.visible_budget:
                    print(
                        f"[iter {iteration}] visible budget overflow "
                        f"({int(metrics['num_visible_max'])} > "
                        f"{parallel.visible_budget}); splats dropped — raise "
                        f"ParallelConfig.visible_budget"
                    )
            if "num_pairs_max" in metrics:
                # per-device strip budget: the EXACT value composite_strip
                # uses (a lower approximation triggers spurious recompiles)
                budget = local_pair_budget(
                    max(int(raster_cfg.pair_budget_factor * ts.state.capacity),
                        raster_cfg.min_pair_budget),
                    n_shard, raster_cfg.chunk)
                if int(metrics["num_pairs_max"]) > budget:
                    raster_cfg = dataclasses.replace(
                        raster_cfg,
                        pair_budget_factor=raster_cfg.pair_budget_factor * 1.5,
                    )
                    steps = _StepCache(mesh, opt_cfg, raster_cfg, parallel)
                    print(
                        f"[iter {iteration}] local pair budget overflow "
                        f"({int(metrics['num_pairs_max'])} > {budget}); "
                        f"factor -> {raster_cfg.pair_budget_factor:.1f}"
                    )
            ema_loss = loss if ema_loss is None else 0.4 * loss + 0.6 * ema_loss
        timer.stop(synced=sync)
        if profile_dir is not None and iteration == profile_iters[1]:
            jax.profiler.stop_trace()
            print(f"[iter {iteration}] wrote profiler trace to {profile_dir}")
        if progress is not None and iteration % log_every == 0:
            progress(iteration, {
                "ema_loss": ema_loss, "step_s": timer.ema_s,
                "pix_per_s": timer.pixels_per_s(w * h * n_data),
                **{k: float(v) for k, v in metrics.items()},
            })

        # --- densification schedule (train.py:125-136) ----------------------
        if in_densify_phase:
            if (iteration > opt_cfg.densify_from_iter
                    and iteration % opt_cfg.densification_interval == 0):
                ts = _maybe_grow_parallel(ts, mesh, gauss_layout, cap_quantum,
                                          GROW_WATERMARK, GROW_FACTOR)
                key, sub = jax.random.split(key)
                use_size_prune = iteration > opt_cfg.opacity_reset_interval
                if gauss_layout:
                    dkey = (ts.state.capacity, use_size_prune)
                    if dkey not in densify_cache:
                        densify_cache[dkey] = make_sharded_densify(
                            mesh, opt_cfg, ts.state.capacity, max_sh_degree,
                            use_size_prune,
                        )
                    ts.state, ts.adam, ts.stats, rep = densify_cache[dkey](
                        ts.state, ts.adam, ts.stats, sub,
                        jnp.float32(ts.spatial_lr_scale),
                    )
                    _maybe_rebalance(ts, mesh, parallel, max_sh_degree,
                                     densify_cache)
                else:
                    from gs_tpu.training import _densify_jit

                    ts.state, ts.adam, ts.stats, rep = _densify_jit(
                        ts.state, ts.adam, ts.stats, sub,
                        jnp.float32(ts.spatial_lr_scale), opt_cfg,
                        use_size_prune,
                    )
                if int(rep.n_dropped) > 0:
                    print(
                        f"[iter {iteration}] capacity overflow: dropped "
                        f"{int(rep.n_dropped)} children; growing next round"
                    )
            if iteration % opt_cfg.opacity_reset_interval == 0 or (
                white_background and iteration == opt_cfg.densify_from_iter
            ):
                from gs_tpu.training import reset_opacity_step

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


def _place_sharded(ts, mesh):
    """Shard state/adam/stats leaves over the mesh (leading axis)."""
    from jax.sharding import NamedSharding

    cap = ts.state.capacity

    def put(tree):
        specs = shard_specs(tree, cap)
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
        )

    ts.state = put(ts.state)
    ts.adam = put(ts.adam)
    ts.stats = put(ts.stats)


def _maybe_grow_parallel(ts, mesh, gauss_layout, cap_quantum, watermark,
                         factor):
    alive = int(ts.state.num_alive)
    if alive <= watermark * ts.state.capacity:
        return ts
    new_cap = -(-int(ts.state.capacity * factor) // cap_quantum) * cap_quantum
    ts.state = gaussians.grow_capacity(ts.state, new_cap)
    ts.adam = optim.grow(ts.adam, new_cap)
    pad = new_cap - ts.stats.xyz_grad_accum.shape[0]
    ts.stats = densify.DensifyStats(
        *(jnp.concatenate([s, jnp.zeros((pad,), s.dtype)]) for s in ts.stats)
    )
    if gauss_layout:
        _place_sharded(ts, mesh)
    return ts


def _maybe_rebalance(ts, mesh, parallel, max_sh_degree, cache):
    """Occupancy-skew-triggered migration after a densify.

    One cheap host-side occupancy check gates ONE jitted multi-round
    rebalance call (``make_sharded_rebalance_loop``): the round loop and its
    skew-based early exit run on-device, so a full rebalance costs one
    dispatch instead of up to 8 host-paced occupancy syncs (~38 ms each
    through a development tunnel).
    """
    n_shard = mesh.shape[mesh_mod.SHARD_AXIS]
    if n_shard == 1:
        return
    occ = np.asarray(shard_occupancy(ts.state, n_shard))
    mean = max(occ.mean(), 1.0)
    if occ.max() / mean <= parallel.rebalance_skew:
        return
    rkey = ("rebalance", ts.state.capacity)
    if rkey not in cache:
        cache[rkey] = make_sharded_rebalance_loop(
            mesh, ts.state.capacity, max_sh_degree,
            migration_budget=parallel.migration_budget, max_rounds=8,
        )
    ts.state, ts.adam, ts.stats, _moved = cache[rkey](
        ts.state, ts.adam, ts.stats, jnp.float32(parallel.rebalance_skew)
    )
