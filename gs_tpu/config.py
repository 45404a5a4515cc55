"""Configuration dataclasses (the reference's flag groups, made declarative).

Behavioral parity: reference ``arguments/__init__.py:51-96``. The reference
builds argparse flags by reflection over class attributes; we keep plain
dataclasses as the source of truth and generate argparse flags from their
fields in :mod:`gs_tpu.cli.args` (same flag names, same shorthands, same
defaults — including the fork's ``sh_degree = 0`` default,
``arguments/__init__.py:53``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=False)
class ModelParams:
    """Data/model paths and representation settings (arguments/__init__.py:51-66)."""

    sh_degree: int = 0  # fork deviation: 0, not 3 (arguments/__init__.py:53)
    source_path: str = ""  # shorthand -s
    model_path: str = ""  # shorthand -m
    images: str = "images"  # shorthand -i
    resolution: int = -1  # shorthand -r
    white_background: bool = False  # shorthand -w
    data_device: str = "tpu"  # reference default "cuda" (arguments/__init__.py:59)
    eval: bool = False

    # argparse shorthand map (reference: leading-underscore attrs get -x)
    _shorthands = {
        "source_path": "s",
        "model_path": "m",
        "images": "i",
        "resolution": "r",
        "white_background": "w",
    }


@dataclass(frozen=True)
class PipelineParams:
    """Render-pipeline toggles (arguments/__init__.py:68-73).

    The *_python flags select the plain-JAX oracle paths instead of the fused
    fast path — the same cross-checking role they play in the reference.
    """

    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass(frozen=True)
class OptimizationParams:
    """Training schedule and densification knobs (arguments/__init__.py:76-96)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


@dataclass(frozen=True)
class RasterizeConfig:
    """TPU rasterizer tuning knobs (no reference analog; kernel-level).

    tile_w/tile_h define the screen-space binning tile. The Pallas compositing
    kernel processes one tile per grid step, pixels laid out as an
    (tile_h*tile_w//128, 128) fp32 block, splats in chunks of ``chunk`` along
    the sublane axis so the transmittance cumsum is a (chunk,chunk) triangular
    matmul on the MXU.
    """

    # 16x16 mirrors the reference and suits trained scenes (tiny splats:
    # pairs/gaussian ~1-2 at any tile size, so bigger tiles only add pixel
    # work). Big-splat scenes benefit from larger tiles — the 1080p bench's
    # uniform cloud peaks at 48x32 (2.9x fewer pairs; see bench.py).
    tile_w: int = 16
    tile_h: int = 16
    chunk: int = 64  # splats per compositing chunk (best on v5e; see benchmarks)
    tile_batch: int = 256  # XLA backend: tiles vmapped per lax.map step
    pair_budget_factor: float = 8.0  # MAX_PAIRS = factor * capacity (tile-overlap duplication)
    min_pair_budget: int = 1 << 14
    backend: str = "auto"  # "auto" | "pallas" | "xla" | "oracle"
    alpha_threshold: float = 1.0 / 255.0  # splat contribution cutoff
    transmittance_eps: float = 1e-4  # early-out T threshold
    max_alpha: float = 0.99
    # exact-conservative per-tile dead-tail truncation (rasterize_tiled
    # .effective_ends): output-identical, large compositing savings on
    # opaque scenes; off only for kernel debugging
    truncate_tiles: bool = True
    # startup kernel-formulation autotune (gs_tpu.ops.autotune): time the
    # MXU/VPU formulations and chunk/tile kernel modes on the real scene at
    # training start and keep the winner. Only active on a real TPU with
    # the Pallas backend; costs ~1 extra compile per candidate.
    autotune: bool = True


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. axes: data-parallel cameras x tile/gaussian sharding.

    ``layout`` picks the shard-axis meaning:
      - "tile": parameters replicated, image tiles sharded
        (gs_tpu.parallel.sharded) — fastest when the model fits every chip.
      - "gauss": parameters + Adam + stats sharded over Gaussians with a
        visible-splat all_gather (gs_tpu.parallel.gauss_sharded) — for N
        beyond one chip; densify/rebalance via
        gs_tpu.parallel.densify_sharded.
    """

    data_axis: str = "data"
    shard_axis: str = "shard"  # shards tiles (fwd) and gaussians (params/grads)
    data_parallel: int = 1
    shard_parallel: int = 1
    layout: str = "tile"  # "tile" | "gauss"
    visible_budget: int | None = None  # gauss layout: per-shard splat budget
    rebalance_skew: float = 1.25  # gauss layout: rebalance when max/mean exceeds
    migration_budget: int = 4096  # rows per shard per rebalance round


def asdict_shallow(cfg) -> dict:
    return {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
