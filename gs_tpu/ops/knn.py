"""K-nearest-neighbor mean squared distance for Gaussian scale init.

Replaces the reference's ``simple_knn._C.distCUDA2`` CUDA kernel
(``scene/gaussian_model.py:20,153``): per point, the mean of squared
distances to its 3 nearest neighbors.

TPU-native formulation: the pairwise distance matrix is a matmul
(|x-y|^2 = |x|^2 + |y|^2 - 2 x.y), so the whole computation rides the MXU,
chunked over query rows to bound memory at O(chunk * N). One-shot at init,
so brute force O(N^2) FLOPs (cheap on the MXU up to millions of points) beats
a spatial-hash scheme that would fight XLA's static shapes.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp

# Above this, the O(N^2) brute force stops being "cheap on the MXU": at 5M
# points it is ~1e14 FLOPs (minutes of init time on one chip). Warn rather
# than fail — it is still exact, one-shot, and memory-bounded.
_BRUTE_FORCE_WARN_N = 2_000_000


def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, chunk: int = 4096) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbors.

    Args:
      points: [N,3] fp32. Self-distance is excluded.

    Returns:
      [N] fp32.
    """
    n = points.shape[0]
    if n > _BRUTE_FORCE_WARN_N:
        warnings.warn(
            f"mean_knn_sq_dist is O(N^2) brute force; N={n:,} "
            f"will take minutes at init (fine above ~{_BRUTE_FORCE_WARN_N:,} "
            "only if you can wait). Consider subsampling the init cloud.",
            stacklevel=2,
        )
    # bound the [chunk, N] f32 distance-matrix temp to ~2 GiB: at N=1M the
    # default chunk of 4096 is a 16 GiB allocation — larger than a v5e's
    # entire HBM (measured OOM, round 4). Keep chunks lane-aligned.
    max_chunk = max(512 * 1024 * 1024 // max(n, 1), 128)
    chunk = min(chunk, max_chunk - max_chunk % 128 if max_chunk >= 128 else 128)
    return _mean_knn_sq_dist(points, k=k, chunk=chunk)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, chunk: int = 4096) -> jnp.ndarray:
    n = points.shape[0]
    if n <= k:
        # degenerate tiny cloud: fall back to mean over all others
        d2 = _sq_dists(points, points)
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
        kk = max(n - 1, 1)
        neg_top, _ = jax.lax.top_k(-d2, kk)
        return jnp.mean(-neg_top, axis=-1)

    pad = (-n) % chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    rows = pts_pad.reshape(-1, chunk, 3)

    def one_chunk(q):
        d2 = _sq_dists(q, points)  # [chunk, N]
        # exclude self: the smallest distance of a real point to the cloud is 0
        neg_top, _ = jax.lax.top_k(-d2, k + 1)  # [chunk, k+1] (negated)
        top = -neg_top
        return jnp.mean(top[:, 1:], axis=-1)

    out = jax.lax.map(one_chunk, rows).reshape(-1)
    return out[:n]


def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[M,3],[N,3] -> [M,N] squared euclidean distances via MXU."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1, keepdims=True)
    cross = a @ b.T
    return jnp.maximum(a2 + b2.T - 2.0 * cross, 0.0)
