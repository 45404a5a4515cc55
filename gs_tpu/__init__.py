"""gs_tpu — a TPU-native 3D Gaussian Splatting framework (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of the reference 3DGS study codebase
(PyTorch + CUDA tile rasterizer) as an idiomatic TPU framework:

- functional ``GaussianState`` pytrees instead of mutable nn.Parameters
- a differentiable tile rasterizer whose per-tile alpha compositing is
  reformulated as MXU matmuls (triangular-matmul transmittance cumsum +
  weights^T @ colors accumulation), implemented as Pallas TPU kernels with a
  hand-derived backward (``jax.custom_vjp``)
- sharding over a ``jax.sharding.Mesh`` (Gaussians / image tiles / cameras)
  with XLA collectives instead of NCCL
- COLMAP / Blender data loading and ecosystem-compatible PLY snapshots

Reference parity is documented per-module with ``file:line`` citations into
the reference repo (see SURVEY.md).
"""

__version__ = "0.1.0"

from gs_tpu import cameras, config  # noqa: F401
