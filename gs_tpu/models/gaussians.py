"""GaussianState: the learned scene representation as a functional pytree.

Rebuild of the reference ``scene/gaussian_model.py:24-174`` with TPU-first
state management:

- instead of mutable ``nn.Parameter`` tensors that change length every
  densification (``gaussian_model.py:357-444``), the state is a fixed-capacity
  padded pytree with an ``alive`` mask. Densify/prune rewrite slots in place
  under jit; capacity grows by scheduled doublings outside jit (bounded
  recompiles).
- activations (exp / sigmoid / quat-normalize, ``gaussian_model.py:26-43``)
  are applied functionally at read time.

Parameter semantics (identical to the reference):
  xyz[.,3] world centers; features_dc[.,1,3] + features_rest[.,K-1,3] SH
  coefficients (K = (max_sh_degree+1)^2); log_scale[.,3]; quat[.,4] (w,x,y,z);
  logit_opacity[.,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gs_tpu.ops import knn, sh, transforms

INIT_OPACITY = 0.1  # scene/gaussian_model.py:160


@struct.dataclass
class GaussianState:
    """Padded Gaussian parameters. Leading dim = capacity; ``alive`` gates use."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    log_scale: jnp.ndarray
    quat: jnp.ndarray
    logit_opacity: jnp.ndarray
    alive: jnp.ndarray  # [C] bool

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        return int(round((self.features_rest.shape[1] + 1) ** 0.5)) - 1

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    # --- activated views (gaussian_model.py:106-129) -------------------------
    @property
    def scaling(self) -> jnp.ndarray:
        return jnp.exp(self.log_scale)

    @property
    def rotation(self) -> jnp.ndarray:
        return self.quat / jnp.linalg.norm(self.quat, axis=-1, keepdims=True).clip(1e-12)

    @property
    def opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logit_opacity)

    @property
    def features(self) -> jnp.ndarray:
        """[C, K, 3] dc-first SH features (gaussian_model.py:119-122)."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def params(self) -> dict[str, jnp.ndarray]:
        """The trainable leaves, keyed like the reference's Adam param groups
        (gaussian_model.py:185-192)."""
        return {
            "xyz": self.xyz,
            "f_dc": self.features_dc,
            "f_rest": self.features_rest,
            "opacity": self.logit_opacity,
            "scaling": self.log_scale,
            "rotation": self.quat,
        }

    def with_params(self, p: dict[str, jnp.ndarray]) -> "GaussianState":
        return self.replace(
            xyz=p["xyz"],
            features_dc=p["f_dc"],
            features_rest=p["f_rest"],
            logit_opacity=p["opacity"],
            log_scale=p["scaling"],
            quat=p["rotation"],
        )


def round_capacity(n: int, quantum: int = 4096) -> int:
    return max(quantum, -(-n // quantum) * quantum)


def empty_state(capacity: int, max_sh_degree: int) -> GaussianState:
    k = sh.num_sh_coeffs(max_sh_degree)
    return GaussianState(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        log_scale=jnp.full((capacity, 3), -10.0, jnp.float32),
        quat=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1)),
        logit_opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
        alive=jnp.zeros((capacity,), bool),
    )


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    max_sh_degree: int,
    capacity: int | None = None,
) -> GaussianState:
    """Initialize from an SfM point cloud (``scene/gaussian_model.py:135-174``).

    - SH dc band from RGB, higher bands zero
    - isotropic log-scale from sqrt(mean 3-NN squared distance)
    - identity quaternions, opacity sigmoid^-1(0.1)
    """
    n = points.shape[0]
    cap = round_capacity(n) if capacity is None else capacity
    if cap < n:
        raise ValueError(f"capacity {cap} < point count {n}")

    pts = jnp.asarray(points, jnp.float32)
    if n > 2_000_000:
        print(
            f"[gs_tpu] scale init: brute-force 3-NN over {n:,} points is "
            "O(N^2) on the MXU (one-shot at init; ~minutes beyond ~5M points)",
            flush=True,
        )
    dist2 = jnp.clip(knn.mean_knn_sq_dist(pts, k=3), 1e-7)  # gaussian_model.py:153
    log_scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    f_dc = sh.rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]  # [N,1,3]

    st = empty_state(cap, max_sh_degree)

    def put(full, vals):
        return full.at[:n].set(vals)

    return st.replace(
        xyz=put(st.xyz, pts),
        features_dc=put(st.features_dc, f_dc),
        log_scale=put(st.log_scale, log_scales),
        logit_opacity=put(
            st.logit_opacity,
            jnp.full((n, 1), float(np.log(INIT_OPACITY / (1 - INIT_OPACITY))), jnp.float32),
        ),
        alive=st.alive.at[:n].set(True),
    )


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Pad every leaf to a larger capacity (outside-jit; triggers one retrace)."""
    if new_capacity < state.capacity:
        raise ValueError("capacity can only grow")
    if new_capacity == state.capacity:
        return state
    pad = new_capacity - state.capacity
    tmpl = empty_state(pad, state.max_sh_degree)
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), state, tmpl)


def densify_stats_init(capacity: int) -> dict[str, jnp.ndarray]:
    """Accumulators mirrored from ``gaussian_model.py:55-57,181-182``."""
    return {
        "xyz_grad_accum": jnp.zeros((capacity,), jnp.float32),
        "denom": jnp.zeros((capacity,), jnp.float32),
        "max_radii2d": jnp.zeros((capacity,), jnp.float32),
    }
