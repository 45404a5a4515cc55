"""Surgical Adam: per-group learning rates + densification state surgery.

Reimplements the role of ``torch.optim.Adam(l, lr=0.0, eps=1e-15)`` with the
reference's six parameter groups and per-group lrs
(``scene/gaussian_model.py:185-197``), as an explicit pytree so densification
can edit moments the way the reference edits optimizer state in place
(``gaussian_model.py:322-444``):

  - pruned slots: moments masked out (``_prune_optimizer``)
  - new slots: zero moments (``cat_tensors_to_optimizer``)
  - opacity reset: zero moments for that group (``replace_tensor_to_optimizer``)

Matches torch.optim.Adam numerics: bias-corrected m/v, denom = sqrt(v_hat)+eps,
eps = 1e-15, betas (0.9, 0.999). ``step`` is per-group and survives surgery,
like torch's per-parameter state["step"].
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

ADAM_EPS = 1e-15
BETA1 = 0.9
BETA2 = 0.999
_LOG_BETA1 = math.log(BETA1)
_LOG_BETA2 = math.log(BETA2)


class AdamState(NamedTuple):
    mu: dict[str, jnp.ndarray]
    nu: dict[str, jnp.ndarray]
    step: dict[str, jnp.ndarray]


def init(params: dict[str, jnp.ndarray]) -> AdamState:
    z = {k: jnp.zeros_like(v) for k, v in params.items()}
    return AdamState(
        mu=z,
        nu={k: jnp.zeros_like(v) for k, v in params.items()},
        step={k: jnp.zeros((), jnp.int32) for k in params},
    )


def update(
    params: dict[str, jnp.ndarray],
    grads: dict[str, jnp.ndarray],
    state: AdamState,
    lrs: dict[str, jnp.ndarray],
) -> tuple[dict[str, jnp.ndarray], AdamState]:
    """One Adam step with per-group lrs (values may be traced scalars)."""
    new_p, new_mu, new_nu, new_step = {}, {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        t = state.step[k] + 1
        # lerp form matches torch's exp_avg.lerp_(grad, 1-beta1) rounding
        mu = state.mu[k] + (1.0 - BETA1) * (g - state.mu[k])
        nu = BETA2 * state.nu[k] + (1.0 - BETA2) * (g * g)
        tf = t.astype(jnp.float32)
        # torch.optim.Adam's exact operation order for bit-level parity:
        # denom = sqrt(nu)/sqrt(bc2) + eps; p -= (lr/bc1) * mu / denom.
        # bias corrections via expm1 — a naive fp32 (1 - beta**t) loses ~5e-5
        # relative to torch's f64 scalars through cancellation at small t.
        bc1 = -jnp.expm1(tf * _LOG_BETA1)
        bc2 = -jnp.expm1(tf * _LOG_BETA2)
        denom = jnp.sqrt(nu) / jnp.sqrt(bc2) + ADAM_EPS
        new_p[k] = p - (lrs[k] / bc1) * mu / denom
        new_mu[k], new_nu[k], new_step[k] = mu, nu, t
    return new_p, AdamState(mu=new_mu, nu=new_nu, step=new_step)


def mask_slots(state: AdamState, keep: jnp.ndarray) -> AdamState:
    """Zero moments of slots where ``keep`` is False (prune surgery).

    ``keep`` is [C] bool over the leading capacity axis of every group.
    """

    def apply(tree):
        return {
            k: jnp.where(keep.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0)
            for k, v in tree.items()
        }

    return AdamState(mu=apply(state.mu), nu=apply(state.nu), step=state.step)


def reset_group(state: AdamState, name: str) -> AdamState:
    """Zero one group's moments (opacity-reset surgery, gaussian_model.py:322-335)."""
    return AdamState(
        mu={**state.mu, name: jnp.zeros_like(state.mu[name])},
        nu={**state.nu, name: jnp.zeros_like(state.nu[name])},
        step=state.step,
    )


def grow(state: AdamState, new_capacity: int) -> AdamState:
    """Pad all moment leaves with zeros along the capacity axis (outside jit)."""

    def pad(tree):
        out = {}
        for k, v in tree.items():
            extra = new_capacity - v.shape[0]
            out[k] = jnp.concatenate([v, jnp.zeros((extra,) + v.shape[1:], v.dtype)])
        return out

    return AdamState(mu=pad(state.mu), nu=pad(state.nu), step=state.step)


def group_lrs(
    opt_cfg,
    xyz_lr: jnp.ndarray | float,
) -> dict[str, jnp.ndarray]:
    """Per-group lrs (gaussian_model.py:185-192): f_rest = feature_lr / 20."""
    return {
        "xyz": jnp.asarray(xyz_lr, jnp.float32),
        "f_dc": jnp.float32(opt_cfg.feature_lr),
        "f_rest": jnp.float32(opt_cfg.feature_lr / 20.0),
        "opacity": jnp.float32(opt_cfg.opacity_lr),
        "scaling": jnp.float32(opt_cfg.scaling_lr),
        "rotation": jnp.float32(opt_cfg.rotation_lr),
    }
