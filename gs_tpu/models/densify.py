"""Adaptive density control: clone / split / prune / opacity reset, under jit.

Functional rebuild of the reference's density control
(``scene/gaussian_model.py:411-581``), preserving its semantics exactly:

- stats: per-Gaussian accumulated screen-space positional gradient norm
  (NDC-scaled, i.e. pixel grads x 0.5*extent — the units the CUDA backward
  emits into means2D.grad) and update counts; max 2D radius tracking
  (``add_densification_stats``, ``train.py:127-128``).
- clone: grad >= threshold and max scale <= percent_dense * extent — exact
  copies appended (``densify_and_clone``).
- split: grad >= threshold and max scale > percent_dense * extent — two
  children sampled from N(mean, Sigma), scale shrunk by 1/(0.8*N), original
  removed (``densify_and_split``).
- prune: opacity < min_opacity, plus (when max_screen_size is set) the
  screen/world size conditions. NOTE the reference quirk: because
  ``densification_postfix`` zeroes ``max_radii2D`` before the prune mask is
  built, the screen-size condition never fires inside densify_and_prune; we
  replicate that faithfully (world-size 0.1*extent does fire).
- Adam surgery: new slots get zero moments, freed slots are cleared, the
  opacity reset zeroes that group's moments (``gaussian_model.py:322-444``).

TPU-first state management: instead of reallocating tensors every call, the
state has fixed capacity with an ``alive`` mask; children are scattered into
free slots (ranked via an argsort compaction). Everything is static-shape and
jittable; capacity growth happens outside jit (``gaussians.grow_capacity``)
when occupancy crosses a watermark. If a round produces more children than
free slots, the overflow children are dropped and reported so the trainer can
grow capacity and retry the *next* round.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gs_tpu.models.gaussians import GaussianState
from gs_tpu.models.optim import AdamState
from gs_tpu.ops import transforms

SPLIT_N = 2  # children per split (gaussian_model.py:446)
SPLIT_SHRINK = 0.8 * SPLIT_N  # scale divisor (gaussian_model.py:490)
WORLD_SIZE_PRUNE = 0.1  # of scene extent (gaussian_model.py:558)
OPACITY_RESET_FLOOR = 0.01  # gaussian_model.py:262


class DensifyStats(NamedTuple):
    xyz_grad_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray  # [C]
    max_radii2d: jnp.ndarray  # [C]

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        z = jnp.zeros((capacity,), jnp.float32)
        return DensifyStats(z, z, z)


def add_stats(
    stats: DensifyStats,
    means2d_pixel_grad: jnp.ndarray,  # [C,2] dL/d(pixel-space mean)
    radii: jnp.ndarray,  # [C]
    visibility: jnp.ndarray,  # [C] bool
    width: int,
    height: int,
) -> DensifyStats:
    """Accumulate the densification signal (``gaussian_model.py:565-581``).

    The reference accumulates the norm of the *NDC-scaled* screen gradient
    (the CUDA backward multiplies pixel-space gradients by 0.5*W / 0.5*H
    before writing means2D.grad); we apply the same scaling here so the
    densify_grad_threshold=2e-4 calibration carries over.
    """
    g = means2d_pixel_grad * jnp.array([0.5 * width, 0.5 * height], jnp.float32)
    norm = jnp.linalg.norm(g, axis=-1)
    vis = visibility
    return DensifyStats(
        xyz_grad_accum=stats.xyz_grad_accum + jnp.where(vis, norm, 0.0),
        denom=stats.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.maximum(
            stats.max_radii2d, jnp.where(vis, radii.astype(jnp.float32), 0.0)
        ),
    )


class DensifyReport(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # children lost to capacity overflow (grow & move on)


def densify_and_prune(
    state: GaussianState,
    adam: AdamState,
    stats: DensifyStats,
    key: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    use_size_prune: bool,
    slot_offset: jax.Array | int = 0,
) -> tuple[GaussianState, AdamState, DensifyStats, DensifyReport]:
    """One densification round (``densify_and_prune``, gaussian_model.py:536-562).

    ``slot_offset``: global index of slot 0 (0 for the replicated layout).
    Split-child noise is drawn per *global parent slot* (fold_in of ``key``),
    so a Gaussian-sharded run (each shard passing its offset) draws the same
    noise as a replicated run whenever the parents occupy the same global
    slots — which makes sharded-vs-replicated densify rounds exactly
    comparable from a common starting layout (tests/test_sharding.py).
    """
    cap = state.capacity
    alive = state.alive

    grads = stats.xyz_grad_accum / jnp.where(stats.denom > 0, stats.denom, 1.0)
    grads = jnp.where(jnp.isnan(grads) | (stats.denom == 0), 0.0, grads)

    scaling = state.scaling  # exp(log_scale)
    max_scale = jnp.max(scaling, axis=-1)
    opacity = state.opacity[:, 0]

    hot = alive & (grads >= max_grad)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    # prune conditions on original points (reference quirk: max_radii2D was
    # zeroed by postfix before this check, so only opacity + world size fire)
    prune_orig = alive & (opacity < min_opacity)
    if use_size_prune:
        prune_orig = prune_orig | (alive & (max_scale > WORLD_SIZE_PRUNE * extent))

    # survivors among originals: not split away, not pruned
    keep = alive & ~split_mask & ~prune_orig

    # children that will actually be born (immediately re-pruned ones dropped,
    # matching the reference's prune over the concatenated array)
    clone_child_ok = clone_mask & ~prune_orig
    child_scale = scaling / SPLIT_SHRINK
    child_max_scale = jnp.max(child_scale, axis=-1)
    split_child_prune = opacity < min_opacity
    if use_size_prune:
        split_child_prune = split_child_prune | (child_max_scale > WORLD_SIZE_PRUNE * extent)
    split_child_ok = split_mask & ~split_child_prune

    # ---- slot allocation -----------------------------------------------------
    n_free = cap - jnp.sum(keep.astype(jnp.int32))
    # dead slots first (stable argsort of keep: False < True)
    free_order = jnp.argsort(keep, stable=True).astype(jnp.int32)

    def targets_for(mask: jnp.ndarray, rank_offset: jnp.ndarray, dup: int):
        """Compact selected slots; return (src[C], tgt[C*dup]) with drops."""
        src = jnp.argsort(~mask, stable=True).astype(jnp.int32)  # selected first
        n_sel = jnp.sum(mask.astype(jnp.int32))
        rank = jnp.arange(cap, dtype=jnp.int32)
        tgts = []
        for d in range(dup):
            r = rank_offset + rank * dup + d
            ok = (rank < n_sel) & (r < n_free)
            tgts.append(jnp.where(ok, free_order[jnp.minimum(r, cap - 1)], cap))
        return src, tgts, n_sel

    clone_src, clone_tgts, n_clone_ok = targets_for(clone_child_ok, jnp.int32(0), 1)
    split_src, split_tgts, n_split_ok = targets_for(
        split_child_ok, n_clone_ok, SPLIT_N
    )

    # ---- build child parameter fields (full-capacity temporaries) -------------
    params = state.params()

    # split children: xyz sampled from N(mean, Sigma), scale shrunk
    rot = transforms.quat_to_rotmat(state.quat)  # [C,3,3]
    slot_ids = jnp.arange(cap, dtype=jnp.int32) + slot_offset
    slot_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(slot_ids)
    eps = jnp.swapaxes(
        jax.vmap(lambda k: jax.random.normal(k, (SPLIT_N, 3), jnp.float32))(
            slot_keys
        ), 0, 1,
    )  # [SPLIT_N, cap, 3], a function of (key, global slot) only
    offsets = jnp.einsum("nij,knj->kni", rot, eps * scaling[None, :, :])
    split_xyz = state.xyz[None] + offsets  # [SPLIT_N, C, 3]
    split_log_scale = jnp.log(child_scale)

    def scatter(dst, src_idx, tgt_idx, values):
        return dst.at[tgt_idx].set(values[src_idx], mode="drop")

    new_params = {}
    for name, p in params.items():
        out = p
        out = scatter(out, clone_src, clone_tgts[0], p)
        for d in range(SPLIT_N):
            if name == "xyz":
                vals = split_xyz[d]
            elif name == "scaling":
                vals = split_log_scale
            else:
                vals = p
            out = scatter(out, split_src, split_tgts[d], vals)
        new_params[name] = out

    # ---- alive mask + adam surgery -------------------------------------------
    new_alive = keep
    all_targets = jnp.concatenate([clone_tgts[0]] + split_tgts)
    new_alive = new_alive.at[all_targets].set(True, mode="drop")

    def fix_moments(tree):
        out = {}
        for name, m in tree.items():
            shape = (cap,) + (1,) * (m.ndim - 1)
            m = jnp.where(new_alive.reshape(shape), m, 0.0)  # clear freed slots
            m = m.at[all_targets].set(0.0, mode="drop")  # zero new slots
            out[name] = m
        return out

    new_adam = AdamState(
        mu=fix_moments(adam.mu), nu=fix_moments(adam.nu), step=adam.step
    )

    new_state = state.with_params(new_params).replace(alive=new_alive)
    # postfix parity: all stats reset to zero (gaussian_model.py:441-444)
    new_stats = DensifyStats.zeros(cap)

    wanted = n_clone_ok + SPLIT_N * n_split_ok
    placed = jnp.sum((all_targets < cap).astype(jnp.int32))
    report = DensifyReport(
        n_cloned=n_clone_ok,
        n_split=jnp.sum(split_mask.astype(jnp.int32)),
        n_pruned=jnp.sum((alive & ~keep).astype(jnp.int32)),
        n_dropped=wanted - placed,
    )
    return new_state, new_adam, new_stats, report


def reset_opacity(
    state: GaussianState, adam: AdamState
) -> tuple[GaussianState, AdamState]:
    """Clamp opacity to <= 0.01 and zero that group's Adam moments
    (``reset_opacity`` + ``replace_tensor_to_optimizer``,
    gaussian_model.py:261-264,322-335)."""
    new_op = jnp.minimum(state.opacity, OPACITY_RESET_FLOOR)
    new_logit = transforms.inverse_sigmoid(jnp.clip(new_op, 1e-7, 1.0 - 1e-7))
    from gs_tpu.models import optim as optim_mod

    return (
        state.replace(logit_opacity=new_logit),
        optim_mod.reset_group(adam, "opacity"),
    )
