"""Density control on the Gaussian-sharded layout + shard rebalancing.

SURVEY.md §2.4 row 2 mandates densify/prune over the sharded model state
(the reference mutates a single-GPU tensor in place,
``scene/gaussian_model.py:357-444``; here every [capacity, ...] leaf of
state/Adam/stats lives split over the ``shard`` mesh axis).

Two pieces, both memory-bounded (nothing ever materializes the full state
on one device — that would defeat the point of sharding):

1. **Sharded densify** (:func:`make_sharded_densify`): each shard runs the
   full clone/split/prune semantics (:func:`gs_tpu.models.densify
   .densify_and_prune`) on its local slice. Decisions are per-Gaussian, so
   shard-local decisions are exactly the replicated decisions; split-child
   noise is drawn per *global* slot (``slot_offset``), so the children are
   bitwise identical to a replicated run (verified in
   tests/test_sharding.py). Children land in the shard's own free slots;
   per-shard drop counts are psum'd into the report so the trainer can grow
   capacity.

2. **Rebalance** (:func:`make_sharded_rebalance`): densification grows
   shards unevenly (hot screen regions densify; their owners fill up while
   others stay empty). One rebalance round moves up to ``migration_budget``
   Gaussians per shard: overfull shards pack their topmost alive rows
   (params + Adam moments + stats, the full per-Gaussian record) into a
   fixed-size buffer, an ``all_gather`` pools the buffers over ICI, and
   underfull shards take deterministic intervals of the pool into their
   free slots. Communication and peak memory are bounded by
   ``n_shard * migration_budget`` rows regardless of capacity; call it
   repeatedly (occupancy check is cheap) if skew exceeds the budget.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gs_tpu.config import OptimizationParams
from gs_tpu.models import densify, gaussians as gmod, optim
from gs_tpu.models.densify import DensifyReport, DensifyStats
from gs_tpu.parallel.gauss_sharded import shard_specs
from gs_tpu.parallel.mesh import SHARD_AXIS


def _row_bundle(state, adam, stats):
    """The per-Gaussian record that must move with a migrating row."""
    return {
        "params": state.params(),
        "mu": adam.mu,
        "nu": adam.nu,
        "stats": stats._asdict(),
    }


def _apply_bundle(state, adam, stats, bundle, row_mask):
    """Write bundle rows back wherever ``row_mask`` is set."""
    def sel(new, old):
        m = row_mask.reshape((-1,) + (1,) * (old.ndim - 1))
        return jnp.where(m, new, old)

    new_params = jax.tree.map(sel, bundle["params"], state.params())
    new_mu = jax.tree.map(sel, bundle["mu"], adam.mu)
    new_nu = jax.tree.map(sel, bundle["nu"], adam.nu)
    new_stats = DensifyStats(**jax.tree.map(sel, bundle["stats"],
                                            stats._asdict()))
    return (
        state.with_params(new_params),
        optim.AdamState(mu=new_mu, nu=new_nu, step=adam.step),
        new_stats,
    )


def make_sharded_densify(
    mesh,
    opt_cfg: OptimizationParams,
    capacity: int,
    max_sh_degree: int,
    use_size_prune: bool,
):
    """Jitted shard_map'd densify round over the gauss-sharded state.

    Inputs/outputs carry the same shardings as the sharded train step
    (leaves with leading ``capacity`` axis split over ``shard``); ``key`` and
    ``extent`` are replicated. The returned report is the global (psum'd)
    one; ``n_dropped > 0`` means some shard ran out of local slots — grow
    capacity or rebalance more often.
    """
    n_shard = mesh.shape[SHARD_AXIS]
    if capacity % n_shard != 0:
        raise ValueError(f"capacity {capacity} % shard={n_shard} != 0")
    local_cap = capacity // n_shard

    def _local(state, adam, stats, key, extent):
        me = jax.lax.axis_index(SHARD_AXIS)
        new_state, new_adam, new_stats, rep = densify.densify_and_prune(
            state, adam, stats, key,
            max_grad=opt_cfg.densify_grad_threshold,
            min_opacity=0.005,  # train.py:133
            extent=extent,
            percent_dense=opt_cfg.percent_dense,
            use_size_prune=use_size_prune,
            slot_offset=me * local_cap,
        )
        rep = DensifyReport(*(jax.lax.psum(r, SHARD_AXIS) for r in rep))
        return new_state, new_adam, new_stats, rep

    state_t = gmod.empty_state(capacity, max_sh_degree)
    adam_t = optim.init(state_t.params())
    stats_t = DensifyStats.zeros(capacity)
    sspec = (shard_specs(state_t, capacity), shard_specs(adam_t, capacity),
             shard_specs(stats_t, capacity))
    rep_spec = DensifyReport(P(), P(), P(), P())
    smapped = jax.shard_map(
        _local, mesh=mesh,
        in_specs=sspec + (P(), P()),
        out_specs=sspec + (rep_spec,),
        check_vma=False,
    )
    return jax.jit(smapped)


def shard_occupancy(state, n_shard: int):
    """Per-shard alive counts [n_shard] (host-friendly; cheap)."""
    local = state.alive.reshape(n_shard, -1)
    return jnp.sum(local.astype(jnp.int32), axis=1)


def make_sharded_rebalance(
    mesh,
    capacity: int,
    max_sh_degree: int,
    migration_budget: int = 4096,
):
    """One bounded-migration rebalance round (see module docstring).

    Returns a jitted fn (state, adam, stats) -> (state, adam, stats, moved)
    where ``moved`` is the global number of migrated Gaussians this round.
    """
    n_shard = mesh.shape[SHARD_AXIS]
    k = int(migration_budget)

    def _local(state, adam, stats):
        return _rebalance_round(state, adam, stats, n_shard, k)

    state_t = gmod.empty_state(capacity, max_sh_degree)
    adam_t = optim.init(state_t.params())
    stats_t = DensifyStats.zeros(capacity)
    sspec = (shard_specs(state_t, capacity), shard_specs(adam_t, capacity),
             shard_specs(stats_t, capacity))
    smapped = jax.shard_map(
        _local, mesh=mesh,
        in_specs=sspec,
        out_specs=sspec + (P(),),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_sharded_rebalance_loop(
    mesh,
    capacity: int,
    max_sh_degree: int,
    migration_budget: int = 4096,
    max_rounds: int = 8,
):
    """Multi-round rebalance fused into ONE jitted call.

    Host-paced round loops pay a device->host occupancy sync per round
    (~38 ms each through a tunnel); this runs up to ``max_rounds`` rounds
    inside a single ``lax.while_loop``, stopping early on-device when the
    occupancy skew drops under ``skew_threshold`` or a round moves nothing.
    The skew condition is computed from all_gathered counts — identical on
    every shard, so the while_loop stays in lockstep across devices.

    Returns jitted (state, adam, stats, skew_threshold) ->
    (state, adam, stats, moved_total).
    """
    n_shard = mesh.shape[SHARD_AXIS]
    k = int(migration_budget)

    def _skew(state):
        counts = jax.lax.all_gather(
            jnp.sum(state.alive.astype(jnp.int32)), SHARD_AXIS)
        mean = jnp.maximum(jnp.mean(counts.astype(jnp.float32)), 1.0)
        return jnp.max(counts).astype(jnp.float32) / mean

    def _local(state, adam, stats, skew_threshold):
        def cond(c):
            state, adam, stats, r, moved_tot, go = c
            return go

        def body(c):
            state, adam, stats, r, moved_tot, _ = c
            state, adam, stats, moved = _rebalance_round(
                state, adam, stats, n_shard, k)
            go = ((moved > 0) & (r + 1 < max_rounds)
                  & (_skew(state) > skew_threshold))
            return (state, adam, stats, r + 1, moved_tot + moved, go)

        init = (state, adam, stats, jnp.int32(0), jnp.int32(0),
                _skew(state) > skew_threshold)
        state, adam, stats, _, moved_tot, _ = jax.lax.while_loop(
            cond, body, init)
        return state, adam, stats, moved_tot

    state_t = gmod.empty_state(capacity, max_sh_degree)
    adam_t = optim.init(state_t.params())
    stats_t = DensifyStats.zeros(capacity)
    sspec = (shard_specs(state_t, capacity), shard_specs(adam_t, capacity),
             shard_specs(stats_t, capacity))
    smapped = jax.shard_map(
        _local, mesh=mesh,
        in_specs=sspec + (P(),),
        out_specs=sspec + (P(),),
        check_vma=False,
    )
    return jax.jit(smapped)


def _rebalance_round(state, adam, stats, n_shard: int, k: int):
    """One bounded-migration round; runs inside shard_map (see module doc)."""
    alive = state.alive
    my_count = jnp.sum(alive.astype(jnp.int32))
    counts = jax.lax.all_gather(my_count, SHARD_AXIS)  # [n_shard]
    total = jnp.sum(counts)
    target = -(-total // n_shard)  # ceil
    excess = jnp.maximum(counts - target, 0)  # [n_shard]
    deficit = jnp.maximum(target - counts, 0)
    # Rows each shard COULD contribute this round vs rows receivers can
    # absorb. A sender must never clear alive bits for rows nobody takes
    # (that would silently destroy Gaussians), so prefix-allocate the
    # total intake across senders in axis order and cap each sender's
    # contribution at its allocated share.
    avail = jnp.minimum(excess, k)
    want = jnp.minimum(deficit, k)  # bounded intake per round
    total_intake = jnp.sum(want)
    cum_avail = jnp.cumsum(avail) - avail  # exclusive prefix
    sent = jnp.clip(total_intake - cum_avail, 0, avail)
    me = jax.lax.axis_index(SHARD_AXIS)
    my_sent = sent[me]

    # --- pack my topmost alive rows into the migration buffer ----------
    # rank_from_top[i] = number of alive rows in slots > i
    a_i32 = alive.astype(jnp.int32)
    above = jnp.cumsum(a_i32[::-1])[::-1] - a_i32  # [local_cap]
    move = alive & (above < my_sent)
    dest = jnp.where(move, above, k)  # drop row k

    bundle = _row_bundle(state, adam, stats)

    def pack(leaf):
        buf = jnp.zeros((k + 1,) + leaf.shape[1:], leaf.dtype)
        return buf.at[dest].set(leaf)[:k]

    buffers = jax.tree.map(pack, bundle)

    # --- pool over the shard axis -------------------------------------
    pool = jax.tree.map(
        lambda b: jax.lax.all_gather(b, SHARD_AXIS, axis=0, tiled=True),
        buffers,
    )  # leaves [n_shard * k, ...]
    # pool row (s*k + j) is valid iff j < sent[s]; compact valid rows'
    # ORDER is (shard, rank) — build the valid-compacted index table
    pj = jnp.arange(n_shard * k, dtype=jnp.int32)
    p_valid = (pj % k) < sent[pj // k]
    v_rank = jnp.cumsum(p_valid.astype(jnp.int32)) - p_valid.astype(jnp.int32)
    pool_size = jnp.sum(sent)
    # valid_idx[r] = pool row of the r-th valid record
    valid_idx = jnp.zeros((n_shard * k,), jnp.int32).at[
        jnp.where(p_valid, v_rank, n_shard * k - 1)
    ].set(pj, mode="drop")

    # --- my intake interval -------------------------------------------
    # shards absorb the pool in axis order, capped by availability;
    # pool_size <= total_intake by construction, so every pooled row is
    # absorbed by some receiver (nothing is ever dropped).
    cum_want = jnp.cumsum(want) - want  # exclusive
    my_start = jnp.minimum(cum_want[me], pool_size)
    my_take = jnp.minimum(want[me], pool_size - my_start)

    # place into my lowest free slots: free_rank over ~alive', where
    # alive' excludes the rows I just sent away
    alive2 = alive & ~move
    f_i32 = (~alive2).astype(jnp.int32)
    free_rank = jnp.cumsum(f_i32) - f_i32
    recv = (~alive2) & (free_rank < my_take)
    src = valid_idx[jnp.minimum(my_start + free_rank, n_shard * k - 1)]

    def take(pool_leaf):
        return pool_leaf[src]  # [local_cap, ...] gather from small pool

    incoming = jax.tree.map(take, pool)
    state2 = state.replace(alive=alive2)
    state3, adam3, stats3 = _apply_bundle(state2, adam, stats, incoming,
                                          recv)
    state3 = state3.replace(alive=alive2 | recv)
    moved = pool_size  # every pooled row is absorbed (see intake note)
    return state3, adam3, stats3, moved
