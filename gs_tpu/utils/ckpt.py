"""Full-training-state checkpointing.

Replaces the reference's ``torch.save((gaussians.capture(), iteration))``
(``train.py:144-146``; ``gaussian_model.py:63-102``): one artifact holding
the Gaussian parameters, the Adam moments + steps, the densification
accumulators, the iteration counter and the spatial lr scale.

Two interchangeable backends over the same flat {path: array} layout:
  - npz (single file, host-portable, dependency-free) — ``.npz`` paths
  - orbax (directory; sharded/async-capable for multi-host runs) — any
    other path
``save_train_state`` / ``load_train_state`` dispatch on the path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gs_tpu.models import densify, gaussians, optim


def _flatten(prefix: str, tree) -> dict[str, np.ndarray]:
    out = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def _to_flat_dict(ts) -> dict[str, np.ndarray]:
    data = {}
    data.update(_flatten("state", ts.state))
    data.update(_flatten("adam", ts.adam))
    data.update(_flatten("stats", ts.stats))
    data["meta/iteration"] = np.int64(ts.iteration)
    data["meta/spatial_lr_scale"] = np.float64(ts.spatial_lr_scale)
    data["meta/max_sh_degree"] = np.int64(ts.max_sh_degree)
    return data


def _from_flat_dict(z):
    from gs_tpu.training import TrainState

    def unflat(prefix: str, template):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        vals = [jnp.asarray(z[prefix + jax.tree_util.keystr(p)]) for p, _ in leaves]
        return jax.tree_util.tree_unflatten(treedef, vals)

    cap = z["state.xyz"].shape[0]
    k1 = z["state.features_rest"].shape[1]
    max_deg = int(round((k1 + 1) ** 0.5)) - 1
    state = unflat("state", gaussians.empty_state(cap, max_deg))
    adam = unflat("adam", optim.init(state.params()))
    stats = unflat("stats", densify.DensifyStats.zeros(cap))
    return TrainState(
        state=state,
        adam=adam,
        stats=stats,
        iteration=int(z["meta/iteration"]),
        spatial_lr_scale=float(z["meta/spatial_lr_scale"]),
        max_sh_degree=int(z["meta/max_sh_degree"]),
    )


def save_train_state(path: str, ts) -> None:
    if not path.endswith(".npz"):
        return save_train_state_orbax(path, ts)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **_to_flat_dict(ts))


def load_train_state(path: str):
    if not path.endswith(".npz"):
        return load_train_state_orbax(path)
    z = np.load(path, allow_pickle=False)
    return _from_flat_dict(z)


def save_train_state_orbax(path: str, ts) -> None:
    """Orbax directory checkpoint (sharded-array capable for multi-host)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _to_flat_dict(ts), force=True)
    ckptr.wait_until_finished()


def load_train_state_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    z = ckptr.restore(os.path.abspath(path))
    return _from_flat_dict(z)
