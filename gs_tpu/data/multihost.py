"""Multi-host input pipeline: per-host camera ownership + global batches.

SURVEY.md §2.4 row 7. The reference eagerly loads every image onto the one
GPU (``utils/camera_utils.py:19-97``). On a multi-host mesh that would read
the whole dataset on every host; instead each host loads ground-truth
images ONLY for the cameras it owns (round-robin over the global camera
index — cameras are shuffled once with a common seed, so round-robin is
load-balanced), while the small camera parameters (matrices, fovs) are
materialized everywhere so any host can build the replicated step inputs.

Trainer contract: with P processes and a data axis of n_data, every process
runs the SAME deterministic sampling over the GLOBAL camera list
(:class:`BatchSampler`: batch slot i draws only from cameras owned by the
process feeding data-row i), then :func:`assemble_global_batch` forms the
global camera-batch arrays — each process materializes only the rows its
devices address (``jax.make_array_from_callback``; pixels for unowned rows
are never touched).
"""

from __future__ import annotations

import random as _random

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P


def process_info() -> tuple[int, int]:
    """(process_index, process_count) of the multi-host runtime."""
    return jax.process_index(), jax.process_count()


def owns_camera(global_idx: int, process_id: int, process_count: int) -> bool:
    """Round-robin camera ownership over the global (post-shuffle) index."""
    if process_count <= 1:
        return True
    return global_idx % process_count == process_id


def owned_indices(n: int, process_id: int, process_count: int) -> list[int]:
    return [i for i in range(n) if owns_camera(i, process_id, process_count)]


def should_load_image(
    global_idx: int,
    process_id: int,
    process_count: int,
    *,
    is_test: bool = False,
) -> bool:
    """Whether this host materializes the ground-truth image.

    Train cameras: owner only. Test cameras: every host — the in-training
    eval (``training_report`` parity) runs redundantly-replicated so its
    printed metrics agree on all hosts, and test splits are small (1/8 of
    the data, ``llffhold=8``).
    """
    if is_test:
        return True
    return owns_camera(global_idx, process_id, process_count)


def data_row_feeders(mesh) -> list[int]:
    """Process index feeding each data-row of the mesh.

    Row i of the data axis must be backed by exactly one process: the image
    batch is sharded over ``data`` (replicated over ``shard``), so every
    device in row i needs slot i's pixels, and single-owner image loading
    (:func:`should_load_image`) can only serve them if those devices belong
    to one process. Standard meshes (data axis outermost across hosts)
    satisfy this; otherwise we fail loudly rather than feed garbage.
    """
    from gs_tpu.parallel.mesh import DATA_AXIS

    axis = list(mesh.axis_names).index(DATA_AXIS)
    dev = np.moveaxis(np.asarray(mesh.devices), axis, 0)
    feeders = []
    for i in range(dev.shape[0]):
        procs = {d.process_index for d in dev[i].flat}
        if len(procs) != 1:
            raise ValueError(
                f"data row {i} spans processes {sorted(procs)}; orient the "
                "mesh so each data-row's devices belong to one process "
                "(data axis outermost across hosts)"
            )
        feeders.append(procs.pop())
    return feeders


def assemble_global_batch(mesh, cams):
    """Global camera-batch arrays from per-process partial camera data.

    Every process passes the same ``cams`` list (global order, length
    n_data); entries whose images this process does not own may have
    ``image=None``. Each leaf becomes a global ``jax.Array`` sharded
    ``P(data)`` via ``jax.make_array_from_callback`` — the callback only
    runs for rows this process's devices address, which the trainer's
    sampling guarantees are locally-owned cameras. The single-process case
    degenerates to an ordinary device_put of the stacked batch (tested
    identical to ``stack_cameras``).
    """
    from gs_tpu.cameras import Camera
    from gs_tpu.parallel.mesh import DATA_AXIS

    base = cams[0]
    n = len(cams)
    if any((c.width, c.height) != (base.width, base.height) for c in cams):
        raise ValueError("camera batch requires uniform resolution")
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def from_rows(row_fn, row_shape):
        shape = (n,) + row_shape

        def cb(index):
            rows = range(*index[0].indices(n))
            block = np.stack([row_fn(r) for r in rows])
            return block[(slice(None),) + tuple(index[1:])]

        return jax.make_array_from_callback(shape, sharding, cb)

    def img_row(r):
        img = cams[r].image
        if img is None:
            raise RuntimeError(
                f"process {jax.process_index()} must feed batch slot {r} but "
                f"does not own its ground-truth image — the sampler assigned "
                f"an unowned camera to a locally-fed slot (bug)"
            )
        return np.asarray(img, np.float32)

    f32row = lambda get: (lambda r: np.asarray(get(cams[r]), np.float32))
    return Camera(
        view=from_rows(f32row(lambda c: c.view), (4, 4)),
        full_proj=from_rows(f32row(lambda c: c.full_proj), (4, 4)),
        cam_pos=from_rows(f32row(lambda c: c.cam_pos), (3,)),
        tan_fovx=from_rows(f32row(lambda c: c.tan_fovx), ()),
        tan_fovy=from_rows(f32row(lambda c: c.tan_fovy), ()),
        width=base.width,
        height=base.height,
        image=from_rows(img_row, (3, base.height, base.width)),
        znear=from_rows(f32row(lambda c: c.znear), ()),
        zfar=from_rows(f32row(lambda c: c.zfar), ()),
    )


class BatchSampler:
    """Deterministic multi-host camera batching over the global camera list.

    All processes run this identically (it must be driven by the shared
    ``random`` module RNG after a common seed): batch slot i draws from the
    per-(feeder process, resolution) pool of cameras OWNED by the process
    feeding data-row i, so the feeder always holds the slot's pixels. The
    resolution for a batch is drawn uniformly from resolutions available to
    every feeder (mirrors the reference's shuffled viewpoint stack per
    resolution group).
    """

    def __init__(self, cams, feeders: list[int], process_count: int,
                 rng: _random.Random | None = None):
        self.cams = list(cams)
        self.feeders = list(feeders)
        self.rng = rng if rng is not None else _random
        procs = sorted(set(self.feeders))
        self._members: dict[tuple[int, tuple[int, int]], list[int]] = {}
        dropped = 0
        for gi, c in enumerate(self.cams):
            owner = gi % process_count  # must match should_load_image
            if owner not in procs:
                dropped += 1  # owner feeds no data row: camera unusable
                continue
            self._members.setdefault((owner, (c.width, c.height)), []).append(gi)
        if dropped:
            print(
                f"[multihost] {dropped} cameras owned by processes that feed "
                f"no data row are excluded from training batches (feeders: "
                f"{procs}, processes: {process_count})"
            )
        by_res: dict[tuple[int, int], set[int]] = {}
        for (p, res) in self._members:
            by_res.setdefault(res, set()).add(p)
        self.resolutions = sorted(r for r, ps in by_res.items()
                                  if ps == set(procs))
        # a batch must be same-resolution AND have one owned camera per
        # feeder, so a resolution some feeder owns no camera of cannot be
        # sampled — that excludes WHOLE resolution groups, not just single
        # cameras, and on a mixed-resolution dataset the reference would
        # still train on them. Fail loud (warn with counts) rather than
        # silently shrinking the training set; round-robin ownership over a
        # shuffled index makes this unlikely unless a resolution group is
        # smaller than the feeder count.
        excluded = {r: ps for r, ps in by_res.items() if ps != set(procs)}
        if excluded:
            for res, ps in sorted(excluded.items()):
                n_cams = sum(len(v) for (p, r), v in self._members.items()
                             if r == res)
                missing = sorted(set(procs) - ps)
                print(
                    f"[multihost] WARNING: resolution {res[0]}x{res[1]} "
                    f"({n_cams} cameras) excluded from training batches — "
                    f"feeder process(es) {missing} own no camera at it; "
                    f"the reference trains on all cameras. Consider fewer "
                    f"processes or uniform resolutions."
                )
        if not self.resolutions:
            raise ValueError(
                "no resolution has cameras owned by every feeding process; "
                "cannot form same-resolution global batches"
            )
        self._stacks: dict[tuple[int, tuple[int, int]], list[int]] = {}

    def next_batch(self) -> list:
        """One global batch: list of n_data cameras (global determinism)."""
        res = self.resolutions[self.rng.randint(0, len(self.resolutions) - 1)]
        out = []
        for f in self.feeders:
            key = (f, res)
            if not self._stacks.get(key):
                pool = list(self._members[key])
                self.rng.shuffle(pool)
                self._stacks[key] = pool
            out.append(self.cams[self._stacks[key].pop()])
        return out
