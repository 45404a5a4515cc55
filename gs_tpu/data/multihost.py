"""Multi-host input pipeline: per-host camera ownership.

SURVEY.md §2.4 row 7. The reference eagerly loads every image onto the one
GPU (``utils/camera_utils.py:19-97``). On a multi-host mesh that would read
the whole dataset on every host; instead each host loads ground-truth
images ONLY for the cameras it owns (round-robin over the global camera
index — cameras are shuffled once with a common seed, so round-robin is
load-balanced), while the small camera parameters (matrices, fovs) are
materialized everywhere so any host can build the replicated step inputs.

Trainer contract: with P processes and a data axis of n_data, host p feeds
its local slice of the global camera batch via
:func:`jax.make_array_from_process_local_data`; cameras in the local slice
are always owned (the parallel trainer samples batch slot i from the
cameras owned by the host backing that slot).
"""

from __future__ import annotations

import jax


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
