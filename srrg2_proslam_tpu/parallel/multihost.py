"""Multi-host execution setup (DCN) for pod-scale runs.

The reference is single-process (SURVEY.md §2.3); this is the new-design
multi-host path: single-program multi-host JAX over a pod slice, with the
same sharded stages as parallel/spmd.py — the mesh simply spans all hosts'
devices and XLA routes intra-slice collectives over ICI and cross-host
legs over DCN (SURVEY.md §5.8).

Division of labor at pod scale:
  * every host runs the same program; the frame stream is read on host 0
    and broadcast (or each host reads its own shard of a multi-camera rig);
  * the loop-closure descriptor database shards across ALL devices in the
    pod (capacity scales linearly with devices);
  * pose-graph factors shard across devices; the dense reduced solve is
    replicated (it is tiny);
  * host-side control (status machine, splitting) is deterministic given
    the same stats readback, so hosts stay in lockstep without extra
    coordination.

This module cannot be exercised in a single-host environment; it is the
documented, tested-by-construction entry point (the sharded kernels it
launches are validated on the virtual mesh in tests/).
"""
from __future__ import annotations

import jax

from .spmd import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize the JAX distributed runtime for a multi-host pod run.

    With no arguments, relies on the TPU environment's automatic discovery
    (GCE metadata); arguments override for manual clusters.  Call once per
    process before any jax API touches the backend.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "d"):
    """1-D mesh over every device of every host (ICI+DCN)."""
    return make_mesh(jax.devices(), axis)


def is_coordinator() -> bool:
    return jax.process_index() == 0
