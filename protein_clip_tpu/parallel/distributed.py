"""Multi-host / multi-slice initialisation.

The reference has no communication backend at all (SURVEY.md §2.3); the
TPU-native story is: one process per host, ``jax.distributed.initialize()``
to join the cluster, then every jit/shard_map in this package runs SPMD
across all hosts' devices. Within a slice the collectives ride ICI; across
slices XLA routes them over DCN — no NCCL/MPI analogue is needed.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join (or bootstrap) a multi-host JAX cluster.

    On Cloud TPU VMs all arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere. No-op when already initialised
    or in a single-process environment with no coordinator configured.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already initialized" in msg:
            return
        if coordinator_address is None and "coordinator_address" in msg:
            # single-process environment, nothing auto-detected: the
            # documented no-op, so one script serves single- and
            # multi-host launches unconditionally
            return
        raise


def is_primary() -> bool:
    """True on the process that should write checkpoints/figures/CSV."""
    return jax.process_index() == 0


def global_device_count() -> int:
    return jax.device_count()
