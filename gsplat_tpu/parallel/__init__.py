"""Multi-chip / multi-host scale-out (shard_map over a jax.sharding.Mesh).

Two sharding modes (both keep Gaussian parameters + Adam state replicated):
- data_parallel: one camera per chip (a capability extension over the
  reference's single image/step), gradients psum'd over ICI;
- tile_parallel: ONE camera's tile rows sharded across chips (the
  workload's sequence-parallel analogue) for very high resolutions.

``initialize_multihost`` wires jax.distributed for pod-slice / multi-host
runs; on a single host it is a no-op.
"""

from __future__ import annotations

from .data_parallel import dp_train_step, get_dp_train_step, make_mesh
from .tile_parallel import get_tp_train_step, make_tile_mesh, tp_train_step

__all__ = [
    "dp_train_step",
    "get_dp_train_step",
    "make_mesh",
    "tp_train_step",
    "get_tp_train_step",
    "make_tile_mesh",
    "initialize_multihost",
]


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed for multi-host training.

    With no arguments, relies on the TPU pod environment's auto-discovery
    (JAX reads the TPU metadata); pass explicit values for other setups.
    Collectives in dp/tp_train_step then span all hosts' devices: build the
    mesh from ``jax.devices()`` (global) and feed each host its own cameras
    via the usual shard_map in_specs — the DCN hop is handled by the same
    psum/all_gather collectives.

    No-op when only one process is present and no coordinator is given.
    """
    import jax

    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
