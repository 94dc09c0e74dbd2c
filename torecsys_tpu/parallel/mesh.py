"""Mesh construction for single-host and multi-host TPU slices."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

DATA_AXIS = "data"
TABLE_AXIS = "table"


def make_mesh(
    data: int = -1,
    table: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, TABLE_AXIS),
) -> jax.sharding.Mesh:
    """Build a 2-D ``(data, table)`` mesh over the available devices.

    Args:
        data: size of the data-parallel axis; ``-1`` = all remaining devices.
        table: size of the table (embedding row-shard) axis.
        devices: explicit device list (e.g. ``jax.devices('cpu')`` for the
            virtual-device test rig); defaults to ``jax.devices()``.
        axis_names: mesh axis names; defaults to ``('data', 'table')``.

    Returns:
        ``jax.sharding.Mesh``.
    """
    devs = list(devices) if devices is not None else list(jax.devices())
    n = len(devs)
    if data == -1:
        if n % table != 0:
            raise ValueError(f"{n} devices not divisible by table={table}")
        data = n // table
    if data * table != n:
        devs = devs[: data * table]
    if data * table > n:
        raise ValueError(f"mesh {data}x{table} needs {data * table} devices, have {n}")
    arr = np.asarray(devs).reshape(data, table)
    return jax.sharding.Mesh(arr, tuple(axis_names))


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` passthrough.

    Call once per host on a multi-host slice before building the mesh.  When
    no cluster environment is detectable AND no explicit coordinator was
    requested, this is a deliberate no-op (single-host run); every other
    failure — bad coordinator address, port collision, partial cluster —
    propagates, because silently training single-host when the user asked for
    a cluster corrupts results (each host would train an independent copy).
    """
    if jax.process_count() > 1 or getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # already initialized
    explicit = bool(kwargs.get("coordinator_address"))
    # NB: TPU_WORKER_HOSTNAMES deliberately not sniffed — single-host TPU
    # runtimes set it too, and treating it as "cluster requested" would make
    # every single-host run die on a doomed coordinator handshake.
    auto_env = any(
        k in os.environ
        for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                  "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not auto_env:
        return  # single-host: nothing to initialize
    jax.distributed.initialize(**kwargs)


def host_local_batch_to_global(
    batch, mesh: jax.sharding.Mesh, data_axis: str = DATA_AXIS,
    stacked: bool = False,
):
    """Assemble per-process host-local arrays into global data-sharded arrays.

    On a multi-host slice each process loads only its shard of the batch
    (per-host file sharding); ``jax.make_array_from_process_local_data``
    stitches the shards into one global array laid out
    ``P(data_axis)`` — the SPMD-correct way to feed a global jitted step
    (SURVEY.md §2.11 backend spec).  Single-process it is a plain device_put.

    ``stacked=True`` handles ``(K, B/host, ...)`` multi-step stacks
    (``Trainer.steps_per_execution > 1``): the scan axis stays unsharded and
    the SECOND axis (batch) shards over ``data_axis``.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    spec = PartitionSpec(None, data_axis) if stacked else PartitionSpec(data_axis)
    sharding = NamedSharding(mesh, spec)
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
