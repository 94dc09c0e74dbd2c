"""Mesh construction for single-host and multi-host TPU slices."""

from __future__ import annotations

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

    On a multi-host TPU pod slice call this once per host before building the
    mesh; on single host it is a no-op if initialization fails because there
    is no cluster environment.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:  # single-host / already initialized
        pass
