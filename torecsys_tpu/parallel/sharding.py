"""Sharding rules: where every parameter and batch array lives on the mesh.

Rules (SURVEY.md §2.11 TPU mapping):
  * embedding tables (param path contains ``embedding``) → row-sharded
    ``P('table', None)`` (first axis = rows; the 3-D field-aware table shards
    its row axis too);
  * every other (dense-tower) parameter → replicated;
  * batch arrays → ``P('data')`` on their leading axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from torecsys_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def infer_param_sharding(
    params: Any,
    mesh: jax.sharding.Mesh,
    table_axis: str = TABLE_AXIS,
) -> Any:
    """Pytree of ``NamedSharding`` matching ``params``' structure.

    Embedding tables are row-sharded over ``table_axis`` when their row count
    divides the axis size; all other params are replicated.
    """
    ts = mesh.shape.get(table_axis, 1)

    def rule(path, leaf):
        p = _path_str(path)
        if "embedding" in p and leaf.ndim >= 2 and ts > 1:
            # (V, E) tables shard rows; (N, V, E) field-aware tables shard V.
            if leaf.ndim == 2 and leaf.shape[0] % ts == 0:
                return NamedSharding(mesh, P(table_axis, None))
            if leaf.ndim == 3 and leaf.shape[1] % ts == 0:
                return NamedSharding(mesh, P(None, table_axis, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: jax.sharding.Mesh, **kwargs) -> Any:
    """Place ``params`` on the mesh per :func:`infer_param_sharding`."""
    shardings = infer_param_sharding(params, mesh, **kwargs)
    return jax.device_put(params, shardings)


def batch_sharding(
    mesh: jax.sharding.Mesh, data_axis: str = DATA_AXIS, stacked: bool = False
) -> NamedSharding:
    """Sharding for a batch array: leading axis over ``data``.

    ``stacked=True`` is for ``(K, B, ...)`` multi-step stacks (scan axis
    first): the *second* axis is the batch axis.
    """
    spec = P(None, data_axis) if stacked else P(data_axis)
    return NamedSharding(mesh, spec)


def shard_batch(
    batch: Dict[str, jnp.ndarray], mesh: jax.sharding.Mesh, stacked: bool = False
) -> Dict[str, jnp.ndarray]:
    """Place every array in a batch dict with its batch axis over ``data``."""
    s = batch_sharding(mesh, stacked=stacked)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
