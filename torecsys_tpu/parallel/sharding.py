"""Sharding rules: where every parameter and batch array lives on the mesh.

Rules (SURVEY.md §2.11 TPU mapping):
  * embedding tables (param path contains ``embedding``) → **table-wise
    placement**: row-sharded ``P('table', None)`` when the table is large
    enough that sharding pays (first axis = rows; the 3-D field-aware table
    shards its row axis), REPLICATED when small (the psum/all-gather traffic
    of sharding a small table exceeds the memory saved — cf. the
    embedding-table placement strategies in PAPERS.md);
  * every other (dense-tower) parameter → replicated;
  * batch arrays → ``P('data')`` on their leading axis.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from torecsys_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS

# Tables with fewer stored rows than this replicate instead of row-sharding.
# At the packed (row, 128-lane) layout this is 32 MB/f32 table — replication
# costs each chip that much HBM plus a dense-grad all-reduce, vs. the sharded
# path's per-step psum of the full (B/dp, K, E) lookup payload; below ~64k
# rows the replica wins on both.  Lookup routing (parallel.lookup) and
# placement (here) read the SAME constant so a replicated table is never
# routed through the shard_map collective.
DEFAULT_MIN_ROWS_TO_SHARD = 1 << 16


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def infer_param_sharding(
    params: Any,
    mesh: jax.sharding.Mesh,
    table_axis: str = TABLE_AXIS,
    min_rows_to_shard: int = DEFAULT_MIN_ROWS_TO_SHARD,
) -> Any:
    """Pytree of ``NamedSharding`` matching ``params``' structure.

    Embedding tables row-shard over ``table_axis`` when they have at least
    ``min_rows_to_shard`` stored rows and the row count divides the axis
    size; small tables (and everything else) replicate.
    """
    ts = mesh.shape.get(table_axis, 1)

    def rule(path, leaf):
        p = _path_str(path)
        if "embedding" in p and leaf.ndim >= 2 and ts > 1:
            # (V, E) tables shard rows; (N, V, E) field-aware tables shard V.
            if (leaf.ndim == 2 and leaf.shape[0] % ts == 0
                    and leaf.shape[0] >= min_rows_to_shard):
                return NamedSharding(mesh, P(table_axis, None))
            if (leaf.ndim == 3 and leaf.shape[1] % ts == 0
                    and leaf.shape[1] >= min_rows_to_shard):
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
