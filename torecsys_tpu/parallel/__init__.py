"""Distributed execution: device meshes, sharding rules, sharded embedding lookup.

The reference has **no** distributed layer (SURVEY.md §2.11) — this package is
the TPU-native design built fresh:

* one global :class:`jax.sharding.Mesh` with axes ``('data', 'table')``;
* the batch is sharded over ``data`` (pure data parallelism for the dense
  towers — gradients all-reduced by SPMD);
* embedding tables are **row-sharded** over ``table`` (the model-parallel
  axis, the recsys analogue of TP+EP); lookups exchange rows over ICI via a
  ``shard_map`` collective;
* everything lives inside ONE jitted train step — XLA overlaps the lookup
  collective with dense compute.
"""

from torecsys_tpu.parallel.mesh import (
    DATA_AXIS,
    TABLE_AXIS,
    make_mesh,
)
from torecsys_tpu.parallel.lookup import (
    LookupContext,
    maybe_sharded_lookup,
    maybe_sharded_packed_lookup,
    sharded_lookup,
    sharded_lookup_alltoall,
    sharded_packed_lookup_alltoall,
    sharded_packed_lookup,
    use_sharded_lookup,
)
from torecsys_tpu.parallel.sharding import (
    batch_sharding,
    infer_param_sharding,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "TABLE_AXIS",
    "LookupContext",
    "batch_sharding",
    "infer_param_sharding",
    "make_mesh",
    "maybe_sharded_lookup",
    "maybe_sharded_packed_lookup",
    "shard_batch",
    "shard_params",
    "sharded_lookup",
    "sharded_lookup_alltoall",
    "sharded_packed_lookup_alltoall",
    "sharded_packed_lookup",
    "use_sharded_lookup",
]
