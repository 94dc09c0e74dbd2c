"""torecsys-tpu: a TPU-native recommender-system framework.

Capability parity with ``p768lwy3/torecsys`` (mounted read-only at
``/root/reference``) — CTR prediction, learning-to-rank, and embedding
models — re-designed from scratch for TPU:

* compute path: JAX / XLA / Pallas; one jitted train step
* scale path: ``jax.sharding.Mesh`` with ``('data', 'table')`` axes —
  data-parallel dense towers, row-sharded embedding tables
* host path: schema-driven collation to fixed-shape numpy batches

Public API mirrors the reference's package layout (``torecsys.inputs``,
``torecsys.layers``, ``torecsys.models``, ``torecsys.losses``, ...):

    import torecsys_tpu as trs
    inputs = trs.inputs.Inputs(schema={...})
    model = trs.models.FactorizationMachineModel(...)
"""

__version__ = "0.1.0"

from torecsys_tpu import data, inputs, layers, losses, metrics, miners, models, ops, parallel, train, utils

__all__ = [
    "data",
    "inputs",
    "layers",
    "losses",
    "metrics",
    "miners",
    "models",
    "ops",
    "parallel",
    "train",
    "utils",
    "__version__",
]
