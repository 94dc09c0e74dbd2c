"""Hybrid dense+sparse optimizer plumbing for the jitted train step.

Splits the parameter pytree into *embedding tables* (updated by a lazy
row-wise optimizer on only the rows each batch touched — see
``torecsys_tpu.ops.sparse``) and *dense params* (updated by the configured
optax transform).  Which tables are sparse is discovered structurally: input
modules on the sparse path emit a ``perturbations/<module>/lookup`` variable
(per-slot gradients) plus a ``lookup_ids/<module>/ids`` sow; the matching
param lives at ``params/<module>/embedding``.  The discovery runs under
``jax.eval_shape`` so it costs nothing at trace time.

Hybrid optimizer state layout (stored in ``TrainState.opt_state``)::

    {"dense": <optax state over the dense sub-pytree>,
     "sparse": {"<module/path/embedding>": {"m": ..., "v": ...}, ...}}

Flat paths use "/" separators (msgpack-checkpoint friendly).
"""

from __future__ import annotations

from typing import Any, Dict, Set, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

from torecsys_tpu.ops.sparse import use_sparse_embedding_grads

SEP = "/"
PERTURB_NAME = "lookup"
IDS_COLLECTION = "lookup_ids"
AUX_COLLECTION = "lookup_aux"
IDS_NAME = "ids"
PARAM_NAME = "embedding"


def probe_perturbations(seq, params, features) -> Dict[str, jax.ShapeDtypeStruct]:
    """Abstractly evaluate one sparse-mode forward and return the flat
    ``{path: ShapeDtypeStruct}`` of the perturbation variables it would emit.

    Zero FLOPs (``jax.eval_shape``); safe to call inside a jitted trace.
    """

    def f(p, b):
        _, mut = seq.apply(
            {"params": p},
            b,
            training=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=True,
        )
        return mut.get("perturbations", {})

    with use_sparse_embedding_grads():
        shapes = jax.eval_shape(f, params, features)
    return traverse_util.flatten_dict(shapes, sep=SEP)


def table_path_for(pert_path: str) -> str:
    """``<module>/lookup`` (perturbations) → ``<module>/embedding`` (params)."""
    parts = pert_path.split(SEP)
    assert parts[-1] == PERTURB_NAME, pert_path
    return SEP.join(parts[:-1] + [PARAM_NAME])


def ids_path_for(pert_path: str) -> str:
    """``<module>/lookup`` (perturbations) → ``<module>/ids`` (lookup_ids)."""
    parts = pert_path.split(SEP)
    return SEP.join(parts[:-1] + [IDS_NAME])


def sparse_table_paths(seq, params, features) -> Set[str]:
    """Flat param paths of every table on the sparse-gradient path."""
    return {table_path_for(p) for p in probe_perturbations(seq, params, features)}


def split_params(params: Any, table_paths: Set[str]) -> Tuple[Dict, Dict]:
    """Partition ``params`` into flat (dense, tables) dicts keyed by path."""
    flat = traverse_util.flatten_dict(params, sep=SEP)
    tables = {k: v for k, v in flat.items() if k in table_paths}
    dense = {k: v for k, v in flat.items() if k not in table_paths}
    return dense, tables


def merge_params(dense_flat: Dict, tables_flat: Dict) -> Any:
    """Inverse of :func:`split_params` — back to the nested params pytree."""
    return traverse_util.unflatten_dict({**dense_flat, **tables_flat}, sep=SEP)


def init_hybrid_opt_state(tx, row_tx, params, table_paths: Set[str]) -> Dict:
    """Build the hybrid optimizer state over a partitioned param pytree."""
    dense, tables = split_params(params, table_paths)
    return {
        "dense": tx.init(dense),
        "sparse": {p: row_tx.init(t) for p, t in tables.items()},
    }


def is_hybrid_opt_state(opt_state: Any) -> bool:
    return isinstance(opt_state, dict) and "sparse" in opt_state and "dense" in opt_state


def sown_ids(mutated: Dict, pert_path: str) -> jnp.ndarray:
    """Extract the ids sown by the module owning ``pert_path``.

    ``sow`` appends to a tuple; exactly one entry is expected — a module whose
    lookup runs twice in one forward would silently sum two call-sites' grads
    against one call-site's ids, so that case is rejected loudly.
    """
    flat = traverse_util.flatten_dict(mutated[IDS_COLLECTION], sep=SEP)
    entry = flat[ids_path_for(pert_path)]
    if len(entry) != 1:
        raise ValueError(
            f"embedding module at {pert_path!r} was applied {len(entry)} times in "
            "one forward; sparse embedding gradients require exactly one lookup "
            "per module per step (set Pipeline.sparse_embeddings=False)"
        )
    return entry[0]


def sown_aux(mutated: Dict, pert_path: str):
    """Host-presort aux sown by the module owning ``pert_path``, or None.

    Modules sow ``order/lo/seg/uids/n_unique`` under ``lookup_aux`` when the
    input pipeline attached them (``data.presort``); presence routes the
    train step through ``ops.sparse.update_from_host_aux`` (the trusted
    presorted path).  The sow tuples carry exactly one entry per step —
    guaranteed by the same single-application check as :func:`sown_ids`.
    """
    if AUX_COLLECTION not in mutated:
        return None
    flat = traverse_util.flatten_dict(mutated[AUX_COLLECTION], sep=SEP)
    prefix = SEP.join(pert_path.split(SEP)[:-1])
    names = ("order", "lo", "seg", "uids", "n_unique")
    aux = {}
    for name in names:
        entry = flat.get(f"{prefix}{SEP}{name}" if prefix else name)
        if entry is None:
            return None
        aux[name] = entry[0]
    return aux
