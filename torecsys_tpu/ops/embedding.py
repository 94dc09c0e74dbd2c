"""Embedding lookup primitives.

The reference's workhorse is ``MultiIndicesEmbedding``
(``/root/reference/torecsys/inputs/base/multi_indices_emb.py:10-112``): one
fused table of ``sum(field_sizes)`` rows, with per-field offsets
(``cumsum(field_sizes)``) added to raw ids before the gather.

Here the lookup is a pure function so that (a) single-device it compiles to
one XLA gather, (b) under a sharded table it can route through the
``torecsys_tpu.parallel`` shard_map path, and (c) the Pallas fused
offset+gather kernel (``torecsys_tpu.ops.pallas.embedding``) slots in behind
the same signature.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def field_offsets(field_sizes: Sequence[int]) -> np.ndarray:
    """Exclusive cumulative sum of field vocab sizes.

    Mirrors the offset trick at ``multi_indices_emb.py:54`` — field ``i``'s
    raw ids are shifted by ``sum(field_sizes[:i])`` into the fused table.

    Returns a static numpy ``(N,)`` int32 array (constant under tracing).
    """
    return np.concatenate([[0], np.cumsum(field_sizes)[:-1]]).astype(np.int32)


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Plain table gather: ``table[ids]``.

    Args:
        table: ``(V, E)``.
        ids: any integer shape ``(...,)``.

    Returns:
        ``(..., E)``.
    """
    return jnp.take(table, ids, axis=0)


def fused_offset_lookup(
    table: jnp.ndarray,
    ids: jnp.ndarray,
    offsets: Optional[np.ndarray] = None,
) -> jnp.ndarray:
    """Gather with per-field offsets applied: ``table[ids + offsets]``.

    Args:
        table: ``(V, E)`` fused table (V = sum of field vocab sizes).
        ids: ``(B, N)`` raw per-field ids.
        offsets: ``(N,)`` int offsets (``field_offsets(...)``); None = zeros.

    Returns:
        ``(B, N, E)``.
    """
    if offsets is not None:
        ids = ids + jnp.asarray(offsets, dtype=ids.dtype)[None, :]
    return jnp.take(table, ids, axis=0)
