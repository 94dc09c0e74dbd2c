"""Input-module base class and the field-format protocol.

The reference's core API idea (SURVEY.md §1) is kept: a batch is a
``Dict[str, Array]`` keyed by raw field name; each input module consumes the
fields named in its ``fields`` attribute and emits a canonical tensor
(``(B, N, E)`` embeddings, ``(B, N, 1)`` first-order values, ``(B, N*N, E)``
field-aware embeddings); the :class:`torecsys_tpu.inputs.Inputs` wrapper maps
*model-argument names* (``feat_inputs`` / ``emb_inputs`` / ...) to modules.

Differences from the reference (``/root/reference/torecsys/inputs/base/__init__.py:11-45``):
the schema is declarative constructor state (no mutable ``set_schema``), so
the whole inputs-apply is one traced function — no dispatch on
``__class__.__name__`` strings (``inputs/inputs.py:70,84``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

Batch = Dict[str, jnp.ndarray]


class BaseInput(nn.Module):
    """Base class for all input (embedder) modules.

    Subclasses define parameters in ``setup()`` and implement
    ``__call__(batch, training=False) -> Array``. Every subclass exposes:

    * ``fields``: tuple of raw batch keys it consumes.
    * ``embed_size`` / ``__len__``: the size of its embedding output dim
      (reference ``BaseInput.__len__``, ``inputs/base/__init__.py:23``).
    """

    def __len__(self) -> int:
        return int(getattr(self, "embed_size", 0))

    # ---- helpers shared by id-based inputs ------------------------------
    def _stack_fields(self, batch: Batch, fields: Tuple[str, ...]) -> jnp.ndarray:
        """Stack raw ``(B,)`` or ``(B, k)`` integer fields into ``(B, N)``."""
        cols = []
        for name in fields:
            x = batch[name]
            if x.ndim == 1:
                x = x[:, None]
            elif x.ndim > 2:
                raise ValueError(f"field {name!r} must be rank<=2, got {x.shape}")
            cols.append(x)
        return jnp.concatenate(cols, axis=1)
