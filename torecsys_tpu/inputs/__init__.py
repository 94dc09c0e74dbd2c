"""Inputs layer: the embedding front-end.

Routes raw batch fields through embedding modules per a declarative schema and
emits a ``Dict[str, Array]`` keyed by *model-argument name* — the reference's
core protocol (``/root/reference/torecsys/inputs/inputs.py:9-132``), kept
verbatim at the API level: ``model(**inputs(batch))``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.inputs.base import BaseInput, Batch
from torecsys_tpu.inputs.embeddings import (
    ConcatInput,
    MultiIndicesEmbedding,
    MultiIndicesFieldAwareEmbedding,
    SingleIndexEmbedding,
    StackedInput,
    ValueInput,
)
from torecsys_tpu.inputs.sequence import ListIndicesEmbedding, SequenceIndicesEmbedding
from torecsys_tpu.inputs.image import ImageInput, PretrainedImageInput, save_tower_weights


class Inputs(nn.Module):
    """Schema-driven wrapper: ``{model_arg_name: input_module}``.

    Example::

        inputs = Inputs(schema={
            'feat_inputs': ValueInput(fields=('age', 'price')),
            'emb_inputs': MultiIndicesEmbedding(
                embed_size=16, field_sizes=(100, 50), fields=('user_id', 'item_id')),
        })
        out = inputs.apply(vars, batch)   # {'feat_inputs': (B,2,1), 'emb_inputs': (B,2,16)}

    Unlike the reference (mutable ``set_schema`` + ``__class__.__name__``
    dispatch, ``inputs/inputs.py:70,84``), the schema is constructor state and
    the forward is a single traced function.
    """

    schema: Mapping[str, BaseInput]

    def __call__(self, batch: Batch, training: bool = False) -> Dict[str, jnp.ndarray]:
        return {name: module(batch, training=training) for name, module in self.schema.items()}

    def add_inputs(self, name: str, module: BaseInput) -> "Inputs":
        """Return a new ``Inputs`` with one more schema entry (modules are
        immutable dataclasses; mirrors ``inputs/inputs.py:91``)."""
        schema = dict(self.schema)
        schema[name] = module
        return self.clone(schema=schema)


__all__ = [
    "BaseInput",
    "ConcatInput",
    "ImageInput",
    "Inputs",
    "ListIndicesEmbedding",
    "MultiIndicesEmbedding",
    "MultiIndicesFieldAwareEmbedding",
    "PretrainedImageInput",
    "save_tower_weights",
    "SequenceIndicesEmbedding",
    "SingleIndexEmbedding",
    "StackedInput",
    "ValueInput",
]
