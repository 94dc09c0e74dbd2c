"""Embedding-model layers: generalized matrix factorization and StarSpace.

Parity:
* GeneralizedMatrixFactorizationLayer — ``/root/reference/torecsys/layers/emb/generalized_matrix_factorization.py:8-59``
* StarSpaceLayer — ``/root/reference/torecsys/layers/emb/starspace.py:8-98``
  (similarity function is dependency-injected, like the reference)
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer
from torecsys_tpu.utils.operations import inner_product_similarity


class GeneralizedMatrixFactorizationLayer(BaseLayer):
    """Dot product of the user and item rows.

    ``(B, 2, E) → (B, 1)``.
    """

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        user = emb_inputs[:, 0, :]
        item = emb_inputs[:, 1, :]
        return jnp.sum(user * item, axis=-1, keepdims=True)


class StarSpaceLayer(BaseLayer):
    """Similarity between context and target embeddings.

    ``(B, 2, E) → (B, E)`` — the reference applies the injected similarity
    over the feature axis of the ``(B, 1, E)`` context/target slices
    (``starspace.py:70-98``).
    """

    similarity: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = inner_product_similarity

    @nn.compact
    def __call__(self, samples_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        context = samples_inputs[:, 0:1, :]  # (B, 1, E)
        target = samples_inputs[:, 1:2, :]
        return self.similarity(context, target)
