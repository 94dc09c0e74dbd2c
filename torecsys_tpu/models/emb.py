"""Embedding models: matrix factorization and StarSpace.

Parity:
* MatrixFactorizationModel — ``/root/reference/torecsys/models/emb/matrix_factorization.py:7-43``
* StarSpaceModel — ``models/emb/starspace.py:11-136`` (the reference's
  ``predict`` is NotImplemented; here ``predict`` scores a context/target
  pair directly).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.layers.emb import GeneralizedMatrixFactorizationLayer, StarSpaceLayer
from torecsys_tpu.models.base import EmbBaseModel, register_model
from torecsys_tpu.utils.operations import inner_product_similarity


@register_model("MF", "MatrixFactorization")
class MatrixFactorizationModel(EmbBaseModel):
    """GMF dot product of (user, item) embedding rows.

    ``(emb_inputs (B, 2, E)) → (B, 1)``.
    """

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        return GeneralizedMatrixFactorizationLayer(name="mf")(emb_inputs, training=training)


@register_model("StarSpace")
class StarSpaceModel(EmbBaseModel):
    """StarSpace: positive + negative context/target similarity scores.

    Inputs are the miner's aggregated batch (reference layout,
    ``starspace.py:96-135``): ``context_inputs`` / ``target_inputs`` of shape
    ``(B·(1+num_neg), 1, E)`` where row blocks alternate [pos, negs...] per
    anchor.  Output: ``(B·(1+num_neg), 1)`` similarity scores, positives
    first within each block — the layout the pairwise LTR losses split on.
    """

    embed_size: int
    num_neg: int
    similarity: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = inner_product_similarity

    @nn.compact
    def __call__(self, context_inputs: jnp.ndarray, target_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        agg_b = context_inputs.shape[0]
        b = agg_b // (1 + self.num_neg)
        e = self.embed_size
        context = context_inputs.reshape(b, 1 + self.num_neg, e)
        target = target_inputs.reshape(b, 1 + self.num_neg, e)

        layer = StarSpaceLayer(similarity=self.similarity, name="starspace")
        ctx_pos = context[:, 0:1, :]  # (B, 1, E)
        tgt_pos = target[:, 0:1, :]
        pos_sim = layer(jnp.concatenate([ctx_pos, tgt_pos], axis=1), training=training)
        # the layer contract is (B, E) per-dimension similarity contributions
        # (starspace.py:70-98); the model's score is their sum — the reference
        # reaches the same (B, 1) via an axis=2 inner product.
        pos_sim = pos_sim.reshape(b, -1).sum(axis=1, keepdims=True)

        ctx_neg = context[:, 1:, :].reshape(b * self.num_neg, 1, e)
        tgt_neg = target[:, 1:, :].reshape(b * self.num_neg, 1, e)
        neg_sim = layer(jnp.concatenate([ctx_neg, tgt_neg], axis=1), training=training)
        neg_sim = neg_sim.reshape(b * self.num_neg, -1).sum(axis=1).reshape(b, self.num_neg)

        out = jnp.concatenate([pos_sim, neg_sim], axis=1)  # (B, 1+num_neg)
        return out.reshape(agg_b, 1)

    def predict(self, context_inputs: jnp.ndarray, target_inputs: jnp.ndarray,
                training: bool = False) -> jnp.ndarray:
        """Score a plain (context, target) pair: ``(B, 1, E) × 2 → (B, 1)``."""
        pair = jnp.concatenate([context_inputs, target_inputs], axis=1)
        layer = StarSpaceLayer(similarity=self.similarity, name="starspace")
        sim = layer(pair, training=training)
        b = context_inputs.shape[0]
        return sim.reshape(b, -1).sum(axis=1, keepdims=True)
