"""FiBiNET: feature-importance (SENET) + bilinear feature interactions.

Parity: ``/root/reference/torecsys/models/ctr/feature_importance_and_bilinear_feature_interaction_network.py:11-111``
— SENET re-weighting, bilinear interaction on both raw and SENET-weighted
embeddings, concat → DNN head.
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.layers.ctr import (
    BilinearInteractionLayer,
    ComposeExcitationNetworkLayer,
    MultilayerPerceptionLayer,
)
from torecsys_tpu.models.base import CtrBaseModel, register_model


@register_model("FiBiNET")
class FeatureImportanceAndBilinearFeatureInteractionNetwork(CtrBaseModel):
    """SENET ∥ raw → 2× bilinear interaction → concat → DNN → ``(B, output_size)``."""

    num_fields: int
    embed_size: int
    senet_reduction: int = 1
    deep_output_size: int = 1
    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    bilinear_type: str = "all"
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = emb_inputs.shape[0]
        senet_emb = ComposeExcitationNetworkLayer(
            num_fields=self.num_fields,
            reduction=self.senet_reduction,
            squared=False,
            name="senet",
        )(emb_inputs, training=training)
        emb_bi = BilinearInteractionLayer(
            num_fields=self.num_fields,
            embed_size=self.embed_size,
            bilinear_type=self.bilinear_type,
            name="emb_bilinear",
        )(emb_inputs, training=training)  # (B, P, E)
        senet_bi = BilinearInteractionLayer(
            num_fields=self.num_fields,
            embed_size=self.embed_size,
            bilinear_type=self.bilinear_type,
            name="senet_bilinear",
        )(senet_emb, training=training)
        cat = jnp.concatenate(
            [emb_bi.reshape(b, -1), senet_bi.reshape(b, -1)], axis=1
        )
        return MultilayerPerceptionLayer(
            output_size=self.deep_output_size,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(cat, training=training)
