"""Deep field-aware models: DeepFFM (= FNFM) and FAT-DeepFFM.

Parity:
* DeepFFM     — ``/root/reference/torecsys/models/ctr/deep_ffm.py:11-128``
  (alias FieldAwareNeuralFactorizationMachine / FNFM)
* FAT-DeepFFM — ``models/ctr/fat_deep_ffm.py:11-109``
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.layers.ctr import (
    ComposeExcitationNetworkLayer,
    FieldAwareFactorizationMachineLayer,
    MultilayerPerceptionLayer,
)
from torecsys_tpu.models.base import CtrBaseModel, register_model


@register_model("DeepFFM", "FNFM", "FieldAwareNeuralFactorizationMachine")
class DeepFieldAwareFactorizationMachineModel(CtrBaseModel):
    """Σ field-emb first-order + Σ DNN(flatten(FFM)) → ``(B, 1)``."""

    num_fields: int
    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    ffm_dropout_rate: float = 0.0
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, field_emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = field_emb_inputs.shape[0]
        first = jnp.sum(field_emb_inputs, axis=(1, 2))[:, None]  # (B, 1)
        second = FieldAwareFactorizationMachineLayer(
            num_fields=self.num_fields, dropout_rate=self.ffm_dropout_rate, name="ffm"
        )(field_emb_inputs, training=training)  # (B, P, E)
        second = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(second.reshape(b, -1), training=training)
        return second + first


@register_model("FATDeepFFM", "FieldAttentiveDeepFieldAwareFactorizationMachine")
class FieldAttentiveDeepFieldAwareFactorizationMachineModel(CtrBaseModel):
    """CEN(field-emb) → (Σ attentive first-order) + DNN(flatten(FFM(attentive)))
    → ``(B, 1)``."""

    num_fields: int
    reduction: int = 1
    deep_layer_sizes: Tuple[int, ...] = (64, 64)
    ffm_dropout_rate: float = 0.0
    deep_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, field_emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = field_emb_inputs.shape[0]
        aem = ComposeExcitationNetworkLayer(
            num_fields=self.num_fields, reduction=self.reduction, squared=True, name="cen"
        )(field_emb_inputs, training=training)  # (B, N², E)
        first = jnp.sum(aem, axis=(1, 2))[:, None]  # (B, 1)
        second = FieldAwareFactorizationMachineLayer(
            num_fields=self.num_fields, dropout_rate=self.ffm_dropout_rate, name="ffm"
        )(aem, training=training)
        second = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.deep_layer_sizes,
            dropout_rate=self.deep_dropout_rate,
            activation=self.activation,
            name="deep",
        )(second.reshape(b, -1), training=training)
        return first + second
