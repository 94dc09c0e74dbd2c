"""Session-interest and position-bias models: DSIN and PAL.

Parity:
* DSIN — ``/root/reference/torecsys/models/ctr/deep_session_interest_network.py:10-141``
  (bias encoding → self-attention interest extractor → BiLSTM interest
  interaction → dual avg pooling → concat).  The reference is marked
  "TODO: [in development]" and has **no output head** — here
  ``use_output_head=True`` (default) adds the missing Dense → ``(B, 1)``
  scoring head so the model is trainable end-to-end; ``False`` reproduces the
  reference's ``(B, 2·E)`` feature output.
* PAL  — ``models/ctr/position_bias_aware_learning_framework.py:10-108``
  (wraps any pCTR model; multiplies it with a position-bias branch at train
  time, drops the branch at ``predict``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.ctr import (
    BiasEncodingLayer,
    MultilayerPerceptionLayer,
    PositionBiasAwareLearningFrameworkLayer,
)
from torecsys_tpu.models.base import CtrBaseModel, register_model
from torecsys_tpu.utils.decorator import in_development


@register_model("DSIN", "DeepSessionInterestNetwork")
@in_development(
    "the reference marks DSIN '[in development]' with no output head "
    "(deep_session_interest_network.py:10); this port ADDS an optional "
    "head (use_output_head) but keeps the status marker"
)
class DeepSessionInterestNetworkModel(CtrBaseModel):
    """DSIN over session behavior embeddings.

    ``__call__(session_embed_inputs (B, L, E), session_index (B,)) →
    (B, 1)`` (or ``(B, 2·E)`` features with ``use_output_head=False``).
    """

    embed_size: int
    max_num_session: int
    max_num_position: int
    extractor_num_heads: int = 1
    interacting_hidden_size: int = 16
    extractor_dropout: float = 0.0
    use_bias_encoding: bool = True
    use_output_head: bool = True

    @nn.compact
    def __call__(self, session_embed_inputs: jnp.ndarray, session_index: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        x = session_embed_inputs  # (B, L, E)
        if self.use_bias_encoding:
            x = BiasEncodingLayer(
                max_num_session=self.max_num_session,
                max_length=self.max_num_position,
                embed_size=self.embed_size,
                name="bias_encoding",
            )(x, session_index, training=training)

        # interest extractor: self-attention over the session
        from torecsys_tpu.layers.precision import mha_dtype

        extraction = nn.MultiHeadDotProductAttention(
            num_heads=self.extractor_num_heads,
            qkv_features=self.embed_size,
            dropout_rate=self.extractor_dropout,
            deterministic=not training,
            dtype=mha_dtype(),
            name="interest_extractor",
        )(x, x)  # (B, L, E)

        # interest interacting: BiLSTM over the extracted interests
        fwd = nn.RNN(nn.OptimizedLSTMCell(features=self.interacting_hidden_size))
        bwd = nn.RNN(nn.OptimizedLSTMCell(features=self.interacting_hidden_size))
        interaction = nn.Bidirectional(fwd, bwd, name="interest_interacting")(
            extraction
        )  # (B, L, 2·H)

        pooled_extraction = jnp.mean(extraction, axis=1)  # (B, E)
        pooled_interaction = jnp.mean(interaction, axis=1)  # (B, 2·H)
        features = jnp.concatenate([pooled_extraction, pooled_interaction], axis=1)
        if not self.use_output_head:
            return features
        return pdense(1, name="output_head")(features)


@register_model("PAL", "PositionBiasAwareLearningFramework")
class PositionBiasAwareLearningFrameworkModel(CtrBaseModel):
    """pCTR model ⊙ position-bias branch.

    ``__call__(pctr_inputs: dict, pos_inputs (B,)) → (B, 1)``; ``predict``
    runs the wrapped model alone (``position_bias_aware_learning_framework.py:89``).
    """

    pctr_model: nn.Module
    output_size: int = 1
    max_num_position: int = 128
    pos_layer_sizes: Tuple[int, ...] = (16,)
    pos_dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu
    outputs_probability = True

    @nn.compact
    def __call__(self, pctr_inputs, pos_inputs: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        pctr_out = self.pctr_model(**pctr_inputs, training=training)
        pos = PositionBiasAwareLearningFrameworkLayer(
            input_size=self.output_size,
            max_num_position=self.max_num_position,
            name="pos_embedding",
        )(pctr_out, pos_inputs, training=training)
        pos = MultilayerPerceptionLayer(
            output_size=1,
            layer_sizes=self.pos_layer_sizes,
            dropout_rate=self.pos_dropout_rate,
            activation=self.activation,
            name="pos_dense",
        )(pos, training=training)
        return nn.sigmoid(pos)

    def predict(self, pctr_inputs, training: bool = False) -> jnp.ndarray:
        """Inference path: position branch dropped."""
        return self.pctr_model(**pctr_inputs, training=training)
