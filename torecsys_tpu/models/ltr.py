"""Learning-to-rank models: the pairwise wrapper and PRM re-ranking.

Parity:
* LearningToRankWrapper — ``/root/reference/torecsys/models/ltr/learning_to_rank_wrapper.py:10-58``
* PersonalizedReRankingModel — ``models/ltr/personalized_reranking.py:10-181``
  (position embedding → input FC → n × (MHA + BN residual, FF + BN residual)
  transformer encoder → FC → softmax over the list)
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.ctr import PositionEmbeddingLayer
from torecsys_tpu.models.base import LtrBaseModel, register_model


@register_model("LTRWrapper")
class LearningToRankWrapper(LtrBaseModel):
    """Runs the wrapped scoring model on positive and negative input dicts.

    ``__call__(pos_inputs: dict, neg_inputs: dict) →
    {'pos_outputs': ..., 'neg_outputs': ...}`` — exactly the reference's
    contract; ``predict`` scores a single input dict.
    """

    model: nn.Module

    @nn.compact
    def __call__(self, pos_inputs: Dict[str, jnp.ndarray],
                 neg_inputs: Dict[str, jnp.ndarray],
                 training: bool = False) -> Dict[str, jnp.ndarray]:
        return {
            "pos_outputs": self.model(**pos_inputs, training=training),
            "neg_outputs": self.model(**neg_inputs, training=training),
        }

    def predict(self, inputs: Dict[str, jnp.ndarray], training: bool = False) -> jnp.ndarray:
        return self.model(**inputs, training=training)


@register_model("PRM", "PersonalizedReRanking")
class PersonalizedReRankingModel(LtrBaseModel):
    """PRM: transformer encoder over a ranked list → per-position softmax.

    ``(feat_inputs (B, L, E)) → (B, L)`` re-ranking scores (softmax over L).
    """

    embed_size: int
    max_num_position: int
    encoding_size: int = 32
    num_encoder_layers: int = 2
    num_heads: int = 2
    ff_hidden_size: int = 64
    dropout_rate: float = 0.0
    use_position_embedding: bool = True
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, feat_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = feat_inputs  # (B, L, E)
        if self.use_position_embedding:
            x = PositionEmbeddingLayer(
                max_num_position=self.max_num_position, name="position_embedding"
            )(x, training=training)
        x = pdense(self.encoding_size, name="input_fc")(x)  # (B, L, D)

        for i in range(self.num_encoder_layers):
            from torecsys_tpu.layers.precision import mha_dtype

            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads,
                qkv_features=self.encoding_size,
                dropout_rate=self.dropout_rate,
                deterministic=not training,
                dtype=mha_dtype(),
                name=f"mha_{i}",
            )(x, x)
            # post-norm residuals with BatchNorm, per the reference's
            # AttentionBatchNorm / FNNBatchNorm (personalized_reranking.py:96-181)
            x = nn.BatchNorm(use_running_average=not training, name=f"attn_bn_{i}")(
                x + attn
            )
            ff = pdense(self.ff_hidden_size, name=f"ff1_{i}")(x)
            ff = self.activation(ff)
            ff = pdense(self.encoding_size, name=f"ff2_{i}")(ff)
            x = nn.BatchNorm(use_running_average=not training, name=f"ff_bn_{i}")(x + ff)

        out = pdense(1, name="output_fc")(x)  # (B, L, 1)
        out = out[..., 0]  # (B, L)
        return nn.softmax(out, axis=-1)
