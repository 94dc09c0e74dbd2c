"""Field-attention and positional layers: SENET/CEN, bias encoding, position
embedding, and position-bias-aware learning (PAL).

Parity:
* ComposeExcitationNetworkLayer — ``/root/reference/torecsys/layers/ctr/compose_excitation_network.py:9-109``
  (aliases CENLayer / SENETLayer / SqueezeAndExcitationNetworkLayer; the
  ``squared`` flag selects N² (field-aware) vs N field counts, ``:62``)
* BiasEncodingLayer — ``/root/reference/torecsys/layers/ctr/bias_encoding.py:9-89`` (DSIN)
* PositionEmbeddingLayer — ``/root/reference/torecsys/layers/ctr/position_embedding.py:9-60`` (PRM)
* PositionBiasAwareLearningFrameworkLayer — ``/root/reference/torecsys/layers/ctr/positon_bias_aware_learning_framework.py:9-104``
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer


class ComposeExcitationNetworkLayer(BaseLayer):
    """SENET over fields: squeeze (mean-pool per field) → excitation MLP →
    re-weight embeddings.

    ``(B, M, E) → (B, M, E)`` where M = N (or N² with ``squared=True`` for
    field-aware embeddings — the caller passes M directly as ``num_fields``).
    """

    num_fields: int
    reduction: int = 1
    squared: bool = False

    @nn.compact
    def __call__(self, field_emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        m = self.num_fields ** 2 if self.squared else self.num_fields
        squeezed = jnp.mean(field_emb_inputs, axis=2)  # (B, M)
        attn = pdense(max(1, m // self.reduction), name="reduce")(squeezed)
        attn = nn.relu(attn)
        attn = pdense(m, name="expand")(attn)
        attn = nn.relu(attn)
        return field_emb_inputs * attn[..., None]


class BiasEncodingLayer(BaseLayer):
    """DSIN bias encoding: session + position + unit bias added to session
    embeddings.

    ``((B, L, E), (B,)) → (B, L, E)`` — the second input is the per-example
    session index used to gather the session bias.
    """

    max_num_session: int
    max_length: int
    embed_size: int

    @nn.compact
    def __call__(self, session_embs: jnp.ndarray, session_index: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        b_session = self.param(
            "session_bias", nn.initializers.normal(stddev=0.01), (self.max_num_session,)
        )
        b_position = self.param(
            "position_bias", nn.initializers.normal(stddev=0.01), (self.max_length,)
        )
        b_unit = self.param(
            "unit_bias", nn.initializers.normal(stddev=0.01), (self.embed_size,)
        )
        session = jnp.take(b_session, session_index.astype(jnp.int32))  # (B,)
        return (
            session_embs
            + session[:, None, None]
            + b_position[None, :, None]
            + b_unit[None, None, :]
        )


class PositionEmbeddingLayer(BaseLayer):
    """Learnable positional bias added over the list axis (PRM).

    ``(B, L, E) → (B, L, E)`` with a ``(1, L, 1)`` parameter (the reference's
    shape, ``position_embedding.py:9-60``).
    """

    max_num_position: int

    @nn.compact
    def __call__(self, session_embs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        bias = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.01),
            (1, self.max_num_position, 1),
        )
        return session_embs + bias


class PositionBiasAwareLearningFrameworkLayer(BaseLayer):
    """PAL: add a learned position-bias embedding (gathered by position id)
    to the feature vector.

    ``((B, E), (B,)) → (B, E)``.
    """

    input_size: int
    max_num_position: int

    @nn.compact
    def __call__(self, feature: jnp.ndarray, position: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        table = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.max_num_position, self.input_size),
        )
        return feature + jnp.take(table, position.astype(jnp.int32), axis=0)
