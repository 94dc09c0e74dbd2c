"""Factorization-style interaction layers: FM, FFM, AFM.

Parity:
* FM  — ``/root/reference/torecsys/layers/ctr/factorization_machine.py:9-81``
* FFM — ``/root/reference/torecsys/layers/ctr/field_aware_factorization_machine.py:9-94``
  (the O(N²) Python pair loop at ``:75-82`` becomes one pair-index gather +
  one fused elementwise product — SURVEY.md §7)
* AFM — ``/root/reference/torecsys/layers/ctr/attentional_factorization_machine.py:9-120``
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer
from torecsys_tpu.ops.interactions import (
    afm_pairwise_products,
    ffm_pairwise_interaction,
    fm_pairwise_interaction,
)


class FactorizationMachineLayer(BaseLayer):
    """FM second-order interaction: ``0.5·((Σv)² − Σv²)``.

    ``(B, N, E) → (B, E)``.
    """

    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        out = fm_pairwise_interaction(emb_inputs)
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not training)(out)
        return out


class FieldAwareFactorizationMachineLayer(BaseLayer):
    """FFM interaction: ``e_{i,f_j} ⊙ e_{j,f_i}`` for all i<j.

    ``(B, N*N, E) → (B, C(N,2), E)``.
    """

    num_fields: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, field_emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        out = ffm_pairwise_interaction(field_emb_inputs, self.num_fields)
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not training)(out)
        return out


class AttentionalFactorizationMachineLayer(BaseLayer):
    """AFM: attention-weighted sum of pairwise Hadamard products.

    ``(B, N, E) → ((B, E), (B, C(N,2), 1))`` — returns the pooled interaction
    and the attention scores (reference returns both, ``:99-120``).
    """

    embed_size: int
    attn_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self, emb_inputs: jnp.ndarray, training: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        products = afm_pairwise_products(emb_inputs)  # (B, P, E)
        scores = pdense(self.attn_size, name="attn_w")(products)
        scores = nn.relu(scores)
        scores = pdense(1, name="attn_h")(scores)  # (B, P, 1)
        attn = nn.softmax(scores, axis=1)
        if self.dropout_rate > 0:
            attn = nn.Dropout(self.dropout_rate, deterministic=not training)(attn)
        out = jnp.sum(attn * products, axis=1)  # (B, E)
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not training)(out)
        return out, attn
