"""Cross / bilinear interaction layers: DCN cross network, residual bilinear
stack, and FiBiNET bilinear pairwise interaction.

Parity:
* CrossNetworkLayer — ``/root/reference/torecsys/layers/ctr/cross_network.py:9-87``.
  The reference detaches the running tensor at ``:65`` (a gradient-killing
  quirk); per SURVEY.md §7 the true DCN-v1 recurrence
  ``x_{i+1} = x0 ⊙ (w·x_i) + b + x_i`` is implemented.
* BilinearNetworkLayer — ``/root/reference/torecsys/layers/ctr/bilinear.py:9-75``
  (same detach quirk at ``:60``; true residual implemented).
* BilinearInteractionLayer — ``/root/reference/torecsys/layers/ctr/bilinear_interaction.py``
  (classes at :11/:82/:155; the reference leaves ``interaction`` type
  NotImplemented — implemented here for completeness).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer
from torecsys_tpu.ops.interactions import cross_layer
from torecsys_tpu.utils.operations import pair_indices


class CrossNetworkLayer(BaseLayer):
    """DCN-v1 cross network: ``num_layers`` steps of the cross recurrence.

    ``(B, N, E) → (B, N, E)`` — the recurrence runs on the flattened
    ``(B, N·E)`` feature vector (the DCN formulation) and reshapes back, so
    the layer keeps the reference's shape contract.
    """

    num_layers: int

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = emb_inputs.shape[0]
        x0 = emb_inputs.reshape(b, -1)  # (B, D)
        d = x0.shape[1]
        x = x0
        for i in range(self.num_layers):
            w = self.param(f"weight_{i}", nn.initializers.xavier_uniform(), (d, 1))
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (d,))
            x = cross_layer(x0, x, w[:, 0], bias)
        return x.reshape(emb_inputs.shape)


class BilinearNetworkLayer(BaseLayer):
    """Residual bilinear stack: ``x ← bilinear_i(x0, x) + x0``.

    ``(B, N, E) → (B, N, E)`` on the flattened ``(B, N·E)`` vector; the
    bilinear form is ``y_o = x0ᵀ W_o x + b_o`` (torch ``nn.Bilinear``
    semantics) with output size D.
    """

    num_layers: int

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = emb_inputs.shape[0]
        x0 = emb_inputs.reshape(b, -1)
        d = x0.shape[1]
        x = x0
        for i in range(self.num_layers):
            w = self.param(
                f"weight_{i}", nn.initializers.normal(stddev=1.0 / d), (d, d, d)
            )
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (d,))
            x = jnp.einsum("bi,oij,bj->bo", x0, w, x) + bias + x0
        return x.reshape(emb_inputs.shape)


class FieldAllTypeBilinear(BaseLayer):
    """FiBiNET field-all bilinear: one shared ``W``; ``p_ij = (v_i·W) ⊙ v_j``.

    ``(B, N, E) → (B, C(N,2), E)``.
    """

    embed_size: int

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        n = emb_inputs.shape[1]
        rows, cols = pair_indices(n)
        w = self.param(
            "weight", nn.initializers.xavier_uniform(), (self.embed_size, self.embed_size)
        )
        projected = jnp.einsum("bne,ef->bnf", emb_inputs, w)
        return projected[:, rows, :] * emb_inputs[:, cols, :]


class FieldEachTypeBilinear(BaseLayer):
    """FiBiNET field-each bilinear: one ``W_i`` per (left) field.

    ``(B, N, E) → (B, C(N,2), E)``.
    """

    num_fields: int
    embed_size: int

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        n = self.num_fields
        rows, cols = pair_indices(n)
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (n, self.embed_size, self.embed_size),
        )
        projected = jnp.einsum("bne,nef->bnf", emb_inputs, w)
        return projected[:, rows, :] * emb_inputs[:, cols, :]


class FieldInteractionTypeBilinear(BaseLayer):
    """FiBiNET field-interaction bilinear: one ``W_ij`` per pair.

    ``(B, N, E) → (B, C(N,2), E)``.  (NotImplemented in the reference,
    ``bilinear_interaction.py``; provided here for the full FiBiNET paper
    surface.)
    """

    num_fields: int
    embed_size: int

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        n = self.num_fields
        rows, cols = pair_indices(n)
        p = len(rows)
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (p, self.embed_size, self.embed_size),
        )
        left = emb_inputs[:, rows, :]  # (B, P, E)
        right = emb_inputs[:, cols, :]
        return jnp.einsum("bpe,pef->bpf", left, w) * right


class BilinearInteractionLayer(BaseLayer):
    """Dispatcher over the three FiBiNET bilinear types.

    ``bilinear_type``: ``'all' | 'each' | 'interaction'``.
    ``(B, N, E) → (B, C(N,2), E)``.
    """

    num_fields: int
    embed_size: int
    bilinear_type: str = "all"

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if self.bilinear_type == "all":
            layer = FieldAllTypeBilinear(embed_size=self.embed_size, name="bilinear")
        elif self.bilinear_type == "each":
            layer = FieldEachTypeBilinear(
                num_fields=self.num_fields, embed_size=self.embed_size, name="bilinear"
            )
        elif self.bilinear_type == "interaction":
            layer = FieldInteractionTypeBilinear(
                num_fields=self.num_fields, embed_size=self.embed_size, name="bilinear"
            )
        else:
            raise ValueError(f"unknown bilinear_type {self.bilinear_type!r}")
        return layer(emb_inputs, training=training)
