"""Product-based interaction layers (PNN): inner and outer product networks.

Parity:
* Inner — ``/root/reference/torecsys/layers/ctr/inner_product_network.py:8-79``
* Outer — ``/root/reference/torecsys/layers/ctr/outer_product_network.py:9-131``
  (kernel types ``mat | vec | num``, xavier-init kernel parameter)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer
from torecsys_tpu.ops.interactions import inner_product_pairs, outer_product_pairs
from torecsys_tpu.utils.operations import combination


class InnerProductNetworkLayer(BaseLayer):
    """Pairwise inner products ``<v_i, v_j>`` for i<j.

    ``(B, N, E) → (B, C(N,2))``.
    """

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        return inner_product_pairs(emb_inputs)


class OuterProductNetworkLayer(BaseLayer):
    """Kernel-compressed pairwise outer products.

    ``(B, N, E) → (B, C(N,2))`` with a learned kernel of type
    ``mat`` (E, P, E) | ``vec`` (P, E) | ``num`` (P, 1).
    """

    num_fields: int
    embed_size: int
    kernel_type: str = "mat"

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        p = combination(self.num_fields, 2)
        if self.kernel_type == "mat":
            shape = (self.embed_size, p, self.embed_size)
        elif self.kernel_type == "vec":
            shape = (p, self.embed_size)
        elif self.kernel_type == "num":
            shape = (p, 1)
        else:
            raise ValueError(f"unknown kernel_type {self.kernel_type!r}")
        kernel = self.param("kernel", nn.initializers.xavier_uniform(), shape)
        return outer_product_pairs(emb_inputs, kernel, self.kernel_type)
