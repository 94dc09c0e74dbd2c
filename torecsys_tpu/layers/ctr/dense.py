"""Dense tower layers: MLP (DNN) and Wide.

Parity:
* MLP  — ``/root/reference/torecsys/layers/ctr/multilayer_perceptron.py:9-84``
  (aliases DNNLayer / DenseLayer / FullyConnectLayer / FeedForwardLayer)
* Wide — ``/root/reference/torecsys/layers/ctr/wide.py:9-68``

Both operate on the trailing dim, so ``(B, E)`` and ``(B, N, E)`` inputs work
identically (matching the reference's Linear broadcasting).
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer


class MultilayerPerceptionLayer(BaseLayer):
    """Dense → activation → dropout stack with a linear output head.

    ``(B, [N,] E) → (B, [N,] output_size)``.
    """

    output_size: int
    layer_sizes: Tuple[int, ...] = ()
    dropout_rate: float = 0.0
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = inputs
        for i, size in enumerate(self.layer_sizes):
            x = pdense(size, name=f"dense_{i}")(x)
            x = self.activation(x)
            if self.dropout_rate > 0:
                x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return pdense(self.output_size, name="output")(x)


class WideLayer(BaseLayer):
    """Single linear layer (+ dropout): the 'wide' half of Wide&Deep.

    ``(B, [N,] E) → (B, [N,] output_size)``.
    """

    output_size: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = pdense(self.output_size, name="linear")(inputs)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not training)(x)
        return x
