"""Compressed Interaction Network (xDeepFM CIN).

Parity: ``/root/reference/torecsys/layers/ctr/compress_interaction_network.py:9-184``
— per layer the outer product ``x^{k-1} ⊗ x^0`` (per embedding column) is
compressed by a 1×1 conv, with ``direct`` and split-half variants, optional
batch-norm + activation, and a final sum-over-E + Dense head.

TPU design: the outer-product-and-compress step is ONE einsum
(``bhe,bne,ohn->boe`` — a batched MXU matmul per embedding column) instead of
the reference's materialized ``(B, H·N, E)`` tensor + Conv1d.
"""

from __future__ import annotations

from typing import Callable, Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer
from torecsys_tpu.ops.interactions import cin_interaction


class CompressInteractionNetworkLayer(BaseLayer):
    """CIN: stacked compressed interactions with direct / split-half wiring.

    ``(B, N, E) → (B, output_size)``.

    Args:
        embed_size: E.
        num_fields: N.
        output_size: final Dense head width.
        layer_sizes: feature-map sizes H_k per CIN layer.
        is_direct: ``True`` = 'direct' variant (whole map is pooled AND fed
            forward); ``False`` = split-half (half pooled, half fed forward;
            last layer fully pooled).
        use_bias / use_batchnorm / activation: per-layer conv options.
    """

    embed_size: int
    num_fields: int
    output_size: int = 1
    layer_sizes: Tuple[int, ...] = (128, 128)
    is_direct: bool = False
    use_bias: bool = True
    use_batchnorm: bool = True
    activation: Callable[[jnp.ndarray], jnp.ndarray] = nn.relu

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x0 = emb_inputs  # (B, N, E)
        xk = x0
        pooled = []
        h_prev = self.num_fields
        for k, h in enumerate(self.layer_sizes):
            is_last = k == len(self.layer_sizes) - 1
            w = self.param(
                f"conv_{k}",
                nn.initializers.xavier_uniform(),
                (h, h_prev, self.num_fields),
            )
            z = cin_interaction(x0, xk, w)  # (B, h, E)
            if self.use_bias:
                b = self.param(f"bias_{k}", nn.initializers.zeros, (h, 1))
                z = z + b[None, :, :]
            if self.use_batchnorm:
                # momentum: flax 0.99 kept DELIBERATELY after measurement.
                # Torch BN's effective running-stats decay is 0.9, and
                # aligning (flax momentum=0.9) was hypothesized to close the
                # xDeepFM parity gap — measured on the parity protocol it
                # does the opposite (val AUC 0.5978/logloss 1.42 at 0.9 vs
                # 0.6702/0.7016 at 0.99, torch twin 0.6898/0.6755): the
                # faster EMA amplifies CIN's noisy per-channel stats at eval.
                # See PARITY.md "xDeepFM BN" note.
                z = nn.BatchNorm(use_running_average=not training,
                                 name=f"bn_{k}", axis=-2, momentum=0.99)(z)
            z = self.activation(z)
            if self.is_direct or is_last:
                pooled.append(z)
                xk = z
            else:
                half = h // 2
                pooled.append(z[:, :half, :])
                xk = z[:, half:, :]
                h = h - half
            h_prev = xk.shape[1]
        out = jnp.concatenate(pooled, axis=1)  # (B, ΣH, E)
        out = jnp.sum(out, axis=2)  # sum over embedding dim → (B, ΣH)
        return pdense(self.output_size, name="head")(out)
