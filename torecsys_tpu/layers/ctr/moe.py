"""Mixture-of-experts layer.

Parity: ``/root/reference/torecsys/layers/ctr/mixture_of_experts.py:9-162`` —
N constructor-injected expert modules plus ``num_gates`` softmax gates; the
output is the gate-weighted concat of expert outputs, one row per gate.

TPU design: experts run densely and are stacked along a new axis so the whole
layer is a handful of batched matmuls (for the MMoE scale of this domain —
a few experts, each a small MLP — dense beats routed dispatch).  Routed
expert-parallelism over a mesh axis is a placement concern handled by
``torecsys_tpu.parallel`` when expert counts warrant it.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.linen as nn

from torecsys_tpu.layers.precision import Dense as pdense
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer


class MixtureOfExpertsLayer(BaseLayer):
    """Gated mixture of experts.

    ``(B, N, E) → (B, num_gates, num_experts·O)`` where O is each expert's
    output size (experts must agree on O — the reference concatenates expert
    outputs the same way, ``mixture_of_experts.py:142-160``).

    Args:
        expert_factory: zero-arg callable returning a fresh expert module;
            each expert maps the flattened ``(B, N·E)`` features to ``(B, O)``
            (mirrors the reference's injected ``expert_func`` + kwargs).
        num_experts: number of experts.
        num_gates: number of gates (tasks for MMoE).
    """

    expert_factory: Callable[[], nn.Module]
    num_experts: int
    num_gates: int = 1

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b = emb_inputs.shape[0]
        flat = emb_inputs.reshape(b, -1)  # (B, N*E)

        expert_outs = []
        for i in range(self.num_experts):
            expert = self.expert_factory()
            out = expert(emb_inputs, training=training)
            expert_outs.append(out.reshape(b, -1))
        experts = jnp.stack(expert_outs, axis=1)  # (B, K, O)

        gates = pdense(self.num_experts * self.num_gates, name="gate")(flat)
        gates = nn.softmax(gates.reshape(b, self.num_gates, self.num_experts), axis=-1)

        # (B, G, K) x (B, K, O) -> (B, G, K, O), gate-weighted expert outputs
        weighted = gates[..., None] * experts[:, None, :, :]
        return weighted.reshape(b, self.num_gates, -1)
