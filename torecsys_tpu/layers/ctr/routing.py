"""Dynamic routing (MIND behavior-to-interest capsules).

Parity: ``/root/reference/torecsys/layers/ctr/dynamic_routing.py:11-177`` —
shared projection S, routing-logit iterations with softmax + squash, and the
dynamic capsule count ``max(1, min(K, log2(N)))`` (``:79-89``).  Under XLA the
capsule count must be static, so it is resolved at construction time from the
static N (SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from torecsys_tpu.layers.base import BaseLayer
from torecsys_tpu.utils.operations import squash


def resolve_num_capsules(num_fields: int, max_num_caps: int) -> int:
    """The reference's dynamic interest count, resolved statically:
    ``max(1, min(K_max, int(log2(N))))`` (``dynamic_routing.py:79-89``)."""
    return max(1, min(max_num_caps, int(math.log2(max(num_fields, 2)))))


class DynamicRoutingLayer(BaseLayer):
    """B2I capsule routing: behaviors ``(B, N, E)`` → interests ``(B, K, O)``.

    Routing iterations run as a compile-time-unrolled loop (``num_iter`` is
    small and static); coupling logits are Gaussian-initialised per the
    reference and are **not** trained by gradient — each forward re-derives
    them from the routing iterations (stop-gradient on the agreement update,
    the standard capsule formulation).
    """

    embed_size: int
    routed_size: int
    max_num_caps: int
    num_fields: int
    num_iter: int = 3

    @nn.compact
    def __call__(self, emb_inputs: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        b, n, e = emb_inputs.shape
        k = resolve_num_capsules(self.num_fields, self.max_num_caps)
        s = self.param(
            "shared_projection",
            nn.initializers.xavier_uniform(),
            (e, self.routed_size),
        )
        u = jnp.einsum("bne,eo->bno", emb_inputs, s)  # (B, N, O) projected behaviors

        logits = self.param(
            "routing_logits", nn.initializers.normal(stddev=1.0), (1, k, n)
        )
        logits = jnp.broadcast_to(logits, (b, k, n))
        v = None
        for it in range(self.num_iter):
            c = nn.softmax(logits, axis=1)  # couple over capsules
            sv = jnp.einsum("bkn,bno->bko", c, u)
            v = squash(sv, axis=-1)  # (B, K, O)
            if it < self.num_iter - 1:
                agreement = jnp.einsum("bko,bno->bkn", v, jax.lax.stop_gradient(u))
                logits = logits + agreement
        return v
