"""Weight regularization as a differentiable loss term.

Parity: ``/root/reference/torecsys/layers/regularization.py:9-52`` — a p-norm
penalty over parameters whose name matches a filter.  The reference returns a
**detached** scalar (``utils/operations.py:85``), so its penalty never
actually regularized; here the penalty participates in autodiff (SURVEY.md §7
key decision).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from torecsys_tpu.utils.operations import regularize


@dataclasses.dataclass(frozen=True)
class Regularizer:
    """Callable config: ``reg(params) → scalar penalty``.

    Args:
        weight_decay: λ multiplier.
        norm: p of the p-norm.
        key_filter: substring a parameter path must contain to be penalised
            (flax dense kernels are named ``kernel``; the reference filtered
            on ``"weight"``, ``layers/regularization.py:38``).
    """

    weight_decay: float = 0.01
    norm: int = 2
    key_filter: str = "kernel"

    def __call__(self, params) -> jnp.ndarray:
        return regularize(
            params,
            weight_decay=self.weight_decay,
            norm=self.norm,
            key_filter=self.key_filter,
        )
