"""Utility helpers shared across the framework.

Capability parity with the reference's ``torecsys/utils`` package
(``/root/reference/torecsys/utils/__init__.py:9`` ``get_reduction``;
``/root/reference/torecsys/utils/operations.py`` tensor ops), re-designed for
JAX: every helper here is a pure function that is safe to call inside a
``jax.jit`` trace.
"""

from torecsys_tpu.utils.decorator import deprecated, in_development, not_jittable
from torecsys_tpu.utils.logging import TqdmHandler
from torecsys_tpu.utils.operations import (
    combination,
    dummy_attention,
    inner_product_similarity,
    pair_indices,
    regularize,
    replicate_tensor,
    show_attention,
    squash,
)

__all__ = [
    "TqdmHandler",
    "combination",
    "deprecated",
    "in_development",
    "not_jittable",
    "dummy_attention",
    "get_reduction",
    "inner_product_similarity",
    "pair_indices",
    "regularize",
    "replicate_tensor",
    "show_attention",
    "squash",
]


def get_reduction(method):
    """Resolve a reduction by name to a callable, mirroring the reference's
    ``get_reduction`` (``/root/reference/torecsys/utils/__init__.py:9-32``)
    which mapped strings to ``torch`` reduction functions.

    Args:
        method: one of ``'mean'|'sum'|'none'`` or an already-callable
            reduction ``fn(x) -> scalar-or-x``.

    Returns:
        Callable applying the reduction to a ``jnp.ndarray``.
    """
    import jax.numpy as jnp

    if callable(method):
        return method
    if method in ("mean", "avg"):
        return jnp.mean
    if method == "sum":
        return jnp.sum
    if method in ("none", None):
        return lambda x: x
    raise ValueError(f"unknown reduction: {method!r}")
