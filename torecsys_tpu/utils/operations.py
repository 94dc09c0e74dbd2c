"""Pure tensor operations.

Parity surface: ``/root/reference/torecsys/utils/operations.py:16-211``
(``combination``, ``dummy_attention``, ``inner_product_similarity``,
``regularize``, ``replicate_tensor``, ``show_attention``, ``squash``).

Differences by design (documented in SURVEY.md §7):
  * ``regularize`` returns a *differentiable* penalty — the reference detached
    the result (``operations.py:85``), silently killing the gradient.
  * ``pair_indices`` is new: the precomputed (i<j) index pairs that replace the
    reference's Python double loops (FFM ``field_aware_factorization_machine.py:75-82``)
    with a single vectorised gather — the TPU-friendly formulation.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def combination(n: int, r: int) -> int:
    """Number of r-combinations of n items (nCr).

    Reference: ``utils/operations.py:16``.
    """
    return math.comb(n, r)


@lru_cache(maxsize=None)
def pair_indices(num_fields: int, offset: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Precomputed row/col indices of all (i, j) pairs with ``j >= i + offset``.

    Used by FM/FFM/AFM/PNN-style layers to turn O(N^2) Python pair loops into
    one gather + one fused elementwise op (SURVEY.md §7 key decisions).

    Returns:
        ``(rows, cols)`` int32 numpy arrays of length C(num_fields, 2) for
        ``offset=1``. Numpy (not jnp) so the result is a static constant under
        tracing.
    """
    rows, cols = [], []
    for i in range(num_fields):
        for j in range(i + offset, num_fields):
            rows.append(i)
            cols.append(j)
    return np.asarray(rows, dtype=np.int32), np.asarray(cols, dtype=np.int32)


def dummy_attention(key: jnp.ndarray, query: jnp.ndarray, value: jnp.ndarray):
    """Identity stand-in matching an attention call signature.

    Reference: ``utils/operations.py:33``. Returns ``(value, zeros_like_scores)``.
    """
    b, l = value.shape[0], value.shape[1]
    return value, jnp.zeros((b, l, l), dtype=value.dtype)


def inner_product_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Sum of elementwise products over ``axis`` (the StarSpace similarity).

    Reference: ``utils/operations.py:50``.
    """
    return jnp.sum(a * b, axis=axis)


def regularize(params, weight_decay: float = 0.01, norm: int = 2, key_filter: str = "kernel"):
    """Differentiable L-``norm`` penalty over parameters whose path contains
    ``key_filter``.

    Reference: ``utils/operations.py:65`` filtered on names containing
    ``"weight"`` and returned a **detached** scalar (``:85``) — a quirk fixed
    here: the returned scalar participates in autodiff, so the penalty
    actually regularizes. Flax kernels are named ``kernel``, hence the default
    filter; embedding tables (``embedding``) are excluded by default like the
    reference excluded biases.

    Args:
        params: a pytree (typically ``variables['params']``).
        weight_decay: multiplier.
        norm: p of the p-norm (1 or 2 typical).
        key_filter: substring a parameter's path must contain to be penalised.

    Returns:
        Scalar ``jnp`` penalty.
    """
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = jnp.asarray(0.0, dtype=jnp.float32)
    for path, leaf in leaves:
        path_str = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key_filter in path_str:
            total = total + jnp.sum(jnp.abs(leaf.astype(jnp.float32)) ** norm)
    return weight_decay * total


def replicate_tensor(x: jnp.ndarray, size: int, axis: int = 0) -> jnp.ndarray:
    """Repeat-interleave ``x`` ``size`` times along ``axis``.

    Reference: ``utils/operations.py:88`` (used by the LTR miner to align
    anchors with multiple negatives).
    """
    return jnp.repeat(x, size, axis=axis)


def show_attention(attentions: np.ndarray, x_axis=None, y_axis=None, save_dir: str | None = None):
    """Render an attention heat-map (host-side, matplotlib-gated).

    Reference: ``utils/operations.py:120-161``. Matplotlib is optional: if it
    is not installed this raises a clear ImportError instead of failing at
    import time.
    """
    try:
        import matplotlib.pyplot as plt
        import matplotlib.ticker as ticker
    except ImportError as e:  # pragma: no cover
        raise ImportError("show_attention requires matplotlib") from e

    attentions = np.asarray(attentions)
    if attentions.ndim != 2:
        raise ValueError(f"attentions must be 2-D, got {attentions.shape}")

    fig = plt.figure()
    ax = fig.add_subplot(111)
    cax = ax.matshow(attentions)
    fig.colorbar(cax)

    if x_axis is not None:
        labels = x_axis.split(",") if isinstance(x_axis, str) else list(x_axis)
        ax.set_xticklabels([""] + labels)
        ax.xaxis.set_major_locator(ticker.MultipleLocator(1))
    if y_axis is not None:
        labels = y_axis.split(",") if isinstance(y_axis, str) else list(y_axis)
        ax.set_yticklabels([""] + labels)
        ax.yaxis.set_major_locator(ticker.MultipleLocator(1))

    if save_dir is None:  # pragma: no cover
        plt.show()
    else:
        plt.savefig(save_dir)
    plt.close(fig)


def squash(x: jnp.ndarray, axis: int = -1, eps: float = 1e-9) -> jnp.ndarray:
    """Capsule-network squash non-linearity ``|x|^2/(1+|x|^2) * x/|x|``.

    Reference: ``utils/operations.py:164`` (used by DynamicRoutingLayer).
    ``eps`` guards the norm at zero so gradients stay finite under jit.
    """
    sq_norm = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    scale = sq_norm / (1.0 + sq_norm)
    return scale * x / jnp.sqrt(sq_norm + eps)
