"""Reference (jax.numpy) implementations of the interaction primitives.

These are the mathematical cores of the CTR layers — each is a pure function
on plain arrays with static shapes, written so XLA can tile them onto the
MXU/VPU (no Python pair loops; everything is one gather + one fused op).

Parity notes reference the PyTorch originals:
  * FM:   ``/root/reference/torecsys/layers/ctr/factorization_machine.py:57``
  * FFM:  ``/root/reference/torecsys/layers/ctr/field_aware_factorization_machine.py:75-82``
    (Python double loop -> precomputed pair-index gather here)
  * AFM:  ``/root/reference/torecsys/layers/ctr/attentional_factorization_machine.py:70-76``
  * CIN:  ``/root/reference/torecsys/layers/ctr/compress_interaction_network.py``
  * PNN:  ``/root/reference/torecsys/layers/ctr/inner_product_network.py`` /
    ``outer_product_network.py``
  * DCN:  ``/root/reference/torecsys/layers/ctr/cross_network.py`` (the
    reference detaches the residual at ``:65``; here the true DCN recurrence
    is used — SURVEY.md §7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from torecsys_tpu.utils.operations import pair_indices


def fm_pairwise_interaction(emb_inputs: jnp.ndarray, reduce_sum: bool = True) -> jnp.ndarray:
    """Factorization-machine second-order interaction.

    ``0.5 * ((sum_n v_n)^2 - sum_n v_n^2)`` over the field axis.

    Args:
        emb_inputs: ``(B, N, E)``.
        reduce_sum: if False, returns the per-dimension vector ``(B, E)``
            without summing over E (the reference always returns ``(B, E)``;
            models that need the scalar sum do it themselves).

    Returns:
        ``(B, E)`` interaction vector (or ``(B, 1)`` summed when
        ``reduce_sum`` is True at the model level — kept (B, E) here).
    """
    sum_sq = jnp.square(jnp.sum(emb_inputs, axis=1))
    sq_sum = jnp.sum(jnp.square(emb_inputs), axis=1)
    out = 0.5 * (sum_sq - sq_sum)
    return out


def ffm_pairwise_interaction(field_emb_inputs: jnp.ndarray, num_fields: int) -> jnp.ndarray:
    """Field-aware FM interaction over field-aware embeddings.

    Input layout matches the reference protocol: ``(B, N*N, E)`` where entry
    ``i*N + j`` is field ``j``'s embedding in field-``i``'s table, i.e. after
    reshape to ``(B, N, N, E)``, ``x[:, i, j]`` = e_{j, f_i}? — the reference
    reshapes to ``(B, Nx, Ny, E)`` and multiplies ``x[:, i, j] * x[:, j, i]``
    for i<j (``field_aware_factorization_machine.py:75-82``). The same math
    here is one gather over precomputed (i<j) pairs and one fused product.

    Args:
        field_emb_inputs: ``(B, N*N, E)``.
        num_fields: N (static).

    Returns:
        ``(B, C(N,2), E)`` elementwise products for each unordered pair.
    """
    b, nn, e = field_emb_inputs.shape
    n = num_fields
    assert nn == n * n, f"expected N*N={n * n} second dim, got {nn}"
    x = field_emb_inputs.reshape(b, n, n, e)
    rows, cols = pair_indices(n)
    left = x[:, rows, cols, :]   # e_{i, f_j} for i<j (row-major [i, j])
    right = x[:, cols, rows, :]  # e_{j, f_i}
    return left * right


def afm_pairwise_products(emb_inputs: jnp.ndarray) -> jnp.ndarray:
    """All (i<j) Hadamard products of field embeddings.

    Reference precomputes row/col indices the same way
    (``attentional_factorization_machine.py:70-76``).

    Args:
        emb_inputs: ``(B, N, E)``.

    Returns:
        ``(B, C(N,2), E)``.
    """
    n = emb_inputs.shape[1]
    rows, cols = pair_indices(n)
    return emb_inputs[:, rows, :] * emb_inputs[:, cols, :]


def inner_product_pairs(emb_inputs: jnp.ndarray) -> jnp.ndarray:
    """Pairwise inner products ``<v_i, v_j>`` for i<j.

    Reference: ``inner_product_network.py:8-79``.

    Args:
        emb_inputs: ``(B, N, E)``.

    Returns:
        ``(B, C(N,2))``.
    """
    n = emb_inputs.shape[1]
    rows, cols = pair_indices(n)
    # One batched matmul on the MXU then a pair gather beats a per-pair sum
    # when N is small (N^2 E flops, single dot_general).
    gram = jnp.einsum("bne,bme->bnm", emb_inputs, emb_inputs)
    return gram[:, rows, cols]


def outer_product_pairs(
    emb_inputs: jnp.ndarray, kernel: jnp.ndarray, kernel_type: str = "mat"
) -> jnp.ndarray:
    """Kernel-compressed pairwise outer products (PNN 'outer' mode).

    Reference: ``outer_product_network.py:9-131`` with kernel types
    ``mat | vec | num``.

    Args:
        emb_inputs: ``(B, N, E)``.
        kernel: ``(E, C(N,2), E)`` for ``mat``; ``(C(N,2), E)`` for ``vec``;
            ``(C(N,2), 1)`` for ``num``.
        kernel_type: one of ``'mat' | 'vec' | 'num'``.

    Returns:
        ``(B, C(N,2))``.
    """
    n = emb_inputs.shape[1]
    rows, cols = pair_indices(n)
    p = emb_inputs[:, rows, :]  # (B, P, E)
    q = emb_inputs[:, cols, :]  # (B, P, E)
    if kernel_type == "mat":
        # sum_e sum_f p_bpe K_epf q_bpf
        return jnp.einsum("bpe,epf,bpf->bp", p, kernel, q)
    if kernel_type == "vec":
        return jnp.einsum("bpe,pe->bp", p * q, kernel)
    if kernel_type == "num":
        return jnp.sum(p * q, axis=-1) * kernel.reshape(1, -1)
    raise ValueError(f"unknown kernel_type {kernel_type!r}")


def cross_layer(
    x0: jnp.ndarray, x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray
) -> jnp.ndarray:
    """One DCN cross layer: ``x' = x0 * (x . w) + b + x``.

    The true DCN-v1 recurrence (the reference detaches the running tensor,
    ``cross_network.py:65`` — intended math implemented per SURVEY.md §7).

    Args:
        x0: ``(B, D)`` the original input.
        x: ``(B, D)`` the running tensor.
        weight: ``(D,)``.
        bias: ``(D,)``.

    Returns:
        ``(B, D)``.
    """
    xw = jnp.einsum("bd,d->b", x, weight)  # (B,)
    return x0 * xw[:, None] + bias[None, :] + x


def cin_interaction(
    x0: jnp.ndarray, xk: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """One CIN (xDeepFM) compressed-interaction step.

    ``Z^{k} = x^{k-1} (x) x^{0}`` outer product per embedding dim, compressed
    by a 1x1 conv — expressed as a single einsum that XLA maps to one MXU
    matmul per embedding column.

    Reference: ``compress_interaction_network.py:9-184`` (Conv1d kernel_size=1
    over the flattened H_{k-1}*N channel axis).

    Args:
        x0: ``(B, N, E)`` the base embeddings.
        xk: ``(B, H, E)`` the previous CIN feature map.
        weight: ``(O, H, N)`` conv weights (out-channels O).

    Returns:
        ``(B, O, E)``.
    """
    # z_{b,h,n,e} = xk_{b,h,e} * x0_{b,n,e};  out_{b,o,e} = sum_{h,n} W_{o,h,n} z
    return jnp.einsum("bhe,bne,ohn->boe", xk, x0, weight)
