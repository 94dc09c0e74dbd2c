"""Functional ranking / regression metrics.

Parity: ``/root/reference/torecsys/metrics/functional.py`` (mse ``:5``,
MAP@k/MAR@k ``:9-92``, DCG/IDCG/NDCG ``:94-123``), re-expressed as vectorised
jnp ops on fixed-shape arrays (ids padded with ``-1`` are ignored — the
static-shape replacement for the reference's variable-length python lists).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def mse(y_pred: jnp.ndarray, y_true: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error.  Reference: ``metrics/functional.py:5``."""
    return jnp.mean(jnp.square(y_pred - y_true))


def _hits(rec_ids: jnp.ndarray, rel_ids: jnp.ndarray) -> jnp.ndarray:
    """``(B, K) x (B, R) → (B, K)`` 1.0 where a recommended id is relevant.

    Padding convention: id ``< 0`` is a pad slot (never matches).
    """
    eq = rec_ids[:, :, None] == rel_ids[:, None, :]  # (B, K, R)
    valid = (rec_ids >= 0)[:, :, None] & (rel_ids >= 0)[:, None, :]
    return jnp.any(eq & valid, axis=-1).astype(jnp.float32)


def mean_average_precision_at_k(
    rec_ids: jnp.ndarray, rel_ids: jnp.ndarray, k: int
) -> jnp.ndarray:
    """MAP@k over a batch of recommendation lists.

    Reference: ``metrics/functional.py:9-50`` (with de-dup of repeated recs —
    here lists are assumed de-duplicated by the producer, the TPU-side
    contract).

    Args:
        rec_ids: ``(B, >=k)`` recommended ids, best first, ``-1`` padded.
        rel_ids: ``(B, R)`` relevant ids, ``-1`` padded.
    """
    rec_ids = rec_ids[:, :k]
    hits = _hits(rec_ids, rel_ids)  # (B, k)
    cum_hits = jnp.cumsum(hits, axis=1)
    ranks = jnp.arange(1, hits.shape[1] + 1, dtype=jnp.float32)[None, :]
    precision_at_i = cum_hits / ranks
    num_rel = jnp.maximum(jnp.sum((rel_ids >= 0).astype(jnp.float32), axis=1), 1.0)
    ap = jnp.sum(precision_at_i * hits, axis=1) / jnp.minimum(num_rel, float(k))
    return jnp.mean(ap)


def mean_average_recall_at_k(
    rec_ids: jnp.ndarray, rel_ids: jnp.ndarray, k: int
) -> jnp.ndarray:
    """MAR@k over a batch.  Reference: ``metrics/functional.py:52-92``."""
    rec_ids = rec_ids[:, :k]
    hits = _hits(rec_ids, rel_ids)
    num_rel = jnp.maximum(jnp.sum((rel_ids >= 0).astype(jnp.float32), axis=1), 1.0)
    recall = jnp.sum(hits, axis=1) / num_rel
    return jnp.mean(recall)


def discounted_cumulative_gain(
    relevance: jnp.ndarray, k: Optional[int] = None, exp: bool = True
) -> jnp.ndarray:
    """DCG@k per list: ``Σ gain_i / log2(i+1)``.

    Reference: ``metrics/functional.py:94-105`` with exp2 / identity gains.

    Args:
        relevance: ``(B, L)`` graded relevance in rank order.
    """
    if k is not None:
        relevance = relevance[:, :k]
    gains = jnp.exp2(relevance) - 1.0 if exp else relevance
    discounts = 1.0 / jnp.log2(jnp.arange(2, relevance.shape[1] + 2, dtype=jnp.float32))
    return jnp.sum(gains * discounts[None, :], axis=1)


def ideal_discounted_cumulative_gain(
    relevance: jnp.ndarray, k: Optional[int] = None, exp: bool = True
) -> jnp.ndarray:
    """IDCG@k: DCG of the descending-sorted relevance.

    Reference: ``metrics/functional.py:107-113``.
    """
    ideal = jnp.sort(relevance, axis=1)[:, ::-1]
    return discounted_cumulative_gain(ideal, k=k, exp=exp)


def normalized_discounted_cumulative_gain(
    relevance: jnp.ndarray, k: Optional[int] = None, exp: bool = True
) -> jnp.ndarray:
    """NDCG@k averaged over the batch.  Reference: ``metrics/functional.py:115-123``."""
    dcg = discounted_cumulative_gain(relevance, k=k, exp=exp)
    idcg = ideal_discounted_cumulative_gain(relevance, k=k, exp=exp)
    return jnp.mean(dcg / jnp.maximum(idcg, 1e-12))


def novelty_score(
    rec_ids: jnp.ndarray, occurrence: jnp.ndarray, num_users: int
) -> jnp.ndarray:
    """Mean self-information ``−log2(occurrence/num_users)`` of recommended items.

    Reference: ``metrics/novelty.py:9-51``.

    Args:
        rec_ids: ``(B, K)`` recommended item ids (``-1`` padded).
        occurrence: ``(V,)`` per-item occurrence counts.
        num_users: total number of users.
    """
    safe_ids = jnp.maximum(rec_ids, 0)
    occ = jnp.take(occurrence, safe_ids)  # (B, K)
    p = jnp.clip(occ.astype(jnp.float32) / float(num_users), 1e-12, 1.0)
    info = -jnp.log2(p)
    valid = (rec_ids >= 0).astype(jnp.float32)
    return jnp.sum(info * valid) / jnp.maximum(jnp.sum(valid), 1.0)
