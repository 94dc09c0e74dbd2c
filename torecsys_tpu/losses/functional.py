"""Functional loss implementations (pure, jit-safe).

Parity with ``/root/reference/torecsys/losses/ltr/functional.py`` /
``losses/emb/functional.py``, plus the standard CTR criteria the reference
reaches via ``torch.nn.modules.loss`` name fallback
(``trainer/torecsys_pipeline.py:475-486``): BCE (logits and probability
variants) and MSE.

Every function takes raw arrays and returns per-example losses; reduction and
masking are applied by the wrappers in ``torecsys_tpu.losses`` (reference's
``apply_mask`` at ``losses/ltr/functional.py:10-22``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def apply_mask(loss: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Masked mean: mean of ``loss`` rows where ``mask`` is True.

    Reference: ``losses/ltr/functional.py:10-22``.
    """
    if mask is None:
        return jnp.mean(loss)
    m = mask.astype(loss.dtype)
    while m.ndim < loss.ndim:
        m = m[..., None]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(loss * m) / denom


def align_targets(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Reshape ``(B,)`` targets against ``(B, 1)`` predictions (and the
    reverse) so elementwise losses never silently broadcast ``(B, B)``."""
    if targets.shape != preds.shape and targets.size == preds.size:
        return targets.reshape(preds.shape)
    return targets


# ---- pointwise CTR criteria ------------------------------------------------

def binary_cross_entropy_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCE on logits (per-example)."""
    targets = targets.astype(logits.dtype)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def binary_cross_entropy(probs: jnp.ndarray, targets: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """BCE on probabilities (torch ``BCELoss`` semantics), per-example."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    targets = targets.astype(p.dtype)
    return -(targets * jnp.log(p) + (1.0 - targets) * jnp.log(1.0 - p))


def mean_squared_error(preds: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Squared error, per-example (torch ``MSELoss`` with reduction applied later)."""
    return jnp.square(preds - targets.astype(preds.dtype))


# ---- learning-to-rank ------------------------------------------------------

def pointwise_logistic_ranking_loss(pos: jnp.ndarray, neg: jnp.ndarray) -> jnp.ndarray:
    """``(1 − σ(pos)) + σ(neg)`` — reference ``losses/ltr/functional.py:25``."""
    return (1.0 - jax.nn.sigmoid(pos)) + jax.nn.sigmoid(neg)


def bayesian_personalized_ranking_loss(pos: jnp.ndarray, neg: jnp.ndarray) -> jnp.ndarray:
    """BPR: ``−log σ(pos − neg)`` — reference ``functional.py:40``.

    Implemented as softplus(neg − pos) for numerical stability.
    """
    return jax.nn.softplus(neg - pos)

def hinge_loss(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """``max(0, margin − pos + neg)`` — reference ``functional.py:61``."""
    return jnp.maximum(0.0, margin - pos + neg)


def adaptive_hinge_loss(pos: jnp.ndarray, negs: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """WARP-style hinge against the hardest negative — reference ``functional.py:80``.

    Args:
        pos: ``(B, 1)`` positive scores.
        negs: ``(B, K)`` scores of K sampled negatives per example.
    """
    hardest = jnp.max(negs, axis=-1, keepdims=True)
    return hinge_loss(pos, hardest, margin)


def margin_ranking_loss(pos: jnp.ndarray, neg: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """torch ``MarginRankingLoss`` with target=1: ``max(0, −(pos−neg) + margin)``.

    Reference triplet parser: ``losses/ltr/functional.py:102``.
    """
    return jnp.maximum(0.0, margin - (pos - neg))


def soft_margin_loss(pos: jnp.ndarray, neg: jnp.ndarray) -> jnp.ndarray:
    """torch ``SoftMarginLoss`` with target=1 on (pos−neg): ``log(1+exp(−x))``.

    Reference triplet parser: ``losses/ltr/functional.py:124``.
    """
    return jax.nn.softplus(-(pos - neg))


def listnet_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """ListNet top-1 cross entropy: ``−Σ softmax(y)·log softmax(ŷ)`` per list.

    Reference: ``losses/ltr/functional.py:145``.

    Args:
        y_true: ``(B, L)`` relevance scores.
        y_pred: ``(B, L)`` predicted scores.
        mask: ``(B, L)`` valid-position mask.
    """
    if mask is not None:
        neg = jnp.asarray(-1e9, dtype=y_pred.dtype)
        y_true = jnp.where(mask, y_true, neg)
        y_pred = jnp.where(mask, y_pred, neg)
    p_true = jax.nn.softmax(y_true, axis=-1)
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    if mask is not None:
        logp = jnp.where(mask, logp, 0.0)
        p_true = jnp.where(mask, p_true, 0.0)
    return -jnp.sum(p_true * logp, axis=-1)


# ---- embedding -------------------------------------------------------------

def skip_gram_loss(content: jnp.ndarray, pos: jnp.ndarray, negs: jnp.ndarray) -> jnp.ndarray:
    """Skip-gram negative sampling: ``−(log σ(c·p) + Σ log σ(−c·n))``.

    Reference: ``losses/emb/functional.py:10``.

    Args:
        content: ``(B, E)`` center/context embedding.
        pos: ``(B, E)`` positive target embedding.
        negs: ``(B, K, E)`` negative target embeddings.
    """
    pos_score = jnp.sum(content * pos, axis=-1)  # (B,)
    neg_score = jnp.einsum("be,bke->bk", content, negs)  # (B, K)
    pos_term = jax.nn.log_sigmoid(pos_score)
    neg_term = jnp.sum(jax.nn.log_sigmoid(-neg_score), axis=-1)
    return -(pos_term + neg_term)
