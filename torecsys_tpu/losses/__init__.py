"""Loss hierarchy: pointwise CTR criteria, LTR ranking losses, embedding losses.

Parity with ``/root/reference/torecsys/losses/`` (class hierarchy at
``losses/__init__.py:9``, ``losses/ltr/__init__.py:8``,
``losses/emb/__init__.py:8``).  Losses are thin dataclass wrappers over the
pure functions in :mod:`torecsys_tpu.losses.functional` — a loss instance is a
callable pytree-free config, safe to close over in a jitted train step.

The reference also resolves any ``torch.nn.modules.loss`` class by name
(``trainer/torecsys_pipeline.py:475-486``); the equivalent here is the
``LOSSES`` registry, which includes ``BCELoss`` / ``BCEWithLogitsLoss`` /
``MSELoss`` aliases so reference configs port verbatim.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Type

import jax.numpy as jnp

from torecsys_tpu.losses import functional as F
from torecsys_tpu.utils import get_reduction


class Loss:
    """Base loss.  Subclasses implement ``__call__`` returning a scalar."""


class RankingLoss(Loss):
    """Base for LTR losses: ``loss(pos_outputs, neg_outputs, mask=None)``."""


class EmbLoss(Loss):
    """Base for embedding losses."""


# ---- pointwise CTR criteria ------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BCEWithLogitsLoss(Loss):
    reduction: str = "mean"

    def __call__(self, preds, targets, mask=None):
        loss = F.binary_cross_entropy_with_logits(preds, F.align_targets(preds, targets))
        if mask is not None:
            return F.apply_mask(loss, mask)
        return get_reduction(self.reduction)(loss)


@dataclasses.dataclass(frozen=True)
class BCELoss(Loss):
    reduction: str = "mean"

    def __call__(self, preds, targets, mask=None):
        loss = F.binary_cross_entropy(preds, F.align_targets(preds, targets))
        if mask is not None:
            return F.apply_mask(loss, mask)
        return get_reduction(self.reduction)(loss)


@dataclasses.dataclass(frozen=True)
class MSELoss(Loss):
    reduction: str = "mean"

    def __call__(self, preds, targets, mask=None):
        loss = F.mean_squared_error(preds, F.align_targets(preds, targets))
        if mask is not None:
            return F.apply_mask(loss, mask)
        return get_reduction(self.reduction)(loss)


# ---- LTR: pointwise / pairwise / groupwise --------------------------------

@dataclasses.dataclass(frozen=True)
class PointwiseLogisticLoss(RankingLoss):
    """Reference: ``losses/ltr/pointwise_ranking_loss.py:21-47``."""

    def __call__(self, pos, neg, mask=None):
        return F.apply_mask(F.pointwise_logistic_ranking_loss(pos, neg), mask)


@dataclasses.dataclass(frozen=True)
class BayesianPersonalizedRankingLoss(RankingLoss):
    """Reference: ``losses/ltr/pairwise_ranking_loss.py:25-65``."""

    def __call__(self, pos, neg, mask=None):
        return F.apply_mask(F.bayesian_personalized_ranking_loss(pos, neg), mask)


@dataclasses.dataclass(frozen=True)
class HingeLoss(RankingLoss):
    """Reference: ``losses/ltr/pairwise_ranking_loss.py:68-105``."""

    margin: float = 1.0

    def __call__(self, pos, neg, mask=None):
        return F.apply_mask(F.hinge_loss(pos, neg, self.margin), mask)


@dataclasses.dataclass(frozen=True)
class AdaptiveHingeLoss(RankingLoss):
    """WARP-style hinge vs the hardest negative.

    Reference: ``losses/ltr/pairwise_ranking_loss.py:108-153``.
    """

    margin: float = 1.0

    def __call__(self, pos, negs, mask=None):
        return F.apply_mask(F.adaptive_hinge_loss(pos, negs, self.margin), mask)


@dataclasses.dataclass(frozen=True)
class TripletLoss(RankingLoss):
    """Margin / soft-margin ranking adapter.

    Reference: ``losses/ltr/pairwise_ranking_loss.py:156-212`` (wraps torch's
    MarginRankingLoss or SoftMarginLoss depending on ``margin``).
    """

    margin: Optional[float] = 1.0

    def __call__(self, pos, neg, mask=None):
        if self.margin is None:
            loss = F.soft_margin_loss(pos, neg)
        else:
            loss = F.margin_ranking_loss(pos, neg, self.margin)
        return F.apply_mask(loss, mask)


@dataclasses.dataclass(frozen=True)
class ListnetLoss(RankingLoss):
    """Groupwise ListNet top-1 cross-entropy.

    Reference: ``losses/ltr/groupwise_ranking_loss.py:20-59``.

    ``groupwise = True`` routes the LTR train step through the listwise
    assembly (per-anchor ``[pos | negs]`` score lists with one-hot
    relevance) instead of the pairwise pos/neg split
    (``train.steps.make_train_step``).
    """

    groupwise = True

    def __call__(self, y_true, y_pred, mask=None):
        loss = F.listnet_loss(y_true, y_pred, mask)
        return jnp.mean(loss)


# ---- embedding -------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SkipGramLoss(EmbLoss):
    """Reference: ``losses/emb/skipgram.py:7-43``."""

    def __call__(self, content, pos, negs, mask=None):
        return F.apply_mask(F.skip_gram_loss(content, pos, negs), mask)


# ---- registry --------------------------------------------------------------

LOSSES: Dict[str, Type[Loss]] = {
    "AdaptiveHingeLoss": AdaptiveHingeLoss,
    "BCELoss": BCELoss,
    "BCEWithLogitsLoss": BCEWithLogitsLoss,
    "BayesianPersonalizedRankingLoss": BayesianPersonalizedRankingLoss,
    "HingeLoss": HingeLoss,
    "ListnetLoss": ListnetLoss,
    "MSELoss": MSELoss,
    "PointwiseLogisticLoss": PointwiseLogisticLoss,
    "SkipGramLoss": SkipGramLoss,
    "TripletLoss": TripletLoss,
}


def get_loss(name_or_loss, **kwargs):
    """Resolve a loss by registry name (mirrors the reference's getattr
    dispatch, ``trainer/torecsys_pipeline.py:476-478``)."""
    if isinstance(name_or_loss, Loss) or callable(name_or_loss) and not isinstance(name_or_loss, str):
        return name_or_loss
    if name_or_loss not in LOSSES:
        raise KeyError(f"unknown loss {name_or_loss!r}; available: {sorted(LOSSES)}")
    return LOSSES[name_or_loss](**kwargs)


__all__ = [
    "AdaptiveHingeLoss",
    "BCELoss",
    "BCEWithLogitsLoss",
    "BayesianPersonalizedRankingLoss",
    "EmbLoss",
    "HingeLoss",
    "ListnetLoss",
    "LOSSES",
    "Loss",
    "MSELoss",
    "PointwiseLogisticLoss",
    "RankingLoss",
    "SkipGramLoss",
    "TripletLoss",
    "functional",
    "get_loss",
]
