"""Model base class and name registry.

Parity: the reference's ``BaseModel`` (``/root/reference/torecsys/models/__init__.py:9``)
and ``CtrBaseModel`` (``models/ctr/__init__.py:8``); model resolution by name
mirrors the reference's ``getattr(torecsys.models, name)`` dispatch
(``trainer/torecsys_pipeline.py:189``) but uses an explicit decorator-filled
registry (SURVEY.md §2.8 design note).

Convention (matching the reference): models return **raw scores** of shape
``(B, 1)`` (or a tuple for multi-output models); only
``LogisticRegressionModel`` applies a sigmoid itself
(``models/ctr/logistic_regression.py:30-62``). Criteria decide whether they
expect logits or probabilities.
"""

from __future__ import annotations

from typing import Callable, Dict, Type

import flax.linen as nn

MODELS: Dict[str, Type[nn.Module]] = {}


def register_model(*names: str) -> Callable[[Type[nn.Module]], Type[nn.Module]]:
    """Class decorator adding a model (and its aliases) to the registry."""

    def wrap(cls: Type[nn.Module]) -> Type[nn.Module]:
        for name in (cls.__name__, *names):
            MODELS[name] = cls
        return cls

    return wrap


def get_model(name_or_model, **kwargs):
    """Resolve a model by registry name or pass an instance through."""
    if isinstance(name_or_model, nn.Module):
        return name_or_model
    if name_or_model not in MODELS:
        raise KeyError(f"unknown model {name_or_model!r}; available: {sorted(MODELS)}")
    return MODELS[name_or_model](**kwargs)


class BaseModel(nn.Module):
    """Base class for all models (CTR / embedding / LTR)."""


class CtrBaseModel(BaseModel):
    """Base class for CTR models — ``__call__(**inputs) → (B, 1)`` raw scores."""

    # True on models whose outputs are already probabilities (LR, ESMM, ...);
    # eval skips the sigmoid for those.  Plain class attr (not a dataclass field).
    outputs_probability = False


class EmbBaseModel(BaseModel):
    """Base class for embedding models."""


class LtrBaseModel(BaseModel):
    """Base class for learning-to-rank models."""
