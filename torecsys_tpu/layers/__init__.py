"""Reusable interaction blocks (flax modules with stated shape contracts).

Mirrors the reference's ``torecsys/layers`` package: 17 CTR layers, 2
embedding layers, and the regularizer; ``layers/ltr`` is an intentionally
empty placeholder there (``/root/reference/torecsys/layers/ltr/__init__.py:1-3``)
and has no counterpart here.
"""

from torecsys_tpu.layers.base import BaseLayer
from torecsys_tpu.layers.ctr import *  # noqa: F401,F403
from torecsys_tpu.layers.ctr import __all__ as _ctr_all
from torecsys_tpu.layers.emb import (
    GeneralizedMatrixFactorizationLayer,
    StarSpaceLayer,
)
from torecsys_tpu.layers.regularization import Regularizer

GMFLayer = GeneralizedMatrixFactorizationLayer

__all__ = list(_ctr_all) + [
    "BaseLayer",
    "GMFLayer",
    "GeneralizedMatrixFactorizationLayer",
    "Regularizer",
    "StarSpaceLayer",
]
