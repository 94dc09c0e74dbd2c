"""Layer base class.

The reference's ``BaseLayer`` (``/root/reference/torecsys/layers/__init__.py:10-44``)
is an nn.Module ABC whose subclasses declare ``inputs_size`` / ``outputs_size``
dicts.  Under JAX shapes are static and checked by tracing, so the contract
here is lighter: every layer is a flax module whose docstring states the
``(B, N, E) → ...`` shape contract, and the optional ``inputs_size`` /
``outputs_size`` properties are kept for API familiarity where meaningful.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn


class BaseLayer(nn.Module):
    """Base class for all interaction layers (shape contracts in docstrings)."""

    @property
    def inputs_size(self) -> Optional[Dict[str, str]]:  # pragma: no cover
        return None

    @property
    def outputs_size(self) -> Optional[Dict[str, str]]:  # pragma: no cover
        return None
