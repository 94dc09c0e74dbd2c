"""Sequential glue: ``model(**inputs(batch))``.

Parity: ``/root/reference/torecsys/models/sequential.py:9-44`` — the seam that
joins the schema-driven :class:`torecsys_tpu.inputs.Inputs` front-end with any
model: the inputs wrapper emits a dict keyed by model-argument names and the
model is called with those kwargs.  The whole composition is one flax module,
so one ``init`` / one ``apply`` / one jitted train step covers embedding
lookup + interaction math + head.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from torecsys_tpu.inputs import Inputs


class Sequential(nn.Module):
    """``Sequential(inputs=..., model=...)(batch) == model(**inputs(batch))``."""

    inputs: Inputs
    model: nn.Module

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], training: bool = False):
        model_args = self.inputs(batch, training=training)
        return self.model(**model_args, training=training)
