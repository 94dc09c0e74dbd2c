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
import jax
import jax.numpy as jnp

from torecsys_tpu.inputs import Inputs


class Sequential(nn.Module):
    """``Sequential(inputs=..., model=...)(batch) == model(**inputs(batch))``."""

    inputs: Inputs
    model: nn.Module

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], training: bool = False):
        model_args = self.inputs(batch, training=training)
        out = self.model(**model_args, training=training)
        # Mixed-precision contract (layers/precision.py): towers may compute
        # in bf16, but losses/metrics always consume f32 scores.
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.bfloat16 else x,
            out,
        )
