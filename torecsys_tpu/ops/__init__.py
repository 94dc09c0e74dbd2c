"""Compute primitives for the framework.

Two tiers behind one API:

* ``torecsys_tpu.ops.interactions`` — pure ``jax.numpy``/``lax`` reference
  implementations of every interaction primitive (always correct, runs on any
  backend, and is what XLA fuses on TPU by default).
* ``torecsys_tpu.ops.pallas`` — hand-written Pallas TPU kernels for the hot
  ops (fused embedding gather with offsets, FM pooling, FFM field pairs).

``torecsys_tpu.ops.dispatch`` selects the tier: Pallas kernels are used on TPU
backends when enabled; everything else falls back to the jnp tier.
"""

from torecsys_tpu.ops.interactions import (
    afm_pairwise_products,
    cin_interaction,
    cross_layer,
    ffm_pairwise_interaction,
    fm_pairwise_interaction,
    inner_product_pairs,
    outer_product_pairs,
)
from torecsys_tpu.ops.embedding import (
    embedding_lookup,
    fused_offset_lookup,
    pack_factor,
    pack_table,
    packed_lookup,
    packed_shape,
    unpack_table,
)

__all__ = [
    "afm_pairwise_products",
    "cin_interaction",
    "cross_layer",
    "embedding_lookup",
    "ffm_pairwise_interaction",
    "fm_pairwise_interaction",
    "fused_offset_lookup",
    "inner_product_pairs",
    "outer_product_pairs",
    "pack_factor",
    "pack_table",
    "packed_lookup",
    "packed_shape",
    "unpack_table",
]
