"""Negative-sampling miners.

Parity with ``/root/reference/torecsys/miners/``:

* :class:`BaseMiner` — ``miners/__init__.py:8-18``
  (``forward(anchor, target) → (pos, neg)``)
* :class:`UniformBatchMiner` — ``miners/uniform_batch_miner.py:8-43``
  (in-batch uniform negatives)

JAX design: miners are pure functions of an explicit PRNG key (no hidden
RNG state), so the whole LTR step — mining included — jit-compiles and is
reproducible per step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


class BaseMiner:
    """``miner(key, batch_values, target_values) → (pos_batch, neg_batch)``."""


@dataclasses.dataclass(frozen=True)
class UniformBatchMiner(BaseMiner):
    """In-batch uniform negative sampling.

    For each anchor row, sample ``num_negs`` other rows' targets uniformly
    (with replacement) from the batch.  Output mirrors the reference
    (``uniform_batch_miner.py:17-43``): the positive batch pairs each anchor
    with its true target ``(B, ...)``; the negative batch repeat-interleaves
    anchors ``num_negs`` times and pairs them with sampled targets
    ``(B·num_negs, ...)``.
    """

    num_negs: int = 1

    def __call__(
        self,
        key: jax.Array,
        batch: Dict[str, jnp.ndarray],
        target_field: str,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        target = batch[target_field]
        b = target.shape[0]
        neg_idx = jax.random.randint(key, (b * self.num_negs,), 0, b)
        neg_target = jnp.take(target, neg_idx, axis=0)

        pos_batch = dict(batch)
        neg_batch = {
            name: (neg_target if name == target_field else jnp.repeat(x, self.num_negs, axis=0))
            for name, x in batch.items()
        }
        return pos_batch, neg_batch


MINERS = {
    "UniformBatchMiner": UniformBatchMiner,
}


def get_miner(name_or_miner, **kwargs):
    """Resolve a miner by registry name (the reference accepts miner class
    names / instances in the pipeline builder, ``trainer/torecsys_pipeline.py:344``)."""
    if isinstance(name_or_miner, BaseMiner):
        return name_or_miner
    if name_or_miner not in MINERS:
        raise KeyError(f"unknown miner {name_or_miner!r}; available: {sorted(MINERS)}")
    return MINERS[name_or_miner](**kwargs)


__all__ = ["BaseMiner", "MINERS", "UniformBatchMiner", "get_miner"]
