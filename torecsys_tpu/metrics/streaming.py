"""Streaming metrics as pure accumulator pytrees.

The reference builds on ``torchmetrics.Metric`` (``metrics/__init__.py:11-19``)
with distributed reduce declared via ``dist_reduce_fx`` (``novelty.py:33-34``).
The JAX-native equivalent: a metric is an (init, update, compute) triple whose
state is a small pytree of arrays — ``update`` runs inside the jitted
train/eval step, states from different hosts/shards merge by ``jnp.add``
(``jax.lax.psum`` under shard_map, or a host-side tree-add), and ``compute``
is called once at log time.

AUC note: exact AUC needs a global sort; the streaming version uses a
fixed-bin score histogram (the standard large-scale CTR formulation) — with
``num_bins=8192`` the quantisation error is far below run-to-run variance,
and the update is one ``scatter-add``, TPU-friendly and psum-mergeable.
The reference implements no AUC at all (SURVEY.md §2.6) — this is an
addition required by BASELINE.md's parity metric.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AUCState(NamedTuple):
    pos_hist: jnp.ndarray  # (num_bins,) positive-score histogram
    neg_hist: jnp.ndarray  # (num_bins,) negative-score histogram


@dataclasses.dataclass(frozen=True)
class StreamingAUC:
    """Histogram-binned streaming ROC-AUC over sigmoid scores in [0, 1]."""

    num_bins: int = 8192

    def init(self) -> AUCState:
        z = jnp.zeros((self.num_bins,), dtype=jnp.float32)
        return AUCState(pos_hist=z, neg_hist=z)

    def update(self, state: AUCState, scores: jnp.ndarray, labels: jnp.ndarray,
               weights: jnp.ndarray | None = None) -> AUCState:
        scores = jnp.clip(scores.reshape(-1), 0.0, 1.0)
        labels = labels.reshape(-1).astype(jnp.float32)
        w = jnp.ones_like(labels) if weights is None else weights.reshape(-1).astype(jnp.float32)
        bins = jnp.minimum((scores * self.num_bins).astype(jnp.int32), self.num_bins - 1)
        pos = state.pos_hist.at[bins].add(labels * w)
        neg = state.neg_hist.at[bins].add((1.0 - labels) * w)
        return AUCState(pos_hist=pos, neg_hist=neg)

    def compute(self, state: AUCState) -> jnp.ndarray:
        """Trapezoidal AUC from the two histograms."""
        pos, neg = state.pos_hist, state.neg_hist
        total_pos = jnp.maximum(jnp.sum(pos), 1e-12)
        total_neg = jnp.maximum(jnp.sum(neg), 1e-12)
        # For each bin b (ascending score): pairs won = pos[b] * (neg below b)
        # plus half-credit for ties within the bin.
        neg_below = jnp.cumsum(neg) - neg
        won = jnp.sum(pos * neg_below) + 0.5 * jnp.sum(pos * neg)
        return won / (total_pos * total_neg)

    @staticmethod
    def merge(a: AUCState, b: AUCState) -> AUCState:
        return jax.tree_util.tree_map(jnp.add, a, b)


class MeanState(NamedTuple):
    total: jnp.ndarray
    count: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class StreamingMean:
    """Weighted streaming mean — the accumulator behind logloss / loss logging."""

    def init(self) -> MeanState:
        return MeanState(total=jnp.zeros((), jnp.float32), count=jnp.zeros((), jnp.float32))

    def update(self, state: MeanState, values: jnp.ndarray,
               weights: jnp.ndarray | None = None) -> MeanState:
        values = values.reshape(-1).astype(jnp.float32)
        w = jnp.ones_like(values) if weights is None else weights.reshape(-1).astype(jnp.float32)
        return MeanState(
            total=state.total + jnp.sum(values * w),
            count=state.count + jnp.sum(w),
        )

    def compute(self, state: MeanState) -> jnp.ndarray:
        return state.total / jnp.maximum(state.count, 1e-12)

    @staticmethod
    def merge(a: MeanState, b: MeanState) -> MeanState:
        return jax.tree_util.tree_map(jnp.add, a, b)


@dataclasses.dataclass(frozen=True)
class StreamingLogLoss:
    """Streaming binary cross-entropy on probability scores."""

    eps: float = 1e-7
    _mean: StreamingMean = StreamingMean()

    def init(self) -> MeanState:
        return self._mean.init()

    def update(self, state: MeanState, scores: jnp.ndarray, labels: jnp.ndarray) -> MeanState:
        p = jnp.clip(scores.reshape(-1), self.eps, 1.0 - self.eps)
        y = labels.reshape(-1).astype(jnp.float32)
        ll = -(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))
        return self._mean.update(state, ll)

    def compute(self, state: MeanState) -> jnp.ndarray:
        return self._mean.compute(state)

    merge = staticmethod(StreamingMean.merge)


@dataclasses.dataclass(frozen=True)
class StreamingNDCG:
    """Streaming mean NDCG@k over ranked lists.

    ``update`` takes per-list predicted scores and graded relevance
    ``(G, L)``; lists are ranked by score inside the update (one
    argsort-free top-L sort per batch) and the per-list NDCG@k accumulates
    into a mean state — psum-mergeable across hosts like the other
    streaming metrics (SURVEY.md §5.5).
    """

    k: int | None = None
    exp: bool = True
    _mean: StreamingMean = StreamingMean()

    def init(self) -> MeanState:
        return self._mean.init()

    def update(self, state: MeanState, scores: jnp.ndarray,
               relevance: jnp.ndarray) -> MeanState:
        from torecsys_tpu.metrics.functional import (
            discounted_cumulative_gain,
            ideal_discounted_cumulative_gain,
        )

        # rank relevance by descending predicted score per list
        order = jnp.argsort(-scores, axis=-1)
        ranked = jnp.take_along_axis(relevance, order, axis=-1)
        dcg = discounted_cumulative_gain(ranked, k=self.k, exp=self.exp)
        idcg = ideal_discounted_cumulative_gain(relevance, k=self.k, exp=self.exp)
        ndcg = dcg / jnp.maximum(idcg, 1e-12)
        return self._mean.update(state, ndcg)

    def compute(self, state: MeanState) -> jnp.ndarray:
        return self._mean.compute(state)

    merge = staticmethod(StreamingMean.merge)


class NoveltyState(NamedTuple):
    total_info: jnp.ndarray
    count: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class Novelty:
    """Streaming mean self-information of top-k recommendations.

    Reference: ``metrics/novelty.py:9-51`` (torchmetrics streaming with
    ``dist_reduce_fx='cat'`` — here the state is two scalars merged by add).
    """

    occurrence: jnp.ndarray  # (V,) item occurrence counts
    num_users: int

    def init(self) -> NoveltyState:
        return NoveltyState(
            total_info=jnp.zeros((), jnp.float32), count=jnp.zeros((), jnp.float32)
        )

    def update(self, state: NoveltyState, rec_ids: jnp.ndarray) -> NoveltyState:
        safe = jnp.maximum(rec_ids, 0)
        occ = jnp.take(jnp.asarray(self.occurrence), safe)
        p = jnp.clip(occ.astype(jnp.float32) / float(self.num_users), 1e-12, 1.0)
        info = -jnp.log2(p)
        valid = (rec_ids >= 0).astype(jnp.float32)
        return NoveltyState(
            total_info=state.total_info + jnp.sum(info * valid),
            count=state.count + jnp.sum(valid),
        )

    def compute(self, state: NoveltyState) -> jnp.ndarray:
        return state.total_info / jnp.maximum(state.count, 1.0)

    @staticmethod
    def merge(a: NoveltyState, b: NoveltyState) -> NoveltyState:
        return jax.tree_util.tree_map(jnp.add, a, b)
