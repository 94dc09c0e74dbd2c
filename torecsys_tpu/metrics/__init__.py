"""Metrics: streaming accumulators + functional ranking metrics.

Parity with ``/root/reference/torecsys/metrics/`` (BaseMetric shim
``metrics/__init__.py:11-19``, Novelty ``novelty.py:9-51``, functional
MAP@k/MAR@k/NDCG ``metrics/functional.py``), plus streaming AUC / logloss —
absent in the reference (SURVEY.md §2.6) but required by BASELINE.md.
"""

from torecsys_tpu.metrics import functional
from torecsys_tpu.metrics.functional import (
    discounted_cumulative_gain,
    ideal_discounted_cumulative_gain,
    mean_average_precision_at_k,
    mean_average_recall_at_k,
    mse,
    normalized_discounted_cumulative_gain,
    novelty_score,
)
from torecsys_tpu.metrics.streaming import (
    AUCState,
    MeanState,
    Novelty,
    NoveltyState,
    StreamingAUC,
    StreamingLogLoss,
    StreamingMean,
    StreamingNDCG,
)

__all__ = [
    "AUCState",
    "MeanState",
    "Novelty",
    "NoveltyState",
    "StreamingAUC",
    "StreamingLogLoss",
    "StreamingMean",
    "StreamingNDCG",
    "discounted_cumulative_gain",
    "functional",
    "ideal_discounted_cumulative_gain",
    "mean_average_precision_at_k",
    "mean_average_recall_at_k",
    "mse",
    "normalized_discounted_cumulative_gain",
    "novelty_score",
]
