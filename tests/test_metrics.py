"""Metric tests: streaming AUC vs exact AUC, golden NDCG/MAP, novelty."""

import jax.numpy as jnp
import numpy as np

from torecsys_tpu.metrics import (
    Novelty,
    StreamingAUC,
    StreamingLogLoss,
    StreamingMean,
    discounted_cumulative_gain,
    mean_average_precision_at_k,
    mean_average_recall_at_k,
    normalized_discounted_cumulative_gain,
    novelty_score,
)


def exact_auc(scores, labels):
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    # ties handled approximately; test data has distinct scores
    return (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def test_streaming_auc_matches_exact(np_rng):
    scores = np_rng.uniform(size=5000).astype(np.float32)
    labels = (np_rng.uniform(size=5000) < scores).astype(np.float32)  # correlated
    auc = StreamingAUC(num_bins=8192)
    state = auc.init()
    for s in range(0, 5000, 1000):  # streaming updates
        state = auc.update(state, jnp.asarray(scores[s:s+1000]), jnp.asarray(labels[s:s+1000]))
    got = float(auc.compute(state))
    want = exact_auc(scores, labels)
    assert abs(got - want) < 2e-3


def test_streaming_auc_merge(np_rng):
    scores = np_rng.uniform(size=2000).astype(np.float32)
    labels = (np_rng.uniform(size=2000) < 0.5).astype(np.float32)
    auc = StreamingAUC()
    s1 = auc.update(auc.init(), jnp.asarray(scores[:1000]), jnp.asarray(labels[:1000]))
    s2 = auc.update(auc.init(), jnp.asarray(scores[1000:]), jnp.asarray(labels[1000:]))
    merged = StreamingAUC.merge(s1, s2)
    full = auc.update(auc.init(), jnp.asarray(scores), jnp.asarray(labels))
    np.testing.assert_allclose(float(auc.compute(merged)), float(auc.compute(full)), rtol=1e-6)


def test_streaming_logloss():
    ll = StreamingLogLoss()
    state = ll.init()
    state = ll.update(state, jnp.array([0.9, 0.1]), jnp.array([1.0, 0.0]))
    want = -np.mean([np.log(0.9), np.log(0.9)])
    np.testing.assert_allclose(float(ll.compute(state)), want, rtol=1e-5)


def test_streaming_mean():
    m = StreamingMean()
    s = m.update(m.init(), jnp.array([1.0, 2.0]))
    s = m.update(s, jnp.array([3.0]))
    np.testing.assert_allclose(float(m.compute(s)), 2.0)


def test_map_at_k():
    rec = jnp.array([[1, 2, 3], [9, 8, 7]])
    rel = jnp.array([[1, 3, -1], [7, -1, -1]])
    got = float(mean_average_precision_at_k(rec, rel, k=3))
    # list 1: hits at rank 1 and 3 → AP = (1/1 + 2/3)/2 = 0.8333
    # list 2: hit at rank 3 → AP = (1/3)/1 = 0.3333
    np.testing.assert_allclose(got, (0.8333333 + 0.3333333) / 2, rtol=1e-4)


def test_mar_at_k():
    rec = jnp.array([[1, 2, 3]])
    rel = jnp.array([[1, 3, 5, -1]])
    np.testing.assert_allclose(float(mean_average_recall_at_k(rec, rel, k=3)), 2 / 3, rtol=1e-5)


def test_ndcg():
    relevance = jnp.array([[3.0, 2.0, 3.0, 0.0, 1.0, 2.0]])
    got = float(normalized_discounted_cumulative_gain(relevance, k=6))
    # textbook example value ≈ 0.9608 (exp2 gains)
    assert 0.9 < got <= 1.0
    perfect = jnp.array([[3.0, 2.0, 1.0]])
    np.testing.assert_allclose(
        float(normalized_discounted_cumulative_gain(perfect)), 1.0, rtol=1e-6
    )


def test_dcg_identity_gains():
    relevance = jnp.array([[1.0, 1.0]])
    got = float(discounted_cumulative_gain(relevance, exp=False)[0])
    np.testing.assert_allclose(got, 1.0 + 1.0 / np.log2(3), rtol=1e-5)


def test_novelty():
    occurrence = jnp.array([100.0, 10.0, 1.0])
    rec = jnp.array([[0, 1], [2, -1]])
    got = float(novelty_score(rec, occurrence, num_users=100))
    want = (0.0 + np.log2(10) + np.log2(100)) / 3
    np.testing.assert_allclose(got, want, rtol=1e-5)

    nov = Novelty(occurrence=occurrence, num_users=100)
    s = nov.update(nov.init(), rec)
    np.testing.assert_allclose(float(nov.compute(s)), want, rtol=1e-5)
