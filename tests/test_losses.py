"""Loss tests: scalar outputs + golden values (reference style
``/root/reference/tests/test_losses.py`` plus numeric pins)."""

import jax.numpy as jnp
import numpy as np
import pytest

import torecsys_tpu.losses as losses

B, K = 8, 3


def pos():
    return jnp.linspace(0.5, 2.0, B).reshape(B, 1)


def neg():
    return jnp.linspace(-1.0, 0.5, B * K).reshape(B, K)


@pytest.mark.parametrize("name", [
    "PointwiseLogisticLoss", "BayesianPersonalizedRankingLoss", "HingeLoss",
    "TripletLoss",
])
def test_pairwise_losses_scalar(name):
    loss = losses.get_loss(name)
    out = loss(pos(), neg()[:, :1])
    assert out.shape == ()
    assert np.isfinite(float(out))


def test_adaptive_hinge():
    out = losses.AdaptiveHingeLoss(margin=1.0)(pos(), neg())
    want = np.maximum(0, 1.0 - np.asarray(pos()) + np.asarray(neg()).max(-1, keepdims=True)).mean()
    np.testing.assert_allclose(float(out), want, rtol=1e-5)


def test_bpr_golden():
    p = jnp.array([[1.0]]); n = jnp.array([[0.0]])
    out = losses.BayesianPersonalizedRankingLoss()(p, n)
    np.testing.assert_allclose(float(out), -np.log(1 / (1 + np.exp(-1.0))), rtol=1e-5)


def test_hinge_golden():
    p = jnp.array([[2.0]]); n = jnp.array([[0.5]])
    assert float(losses.HingeLoss(margin=1.0)(p, n)) == 0.0
    assert float(losses.HingeLoss(margin=2.0)(p, n)) == pytest.approx(0.5)


def test_bce_with_logits_matches_manual():
    logits = jnp.array([[0.3], [-0.7], [2.0]])
    targets = jnp.array([1.0, 0.0, 1.0])
    out = float(losses.BCEWithLogitsLoss()(logits, targets))
    p = 1 / (1 + np.exp(-np.asarray(logits)[:, 0]))
    want = -np.mean([np.log(p[0]), np.log(1 - p[1]), np.log(p[2])])
    np.testing.assert_allclose(out, want, rtol=1e-5)


def test_bce_shape_alignment_no_silent_broadcast():
    """(B,1) preds + (B,) targets must produce the (B,)-aligned loss, not a
    (B,B) broadcast."""
    logits = jnp.zeros((4, 1))
    targets = jnp.array([1.0, 0.0, 1.0, 0.0])
    out = float(losses.BCEWithLogitsLoss()(logits, targets))
    np.testing.assert_allclose(out, np.log(2.0), rtol=1e-6)


def test_mse():
    preds = jnp.array([[1.0], [2.0]])
    targets = jnp.array([0.0, 4.0])
    np.testing.assert_allclose(float(losses.MSELoss()(preds, targets)), 2.5, rtol=1e-6)


def test_listnet():
    y_true = jnp.array([[3.0, 2.0, 1.0]])
    y_pred = jnp.array([[3.0, 2.0, 1.0]])
    better = float(losses.ListnetLoss()(y_true, y_pred))
    worse = float(losses.ListnetLoss()(y_true, -y_pred))
    assert better < worse


def test_listnet_mask():
    y_true = jnp.array([[3.0, 2.0, 99.0]])
    y_pred = jnp.array([[3.0, 2.0, -50.0]])
    mask = jnp.array([[True, True, False]])
    out = float(losses.ListnetLoss()(y_true, y_pred, mask))
    assert np.isfinite(out)


def test_skipgram():
    content = jnp.ones((B, 4))
    p = jnp.ones((B, 4))
    n = -jnp.ones((B, K, 4))
    out = losses.SkipGramLoss()(content, p, n)
    assert out.shape == ()
    # perfect separation → small loss
    assert float(out) < 0.2


def test_soft_margin_triplet():
    out = losses.TripletLoss(margin=None)(pos(), neg()[:, :1])
    assert np.isfinite(float(out))


def test_pointwise_logistic_golden():
    p = jnp.array([[100.0]]); n = jnp.array([[-100.0]])
    np.testing.assert_allclose(float(losses.PointwiseLogisticLoss()(p, n)), 0.0, atol=1e-5)


def test_apply_mask():
    loss = jnp.array([1.0, 2.0, 3.0, 4.0])
    mask = jnp.array([True, True, False, False])
    np.testing.assert_allclose(
        float(losses.functional.apply_mask(loss, mask)), 1.5, rtol=1e-6
    )


def test_registry():
    with pytest.raises(KeyError):
        losses.get_loss("NopeLoss")
