"""Metric oracles: closed forms and convergence checks."""

import numpy as np
import jax
import scipy.stats

from bayesnf_tpu import metrics


def test_point_and_interval_metrics():
  y = np.array([0.0, 1.0, 2.0, 3.0])
  yhat = np.array([0.0, 2.0, 2.0, 1.0])
  np.testing.assert_allclose(
      float(metrics.rmse(y, yhat)), np.sqrt((0 + 1 + 0 + 4) / 4)
  )
  np.testing.assert_allclose(float(metrics.mae(y, yhat)), 3 / 4)
  lo = np.array([-1.0, 0.0, 2.5, 2.0])
  hi = np.array([1.0, 0.5, 3.5, 4.0])
  np.testing.assert_allclose(float(metrics.coverage(y, lo, hi)), 0.5)
  np.testing.assert_allclose(float(metrics.interval_width(lo, hi)), 1.375)


def test_crps_normal_closed_form_vs_quadrature():
  # CRPS(F, y) = int (F(x) - 1[x >= y])^2 dx, brute-forced on a grid.
  loc, scale, y = 0.3, 1.7, -0.9
  xs = np.linspace(-20, 20, 200_001)
  f = scipy.stats.norm.cdf(xs, loc, scale)
  step = (xs >= y).astype(float)
  want = np.trapezoid((f - step) ** 2, xs)
  got = float(metrics.crps_normal(np.array([y]), loc, scale))
  np.testing.assert_allclose(got, want, rtol=2e-4)  # f32 vs f64 quadrature


def test_crps_ensemble_converges_to_normal_closed_form():
  rng = np.random.default_rng(0)
  loc = np.array([0.0, 2.0, -1.0])
  scale = np.array([1.0, 0.5, 3.0])
  y = np.array([0.5, 1.0, -4.0])
  samples = rng.normal(loc, scale, size=(40_000, 3))
  got = float(metrics.crps_ensemble(y, samples, fair=True))
  want = float(metrics.crps_normal(y, loc, scale))
  np.testing.assert_allclose(got, want, rtol=2e-2)


def test_crps_ensemble_matches_pairwise_definition():
  # The sorted-sample identity vs the explicit O(M^2) double sum.
  rng = np.random.default_rng(1)
  samples = rng.normal(size=(17, 5))
  y = rng.normal(size=5)
  diffs = np.abs(samples[:, None, :] - samples[None, :, :])
  for fair, denom in [(True, 17 * 16), (False, 17 * 17)]:
    want = np.mean(
        np.mean(np.abs(samples - y), axis=0)
        - diffs.sum(axis=(0, 1)) / (2.0 * denom)
    )
    got = float(metrics.crps_ensemble(y, samples, fair=fair))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_crps_on_model_draws():
  """End-to-end: CRPS of a fitted model's posterior-predictive draws."""
  import pandas as pd
  from bayesnf_tpu import BayesianNeuralFieldMAP

  rng = np.random.default_rng(2)
  n = 80
  t = np.arange(n, dtype=float) % 20
  lat = rng.normal(size=n)
  y = np.sin(2 * np.pi * t / 10) * 2 + lat + 0.3 * rng.normal(size=n)
  df = pd.DataFrame({'time': t, 'lat': lat, 'y': y})
  m = BayesianNeuralFieldMAP(
      width=8, depth=1, seasonality_periods=[10.0],
      feature_cols=['time', 'lat'], target_col='y', timetype='float',
  )
  m.fit(df, seed=jax.random.PRNGKey(0), ensemble_size=2, num_epochs=300,
        learning_rate=0.02)
  dist = m.likelihood_model(df)
  draws = np.asarray(dist.sample(jax.random.PRNGKey(1), (8,)))
  crps = float(metrics.crps_ensemble(y, draws.reshape(-1, n)))
  # Far better than the climatological forecast (a constant at the mean).
  clim = float(metrics.crps_ensemble(y, np.tile(y.mean(), (2, n))))
  assert 0 < crps < 0.8 * clim, (crps, clim)


def test_crps_ensemble_single_sample_guard():
  """fair=True at M=1 must raise (the M(M-1) denominator is zero), and
  fair=False must still return the exact empirical CRPS = |x - y|."""
  import pytest

  y = np.array([1.0, 2.0])
  one = np.array([[2.0, 2.0]])
  with pytest.raises(ValueError, match='at least 2 samples'):
    metrics.crps_ensemble(y, one)
  got = float(metrics.crps_ensemble(y, one, fair=False))
  np.testing.assert_allclose(got, 0.5)  # mean(|2-1|, |2-2|)
