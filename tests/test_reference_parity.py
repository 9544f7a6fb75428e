"""Behavioral parity vs the reference's committed golden predictions.

The reference ships full-run golden prediction CSVs for chickenpox series 8
(`/root/reference/tests/test_data/bnf-map.chickenpox.8.pred.csv`, produced
by 10k-epoch 64-particle runs). Bit-exact comparison is impossible across
frameworks/RNGs (the reference's own exact-equality golden tests are
disabled as too brittle, reference test_evaluate_mini.py:58), so this test
asserts *quality* parity on the train region: our fit must match or beat
the reference golden's train RMSE and produce calibrated intervals.

Reference golden facts (precomputed): train-region RMSE 39.548, target
std 37.753 (this tiny 100-row single-county series is prior-dominated —
the reference underfits to roughly the mean, and so do we), and
train-region CRPS 21.805 for the golden's predictive distribution
moment-matched from its committed mean and 95% interval
(scale = (upper - lower) / (2 * 1.96), closed-form Normal CRPS) — the
paper's headline metric (reference README.md:24-30), gated here via
posterior samples from `likelihood_model` + `metrics.crps_ensemble`.
"""

import os

import numpy as np
import pandas as pd
import jax
import pytest

from bayesnf_tpu import BayesianNeuralFieldMAP
from bayesnf_tpu import metrics

_DATA_ROOT = os.path.join(os.path.dirname(__file__), 'test_data')
_REFERENCE_GOLDEN_TRAIN_RMSE = 39.548
# Derived from /root/reference/tests/test_data/bnf-map.chickenpox.8.pred.csv
# train rows: crps_normal(y, yhat, (upper - lower) / (2 * 1.959964)).
_REFERENCE_GOLDEN_TRAIN_CRPS = 21.805


@pytest.mark.slow
def test_chickenpox8_matches_or_beats_reference_golden():
  df_train = pd.read_csv(
      os.path.join(_DATA_ROOT, 'chickenpox.8.train.csv'),
      index_col=0,
      parse_dates=['datetime'],
  )
  model = BayesianNeuralFieldMAP(
      width=256, depth=2,
      seasonality_periods=[4.0, 52.1775],
      num_seasonal_harmonics=[2, 10],
      feature_cols=['datetime', 'latitude', 'longitude'],
      target_col='chickenpox',
      observation_model='NORMAL',
      timetype='index', freq='W',
      standardize=['latitude', 'longitude'],
  )
  model.fit(
      df_train, seed=jax.random.PRNGKey(0), ensemble_size=4, num_epochs=2500,
      learning_rate=0.005,
  )
  means, quants = model.predict(df_train, quantiles=(0.5, 0.025, 0.975))
  y = df_train['chickenpox'].values
  yhat = np.asarray(means).mean(axis=(0, 1))
  rmse = float(np.sqrt(np.mean((yhat - y) ** 2)))
  assert rmse <= _REFERENCE_GOLDEN_TRAIN_RMSE + 0.5, rmse

  _, lo, hi = (np.asarray(q) for q in quants)
  coverage = float(np.mean((y >= lo) & (y <= hi)))
  assert coverage >= 0.85, coverage

  # CRPS leg — the second half of the stated success metric (RMSE/CRPS
  # parity): posterior-predictive samples through the public
  # likelihood_model path, fair ensemble-CRPS estimator, gated against the
  # golden-derived bound.
  dist = model.likelihood_model(df_train)
  draws = np.asarray(dist.sample(jax.random.PRNGKey(7), sample_shape=(16,)))
  crps = float(
      metrics.crps_ensemble(y, draws.reshape(-1, len(y)), fair=True)
  )
  assert crps <= _REFERENCE_GOLDEN_TRAIN_CRPS + 0.5, crps
