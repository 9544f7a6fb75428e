"""Baseline harness tests: sklearn methods produce the reference schema."""

import os

import numpy as np
import pandas as pd
import pytest

from bayesnf_tpu.cli import evaluate_baseline

_DATA_ROOT = os.path.join(os.path.dirname(__file__), 'test_data')


@pytest.mark.parametrize(
    'runner, stem',
    [
        (evaluate_baseline.run_rf, 'rf'),
        (evaluate_baseline.run_tsreg, 'tsreg-OLS'),
    ],
)
def test_baseline_artifacts(tmp_path, runner, stem):
  runner(_DATA_ROOT, 'chickenpox', '8', str(tmp_path))
  log = pd.read_csv(tmp_path / f'{stem}.chickenpox.8.log.csv')
  assert list(log.columns) == ['epoch', 'runtime', 'rmse', 'nlpd']
  assert np.isfinite(log.rmse[0])
  pred = pd.read_csv(tmp_path / f'{stem}.chickenpox.8.pred.csv', index_col=0)
  assert list(pred.columns) == ['yhat', 'yhat_std', 'yhat_lower', 'yhat_upper']
  assert len(pred) == 308
  assert pred.index.is_monotonic_increasing


def test_gboost_quantile_ordering(tmp_path):
  evaluate_baseline.run_gboost(
      _DATA_ROOT, 'chickenpox', '8', str(tmp_path),
      n_estimators=10, use_features=False,
  )
  pred = pd.read_csv(
      tmp_path / 'gboost-10-False.chickenpox.8.pred.csv', index_col=0
  )
  # Quantile GBMs are not strictly non-crossing; check they mostly order.
  frac = np.mean(
      (pred.yhat_lower <= pred.yhat) & (pred.yhat <= pred.yhat_upper)
  )
  assert frac > 0.8


def test_gated_methods_report_missing_dependency():
  runner = evaluate_baseline._gated('gpflow', 'SVGP')
  with pytest.raises(SystemExit, match='gpflow'):
    runner()
