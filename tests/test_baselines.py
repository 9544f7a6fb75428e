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


@pytest.mark.parametrize(
    'method, dep',
    [('SVGP', 'gpflow'), ('ST-SVGP', 'bayesnewton'),
     ('MF-ST-SVGP', 'bayesnewton'), ('NF', 'neuralforecast')],
)
def test_gp_nf_methods_report_missing_dependency(tmp_path, method, dep):
  runner = evaluate_baseline.METHODS[method]
  with pytest.raises(SystemExit, match=dep):
    runner(_DATA_ROOT, 'chickenpox', '8', str(tmp_path))


# ---------------------------------------------------------------------------
# GP/NF driver plumbing: unit tests for the dependency-free helpers, plus
# end-to-end schema tests with mocked gpflow/bayesnewton/neuralforecast.
# ---------------------------------------------------------------------------

from bayesnf_tpu.cli import baseline_gp
from bayesnf_tpu.cli import baseline_nf


def test_create_spatiotemporal_grid_shapes_and_nans():
  # 2 locations, 3 times; one (time, loc) pair missing -> NaN on the grid.
  x = np.array([
      [0.0, 1.0, 1.0],
      [0.0, 2.0, 2.0],
      [1.0, 1.0, 1.0],
      [1.0, 2.0, 2.0],
      [2.0, 1.0, 1.0],
  ])
  y = np.array([10.0, 20.0, 11.0, 21.0, 12.0])
  t, r, yg = baseline_gp.create_spatiotemporal_grid(x, y)
  assert t.shape == (3, 1)
  assert r.shape == (3, 2, 2)
  assert yg.shape == (3, 2, 1)
  np.testing.assert_array_equal(t[:, 0], [0.0, 1.0, 2.0])
  # Locations sorted lexicographically; observed values land in place.
  np.testing.assert_array_equal(yg[0, :, 0], [10.0, 20.0])
  np.testing.assert_array_equal(yg[1, :, 0], [11.0, 21.0])
  assert yg[2, 0, 0] == 12.0 and np.isnan(yg[2, 1, 0])


def test_checkpoint_steps_power_of_two():
  assert baseline_gp.checkpoint_steps(8) == [0, 1, 3, 7]
  assert baseline_gp.checkpoint_steps(10) == [0, 1, 3, 7, 9]
  assert baseline_gp.checkpoint_steps(1) == [0]


def test_load_series_tidy_unix_standardized():
  table = baseline_gp.load_series_tidy(_DATA_ROOT, 'chickenpox', '8')
  assert table.x_train.shape[1] == 3  # unix time, lat, lon
  np.testing.assert_allclose(table.x_train.mean(axis=0), 0.0, atol=1e-7)
  # Targets stay raw (not z-scored).
  assert table.y_train.max() > 10


def test_forecast_horizon():
  df_train = pd.DataFrame({'location': ['A', 'A', 'B']})
  df_test = pd.DataFrame({'location': ['A', 'B', 'B']})
  h = baseline_nf.forecast_horizon(
      df_train, df_test, t_train=[0.0, 1.0, 1.0], t_test=[4.0, 2.0, 3.0]
  )
  assert h == 3  # A: 4-1=3, B: 3-1=2


class _FakeVars:
  def __add__(self, other):
    return self

  def __call__(self):
    return self


def _install_fake_bayesnewton(monkeypatch):
  import sys
  import types as _types

  def model_ctor(**kwargs):
    model = _types.SimpleNamespace()
    model.vars = lambda: _FakeVars()
    model.energy = lambda: 0.0
    model.inference = lambda lr: None
    def predict_y(X, R):
      n = X.shape[0] * R.shape[1]
      return np.full(n, 0.5), np.full(n, 1.0)
    model.predict_y = predict_y
    model.negative_log_predictive_density = lambda X, R, Y: 1.25
    return model

  bn = _types.SimpleNamespace(
      kernels=_types.SimpleNamespace(
          Matern32=lambda **kw: ('m32', kw),
          Separable=lambda ks: ('sep', ks),
          SpatioTemporalKernel=lambda **kw: ('st', kw),
      ),
      likelihoods=_types.SimpleNamespace(Gaussian=lambda variance: 'gauss'),
      models=_types.SimpleNamespace(
          MarkovVariationalGP=lambda **kw: model_ctor(**kw),
          MarkovVariationalMeanFieldGP=lambda **kw: model_ctor(**kw),
      ),
  )

  class _WithVars:
    def __init__(self, v):
      pass

    def __call__(self, fn):
      return fn

  objax = _types.SimpleNamespace(
      optimizer=_types.SimpleNamespace(
          Adam=lambda v: _FakeVars() if False else _make_opt()
      ),
      GradValues=lambda f, v: (lambda: (None, (np.float32(3.5),))),
      Function=_types.SimpleNamespace(with_vars=_WithVars),
      Jit=lambda fn: fn,
  )

  def _make_opt():
    opt = lambda lr, grads: None
    opt.vars = lambda: _FakeVars()
    return opt

  monkeypatch.setitem(sys.modules, 'bayesnewton', bn)
  monkeypatch.setitem(sys.modules, 'objax', objax)


@pytest.mark.parametrize('method, prefix', [
    ('ST-SVGP', 'bayesnewton-st-svgp'),
    ('MF-ST-SVGP', 'bayesnewton-mf-st-svgp'),
])
def test_st_svgp_schema_with_mock(tmp_path, monkeypatch, method, prefix):
  _install_fake_bayesnewton(monkeypatch)
  path = evaluate_baseline.METHODS[method](
      _DATA_ROOT, 'chickenpox', '8', str(tmp_path), iters=4
  )
  assert path.endswith(f'{prefix}.chickenpox.8.pred.csv')
  log = pd.read_csv(tmp_path / f'{prefix}.chickenpox.8.log.csv')
  assert list(log.columns) == ['epoch', 'runtime', 'rmse', 'nlpd']
  assert list(log.epoch) == [0, 1, 3]  # power-of-2 checkpoints for iters=4
  assert np.all(np.isfinite(log.rmse))
  pred = pd.read_csv(path, index_col=0)
  assert list(pred.columns) == ['yhat', 'yhat_std', 'yhat_lower', 'yhat_upper']
  assert len(pred) == 308  # all train+test rows recovered from the grid join
  assert np.all(np.isfinite(pred.values))
  # yhat = 0.5 (normalized) maps back through train stats.
  assert np.allclose(pred.yhat, pred.yhat.iloc[0])


def _install_fake_neuralforecast(monkeypatch):
  import sys
  import types as _types

  class _FakeNF:
    def __init__(self, models, freq):
      self.models = models

    def fit(self, df, static_df=None):
      assert {'unique_id', 'ds', 'y'}.issubset(df.columns)
      assert 'unique_id' in static_df.columns

    def get_missing_future(self, df):
      return df.iloc[:0]

    def predict(self, futr_df=None):
      return pd.DataFrame({
          'unique_id': futr_df.unique_id.values,
          'ds': futr_df.ds.values,
          'NBEATS-median': np.full(len(futr_df), 7.0),
          'NBEATS-lo-95': np.full(len(futr_df), 5.0),
          'NBEATS-hi-95': np.full(len(futr_df), 9.0),
      })

  def _model(**kwargs):
    assert kwargs['h'] >= 1
    return ('nbeats', kwargs)

  nf_root = _types.SimpleNamespace(NeuralForecast=_FakeNF)
  monkeypatch.setitem(sys.modules, 'neuralforecast', nf_root)
  monkeypatch.setitem(
      sys.modules, 'neuralforecast.models',
      _types.SimpleNamespace(NBEATS=_model),
  )
  monkeypatch.setitem(
      sys.modules, 'neuralforecast.auto', _types.SimpleNamespace()
  )
  monkeypatch.setitem(
      sys.modules, 'neuralforecast.losses.pytorch',
      _types.SimpleNamespace(MQLoss=lambda level: ('mqloss', level)),
  )


def _write_shared_location_series(root, dataset='chickenpox', series='0'):
  # NF forecasts each location past its own history, so (unlike the
  # bundled series-8 split, whose test region is different counties) the
  # NF driver needs train/test to share locations.
  rng = np.random.default_rng(0)
  rows = []
  dates = pd.date_range('2010-01-04', periods=24, freq='W-MON')
  for loc, (lat, lon) in {'AAA': (46.5, 19.3), 'BBB': (47.2, 18.1)}.items():
    for d in dates:
      rows.append(dict(location=loc, datetime=d, latitude=lat,
                       longitude=lon, chickenpox=float(rng.poisson(20))))
  df = pd.DataFrame(rows)
  train = pd.concat([g.iloc[:20] for _, g in df.groupby('location')])
  test = pd.concat([g.iloc[20:] for _, g in df.groupby('location')])
  train.index = np.arange(len(train))
  test.index = np.arange(len(train), len(train) + len(test))
  train.to_csv(os.path.join(root, f'{dataset}.{series}.train.csv'))
  test.to_csv(os.path.join(root, f'{dataset}.{series}.test.csv'))
  return len(test)


def test_nf_schema_with_mock(tmp_path, monkeypatch):
  _install_fake_neuralforecast(monkeypatch)
  data_dir = tmp_path / 'data'
  os.makedirs(data_dir)
  n_test = _write_shared_location_series(str(data_dir))
  path = evaluate_baseline.METHODS['NF'](
      str(data_dir), 'chickenpox', '0', str(tmp_path), nf_epochs=3
  )
  log = pd.read_csv(tmp_path / 'nf-nbeats.chickenpox.0.log.csv')
  assert list(log.columns) == ['epoch', 'runtime', 'rmse', 'nlpd']
  assert log.epoch[0] == 3
  pred = pd.read_csv(path, index_col=0)
  assert list(pred.columns) == ['yhat', 'yhat_std', 'yhat_lower', 'yhat_upper']
  assert len(pred) == n_test  # the test region
  assert np.all(pred.yhat == 7.0)
  assert np.all(pred.yhat_lower == 5.0)


def test_probe_reports_all_methods(capsys):
  """--probe lists every method with OK or an actionable SKIPPED reason
  and exits 0 regardless of which heavy deps are installed."""
  from bayesnf_tpu.cli import evaluate_baseline as eb

  results = eb.probe_methods()
  assert sorted(results) == sorted(eb.METHODS)
  for method, status in results.items():
    assert status == 'OK' or status.startswith('SKIPPED (missing: '), (
        method, status)
  # The sklearn methods are always runnable in the test environment.
  assert results['RF'] == results['GBOOST'] == results['TSREG'] == 'OK'
  assert eb.main(['--probe']) == 0
  out = capsys.readouterr().out
  for method in eb.METHODS:
    assert method in out
