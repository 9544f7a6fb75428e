"""Host-side data layer: long-format pandas DataFrames -> float matrices.

Behavioral parity with the reference's `SpatiotemporalDataHandler`
(`/root/reference/src/bayesnf/spatiotemporal.py:98-192`):

- rows with NaN targets are dropped,
- the time column is converted either to an integer period index relative to
  2020-01-01 (``timetype='index'``) or to raw floats (``timetype='float'``),
  then shifted so the training minimum is zero,
- selected columns are z-scored with *train-time* statistics which are reused
  verbatim at test time,
- the time scale (max training time value) becomes the time input scale.

Everything downstream of this module consumes plain ``(N, D)`` float32
matrices; pandas never reaches device code.
"""

from collections.abc import Sequence

import numpy as np
import pandas as pd


def convert_datetime_col(table, time_column, timetype, freq, time_min=None):
  """Convert a time column in place according to the frequency.

  With ``timetype='index'`` the datetime column becomes the integer number of
  `freq` periods since 2020-01-01; with ``'float'`` it is cast to float.
  The column is then shifted by `time_min` (or its own minimum).

  Returns:
    (table, time_min): the mutated table and the offset that was subtracted.
  """
  if timetype == 'index':
    first_date = pd.to_datetime('2020-01-01').to_period(freq)
    periods = table[time_column].dt.to_period(freq)
    table[time_column] = (periods - first_date).map(lambda x: x.n)
  elif timetype == 'float':
    table[time_column] = table[time_column].astype(float)
  else:
    raise ValueError(f'Unknown timetype: {timetype}')
  if time_min is None:
    time_min = table[time_column].min()
  table[time_column] = table[time_column] - time_min
  return table, time_min


class SpatiotemporalDataHandler:
  """Prepares long-format spatiotemporal tables for training/prediction."""

  def __init__(
      self,
      feature_cols: Sequence[str],
      target_col: str,
      timetype: str,
      freq: str | None,
      standardize: Sequence[str] | None = None,
  ):
    self.feature_cols = list(feature_cols)
    self.target_col = target_col
    self.timetype = timetype
    self.freq = freq
    self.standardize = standardize
    self.mu_ = None
    self.std_ = None
    self.time_min_ = None
    self.time_scale_ = None

  @property
  def _time_idx(self) -> int:
    return 0

  @property
  def _time_column(self) -> str:
    return self.feature_cols[self._time_idx]

  def _maybe_filter_target_nans(self, table: pd.DataFrame) -> pd.DataFrame:
    if self.target_col in table.columns:
      return table[table[self.target_col].notna()]
    return table

  def copy_and_filter_table(self, table: pd.DataFrame) -> pd.DataFrame:
    return self._maybe_filter_target_nans(table.copy())

  def get_target(self, table: pd.DataFrame) -> np.ndarray:
    table = self._maybe_filter_target_nans(table)
    return table[self.target_col].values

  def get_train(self, table: pd.DataFrame) -> np.ndarray:
    """Fetch the training feature matrix; fits time offset and z-score stats."""
    table = self.copy_and_filter_table(table)
    self.mu_ = np.zeros(len(self.feature_cols))
    self.std_ = np.ones(len(self.feature_cols))

    table, self.time_min_ = convert_datetime_col(
        table, self._time_column, self.timetype, self.freq, None
    )
    features = table[self.feature_cols].values
    self.time_scale_ = features[:, self._time_idx].max()

    if self.standardize:
      if self._time_column in self.standardize:
        raise TypeError('Do not standardize the time column!')
      idx = [self.feature_cols.index(f) for f in self.standardize]
      self.mu_[idx] = np.mean(features[:, idx].astype(float), axis=0)
      self.std_[idx] = np.std(features[:, idx].astype(float), axis=0)
      features = (features - self.mu_) / self.std_

    return features

  def get_test(self, table: pd.DataFrame) -> np.ndarray:
    """Fetch a test feature matrix, reusing train-time stats."""
    table = table.copy()
    table, _ = convert_datetime_col(
        table, self._time_column, self.timetype, self.freq, self.time_min_
    )
    features = table[self.feature_cols].values
    if self.standardize:
      features = (features - self.mu_) / self.std_
    return features

  def get_input_scales(self) -> np.ndarray:
    """Per-feature input scales: time scale for column 0, 1.0 elsewhere."""
    input_scales = np.ones(len(self.feature_cols))
    input_scales[self._time_idx] = self.time_scale_
    return input_scales
