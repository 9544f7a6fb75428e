"""Feature encoder math tests (parity: reference models.py:36-88)."""

import numpy as np
import pytest

from bayesnf_tpu.models import features as feat_lib


class TestSeasonalFrequencyTable:

  def test_basic(self):
    freqs, harms = feat_lib.seasonal_frequency_table(
        np.array([4.0, 52.1775]), np.array([2, 10])
    )
    # Period 4 harmonics: 1/4, 2/4. Period 52.1775: k/52.1775, k=1..10.
    expected = np.concatenate(
        [np.array([0.25, 0.5]), np.arange(1, 11) / 52.1775]
    ).astype(np.float32)
    np.testing.assert_allclose(freqs, expected, rtol=1e-6)
    np.testing.assert_array_equal(
        harms, np.concatenate([[1, 2], np.arange(1, 11)])
    )

  def test_dedup_keeps_first_occurrence_order(self):
    # Harmonic 2 of period 12 (2/12) == harmonic 1 of period 6 (1/6).
    freqs, harms = feat_lib.seasonal_frequency_table(
        np.array([12.0, 6.0]), np.array([2, 1])
    )
    np.testing.assert_allclose(
        freqs, np.array([1 / 12, 2 / 12], dtype=np.float32), rtol=1e-6
    )
    np.testing.assert_array_equal(harms, [1, 2])

  def test_empty(self):
    freqs, harms = feat_lib.seasonal_frequency_table(np.zeros(0), np.zeros(0))
    assert freqs.shape == (0,) and harms.shape == (0,)

  def test_harmonic_exceeds_half_period(self):
    with pytest.raises(ValueError, match='Nyquist'):
      feat_lib.seasonal_frequency_table(np.array([4.0]), np.array([3]))

  def test_shape_mismatch(self):
    with pytest.raises(ValueError, match='shape mismatch'):
      feat_lib.seasonal_frequency_table(np.array([4.0, 8.0]), np.array([1]))

  def test_rank(self):
    with pytest.raises(ValueError, match='rank-1'):
      feat_lib.seasonal_frequency_table(
          np.array([[4.0]]), np.array([[1]])
      )


class TestSeasonalFeatures:

  def test_values_and_rescale(self):
    t = np.array([0.0, 1.0, 2.5])
    freqs = np.array([0.25, 0.5], dtype=np.float32)
    harms = np.array([1.0, 2.0], dtype=np.float32)
    got = np.asarray(feat_lib.seasonal_features(t, freqs, harms, rescale=True))
    angles = 2 * np.pi * t[:, None] * freqs[None, :]
    expected = np.concatenate([np.cos(angles), np.sin(angles)], axis=-1)
    expected = expected / np.array([1.0, 2.0, 1.0, 2.0])
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

  def test_no_rescale(self):
    t = np.array([0.3])
    freqs = np.array([0.1], dtype=np.float32)
    harms = np.array([3.0], dtype=np.float32)
    got = np.asarray(feat_lib.seasonal_features(t, freqs, harms, rescale=False))
    angle = 2 * np.pi * 0.3 * np.float32(0.1)
    np.testing.assert_allclose(
        got[0], [np.cos(angle), np.sin(angle)], rtol=1e-5
    )

  def test_empty(self):
    got = feat_lib.seasonal_features(np.zeros(7), np.zeros(0), np.zeros(0))
    assert got.shape == (7, 0)


class TestFourierFeatures:

  def test_values_and_rescale(self):
    x = np.array([0.1, -0.4], dtype=np.float32)
    got = np.asarray(feat_lib.fourier_features(x, 3, rescale=True))
    angles = 2 * np.pi * x[:, None] * np.array([1.0, 2.0, 4.0])
    expected = np.concatenate([np.cos(angles), np.sin(angles)], axis=-1)
    expected = expected / np.array([1, 2, 3, 1, 2, 3], dtype=np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

  def test_zero_degree_is_empty(self):
    got = feat_lib.fourier_features(np.zeros(4, dtype=np.float32), 0)
    assert got.shape == (4, 0)
