"""Calendar math parity tests (reference test table, test_spatiotemporal.py:21-46)."""

import numpy as np
import pytest

from bayesnf_tpu.calendar import seasonalities_to_array
from bayesnf_tpu.calendar import seasonality_to_float


@pytest.mark.parametrize(
    'seasonality, freq, expected',
    [
        ('Y', 'Y', 1),
        ('Q', 'Q', 1),
        ('Y', 'Q', 4),
        ('M', 'h', 730.5),
        ('Q', 'M', 3),
        ('Y', 'M', 12),
        ('M', 'D', 30.4375),
        ('min', 's', 60),
        ('h', 's', 3600),
        ('D', 's', 86400),
        ('M', 's', 2629800),
        ('Q', 's', 7889400),
        ('Y', 's', 31557600),
        ('Y', 'D', 365.25),
        ('Y', 'W', 52.25),
    ],
)
def test_seasonality_to_float(seasonality, freq, expected):
  assert seasonality_to_float(seasonality, freq) == expected


def test_seasonalities_to_array():
  periods = seasonalities_to_array(['D', 'W', 'M'], 'h')
  np.testing.assert_allclose(periods, np.array([24, 168, 730.5]))


def test_seasonalities_to_array_rejects_subunit():
  with pytest.raises(TypeError):
    seasonalities_to_array(['h'], 'D')
  with pytest.raises(TypeError):
    seasonalities_to_array([0.5], 'D')
