"""Evaluation metrics for probabilistic spatiotemporal forecasts.

The BayesNF paper scores models by RMSE/MAE and CRPS (doi
10.1038/s41467-024-51477-5); the reference computes these in private
notebook code and ships no metric API. Here they are library functions,
vectorized and jit-friendly, operating on plain arrays:

- point metrics on a flattened prediction (`rmse`, `mae`);
- interval metrics on predicted quantiles (`coverage`, `interval_width`);
- `crps_ensemble` on posterior-predictive draws — e.g.
  `model.likelihood_model(df).sample(key, (k,))` flattened over the
  ensemble axes — plus the closed-form `crps_normal` oracle.
"""

import math


import jax.numpy as jnp
from jax.scipy import special as jsp_special


def rmse(y, yhat):
  """Root mean squared error."""
  y, yhat = jnp.asarray(y), jnp.asarray(yhat)
  return jnp.sqrt(jnp.mean((yhat - y) ** 2))


def mae(y, yhat):
  """Mean absolute error."""
  y, yhat = jnp.asarray(y), jnp.asarray(yhat)
  return jnp.mean(jnp.abs(yhat - y))


def coverage(y, lower, upper):
  """Fraction of observations inside [lower, upper]."""
  y = jnp.asarray(y)
  return jnp.mean(
      (y >= jnp.asarray(lower)) & (y <= jnp.asarray(upper))
  ).astype(jnp.float32)


def interval_width(lower, upper):
  """Mean predictive-interval width."""
  return jnp.mean(jnp.asarray(upper) - jnp.asarray(lower))


def crps_ensemble(y, samples, fair=True):
  """Mean CRPS of an empirical (ensemble) predictive distribution.

  CRPS(F, y) = E|X - y| - 0.5 E|X - X'| with X, X' ~ F, estimated from
  `samples`. With `fair=True` the spread term uses the M(M-1) denominator
  (the "fair" estimator, unbiased for the underlying distribution's CRPS);
  otherwise the classical M^2 form (the empirical distribution's exact
  CRPS).

  Args:
    y: (N,) observations.
    samples: (M, N) predictive draws — flatten any leading ensemble/draw
      axes into M first (e.g. `samples.reshape(-1, n)`).
    fair: estimator variant (see above).

  Returns:
    Scalar mean CRPS over the N observations.
  """
  y = jnp.asarray(y)
  samples = jnp.asarray(samples)
  m = samples.shape[0]
  if fair and m < 2:
    raise ValueError(
        'crps_ensemble(fair=True) needs at least 2 samples (the M(M-1) '
        f'spread term is undefined at M={m}); pass fair=False for the '
        'single-sample empirical form.'
    )
  term_y = jnp.mean(jnp.abs(samples - y[None, :]), axis=0)
  # Pairwise spread via the sorted-sample identity:
  #   sum_{i,j} |x_i - x_j| = 2 * sum_k (2k + 1 - M) x_(k),  k = 0..M-1
  # O(M log M) instead of the O(M^2) double loop.
  sorted_s = jnp.sort(samples, axis=0)
  weights = 2.0 * jnp.arange(1, m + 1) - m - 1.0
  pair_sum = 2.0 * jnp.sum(weights[:, None] * sorted_s, axis=0)
  denom = m * (m - 1) if fair else m * m
  term_spread = pair_sum / (2.0 * denom)
  return jnp.mean(term_y - term_spread)


def crps_normal(y, loc, scale):
  """Closed-form mean CRPS of Normal(loc, scale) forecasts.

  CRPS = scale * (z * (2 Phi(z) - 1) + 2 phi(z) - 1/sqrt(pi)),
  z = (y - loc)/scale.
  """
  y, loc, scale = jnp.asarray(y), jnp.asarray(loc), jnp.asarray(scale)
  z = (y - loc) / scale
  phi = jnp.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
  big_phi = jsp_special.ndtr(z)
  return jnp.mean(
      scale * (z * (2.0 * big_phi - 1.0) + 2.0 * phi - 1.0 / math.sqrt(math.pi))
  )
