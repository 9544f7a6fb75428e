"""Quantile engine tests: root-finder correctness and mixture semantics."""

import numpy as np
import jax.numpy as jnp
import scipy.stats

from bayesnf_tpu.inference import quantiles as q_lib
from bayesnf_tpu.models import distributions as dist_lib


class TestChandrupatla:

  def test_scalar_polynomial(self):
    root = q_lib.find_root_chandrupatla(
        lambda x: x**3 - 2 * x - 5, 0.0, 5.0
    )
    np.testing.assert_allclose(float(root), 2.0945515, rtol=1e-5)

  def test_vectorized_independent_lanes(self):
    targets = jnp.array([0.1, 0.5, 0.9, 0.999])
    f = lambda x: jnp.tanh(x) - targets
    roots = np.asarray(q_lib.find_root_chandrupatla(f, -10.0, 10.0))
    # Stopping rule is |f(root)| <= value_tolerance (1e-5), so assert the
    # defining property rather than x-distance (flat tails amplify x-error).
    np.testing.assert_allclose(
        np.tanh(roots), np.asarray(targets), atol=2e-5
    )
    np.testing.assert_allclose(
        roots[:3], np.arctanh(np.asarray(targets[:3])), atol=1e-4
    )

  def test_flat_region(self):
    # Root at 0 of a function flat on one side.
    f = lambda x: jnp.where(x > 0, x**2, -jnp.abs(x) ** 0.5)
    root = float(q_lib.find_root_chandrupatla(f, -1.0, 1.0))
    assert abs(root) < 1e-3


class TestNormalMixtureQuantiles:

  def test_single_member_equals_normal_quantile(self):
    means = jnp.full((1, 1, 5), 2.0)
    scales = jnp.full((1, 1), 1.5)
    got = q_lib.normal_mixture_quantiles(means, scales, [0.5, 0.975], (0, 1))
    np.testing.assert_allclose(np.asarray(got[0]), 2.0, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got[1]), scipy.stats.norm.ppf(0.975, 2.0, 1.5), atol=1e-3
    )

  def test_two_component_mixture_median(self):
    # Mixture of N(-1, .1) and N(1, .1): symmetric => median 0.
    means = jnp.array([[[-1.0]], [[1.0]]])  # (2,1,1)
    scales = jnp.array([[0.1], [0.1]])
    got = q_lib.normal_mixture_quantiles(means, scales, [0.5], (0, 1))
    np.testing.assert_allclose(np.asarray(got[0]), 0.0, atol=1e-4)

  def test_mixture_quantile_vs_brute_force(self):
    rng = np.random.default_rng(0)
    means = rng.normal(size=(4, 3, 6)).astype(np.float32)
    scales = rng.uniform(0.5, 2.0, size=(4, 3)).astype(np.float32)
    got = q_lib.normal_mixture_quantiles(
        jnp.asarray(means), jnp.asarray(scales), [0.8], (0, 1)
    )[0]
    # Brute force: evaluate mixture CDF on a fine grid per output point.
    grid = np.linspace(-10, 10, 20001)
    for j in range(6):
      cdf = scipy.stats.norm.cdf(
          grid[:, None], means[:, :, j].ravel(), scales.ravel()
      ).mean(-1)
      want = grid[np.searchsorted(cdf, 0.8)]
      np.testing.assert_allclose(float(got[j]), want, atol=5e-3)

  def test_approximate_moment_matching(self):
    means = jnp.array([[[-1.0]], [[1.0]]])
    scales = jnp.array([[0.5], [0.5]])
    got = q_lib.normal_mixture_quantiles(
        means, scales, [0.5, 0.9], (0, 1), approximate=True
    )
    mix_std = np.sqrt(0.5**2 + 1.0)  # E[s^2+m^2] - mean^2
    np.testing.assert_allclose(np.asarray(got[0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got[1]), scipy.stats.norm.ppf(0.9) * mix_std, rtol=1e-4
    )


class TestCountQuantiles:

  def test_single_member_nb_matches_scipy_ppf(self):
    r, l = 5.0, 0.4
    d = dist_lib.NegativeBinomial(
        jnp.full((1, 1, 3), r), jnp.full((1, 1, 3), l)
    )
    p_fail = 1.0 / (1.0 + np.exp(l))
    for q in (0.5, 0.9):
      got = np.asarray(q_lib.count_mixture_quantile_root(d, q, (0, 1)))
      want = scipy.stats.nbinom.ppf(q, r, p_fail)
      np.testing.assert_allclose(got, want)

  def test_zero_clamp(self):
    # Heavy zero inflation: low quantiles clamp to 0.
    d = dist_lib.ZeroInflatedNegativeBinomial(
        jnp.full((1, 1, 2), 5.0),
        jnp.full((1, 1, 2), 0.4),
        jnp.full((1, 1, 2), 0.6),
    )
    got = np.asarray(q_lib.count_mixture_quantile_root(d, 0.5, (0, 1)))
    np.testing.assert_array_equal(got, 0.0)

  def test_quantiles_are_integers_and_monotone(self):
    d = dist_lib.NegativeBinomial(
        jnp.full((2, 2, 4), 3.0), jnp.asarray(np.linspace(-1, 1, 16).reshape(2, 2, 4))
    )
    qs = [
        np.asarray(q_lib.count_mixture_quantile_root(d, q, (0, 1)))
        for q in (0.1, 0.5, 0.9)
    ]
    for q in qs:
      np.testing.assert_array_equal(q, np.floor(q))
    assert np.all(qs[0] <= qs[1]) and np.all(qs[1] <= qs[2])
