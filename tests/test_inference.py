"""Trainer and predictor integration tests (fast CPU configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesnf_tpu.inference import map as map_lib
from bayesnf_tpu.inference import predict as predict_lib
from bayesnf_tpu.inference import vi as vi_lib
from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.models import likelihoods
from bayesnf_tpu.parallel import mesh as mesh_lib


def _small_config(width=8, depth=1):
  return field_lib.FieldConfig.create(
      width=width,
      depth=depth,
      input_scales=[50.0, 1.0],
      fourier_degrees=[3, 2],
      interactions=[],
      seasonality_periods=[10.0],
      num_seasonal_harmonics=[2],
  )


def _small_data(n=120, seed=0):
  rng = np.random.default_rng(seed)
  t = np.arange(n, dtype=np.float32) % 50
  s = rng.normal(size=n).astype(np.float32)
  x = np.stack([t, s], -1)
  y = (np.sin(2 * np.pi * t / 10) * 3 + s + 0.1 * rng.normal(size=n)).astype(
      np.float32
  )
  return x, y


def _aug(config, x):
  x = jnp.asarray(x)
  return jnp.concatenate(
      [x, field_lib.seasonal_features_for(config, x)], axis=-1
  )


class TestEnsembleMap:

  def test_loss_decreases_and_shapes(self):
    config = _small_config()
    x, y = _small_data()
    params, losses = map_lib.ensemble_map(
        _aug(config, x),
        y,
        config,
        likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=8,
        learning_rate=0.01,
        num_epochs=60,
        seed=jax.random.PRNGKey(0),
    )
    assert losses.shape == (8, 60)
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert np.all(losses[:, -1] < losses[:, 0])
    specs = field_lib.param_specs(config)
    for spec, p in zip(specs, params):
      assert p.shape == (8,) + spec.shape

  def test_deterministic_same_seed(self):
    config = _small_config()
    x, y = _small_data()
    run = lambda: map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=4, learning_rate=0.01, num_epochs=10,
        seed=jax.random.PRNGKey(7),
    )
    p1, l1 = run()
    p2, l2 = run()
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for a, b in zip(p1, p2):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_minibatch_path(self):
    config = _small_config()
    x, y = _small_data()
    params, losses = map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=2, learning_rate=0.01, num_epochs=30,
        seed=jax.random.PRNGKey(1), batch_size=32,
    )
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert losses[:, -1].mean() < losses[:, 0].mean()

  def test_ensemble_smaller_than_devices(self):
    # Reference issue #28: errors when ensemble < device count. We pad.
    config = _small_config()
    x, y = _small_data()
    params, losses = map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=3, learning_rate=0.01, num_epochs=5,
        seed=jax.random.PRNGKey(1),
    )
    assert losses.shape == (3, 5)
    assert params[0].shape[0] == 3

  def test_num_splits_concatenates(self):
    config = _small_config()
    x, y = _small_data()
    params, losses = map_lib.fit_map(
        _aug(config, x), y, jax.random.PRNGKey(0), 'NORMAL', config,
        num_particles=8, learning_rate=0.01, num_epochs=5, num_splits=2,
    )
    assert losses.shape == (8, 5)
    assert params[0].shape[0] == 8
    # Splits use folded seeds => different members.
    assert not np.allclose(losses[:4], losses[4:])

  def test_mle_is_prior_free(self):
    config = _small_config()
    x, y = _small_data()
    common = dict(
        aug_features=_aug(config, x), target=y, config=config,
        distribution=likelihoods.LikelihoodDist.NORMAL, ensemble_size=2,
        learning_rate=0.01, num_epochs=5, seed=jax.random.PRNGKey(0),
    )
    _, l_map = map_lib.ensemble_map(prior_weight=1.0, **common)
    _, l_mle = map_lib.ensemble_map(prior_weight=0.0, **common)
    # MAP loss includes the prior term: strictly larger in magnitude.
    assert np.asarray(l_map)[0, 0] > np.asarray(l_mle)[0, 0]

  def test_explicit_data_mesh(self):
    config = _small_config()
    x, y = _small_data(n=128)
    mesh = mesh_lib.default_mesh(data_devices=2)
    params, losses = map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=4, learning_rate=0.01, num_epochs=10,
        seed=jax.random.PRNGKey(3), mesh=mesh,
    )
    assert np.all(np.isfinite(np.asarray(losses)))
    # Same run on the default (ens-only) mesh: numerically very close
    # (reduction order may differ across data shards).
    params2, losses2 = map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=4, learning_rate=0.01, num_epochs=10,
        seed=jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(losses2), rtol=1e-3, atol=1e-3
    )


class TestEnsembleVI:

  def test_loss_decreases_and_outputs(self):
    config = _small_config()
    x, y = _small_data()
    surrogate, losses, draws = vi_lib.fit_vi(
        _aug(config, x), y, jax.random.PRNGKey(0), 'NORMAL', config,
        ensemble_size=3, learning_rate=0.02, num_epochs=60,
        sample_size_divergence=3, sample_size_posterior=7, kl_weight=0.2,
    )
    losses = np.asarray(losses)
    assert losses.shape == (3, 60)
    assert np.all(np.isfinite(losses))
    assert losses[:, -1].mean() < losses[:, 0].mean()
    specs = field_lib.param_specs(config)
    for spec, p in zip(specs, draws):
      assert p.shape == (3, 7) + spec.shape
    locs, raw_scales = surrogate
    assert locs[0].shape == (3,)

  def test_minibatch_vi(self):
    config = _small_config()
    x, y = _small_data()
    _, losses, _ = vi_lib.fit_vi(
        _aug(config, x), y, jax.random.PRNGKey(0), 'NORMAL', config,
        ensemble_size=2, learning_rate=0.02, num_epochs=40,
        batch_size=40, kl_weight=0.1,
    )
    assert np.all(np.isfinite(np.asarray(losses)))


class TestPredict:

  def _fit(self, config, x, y, e=4):
    params, _ = map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=e, learning_rate=0.01, num_epochs=40,
        seed=jax.random.PRNGKey(0),
    )
    # Public 2-dim ensemble shape.
    return tuple(np.asarray(p).reshape((2, e // 2) + p.shape[1:]) for p in params)

  def test_chunking_invariance(self):
    config = _small_config()
    x, y = _small_data(n=100)
    params = self._fit(config, x, y)
    m1, q1 = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.5,), ensemble_dims=2, chunk_size=16
    )
    m2, q2 = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.5,), ensemble_dims=2, chunk_size=1024
    )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(q1[0]), np.asarray(q2[0]), rtol=1e-4, atol=1e-4
    )

  def test_shapes_and_quantile_order(self):
    config = _small_config()
    x, y = _small_data(n=90)
    params = self._fit(config, x, y)
    means, quants = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.5, 0.025, 0.975), ensemble_dims=2
    )
    assert means.shape == (2, 2, 90)
    q50, qlo, qhi = (np.asarray(q) for q in quants)
    assert q50.shape == (90,)
    assert np.all(qlo <= q50) and np.all(q50 <= qhi)

  def test_mesh_row_parallel_matches_single_program(self):
    """predict_bnf(mesh=...) shards chunk rows over all devices — same
    numbers as the meshless program (N=90 also exercises uneven pad)."""
    config = _small_config()
    x, y = _small_data(n=90)
    params = self._fit(config, x, y)
    m1, q1 = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.5, 0.975), ensemble_dims=2,
        chunk_size=32,
    )
    for mesh in (mesh_lib.default_mesh(), mesh_lib.default_mesh(data_devices=4)):
      m2, q2 = predict_lib.predict_bnf(
          x, 'NORMAL', params, config, (0.5, 0.975), ensemble_dims=2,
          chunk_size=32, mesh=mesh,
      )
      np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
      for a, b in zip(q1, q2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )

  def test_mesh_row_parallel_matches_single_program_nb(self):
    """Count-likelihood predict (integer quantile root-find) over a mesh
    matches the meshless program too."""
    config = _small_config()
    x, y = _small_data(n=70)
    y_nb = np.round(np.exp(np.asarray(y) / 4.0)).astype(np.float32)
    params, _ = map_lib.ensemble_map(
        _aug(config, x), jnp.asarray(y_nb), config,
        likelihoods.LikelihoodDist.NB,
        ensemble_size=4, learning_rate=0.01, num_epochs=30,
        seed=jax.random.PRNGKey(0),
    )
    params = tuple(
        np.asarray(p).reshape((2, 2) + p.shape[1:]) for p in params
    )
    m1, q1 = predict_lib.predict_bnf(
        x, 'NB', params, config, (0.5, 0.9), ensemble_dims=2, chunk_size=32,
    )
    m2, q2 = predict_lib.predict_bnf(
        x, 'NB', params, config, (0.5, 0.9), ensemble_dims=2, chunk_size=32,
        mesh=mesh_lib.default_mesh(data_devices=2),
    )
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    for a, b in zip(q1, q2):
      # Integer-valued quantiles: must match exactly.
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_mesh_pallas_forward_matches_xla_mesh(self):
    """Mesh-parallel fused predict: the shard_map'd Pallas forward over an
    ('ens' x 'data') mesh agrees with the XLA mesh path (and hence, via
    the meshless agreement tests, with the single-program oracle). N=90
    exercises chunk padding of the row shards."""
    config = _small_config()
    x, y = _small_data(n=90)
    params = self._fit(config, x, y)
    mesh = mesh_lib.default_mesh(data_devices=2)
    m_x, q_x = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.5, 0.975), ensemble_dims=2,
        chunk_size=32, mesh=mesh, backend='xla',
    )
    m_p, q_p = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.5, 0.975), ensemble_dims=2,
        chunk_size=32, mesh=mesh, backend='pallas',
    )
    np.testing.assert_allclose(
        np.asarray(m_x), np.asarray(m_p), rtol=1e-4, atol=1e-5
    )
    for a, b in zip(q_x, q_p):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
      )

  def test_mesh_pallas_forward_matches_xla_mesh_nb(self):
    """Count-model mesh-parallel fused predict: integer quantiles from the
    sharded fused forward match the XLA mesh path within one count."""
    config = _small_config()
    x, y = _small_data(n=70)
    y_nb = np.round(np.exp(np.asarray(y) / 4.0)).astype(np.float32)
    params, _ = map_lib.ensemble_map(
        _aug(config, x), jnp.asarray(y_nb), config,
        likelihoods.LikelihoodDist.NB,
        ensemble_size=4, learning_rate=0.01, num_epochs=30,
        seed=jax.random.PRNGKey(0),
    )
    params = tuple(p[jnp.newaxis] for p in params)
    mesh = mesh_lib.default_mesh(data_devices=2)
    m_x, q_x = predict_lib.predict_bnf(
        x, 'NB', params, config, (0.5, 0.9), ensemble_dims=2,
        chunk_size=32, mesh=mesh, backend='xla',
    )
    m_p, q_p = predict_lib.predict_bnf(
        x, 'NB', params, config, (0.5, 0.9), ensemble_dims=2,
        chunk_size=32, mesh=mesh, backend='pallas',
    )
    np.testing.assert_allclose(
        np.asarray(m_x), np.asarray(m_p), rtol=1e-4, atol=1e-5
    )
    for a, b in zip(q_x, q_p):
      assert np.max(np.abs(np.asarray(a) - np.asarray(b))) <= 1.0

  def test_approximate_close_to_exact(self):
    config = _small_config()
    x, y = _small_data(n=80)
    params = self._fit(config, x, y)
    _, exact = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.9,), ensemble_dims=2
    )
    _, approx = predict_lib.predict_bnf(
        x, 'NORMAL', params, config, (0.9,), ensemble_dims=2,
        approximate_quantiles=True,
    )
    # Trained members agree closely => mixture ~ Normal => paths agree.
    np.testing.assert_allclose(
        np.asarray(exact[0]), np.asarray(approx[0]), rtol=0.15, atol=0.3
    )


class TestPallasBackend:

  def test_matches_xla_backend(self):
    config = _small_config(width=16, depth=2)
    x, y = _small_data(n=96)
    common = dict(
        aug_features=_aug(config, x), target=y, config=config,
        distribution=likelihoods.LikelihoodDist.NORMAL, ensemble_size=2,
        learning_rate=0.01, num_epochs=8, seed=jax.random.PRNGKey(0),
    )
    p_x, l_x = map_lib.ensemble_map(backend='xla', **common)
    p_p, l_p = map_lib.ensemble_map(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    # Same math, same RNG; only matmul tiling differs (f32 tolerance).
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-5)
    np.testing.assert_allclose(l_x, l_p, rtol=1e-3)
    for a, b in zip(p_x, p_p):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
      )

  def test_minibatch_pallas(self):
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=96)
    params, losses = map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=3, learning_rate=0.01, num_epochs=12,
        seed=jax.random.PRNGKey(1), batch_size=32, backend='pallas',
    )
    losses = np.asarray(losses)
    assert losses.shape == (3, 12)
    assert np.all(np.isfinite(losses))
    assert losses[:, -1].mean() < losses[:, 0].mean()

  def _count_data(self, n=96, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float32) % 50
    s = rng.normal(size=n).astype(np.float32)
    x = np.stack([t, s], -1)
    y = rng.poisson(np.exp(0.5 * np.sin(t / 8) + 1.0)).astype(np.float32)
    y[::9] = 0.0  # exercise the ZINB zero branch
    return x, y

  def test_pallas_nb_likelihood(self):
    config = _small_config(width=16, depth=1)
    x, y = self._count_data()
    params, losses = map_lib.ensemble_map(
        _aug(config, x), y, config, likelihoods.LikelihoodDist.NB,
        ensemble_size=2, learning_rate=0.01, num_epochs=15,
        seed=jax.random.PRNGKey(0), backend='pallas',
    )
    losses = np.asarray(losses)
    assert np.all(np.isfinite(losses))
    assert losses[:, -1].mean() < losses[:, 0].mean()

  def test_data_sharded_full_batch_matches_xla(self):
    """Fused kernels on an ('ens' x 'data') mesh: per-shard kernel + psum."""
    config = _small_config(width=16, depth=2)
    x, y = _small_data(n=96)
    mesh = mesh_lib.default_mesh(data_devices=2)
    common = dict(
        aug_features=_aug(config, x), target=y, config=config,
        distribution=likelihoods.LikelihoodDist.NORMAL, ensemble_size=2,
        learning_rate=0.01, num_epochs=8, seed=jax.random.PRNGKey(0),
        mesh=mesh,
    )
    p_x, l_x = map_lib.ensemble_map(backend='xla', **common)
    p_p, l_p = map_lib.ensemble_map(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-5)
    np.testing.assert_allclose(l_x, l_p, rtol=1e-3)
    for a, b in zip(p_x, p_p):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
      )

  def test_data_sharded_uneven_rows_full_batch(self):
    """N % data_shards != 0: padded shards + in-kernel valid-row masking.

    The sharded-pallas and sharded-xla results must both match an
    unsharded-xla fit of the same seed (the unpadded ground truth).
    """
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=97)  # 97 % 2 == 1
    common = dict(
        aug_features=_aug(config, x), target=y, config=config,
        distribution=likelihoods.LikelihoodDist.NORMAL, ensemble_size=2,
        learning_rate=0.01, num_epochs=8, seed=jax.random.PRNGKey(0),
    )
    mesh2 = mesh_lib.default_mesh(data_devices=2)
    p_ref, l_ref = map_lib.ensemble_map(
        backend='xla', mesh=mesh_lib.default_mesh(), **common
    )
    l_ref = np.asarray(l_ref)
    for backend in ('xla', 'pallas'):
      p_s, l_s = map_lib.ensemble_map(backend=backend, mesh=mesh2, **common)
      l_s = np.asarray(l_s)
      np.testing.assert_allclose(
          l_ref[:, 0], l_s[:, 0], rtol=1e-5, err_msg=backend
      )
      np.testing.assert_allclose(l_ref, l_s, rtol=1e-3, err_msg=backend)
      for a, b in zip(p_ref, p_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3,
            err_msg=backend,
        )

  def test_data_sharded_minibatch_matches_xla(self):
    """Minibatch SGD over a sharded data axis (the BASELINE config-5 /
    VI-registry regime): both backends run the per-shard local-permutation
    scheme of parallel/minibatch.py under shard_map, so they agree
    batch-for-batch. N=97 also exercises the balanced padded layout."""
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=97)
    mesh = mesh_lib.default_mesh(data_devices=2)
    common = dict(
        aug_features=_aug(config, x), target=y, config=config,
        distribution=likelihoods.LikelihoodDist.NORMAL, ensemble_size=4,
        learning_rate=0.01, num_epochs=6, seed=jax.random.PRNGKey(0),
        batch_size=32, mesh=mesh,
    )
    p_x, l_x = map_lib.ensemble_map(backend='xla', **common)
    p_p, l_p = map_lib.ensemble_map(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    assert l_x.shape == (4, 6)
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-5)
    np.testing.assert_allclose(l_x, l_p, rtol=1e-3, atol=1e-4)
    for a, b in zip(p_x, p_p):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
      )

  def test_data_sharded_minibatch_non_divisible(self):
    """batch_size % data_shards != 0: pallas refuses with an actionable
    message; xla falls back to the GSPMD global-permutation path."""
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=96)
    mesh = mesh_lib.default_mesh(data_devices=2)
    common = dict(
        aug_features=_aug(config, x), target=y, config=config,
        distribution=likelihoods.LikelihoodDist.NORMAL, ensemble_size=2,
        learning_rate=0.01, num_epochs=2, seed=jax.random.PRNGKey(0),
        batch_size=33, mesh=mesh,
    )
    with pytest.raises(ValueError, match='data_shards == 0'):
      map_lib.ensemble_map(backend='pallas', **common)
    _, losses = map_lib.ensemble_map(backend='xla', **common)
    assert np.all(np.isfinite(np.asarray(losses)))

  @pytest.mark.parametrize('dist', [
      likelihoods.LikelihoodDist.NB, likelihoods.LikelihoodDist.ZINB,
  ])
  def test_count_matches_xla_backend(self, dist):
    config = _small_config(width=16, depth=2)
    x, y = self._count_data()
    common = dict(
        aug_features=_aug(config, x), target=y, config=config,
        distribution=dist, ensemble_size=2,
        learning_rate=0.01, num_epochs=8, seed=jax.random.PRNGKey(0),
    )
    p_x, l_x = map_lib.ensemble_map(backend='xla', **common)
    p_p, l_p = map_lib.ensemble_map(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    # Same math/RNG; differences are matmul tiling plus the in-kernel
    # Stirling gammaln/digamma vs jax.scipy's (<= ~3e-4 relative).
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-3)
    np.testing.assert_allclose(l_x, l_p, rtol=3e-3)
    for a, b in zip(p_x, p_p):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-2, atol=5e-3
      )


class TestPallasVIBackend:

  def _common(self, config, x, y, batch_size=None):
    return dict(
        aug_features=_aug(config, x), target=y,
        seed=jax.random.PRNGKey(0), observation_model='NORMAL',
        config=config, ensemble_size=2, learning_rate=0.02,
        num_epochs=6, sample_size_divergence=3, sample_size_posterior=4,
        kl_weight=0.2, batch_size=batch_size,
    )

  def test_vi_matches_xla_backend(self):
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=96)
    common = self._common(config, x, y)
    s_x, l_x, d_x = vi_lib.fit_vi(backend='xla', **common)
    s_p, l_p, d_p = vi_lib.fit_vi(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    # Identical RNG (step keys, MC draws, minibatch permutation); only
    # matmul tiling differs.
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-5)
    np.testing.assert_allclose(l_x, l_p, rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_x),
                    jax.tree_util.tree_leaves(s_p)):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
      )

  def test_vi_minibatch_pallas(self):
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=96)
    common = self._common(config, x, y, batch_size=32)
    s_x, l_x, _ = vi_lib.fit_vi(backend='xla', **common)
    s_p, l_p, _ = vi_lib.fit_vi(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    assert l_p.shape == (2, 6)
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-5)
    np.testing.assert_allclose(l_x, l_p, rtol=2e-3, atol=1e-3)

  def test_vi_data_sharded_minibatch_matches_xla(self):
    """Minibatch VI over a sharded data axis — the regime of EVERY VI
    registry config. Both backends resample per step via the per-shard
    scheme of parallel/minibatch.py; N=97 exercises the balanced layout.
    """
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=97)
    mesh = mesh_lib.default_mesh(data_devices=2)
    common = self._common(config, x, y, batch_size=32)
    common['mesh'] = mesh
    common['ensemble_size'] = 4
    s_x, l_x, _ = vi_lib.fit_vi(backend='xla', **common)
    s_p, l_p, _ = vi_lib.fit_vi(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    assert l_x.shape == (4, 6)
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-5)
    np.testing.assert_allclose(l_x, l_p, rtol=2e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_x),
                    jax.tree_util.tree_leaves(s_p)):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
      )

  def test_vi_data_sharded_minibatch_non_divisible(self):
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=96)
    common = self._common(config, x, y, batch_size=33)
    common['mesh'] = mesh_lib.default_mesh(data_devices=2)
    with pytest.raises(ValueError, match='data_shards == 0'):
      vi_lib.fit_vi(backend='pallas', **common)
    _, losses, _ = vi_lib.fit_vi(backend='xla', **common)
    assert np.all(np.isfinite(np.asarray(losses)))

  def test_vi_data_sharded_full_batch_matches_xla(self):
    """VI fused kernels on an ('ens' x 'data') mesh: NLL/grad psum."""
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=96)
    mesh = mesh_lib.default_mesh(data_devices=2)
    common = self._common(config, x, y)
    common['mesh'] = mesh
    s_x, l_x, _ = vi_lib.fit_vi(backend='xla', **common)
    s_p, l_p, _ = vi_lib.fit_vi(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-5)
    np.testing.assert_allclose(l_x, l_p, rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_x),
                    jax.tree_util.tree_leaves(s_p)):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3
      )

  def test_vi_data_sharded_uneven_rows_full_batch(self):
    """VI on an uneven data axis: padded shards, exact row exclusion."""
    config = _small_config(width=16, depth=1)
    x, y = _small_data(n=97)
    common = self._common(config, x, y)
    s_ref, l_ref, _ = vi_lib.fit_vi(
        backend='xla', mesh=mesh_lib.default_mesh(), **common
    )
    l_ref = np.asarray(l_ref)
    mesh2 = mesh_lib.default_mesh(data_devices=2)
    for backend in ('xla', 'pallas'):
      s_s, l_s, _ = vi_lib.fit_vi(backend=backend, mesh=mesh2, **common)
      l_s = np.asarray(l_s)
      np.testing.assert_allclose(
          l_ref[:, 0], l_s[:, 0], rtol=1e-5, err_msg=backend
      )
      np.testing.assert_allclose(
          l_ref, l_s, rtol=1e-3, atol=1e-4, err_msg=backend
      )
      for a, b in zip(jax.tree_util.tree_leaves(s_ref),
                      jax.tree_util.tree_leaves(s_s)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-3,
            err_msg=backend,
        )

  def test_vi_count_matches_xla_backend(self):
    config = _small_config(width=16, depth=1)
    rng = np.random.default_rng(7)
    t = np.arange(96, dtype=np.float32) % 50
    x = np.stack([t, rng.normal(size=96).astype(np.float32)], -1)
    y = rng.poisson(np.exp(0.4 * np.sin(t / 8) + 1.0)).astype(np.float32)
    y[::9] = 0.0
    common = self._common(config, x, y)
    common['observation_model'] = 'ZINB'
    s_x, l_x, _ = vi_lib.fit_vi(backend='xla', **common)
    s_p, l_p, _ = vi_lib.fit_vi(backend='pallas', **common)
    l_x, l_p = np.asarray(l_x), np.asarray(l_p)
    np.testing.assert_allclose(l_x[:, 0], l_p[:, 0], rtol=1e-3)
    np.testing.assert_allclose(l_x, l_p, rtol=5e-3, atol=1e-3)
