"""Field model tests: spec table, init scheme, and a full numpy forward oracle.

The oracle is an independent numpy transcription of the model's published
structure (reference models.py:197-273): per-input scale adjustment,
grouped feature scaling, blended elu/tanh activation, 1/sqrt(fan_in)
pre-scaling, softplus layer/output scales.
"""

import numpy as np
import jax
import jax.numpy as jnp

from bayesnf_tpu.models import field as field_lib


def _make_config(width=16, depth=2):
  return field_lib.FieldConfig.create(
      width=width,
      depth=depth,
      input_scales=[100.0, 1.0, 1.0],
      fourier_degrees=[3, 2, 0],
      interactions=[(1, 2)],
      seasonality_periods=[7.0],
      num_seasonal_harmonics=[2],
  )


def _softplus(x):
  return np.logaddexp(0.0, x)


def _numpy_oracle(config, params, x, seasonal):
  """Independent numpy forward pass."""
  specs = field_lib.param_specs(config)
  by_name = {s.name: np.asarray(p) for s, p in zip(specs, params)}

  scaled_x = x / (
      np.asarray(config.input_scales) * np.exp(by_name['log_scale_adjustment'])
  )
  groups = [scaled_x]
  for i, deg in enumerate(config.fourier_degrees):
    if deg > 0:
      angles = 2 * np.pi * scaled_x[:, i : i + 1] * (2.0 ** np.arange(deg))
      f = np.concatenate([np.cos(angles), np.sin(angles)], -1)
      groups.append(f / np.tile(np.arange(1, deg + 1), 2))
  if config.seasonal_frequencies:
    groups.append(np.asarray(seasonal))
  if config.interactions:
    idx = np.asarray(config.interactions)
    groups.append(np.prod(scaled_x[:, idx], axis=-1))

  gscales = _softplus(by_name['feature_scales_raw'])
  h = np.concatenate([g * gscales[i] for i, g in enumerate(groups)], -1)

  w = 1.0 / (1.0 + np.exp(-by_name['activation_logit']))
  act = lambda z: w * np.where(z > 0, z, np.expm1(z)) + (1 - w) * np.tanh(z)
  lscales = _softplus(by_name['layer_scales_raw'])
  for layer in range(config.depth):
    h = h / np.sqrt(h.shape[-1])
    h = act(lscales[layer] * (h @ by_name[f'kernel_{layer}'] + by_name[f'bias_{layer}']))
  h = h / np.sqrt(h.shape[-1])
  out = h @ by_name['kernel_out'] + by_name['bias_out']
  return lscales[config.depth] * out[..., 0]


class TestSpecs:

  def test_encoded_dim(self):
    config = _make_config()
    # 3 inputs + 2*(3+2) fourier + 2*2 seasonal + 1 interaction = 18.
    assert config.encoded_dim == 3 + 10 + 4 + 1
    assert config.num_feature_groups == 5  # x, fourier0, fourier1, seas, inter

  def test_spec_shapes(self):
    config = _make_config(width=16, depth=2)
    specs = field_lib.param_specs(config)
    by_name = {s.name: s for s in specs}
    assert by_name['kernel_0'].shape == (18, 16)
    assert by_name['kernel_1'].shape == (16, 16)
    assert by_name['kernel_out'].shape == (16, 1)
    assert by_name['nb_shape_raw'].prior_loc == -1.5
    assert by_name['layer_scales_raw'].shape == (3,)
    assert [s.name for s in specs[:3]] == [
        'log_noise_scale', 'nb_shape_raw', 'zinb_logit'
    ]

  def test_init_scheme(self):
    config = _make_config()
    params = field_lib.init_params(
        config, jax.random.PRNGKey(0), log_noise_scale_init=1.7
    )
    specs = field_lib.param_specs(config)
    for spec, p in zip(specs, params):
      p = np.asarray(p)
      if spec.is_matrix:
        assert np.all(np.abs(p) <= 2.0)
        assert np.std(p) > 0.5  # actually random
      elif spec.name == 'log_noise_scale':
        np.testing.assert_allclose(p, 1.7)
      else:
        np.testing.assert_array_equal(p, np.zeros(spec.shape))


class TestForwardOracle:

  def test_matches_numpy_oracle(self):
    config = _make_config()
    key = jax.random.PRNGKey(42)
    # Random (not init) params so every term is exercised.
    specs = field_lib.param_specs(config)
    keys = jax.random.split(key, len(specs) + 1)
    params = tuple(
        0.5 * jax.random.normal(k, s.shape) for s, k in zip(specs, keys[:-1])
    )
    x = jax.random.normal(keys[-1], (37, 3)) * jnp.array([50.0, 1.0, 1.0])
    seasonal = field_lib.seasonal_features_for(config, x)

    got = np.asarray(field_lib.apply_field(config, params, x, seasonal))
    want = _numpy_oracle(config, params, np.asarray(x), seasonal)
    # f32 device math vs f64 numpy oracle.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

  def test_vmap_ensemble_matches_loop(self):
    config = _make_config(width=8, depth=1)
    specs = field_lib.param_specs(config)

    def draw(k):
      ks = jax.random.split(k, len(specs))
      return tuple(
          0.3 * jax.random.normal(kk, s.shape) for s, kk in zip(specs, ks)
      )

    members = [draw(jax.random.PRNGKey(i)) for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)
    x = jax.random.normal(jax.random.PRNGKey(9), (11, 3))
    seasonal = field_lib.seasonal_features_for(config, x)

    batched = jax.vmap(field_lib.apply_field, in_axes=(None, 0, None, None))(
        config, stacked, x, seasonal
    )
    for i, m in enumerate(members):
      np.testing.assert_allclose(
          np.asarray(batched[i]),
          np.asarray(field_lib.apply_field(config, m, x, seasonal)),
          rtol=1e-5,
          atol=1e-6,
      )

  def test_no_seasonal_no_interactions(self):
    config = field_lib.FieldConfig.create(
        width=8,
        depth=1,
        input_scales=[10.0],
        fourier_degrees=[2],
        interactions=[],
        seasonality_periods=[],
        num_seasonal_harmonics=[],
    )
    assert config.num_feature_groups == 2
    assert config.encoded_dim == 1 + 4
    params = field_lib.init_params(config, jax.random.PRNGKey(0))
    x = jnp.linspace(0, 10, 5).reshape(-1, 1)
    seasonal = field_lib.seasonal_features_for(config, x)
    assert seasonal.shape == (5, 0)
    out = field_lib.apply_field(config, params, x, seasonal)
    assert out.shape == (5,)
    assert np.all(np.isfinite(np.asarray(out)))
