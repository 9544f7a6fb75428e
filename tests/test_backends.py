"""Trainer-backend resolution ('auto' -> xla/pallas) and fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesnf_tpu.inference import backends
from bayesnf_tpu.inference import map as map_lib
from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.models import likelihoods
from bayesnf_tpu.parallel import mesh as mesh_lib


def _tiny_config():
  return field_lib.FieldConfig.create(
      width=8,
      depth=1,
      input_scales=[10.0],
      fourier_degrees=[2],
      interactions=[],
      seasonality_periods=[],
      num_seasonal_harmonics=[],
  )


def test_explicit_backends_pass_through():
  mesh = mesh_lib.default_mesh()
  assert backends.resolve_backend('xla', mesh) == 'xla'
  assert backends.resolve_backend('pallas', mesh) == 'pallas'


def test_unknown_backend_rejected():
  with pytest.raises(ValueError, match='Unknown backend'):
    backends.resolve_backend('cuda', mesh_lib.default_mesh())


def test_auto_is_xla_off_tpu():
  # The test suite runs on the virtual CPU mesh.
  assert jax.default_backend() != 'tpu'
  assert backends.resolve_backend('auto', mesh_lib.default_mesh()) == 'xla'


def test_auto_is_pallas_on_tpu_with_unsharded_data(monkeypatch):
  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  devices = np.array(jax.devices()).reshape(-1, 1)
  mesh = jax.sharding.Mesh(
      devices, (mesh_lib.ENSEMBLE_AXIS, mesh_lib.DATA_AXIS)
  )
  assert backends.resolve_backend('auto', mesh) == 'pallas'


def test_auto_is_xla_on_tpu_with_sharded_data(monkeypatch):
  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  devices = np.array(jax.devices()).reshape(-1, 2)
  mesh = jax.sharding.Mesh(
      devices, (mesh_lib.ENSEMBLE_AXIS, mesh_lib.DATA_AXIS)
  )
  assert backends.resolve_backend('auto', mesh) == 'xla'


def test_auto_on_tpu_with_sharded_data_full_batch(monkeypatch):
  """Full batch on a sharded data axis resolves to pallas (any N)."""
  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  devices = np.array(jax.devices()).reshape(-1, 2)
  mesh = jax.sharding.Mesh(
      devices, (mesh_lib.ENSEMBLE_AXIS, mesh_lib.DATA_AXIS)
  )
  assert backends.resolve_backend('auto', mesh, full_batch=True) == 'pallas'
  assert backends.resolve_backend('auto', mesh, full_batch=False) == 'xla'


def test_auto_pallas_build_failure_falls_back_to_xla(monkeypatch, capsys):
  """A kernel-build failure under 'auto' retries the chunk on xla, loudly."""
  monkeypatch.setattr(
      backends,
      'resolve_backend',
      lambda b, m, **kw: 'pallas' if b == 'auto' else b,
  )

  def broken_pallas(*args, **kwargs):
    raise RuntimeError('Mosaic failed to compile TPU kernel (simulated)')

  monkeypatch.setattr(map_lib, '_make_pallas_train_fn', broken_pallas)

  config = _tiny_config()
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(40, 1)), jnp.float32)
  y = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
  seasonal = field_lib.seasonal_features_for(config, x)
  aug = jnp.concatenate([x, seasonal], axis=-1)

  params, losses = map_lib.ensemble_map(
      aug, y, config, likelihoods.LikelihoodDist.NORMAL,
      ensemble_size=2, learning_rate=0.01, num_epochs=3,
      seed=jax.random.PRNGKey(0), backend='auto',
  )
  assert losses.shape == (2, 3)
  assert np.all(np.isfinite(np.asarray(losses)))
  assert 'falling back to xla' in capsys.readouterr().err


def test_auto_probe_compiles_once_per_chunk_size(monkeypatch, tmp_path):
  """The probe's AOT-compiled program is reused for later equal-size chunks.

  jit dispatch does not see AOT .lower().compile() results, so without the
  reuse cache a checkpointed auto->pallas fit would compile the same chunk
  program twice (once in the probe, once at the second chunk's dispatch).
  """
  monkeypatch.setattr(
      backends,
      'resolve_backend',
      lambda b, m, **kw: 'pallas' if b == 'auto' else b,
  )
  calls = {'lower': 0, 'direct': 0}
  real_factory = map_lib._make_pallas_train_fn  # pylint: disable=protected-access

  def counting_factory(*args, **kwargs):
    fn = real_factory(*args, **kwargs)

    class _Wrap:

      def lower(self, *a, **kw):
        calls['lower'] += 1
        return fn.lower(*a, **kw)

      def __call__(self, *a, **kw):
        calls['direct'] += 1
        return fn(*a, **kw)

    return _Wrap()

  monkeypatch.setattr(map_lib, '_make_pallas_train_fn', counting_factory)

  config = _tiny_config()
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(40, 1)), jnp.float32)
  y = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
  seasonal = field_lib.seasonal_features_for(config, x)
  aug = jnp.concatenate([x, seasonal], axis=-1)

  _, losses = map_lib.ensemble_map(
      aug, y, config, likelihoods.LikelihoodDist.NORMAL,
      ensemble_size=2, learning_rate=0.01, num_epochs=4,
      seed=jax.random.PRNGKey(0), backend='auto',
      checkpoint_dir=str(tmp_path / 'ck'), checkpoint_every=2,
  )
  assert losses.shape == (2, 4)
  # One AOT probe compile; both 2-epoch chunks ran through the compiled
  # object (a direct jit dispatch would have been a second compile).
  assert calls == {'lower': 1, 'direct': 0}


def test_auto_explicit_pallas_failure_is_not_swallowed(monkeypatch):
  """An explicitly requested pallas backend must surface its failure."""
  def broken_pallas(*args, **kwargs):
    raise RuntimeError('Mosaic failed to compile TPU kernel (simulated)')

  monkeypatch.setattr(map_lib, '_make_pallas_train_fn', broken_pallas)

  config = _tiny_config()
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(40, 1)), jnp.float32)
  y = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
  seasonal = field_lib.seasonal_features_for(config, x)
  aug = jnp.concatenate([x, seasonal], axis=-1)

  with pytest.raises(RuntimeError, match='simulated'):
    map_lib.ensemble_map(
        aug, y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=2, learning_rate=0.01, num_epochs=3,
        seed=jax.random.PRNGKey(0), backend='pallas',
    )
