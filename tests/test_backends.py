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


def test_auto_is_xla_on_tpu_with_sharded_nondivisible_minibatch(monkeypatch):
  """The one sharded regime pallas cannot run: minibatch SGD whose batch
  does not divide the data axis (global permutation gather)."""
  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  devices = np.array(jax.devices()).reshape(-1, 2)
  mesh = jax.sharding.Mesh(
      devices, (mesh_lib.ENSEMBLE_AXIS, mesh_lib.DATA_AXIS)
  )
  assert backends.resolve_backend(
      'auto', mesh, full_batch=False, batch_divisible=False
  ) == 'xla'


def test_auto_sharded_minibatch_defaults_to_xla(monkeypatch):
  """Omitting batch_divisible must fail SAFE: a sharded-data minibatch
  resolves to 'xla' (always correct) unless the caller explicitly attests
  the batch divides the shard count."""
  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  devices = np.array(jax.devices()).reshape(-1, 2)
  mesh = jax.sharding.Mesh(
      devices, (mesh_lib.ENSEMBLE_AXIS, mesh_lib.DATA_AXIS)
  )
  assert backends.resolve_backend('auto', mesh) == 'xla'


def test_auto_on_tpu_with_sharded_data(monkeypatch):
  """Pallas covers a sharded data axis both full-batch (any N) and for a
  shard-divisible minibatch (per-shard local permutation)."""
  monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
  devices = np.array(jax.devices()).reshape(-1, 2)
  mesh = jax.sharding.Mesh(
      devices, (mesh_lib.ENSEMBLE_AXIS, mesh_lib.DATA_AXIS)
  )
  assert backends.resolve_backend('auto', mesh, full_batch=True) == 'pallas'
  assert backends.resolve_backend(
      'auto', mesh, full_batch=False, batch_divisible=True
  ) == 'pallas'


def test_auto_pallas_build_failure_falls_back_to_xla(monkeypatch, capsys):
  """A kernel-build failure under 'auto' retries the chunk on xla, loudly."""
  monkeypatch.setattr(
      backends,
      'resolve_backend',
      lambda b, m, **kw: 'pallas' if b == 'auto' else b,
  )

  def broken_pallas(*args, **kwargs):
    raise RuntimeError('Mosaic failed to compile TPU kernel (simulated)')

  monkeypatch.setattr(map_lib, '_make_shardmap_train_fn', broken_pallas)

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


def _counting_pallas_factory(monkeypatch, module, attr):
  """Wrap a trainer factory so the test can count lower() vs direct calls."""
  calls = {'lower': 0, 'direct': 0}
  real_factory = getattr(module, attr)

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

  monkeypatch.setattr(module, attr, counting_factory)
  return calls


def _tiny_train_data(config):
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(40, 1)), jnp.float32)
  y = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
  seasonal = field_lib.seasonal_features_for(config, x)
  return jnp.concatenate([x, seasonal], axis=-1), y


def test_auto_probe_compiles_once_per_chunk_size(monkeypatch, tmp_path, capsys):
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
  calls = _counting_pallas_factory(
      monkeypatch, map_lib, '_make_shardmap_train_fn'
  )
  config = _tiny_config()
  aug, y = _tiny_train_data(config)

  _, losses = map_lib.ensemble_map(
      aug, y, config, likelihoods.LikelihoodDist.NORMAL,
      ensemble_size=2, learning_rate=0.01, num_epochs=4,
      seed=jax.random.PRNGKey(0), backend='auto',
      checkpoint_dir=str(tmp_path / 'ck'), checkpoint_every=2,
  )
  assert losses.shape == (2, 4)
  # The probe must not have silently fallen back to xla (which would also
  # yield {'lower': 1, 'direct': 0} and make the counts below vacuous).
  assert 'falling back to xla' not in capsys.readouterr().err
  # One AOT probe compile; both 2-epoch chunks ran through the compiled
  # object (a direct jit dispatch would have been a second compile).
  assert calls == {'lower': 1, 'direct': 0}


def test_probe_reuse_respects_subtiles_knob(monkeypatch, tmp_path, capsys):
  """A BNF_FUSED_SUBTILES change between chunks must NOT reuse the probe.

  resolve_subtiles' contract: a traced program is only valid for the knob
  value it was traced under. The second chunk here runs with a different
  value, so it must go through a fresh factory dispatch (direct call), not
  the probe's AOT program.
  """
  monkeypatch.setattr(
      backends,
      'resolve_backend',
      lambda b, m, **kw: 'pallas' if b == 'auto' else b,
  )
  calls = _counting_pallas_factory(
      monkeypatch, map_lib, '_make_shardmap_train_fn'
  )
  config = _tiny_config()
  aug, y = _tiny_train_data(config)

  flipped = {'done': False}
  from bayesnf_tpu.utils import checkpoint as ckpt_lib
  real_save = ckpt_lib.TrainCheckpointer.save

  def save_and_flip(self, state):
    real_save(self, state)
    if not flipped['done']:
      monkeypatch.setenv('BNF_FUSED_SUBTILES', '2')
      flipped['done'] = True

  monkeypatch.setattr(ckpt_lib.TrainCheckpointer, 'save', save_and_flip)
  monkeypatch.setenv('BNF_FUSED_SUBTILES', '1')

  _, losses = map_lib.ensemble_map(
      aug, y, config, likelihoods.LikelihoodDist.NORMAL,
      ensemble_size=2, learning_rate=0.01, num_epochs=4,
      seed=jax.random.PRNGKey(0), backend='auto',
      checkpoint_dir=str(tmp_path / 'ck'), checkpoint_every=2,
  )
  assert losses.shape == (2, 4)
  assert 'falling back to xla' not in capsys.readouterr().err
  # Chunk 1: AOT probe under subtiles=1. Chunk 2: subtiles flipped to 2 ->
  # probe key mismatch -> fresh program dispatched directly.
  assert calls == {'lower': 1, 'direct': 1}


def test_vi_probe_compiles_once_per_chunk_size(monkeypatch, tmp_path, capsys):
  """The VI trainer reuses its probe AOT program exactly like the MAP one."""
  from bayesnf_tpu.inference import vi as vi_lib

  monkeypatch.setattr(
      backends,
      'resolve_backend',
      lambda b, m, **kw: 'pallas' if b == 'auto' else b,
  )
  calls = _counting_pallas_factory(monkeypatch, vi_lib, '_make_shardmap_vi_fn')
  config = _tiny_config()
  aug, y = _tiny_train_data(config)

  _, losses, _ = vi_lib.fit_vi(
      aug, y, jax.random.PRNGKey(0), 'NORMAL', config,
      ensemble_size=2, learning_rate=0.01, num_epochs=4,
      sample_size_divergence=2, sample_size_posterior=2, backend='auto',
      checkpoint_dir=str(tmp_path / 'ck'), checkpoint_every=2,
  )
  assert losses.shape == (2, 4)
  assert 'falling back to xla' not in capsys.readouterr().err
  assert calls == {'lower': 1, 'direct': 0}


def test_auto_explicit_pallas_failure_is_not_swallowed(monkeypatch):
  """An explicitly requested pallas backend must surface its failure."""
  def broken_pallas(*args, **kwargs):
    raise RuntimeError('Mosaic failed to compile TPU kernel (simulated)')

  monkeypatch.setattr(map_lib, '_make_shardmap_train_fn', broken_pallas)

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
