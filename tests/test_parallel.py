"""Mesh/sharding-layer tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import pytest

from bayesnf_tpu.parallel import distributed
from bayesnf_tpu.parallel import mesh as mesh_lib


class TestDefaultMesh:

  def test_all_devices_on_ensemble(self):
    mesh = mesh_lib.default_mesh()
    assert mesh.shape == {'ens': 8, 'data': 1}

  def test_data_axis_split(self):
    mesh = mesh_lib.default_mesh(data_devices=4)
    assert mesh.shape == {'ens': 2, 'data': 4}

  def test_invalid_split(self):
    with pytest.raises(ValueError):
      mesh_lib.default_mesh(data_devices=3)
    with pytest.raises(ValueError):
      mesh_lib.default_mesh(ensemble_devices=3, data_devices=2)

  def test_pad_ensemble_size(self):
    mesh = mesh_lib.default_mesh()
    assert mesh_lib.pad_ensemble_size(8, mesh) == 8
    assert mesh_lib.pad_ensemble_size(3, mesh) == 8
    assert mesh_lib.pad_ensemble_size(9, mesh) == 16
    assert mesh_lib.pad_ensemble_size(1, mesh) == 8


class TestMultihostMesh:

  def test_single_process_layout(self):
    mesh = distributed.multihost_mesh(data_devices_per_host=2)
    assert mesh.shape == {'ens': 4, 'data': 2}

  def test_invalid_per_host_split(self):
    with pytest.raises(ValueError):
      distributed.multihost_mesh(data_devices_per_host=3)


def test_mesh_layout_invariance_of_training():
  """Same fit on (8,1), (4,2), (2,4) meshes: numerically equivalent."""
  import jax.numpy as jnp
  from bayesnf_tpu.inference import map as map_lib
  from bayesnf_tpu.models import field as field_lib
  from bayesnf_tpu.models import likelihoods

  config = field_lib.FieldConfig.create(
      width=8, depth=1, input_scales=[30.0], fourier_degrees=[3],
      interactions=[], seasonality_periods=[], num_seasonal_harmonics=[],
  )
  x = np.arange(64, dtype=np.float32).reshape(-1, 1)
  y = np.sin(x[:, 0] / 5).astype(np.float32)
  aug = jnp.asarray(x)

  results = []
  for data_devices in (1, 2, 4):
    mesh = mesh_lib.default_mesh(data_devices=data_devices)
    _, losses = map_lib.ensemble_map(
        aug, y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=4, learning_rate=0.01, num_epochs=10,
        seed=jax.random.PRNGKey(0), mesh=mesh,
    )
    results.append(np.asarray(losses))
  np.testing.assert_allclose(results[0], results[1], rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(results[0], results[2], rtol=1e-4, atol=1e-4)
