"""Device mesh and sharding helpers.

The reference parallelizes with `jax.pmap(jax.vmap(...))` over local devices
(reference inference.py:577-578) and hard-errors when the ensemble is smaller
than the device count (reference spatiotemporal.py:519-521, issue #28).

Here parallelism is an explicit 2-D `jax.sharding.Mesh`:

- axis ``'ens'``: independent ensemble members — the embarrassingly parallel
  axis; zero collectives on the training path.
- axis ``'data'``: shards the observation dimension of each training batch;
  GSPMD inserts the loss/gradient all-reduce over ICI automatically. Size 1
  on a single chip (no-op), > 1 for large-N multi-chip configs.

Any ensemble size works on any device count: the member axis is padded up to
a multiple of the mesh's ensemble extent and the padding members are dropped
on the way out (fixes reference issue #28).
"""

import math

import jax
from jax.sharding import Mesh
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P
import numpy as np

ENSEMBLE_AXIS = 'ens'
DATA_AXIS = 'data'


def default_mesh(
    devices=None, ensemble_devices: int | None = None, data_devices: int = 1
) -> Mesh:
  """Build the ('ens', 'data') mesh over the available devices.

  By default all devices go to the ensemble axis — the reference's only
  parallelism strategy, generalized. Pass `data_devices > 1` to carve out a
  data-sharding axis (total devices must equal ens * data).
  """
  if devices is None:
    devices = jax.devices()
  n = len(devices)
  if ensemble_devices is None:
    if n % data_devices != 0:
      raise ValueError(f'{data_devices=} must divide device count {n}.')
    ensemble_devices = n // data_devices
  if ensemble_devices * data_devices != n:
    raise ValueError(
        f'{ensemble_devices=} * {data_devices=} != device count {n}.'
    )
  grid = np.asarray(devices).reshape(ensemble_devices, data_devices)
  return Mesh(grid, (ENSEMBLE_AXIS, DATA_AXIS))


def pad_ensemble_size(ensemble_size: int, mesh: Mesh) -> int:
  """Smallest multiple of the mesh's ensemble extent >= ensemble_size."""
  extent = mesh.shape[ENSEMBLE_AXIS]
  return int(math.ceil(ensemble_size / extent) * extent)


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
  """Sharding for arrays whose leading axis is the ensemble-member axis."""
  return NamedSharding(mesh, P(ENSEMBLE_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
  """Sharding for arrays whose leading axis is the observation axis."""
  return NamedSharding(mesh, P(DATA_AXIS))


def data_sharding_t(mesh: Mesh) -> NamedSharding:
  """Sharding for features-major arrays (observation axis second)."""
  return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())
