"""Multi-host (DCN) scale-out helpers.

The reference is single-host only (`jax.pmap` over local devices; no
`jax.distributed`, SURVEY.md §2.4). Here multi-host runs use the standard
JAX distributed runtime plus the same ('ens', 'data') mesh, laid out so:

- the ensemble axis spans hosts (members are independent — zero DCN traffic
  during training);
- the data axis stays within each host's ICI domain (its loss all-reduce
  never crosses DCN).

Typical pod-slice usage (same script on every host):

    from bayesnf_tpu.parallel import distributed
    distributed.initialize()                 # env-driven (TPU pods: no args)
    mesh = distributed.multihost_mesh(data_devices_per_host=1)
    model.fit(df, seed, ensemble_size=256, mesh=mesh)

Every host must run the same fit with the same arguments (standard SPMD);
params_/losses_ are fully addressable on each host afterward because the
final device_get gathers across processes.
"""

import numpy as np

import jax
from jax.sharding import Mesh

from bayesnf_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address=None, num_processes=None, process_id=None):
  """Initialize the JAX distributed runtime (no-op if already initialized).

  On Cloud TPU pods all arguments are discovered from the environment;
  elsewhere pass them explicitly (see `jax.distributed.initialize`).
  """
  try:
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
  except RuntimeError as e:  # already initialized
    if 'already initialized' not in str(e):
      raise


def multihost_mesh(data_devices_per_host: int = 1) -> Mesh:
  """('ens', 'data') mesh over all hosts' devices.

  Devices are arranged host-major on the ensemble axis so that each host's
  local devices form contiguous ensemble groups, and the data axis (if > 1)
  is built from devices of the same host (ICI, not DCN).
  """
  devices = np.asarray(jax.devices())
  num_local = jax.local_device_count()
  if num_local % data_devices_per_host != 0:
    raise ValueError(
        f'{data_devices_per_host=} must divide local device count'
        f' {num_local}.'
    )
  grid = devices.reshape(-1, data_devices_per_host)
  return Mesh(grid, (mesh_lib.ENSEMBLE_AXIS, mesh_lib.DATA_AXIS))
