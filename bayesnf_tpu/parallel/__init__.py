"""Device-mesh construction and ensemble sharding utilities."""

from bayesnf_tpu.parallel.mesh import default_mesh
from bayesnf_tpu.parallel.mesh import ensemble_sharding
from bayesnf_tpu.parallel.mesh import pad_ensemble_size
from bayesnf_tpu.parallel.mesh import replicated_sharding

__all__ = [
    'default_mesh',
    'ensemble_sharding',
    'pad_ensemble_size',
    'replicated_sharding',
]
