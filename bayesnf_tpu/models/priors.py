"""Prior over field parameters: i.i.d. Logistic on every leaf.

Parity with the reference prior (`/root/reference/src/bayesnf/models.py:91-103`
and `inference.py:261-268`): every parameter entry gets an elementwise
Logistic(loc, 1) density — loc 0 everywhere except the NB shape parameter
(loc -1.5). Implemented as a single branch-free log-density sum driven by the
:func:`bayesnf_tpu.models.field.param_specs` table, instead of a TFP
JointDistributionCoroutine.
"""

import jax.numpy as jnp

from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.ops import special


def prior_log_prob(config: field_lib.FieldConfig, params: tuple) -> jnp.ndarray:
  """Total log-density of the Logistic prior over one member's params."""
  specs = field_lib.param_specs(config)
  total = jnp.zeros((), dtype=jnp.float32)
  for spec, p in zip(specs, params):
    total += jnp.sum(special.logistic_log_prob(p, loc=spec.prior_loc))
  return total


def sample_prior(config: field_lib.FieldConfig, key) -> tuple:
  """Draw one member's params from the prior (logistic inverse-CDF)."""
  import jax

  specs = field_lib.param_specs(config)
  keys = jax.random.split(key, len(specs))
  out = []
  for spec, k in zip(specs, keys):
    u = jax.random.uniform(
        k, spec.shape, minval=1e-6, maxval=1.0 - 1e-6, dtype=jnp.float32
    )
    out.append(spec.prior_loc + jnp.log(u) - jnp.log1p(-u))
  return tuple(out)
