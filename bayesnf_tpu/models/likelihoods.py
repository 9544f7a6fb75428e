"""Observation models: NORMAL, NB, ZINB as branch-free vectorized functions.

Parity with the reference's TFP-based likelihood factory
(`/root/reference/src/bayesnf/models.py:106-194`), reimplemented as plain
log-prob / parameter functions with the branch selected at trace time:

- NORMAL: y ~ Normal(pred, 0.01 + exp(log_noise_scale)).
- NB: mean = softplus(pred), shape = softplus(nb_shape_raw);
  total_count = 1/shape, logits = -log(shape) - log(mean) (the DeepAR
  parametrization, reference models.py:166-176).
- ZINB: NB plus inflated-zero probability sigmoid(zinb_logit).

The log-likelihood of a batch is the *sum* over observations (the reference
wraps everything in `tfd.Independent(., 1)`).
"""

import enum

import jax
import jax.numpy as jnp

from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.ops import special


class LikelihoodDist(enum.Enum):
  NORMAL = 'NORMAL'
  NB = 'NB'
  ZINB = 'ZINB'


def log_likelihood(
    distribution: LikelihoodDist,
    params: tuple,
    pred: jax.Array,
    y: jax.Array,
    weights: jax.Array | None = None,
) -> jax.Array:
  """Summed log-likelihood of observations `y` given predictions `pred`.

  Args:
    distribution: which observation model (trace-time constant).
    params: flat parameter tuple (single member); only the three leading
      scalars are consumed here.
    pred: (B,) field predictions.
    y: (B,) observed targets.
    weights: optional (B,) per-observation weights (e.g. 0 for padding rows
      in chunked gradient accumulation).

  Returns:
    Scalar (weighted) sum of elementwise log-probs.
  """
  wsum = (lambda lp: jnp.sum(lp)) if weights is None else (
      lambda lp: jnp.sum(lp * weights)
  )
  if distribution == LikelihoodDist.NORMAL:
    scale = 0.01 + jnp.exp(params[field_lib.IDX_LOG_NOISE_SCALE])
    return wsum(special.normal_log_prob(y, pred, scale))

  shape = jax.nn.softplus(params[field_lib.IDX_NB_SHAPE_RAW])
  total_count = 1.0 / shape
  # log(softplus(pred)) computed stably (no -inf/NaN for very negative pred).
  logits = -jnp.log(shape) - special.log_softplus(pred)

  if distribution == LikelihoodDist.NB:
    return wsum(special.nb_log_prob(y, total_count, logits))

  if distribution == LikelihoodDist.ZINB:
    nb_lp = special.nb_log_prob(y, total_count, logits)
    log_pi = jax.nn.log_sigmoid(params[field_lib.IDX_ZINB_LOGIT])
    log_one_minus_pi = jax.nn.log_sigmoid(-params[field_lib.IDX_ZINB_LOGIT])
    # At y == 0 the density is pi + (1-pi)*NB(0); elsewhere (1-pi)*NB(y).
    zero_lp = jnp.logaddexp(log_pi, log_one_minus_pi + nb_lp)
    nonzero_lp = log_one_minus_pi + nb_lp
    return wsum(jnp.where(y == 0, zero_lp, nonzero_lp))

  raise AssertionError(f'Unknown likelihood distribution: {distribution}')


def forecast_params(
    distribution: LikelihoodDist, params: tuple, pred: jax.Array
) -> tuple[jax.Array, ...]:
  """Raw distribution parameters per observation model.

  Matches the reference's `_make_forecast_inner` contract
  (inference.py:103-126):

  - NORMAL -> (loc (B,), scale ())
  - NB     -> (total_count (), logits (B,))
  - ZINB   -> (total_count (), logits (B,), inflated_loc_probs (B,))
  """
  if distribution == LikelihoodDist.NORMAL:
    scale = 0.01 + jnp.exp(params[field_lib.IDX_LOG_NOISE_SCALE])
    return (pred, scale)

  shape = jax.nn.softplus(params[field_lib.IDX_NB_SHAPE_RAW])
  total_count = 1.0 / shape
  logits = -jnp.log(shape) - special.log_softplus(pred)

  if distribution == LikelihoodDist.NB:
    return (total_count, logits)
  if distribution == LikelihoodDist.ZINB:
    pi = jax.nn.sigmoid(params[field_lib.IDX_ZINB_LOGIT])
    return (total_count, logits, pi * jnp.ones_like(logits))
  raise AssertionError(f'Unknown likelihood distribution: {distribution}')
