"""Lightweight, self-contained distribution objects.

These back the public `likelihood_model()` accessor and the quantile engine,
replacing the reference's TFP distribution objects
(`tfd.Normal` / `tfd.NegativeBinomial` / `tfd.ZeroInflatedNegativeBinomial` /
`tfd.Independent`, reference models.py:157-191) with minimal JAX-native
classes. All methods are vectorized and jit-safe; parameters broadcast
against event arguments exactly as in TFP.
"""

import dataclasses

import jax
import jax.numpy as jnp

from bayesnf_tpu.ops import special


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Normal:
  """Normal(loc, scale)."""

  loc: jax.Array
  scale: jax.Array

  def mean(self):
    return self.loc * jnp.ones_like(self.scale * self.loc)

  def stddev(self):
    return self.scale * jnp.ones_like(self.loc)

  def variance(self):
    return jnp.square(self.stddev())

  def log_prob(self, x):
    return special.normal_log_prob(x, self.loc, self.scale)

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def cdf(self, x):
    return special.normal_cdf(x, self.loc, self.scale)

  def quantile(self, q):
    return special.normal_quantile(q, self.loc, self.scale)

  def sample(self, key, sample_shape=()):
    shape = tuple(sample_shape) + jnp.broadcast_shapes(
        jnp.shape(self.loc), jnp.shape(self.scale)
    )
    return self.loc + self.scale * jax.random.normal(key, shape)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NegativeBinomial:
  """NegativeBinomial(total_count, logits), TFP parametrization.

  log-pmf: lgamma(r+x) - lgamma(1+x) - lgamma(r)
           + r*log_sigmoid(-logits) + x*log_sigmoid(logits).
  mean = total_count * exp(logits); variance = mean / sigmoid(-logits).
  """

  total_count: jax.Array
  logits: jax.Array

  def mean(self):
    return special.nb_mean(self.total_count, self.logits)

  def variance(self):
    return special.nb_variance(self.total_count, self.logits)

  def stddev(self):
    return jnp.sqrt(self.variance())

  def log_prob(self, x):
    return special.nb_log_prob(x, self.total_count, self.logits)

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def cdf(self, x):
    return special.nb_cdf(x, self.total_count, self.logits)

  def sample(self, key, sample_shape=()):
    # Gamma-Poisson mixture: X ~ Poisson(Gamma(r, rate) * exp(logits) * rate).
    gamma_key, poisson_key = jax.random.split(key)
    shape = tuple(sample_shape) + jnp.broadcast_shapes(
        jnp.shape(self.total_count), jnp.shape(self.logits)
    )
    rate = (
        jax.random.gamma(gamma_key, jnp.broadcast_to(self.total_count, shape))
        * jnp.exp(self.logits)
    )
    return jax.random.poisson(poisson_key, rate).astype(jnp.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZeroInflatedNegativeBinomial:
  """Mixture pi * delta_0 + (1 - pi) * NegativeBinomial."""

  total_count: jax.Array
  logits: jax.Array
  inflated_loc_probs: jax.Array

  @property
  def _nb(self):
    return NegativeBinomial(self.total_count, self.logits)

  def mean(self):
    return (1.0 - self.inflated_loc_probs) * self._nb.mean()

  def variance(self):
    nb = self._nb
    second_moment = (1.0 - self.inflated_loc_probs) * (
        nb.variance() + jnp.square(nb.mean())
    )
    return second_moment - jnp.square(self.mean())

  def stddev(self):
    return jnp.sqrt(self.variance())

  def log_prob(self, x):
    pi = self.inflated_loc_probs
    nb_lp = self._nb.log_prob(x)
    zero_lp = jnp.logaddexp(jnp.log(pi), jnp.log1p(-pi) + nb_lp)
    return jnp.where(x == 0, zero_lp, jnp.log1p(-pi) + nb_lp)

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def cdf(self, x):
    step = jnp.where(x >= 0, 1.0, 0.0)
    return self.inflated_loc_probs * step + (
        1.0 - self.inflated_loc_probs
    ) * self._nb.cdf(x)

  def sample(self, key, sample_shape=()):
    mix_key, nb_key = jax.random.split(key)
    # The batch shape includes pi (as in TFP): a wider inflated_loc_probs
    # must widen the draw, not crash the broadcast below.
    batch = jnp.broadcast_shapes(
        jnp.shape(self.total_count),
        jnp.shape(self.logits),
        jnp.shape(self.inflated_loc_probs),
    )
    shape = tuple(sample_shape) + batch
    # Widen the NB params BEFORE sampling so every batch element gets an
    # independent draw (broadcasting the draw afterwards would alias them).
    nb_wide = NegativeBinomial(
        jnp.broadcast_to(self.total_count, batch),
        jnp.broadcast_to(self.logits, batch),
    )
    nb_draw = nb_wide.sample(nb_key, sample_shape)
    inflate = jax.random.bernoulli(
        mix_key, jnp.broadcast_to(self.inflated_loc_probs, shape)
    )
    return jnp.where(inflate, 0.0, nb_draw)


def count_obs_dist(total_count, logits, inflated_loc_probs=None):
  """Count observation distribution from flat forecast parameters.

  THE construction shared by every predict-path site (the in-memory
  predictor, both streamed-predict passes, `likelihood_model`):
  per-member scalar `total_count` broadcasts over the per-row `logits`
  via a trailing axis. The streamed-vs-in-memory bit-identity contract
  requires every site to build the object identically, so none of them
  may inline this.
  """
  tc = total_count[..., jnp.newaxis]
  if inflated_loc_probs is None:
    return NegativeBinomial(total_count=tc, logits=logits)
  return ZeroInflatedNegativeBinomial(
      total_count=tc, logits=logits, inflated_loc_probs=inflated_loc_probs
  )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Independent:
  """Reinterpret the rightmost `ndims` batch dims as event dims.

  Only what the public API needs: sums log-probs over the event axes and
  forwards moments/sampling to the base distribution.
  """

  distribution: object
  reinterpreted_batch_ndims: int = dataclasses.field(
      default=1, metadata=dict(static=True)
  )

  def log_prob(self, x):
    lp = self.distribution.log_prob(x)
    axes = tuple(range(-self.reinterpreted_batch_ndims, 0))
    return jnp.sum(lp, axis=axes)

  def mean(self):
    return self.distribution.mean()

  def stddev(self):
    return self.distribution.stddev()

  def variance(self):
    return self.distribution.variance()

  def cdf(self, x):
    # Joint CDF of independent components: product over the event axes
    # (consistent with log_prob's sum, and with TFP's Independent).
    axes = tuple(range(-self.reinterpreted_batch_ndims, 0))
    return jnp.prod(self.distribution.cdf(x), axis=axes)

  def prob(self, x):
    # prob must equal exp(log_prob): reduce over the event axes.
    return jnp.exp(self.log_prob(x))

  def sample(self, key, sample_shape=()):
    return self.distribution.sample(key, sample_shape)
