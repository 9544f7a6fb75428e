import os
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax, jax.numpy as jnp, numpy as np
from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.ops import fused_mlp

config = field_lib.FieldConfig.create(
    width=16, depth=2, input_scales=[10., 1.],
    fourier_degrees=[3, 0], interactions=[(0, 1)],
    seasonality_periods=[7.], num_seasonal_harmonics=[2])
K, N = 3, 70
keys = jax.random.split(jax.random.PRNGKey(0), K)
params = jax.vmap(lambda k: field_lib.init_params(config, k))(keys)
rng = np.random.default_rng(1)
x = np.concatenate([np.arange(N, dtype=np.float32)[:, None],
                    rng.normal(size=(N, 1)).astype(np.float32)], -1)
x = jnp.asarray(x)
seasonal = field_lib.seasonal_features_for(config, x)
x_t, seas_t = x.T, seasonal.T

want = jax.vmap(lambda p: field_lib.apply_field_t(config, p, x_t, seas_t))(params)

groups = jax.vmap(lambda p: tuple(field_lib.encode_t_groups(config, p, x_t, seas_t)))(params)
num_w = config.depth + 1
weights = tuple(params[field_lib.IDX_FIRST_DENSE + 2*l] for l in range(num_w))
biases = tuple(params[field_lib.IDX_FIRST_DENSE + 2*l + 1] for l in range(num_w))
got = fused_mlp.fused_field_mlp_t(
    config.depth, 128, 'f32', groups, weights, biases,
    params[field_lib.IDX_LAYER_SCALES], params[field_lib.IDX_ACTIVATION_LOGIT])
d = np.abs(np.asarray(got) - np.asarray(want))
print('max abs diff', d.max(), 'max rel', (d / (np.abs(np.asarray(want)) + 1e-12)).max())

# triangulate: oracle on concatenated h0
h0 = jnp.concatenate(groups, axis=1)  # (K, F, N)
def one_member(h, ws, bs, sr, lg):
  s = jax.nn.softplus(sr); w = jax.nn.sigmoid(lg)
  for l in range(config.depth):
    h = h / jnp.sqrt(h.shape[-1] * 1.0)
    z = s[l] * (h @ ws[l] + bs[l])
    h = w * jax.nn.elu(z) + (1 - w) * jnp.tanh(z)
  h = h / jnp.sqrt(h.shape[-1] * 1.0)
  return s[config.depth] * (h @ ws[config.depth] + bs[config.depth])[:, 0]
oracle = jax.vmap(one_member)(jnp.swapaxes(h0, 1, 2), weights, biases,
                              params[field_lib.IDX_LAYER_SCALES],
                              params[field_lib.IDX_ACTIVATION_LOGIT])
d1 = np.abs(np.asarray(oracle) - np.asarray(want)).max()
d2 = np.abs(np.asarray(oracle) - np.asarray(got)).max()
print('oracle-vs-apply_field_t', d1, ' oracle-vs-kernel', d2)
# single-group: pass concatenated h0 as ONE group
got1 = fused_mlp.fused_field_mlp_t(
    config.depth, 128, 'f32', (h0,), weights, biases,
    params[field_lib.IDX_LAYER_SCALES], params[field_lib.IDX_ACTIVATION_LOGIT])
print('onegroup-vs-kernel', np.abs(np.asarray(got1) - np.asarray(got)).max(),
      'onegroup-vs-oracle', np.abs(np.asarray(got1) - np.asarray(oracle)).max())
