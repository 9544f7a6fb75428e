import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax, jax.numpy as jnp, numpy as np
from bayesnf_tpu.inference import predict as predict_lib
from bayesnf_tpu.models import field as field_lib, likelihoods

config = field_lib.FieldConfig.create(
    width=16, depth=2, input_scales=[10., 1.],
    fourier_degrees=[3, 0], interactions=[(0, 1)],
    seasonality_periods=[7.], num_seasonal_harmonics=[2])
K, N = 3, 70
keys = jax.random.split(jax.random.PRNGKey(0), K)
params = jax.vmap(lambda k: field_lib.init_params(config, k))(keys)
params = tuple(p[:, None] if False else p for p in params)
# give params a 2d ensemble shape (1, K) like MAP
params2 = tuple(p[None] for p in params)
rng = np.random.default_rng(1)
x = np.concatenate([np.arange(N, dtype=np.float32)[:, None],
                    rng.normal(size=(N, 1)).astype(np.float32)], -1)
for om in ['NORMAL', 'NB', 'ZINB']:
  outs = {}
  for be in ['xla', 'pallas']:
    means, qs = predict_lib.predict_bnf(
        x, om, params2, config, quantiles=(0.5, 0.9),
        ensemble_dims=2, chunk_size=32, backend=be)
    outs[be] = (np.asarray(means), [np.asarray(q) for q in qs])
  np.testing.assert_allclose(outs['xla'][0], outs['pallas'][0], rtol=2e-5, atol=2e-5)
  for a, b in zip(outs['xla'][1], outs['pallas'][1]):
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
  print(om, 'OK', float(outs['pallas'][0].mean()))
print('ALL OK')
