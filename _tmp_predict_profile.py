import time
import jax, jax.numpy as jnp, numpy as np
from bayesnf_tpu.inference import predict as predict_lib, map as map_lib, quantiles as quantiles_lib
from bayesnf_tpu.models import field as field_lib, likelihoods
from bayesnf_tpu.parallel import mesh as mesh_lib

n_rows, width, ensemble = 38096, 512, 64
config = field_lib.FieldConfig.create(
    width=width, depth=2, input_scales=[float(n_rows-1),1.,1.],
    fourier_degrees=[5,5,5], interactions=[],
    seasonality_periods=[24., 168.], num_seasonal_harmonics=[4,4])
rng = np.random.default_rng(0)
t = np.arange(n_rows, dtype=np.float32)
space = rng.normal(size=(n_rows,2)).astype(np.float32)
x = jnp.asarray(np.concatenate([t[:,None], space], -1))
y = jnp.asarray((10*np.sin(2*np.pi*t/24)+space[:,0]).astype(np.float32))
seasonal = field_lib.seasonal_features_for(config, x)
aug = jnp.concatenate([x, seasonal], -1)
params, _ = map_lib.ensemble_map(aug, y, config, likelihoods.LikelihoodDist.NORMAL,
    ensemble_size=ensemble, learning_rate=0.005, num_epochs=3,
    seed=jax.random.PRNGKey(0), batch_size=None, prior_weight=1.0,
    mesh=mesh_lib.default_mesh(), backend='xla')

def bench_case(label, quantiles, iters=None):
  import bayesnf_tpu.inference.quantiles as q
  orig = q.find_root_chandrupatla
  if iters is not None:
    import functools
    def patched(f, low, high, **kw):
      kw['max_iterations'] = iters
      return orig(f, low, high, **kw)
    q.find_root_chandrupatla = patched
  predict_lib._make_predict_fn.cache_clear()
  fn = predict_lib._make_predict_fn(config, likelihoods.LikelihoodDist.NORMAL,
      quantiles, 1, False, 4096)
  @jax.jit
  def reduced(p, xx):
    means, qs = fn(p, xx)
    return means.sum() + sum(qq.sum() for qq in qs)
  v = float(reduced(params, x))
  t0 = time.perf_counter()
  for _ in range(5): float(reduced(params, x))
  dt = (time.perf_counter()-t0)/5*1000
  q.find_root_chandrupatla = orig
  print(f"{label}: {dt:.1f} ms  checksum={v:.4f}")

bench_case("means only (no quantiles)", ())
bench_case("3 quantiles, 60 iters", (0.5, 0.025, 0.975))
bench_case("3 quantiles, 15 iters", (0.5, 0.025, 0.975), iters=15)
bench_case("3 quantiles, 5 iters", (0.5, 0.025, 0.975), iters=5)
