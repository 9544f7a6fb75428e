import jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_platforms', 'cpu')
from bayesnf_tpu.ops import fused_mlp

def oracle(depth, h0, weights, biases, scales_raw, logit):
  def one_member(h, ws, bs, sr, lg):
    s = jax.nn.softplus(sr); w = jax.nn.sigmoid(lg)
    for l in range(depth):
      h = h / jnp.sqrt(h.shape[-1] * 1.0)
      z = s[l] * (h @ ws[l] + bs[l])
      h = w * jax.nn.elu(z) + (1 - w) * jnp.tanh(z)
    h = h / jnp.sqrt(h.shape[-1] * 1.0)
    return s[depth] * (h @ ws[depth] + bs[depth])[:, 0]
  return jax.vmap(one_member)(h0, weights, biases, scales_raw, logit)

def make(e, n, f, width, depth, seed=0):
  rng = np.random.default_rng(seed)
  h0 = jnp.asarray(rng.normal(size=(e, n, f)).astype(np.float32))
  fan_ins = [f] + [width] * (depth - 1) + [width]
  fan_outs = [width] * depth + [1]
  ws = tuple(jnp.asarray(rng.normal(size=(e, fi, fo)).astype(np.float32) * .5)
             for fi, fo in zip(fan_ins, fan_outs))
  bs = tuple(jnp.asarray(rng.normal(size=(e, fo)).astype(np.float32) * .3)
             for fo in fan_outs)
  sr = jnp.asarray(rng.normal(size=(e, depth + 1)).astype(np.float32))
  lg = jnp.asarray(rng.normal(size=(e,)).astype(np.float32))
  return h0, ws, bs, sr, lg

for (f, n, tile) in [(12, 70, 32), (13, 70, 32), (12, 70, 128), (13, 70, 128), (13, 128, 128), (12, 128, 128)]:
  h0, ws, bs, sr, lg = make(3, n, f, 16, 2)
  want = oracle(2, h0, ws, bs, sr, lg)
  h0t = jnp.swapaxes(h0, 1, 2)
  got = fused_mlp.fused_field_mlp_t(2, tile, 'f32', (h0t,), ws, bs, sr, lg)
  print(f'f={f} n={n} tile={tile} maxdiff={np.abs(np.asarray(got)-np.asarray(want)).max():.2e}')
