"""Mixed-precision matmul: value and gradient correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from bayesnf_tpu.ops import mixed


def test_forward_close_to_f32():
  rng = np.random.default_rng(0)
  a = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
  b = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
  got = np.asarray(mixed.matmul_bf16(a, b))
  want = np.asarray(a) @ np.asarray(b)
  # bf16 operands: ~3 decimal digits.
  np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_gradients_close_to_f32_autodiff():
  rng = np.random.default_rng(1)
  a = jnp.asarray(rng.normal(size=(40, 24)).astype(np.float32))
  b = jnp.asarray(rng.normal(size=(24, 8)).astype(np.float32))
  w = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))

  loss_mixed = lambda a, b: jnp.sum(mixed.matmul_bf16(a, b) * w)
  loss_f32 = lambda a, b: jnp.sum((a @ b) * w)

  ga_m, gb_m = jax.grad(loss_mixed, argnums=(0, 1))(a, b)
  ga_f, gb_f = jax.grad(loss_f32, argnums=(0, 1))(a, b)
  np.testing.assert_allclose(np.asarray(ga_m), np.asarray(ga_f), rtol=5e-2,
                             atol=5e-2)
  np.testing.assert_allclose(np.asarray(gb_m), np.asarray(gb_f), rtol=5e-2,
                             atol=5e-2)


def test_vmap_batches():
  rng = np.random.default_rng(2)
  a = jnp.asarray(rng.normal(size=(4, 10, 6)).astype(np.float32))
  b = jnp.asarray(rng.normal(size=(4, 6, 3)).astype(np.float32))
  got = jax.vmap(mixed.matmul_bf16)(a, b)
  want = jnp.einsum('bij,bjk->bik', a, b)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2,
                             atol=3e-2)
