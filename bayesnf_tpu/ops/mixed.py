"""Mixed-precision matmul with a fully-bf16 backward.

On TPU v5e, f32 matmuls run ~5x slower than bf16 (multi-pass emulation on
the MXU). Naively casting forward operands to bf16 only accelerates the
forward: autodiff's backward matmuls pair a bf16 residual with an f32
cotangent, and XLA upcasts such mixed dots back to the slow f32 path —
measured: bf16-forward-only is *slower* than pure f32 end-to-end.

`matmul_bf16` therefore carries a custom VJP that casts the cotangent to
bf16 so all three matmuls (forward, d_lhs, d_rhs) execute as
bf16 x bf16 -> f32-accumulate. Residuals are stored in bf16, halving
activation memory traffic as a side effect.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def matmul_bf16(a, b):
  """a @ b with bf16 MXU operands and f32 accumulation, fwd and bwd."""
  return jnp.dot(
      a.astype(jnp.bfloat16),
      b.astype(jnp.bfloat16),
      preferred_element_type=jnp.float32,
  )


def _fwd(a, b):
  a16 = a.astype(jnp.bfloat16)
  b16 = b.astype(jnp.bfloat16)
  out = jnp.dot(a16, b16, preferred_element_type=jnp.float32)
  return out, (a16, b16)


def _bwd(res, g):
  a16, b16 = res
  g16 = g.astype(jnp.bfloat16)
  da = jnp.dot(g16, b16.T, preferred_element_type=jnp.float32)
  db = jnp.dot(a16.T, g16, preferred_element_type=jnp.float32)
  return da.astype(jnp.float32), db.astype(jnp.float32)


matmul_bf16.defvjp(_fwd, _bwd)
