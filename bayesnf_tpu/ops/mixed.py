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
  # Fence from producer fusion so both dots hit the MXU (see matmul_f32).
  a16, b16, g16 = jax.lax.optimization_barrier((a16, b16, g16))
  da = jnp.dot(g16, b16.T, preferred_element_type=jnp.float32)
  db = jnp.dot(a16.T, g16, preferred_element_type=jnp.float32)
  return da.astype(jnp.float32), db.astype(jnp.float32)


matmul_bf16.defvjp(_fwd, _bwd)


@jax.custom_vjp
def matmul_f32(a, b):
  """a @ b (f32) whose backward dots are fenced from producer fusion.

  Profiling the v5e training step showed XLA fusing the weight-gradient
  contraction (dW = h^T dz, a huge-N outer-product reduction) into its
  elementwise producer chain as a VPU multiply+reduce — ~7x slower than the
  same contraction as a standalone MXU dot. An `optimization_barrier` on
  the backward operands forces materialization, letting XLA emit real dots.
  """
  return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _f32_fwd(a, b):
  return jnp.dot(a, b, preferred_element_type=jnp.float32), (a, b)


def _f32_bwd(res, g):
  a, b = res
  a, b, g = jax.lax.optimization_barrier((a, b, g))
  da = jnp.dot(g, b.T, preferred_element_type=jnp.float32)
  db = jnp.dot(a.T, g, preferred_element_type=jnp.float32)
  return da, db


matmul_f32.defvjp(_f32_fwd, _f32_bwd)
