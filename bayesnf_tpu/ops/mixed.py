"""Precision-controlled matmuls with fusion-fenced backwards.

Three tiers (all f32-accumulating via `preferred_element_type`):

- `matmul_f32`: plain dots. NOTE (verified on-device): under JAX's TPU
  default matmul precision these already execute with bf16 MXU operands —
  bit-identical to `matmul_bf16` there — so on TPU this is a labeling
  default, not a slower path.
- `matmul_bf16`: EXPLICIT bf16 operand casts, forward and backward (the
  custom VJP casts the cotangent too, so all three dots are uniformly
  bf16 on any stack, and residuals are stored in bf16 — halving
  activation memory traffic). Meaningful on backends whose default dot
  precision is true f32 (e.g. CPU), and self-documenting on TPU.
- `matmul_highest`: `Precision.HIGHEST` multi-pass true-f32 MXU
  arithmetic on all three dots — the only way to get tighter-than-bf16
  operands on TPU.

All tiers fence their backward dots with `optimization_barrier`:
profiling the v5e training step showed XLA fusing the weight-gradient
contraction (dW = h^T dz, a huge-N outer-product reduction) into its
elementwise producer chain as a VPU multiply+reduce ~7x slower than the
same contraction as a standalone MXU dot.
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


@jax.custom_vjp
def matmul_highest(a, b):
  """a @ b with Precision.HIGHEST (multi-pass true-f32 MXU arithmetic).

  Same fusion fence on the backward dots as `matmul_f32` — without it XLA
  can fuse the weight-gradient contraction into its elementwise producer
  chain as a slow VPU multiply+reduce.
  """
  return jnp.dot(
      a, b, precision=jax.lax.Precision.HIGHEST,
      preferred_element_type=jnp.float32,
  )


def _hi_fwd(a, b):
  out = jnp.dot(
      a, b, precision=jax.lax.Precision.HIGHEST,
      preferred_element_type=jnp.float32,
  )
  return out, (a, b)


def _hi_bwd(res, g):
  a, b = res
  a, b, g = jax.lax.optimization_barrier((a, b, g))
  da = jnp.dot(
      g, b.T, precision=jax.lax.Precision.HIGHEST,
      preferred_element_type=jnp.float32,
  )
  db = jnp.dot(
      a.T, g, precision=jax.lax.Precision.HIGHEST,
      preferred_element_type=jnp.float32,
  )
  return da, db


matmul_highest.defvjp(_hi_fwd, _hi_bwd)
