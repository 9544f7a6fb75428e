"""Fused ensemble field-MLP Pallas TPU kernels.

Motivation (measured on v5e, 64-member x 38k-row x width-512 workload): the
XLA backward pass runs at ~half the forward's MXU efficiency because every
layer's activations round-trip HBM between the forward and backward
programs (~0.5 GB/member/step). These kernels keep the whole per-tile
forward AND backward resident in VMEM:

- grid (E, N/tile): member-major, so each member's weights are DMA'd into
  VMEM once and reused across all row tiles;
- the backward kernel *recomputes* the forward for its tile (flash-style)
  instead of loading stored activations — HBM traffic drops to the encoded
  inputs plus the weights;
- weight/bias/scalar gradients are accumulated in VMEM across row tiles
  via output-block revisiting (init at tile 0, += after).

The op computes, per ensemble member e (cf. reference models.py:263-273):

    h_0 = encoded features (precomputed outside; XLA fuses the encode)
    for l in 0..depth-1:
        z_l = s_l * (h_l / sqrt(fan_in) @ W_l + b_l)
        h_{l+1} = w * elu(z_l) + (1 - w) * tanh(z_l)
    pred = s_out * (h_depth / sqrt(width) @ W_out + b_out)[:, 0]

with s_l = softplus(layer_scales_raw[l]) and w = sigmoid(activation_logit).

Exposed as `fused_field_mlp` with a custom VJP; gradients match JAX autodiff
of the pure-JAX model (validated in tests/test_fused_mlp.py).
"""

import functools
import math
import os
import zlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayesnf_tpu.ops import special


def _interpret() -> bool:
  """Run Pallas in interpreter mode off-TPU (CPU tests / debugging)."""
  return jax.default_backend() != 'tpu'


def pick_tile(width: int, rows: int) -> int:
  """Row-tile heuristic (measured on v5e, width-512 x 38k workload).

  Larger tiles amortize per-cell sequencing (2048 beats 512 by ~7%), but
  tile x width activation buffers must stay well inside VMEM, and tiny
  batches shouldn't pad up to a huge tile.
  """
  cap = 2048 if width <= 512 else 1024 if width <= 1024 else 512
  return min(cap, max(128, math.ceil(rows / 128) * 128))


def resolve_subtiles(subtiles: int | None = None) -> int:
  """Resolve the subtile split (BNF_FUSED_SUBTILES env var when unset).

  Callers that cache traced programs (the lru_cached trainer factories)
  must resolve the env var through this helper *before* their cache
  lookup, so a changed env var is a new cache key rather than silently
  reusing a program traced under the old value.
  """
  if subtiles is None:
    return int(os.environ.get('BNF_FUSED_SUBTILES', '1'))
  return int(subtiles)


def _act_parts(z):
  """(elu(z), tanh(z), elu'(z)).

  tanh uses the VPU's fast hardware path; elu shares one exp between the
  value (q - 1) and derivative (q) on the negative branch.
  """
  q = jnp.exp(jnp.minimum(z, 0.0))
  tanh = jnp.tanh(z)
  elu = jnp.where(z > 0, z, q - 1.0)
  delu = jnp.where(z > 0, jnp.ones_like(z), q)
  return elu, tanh, delu


def _act(z, w):
  elu, tanh, _ = _act_parts(z)
  return w * elu + (1.0 - w) * tanh


def _act_grad(z, w):
  """(d act/d z, d act/d w) evaluated elementwise."""
  elu, tanh, delu = _act_parts(z)
  dtanh = 1.0 - tanh * tanh
  return w * delu + (1.0 - w) * dtanh, elu - tanh


def _mm(a, b, compute_dtype):
  # Dots whose result has a size-1 minor dim stay f32: Mosaic lowers them
  # via a multiply+reduce whose bf16->f32 vector.broadcast fails to verify
  # (and they are tiny VPU ops with no MXU upside anyway).
  # compute_dtype 'highest' selects multi-pass true-f32 MXU arithmetic
  # (the TPU default already truncates f32 dot operands to bf16).
  if compute_dtype == 'highest':
    return jnp.dot(
        a, b, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
  if compute_dtype is not None and b.shape[-1] > 1:
    # Explicit bf16 mode means ONE-pass bf16 MXU operands: pin DEFAULT so
    # an ambient jax_default_matmul_precision='highest' (e.g. the compiled
    # test sweep) cannot request multi-pass emulation on bf16 inputs,
    # which Mosaic's compiler rejects.
    return jnp.dot(
        a.astype(compute_dtype), b.astype(compute_dtype),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
  return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _forward_kernel(depth, rsqrts, compute_dtype, h0_ref, *refs):
  """Forward for one (member, row-tile) grid cell."""
  num_w = depth + 1
  w_refs = refs[:num_w]
  b_refs = refs[num_w : 2 * num_w]
  scales_ref, logit_ref, pred_ref = refs[2 * num_w : 2 * num_w + 3]

  s = jax.nn.softplus(scales_ref[0, 0])
  w = jax.nn.sigmoid(logit_ref[0, 0, 0])

  h = h0_ref[0]
  for l in range(depth):
    z = s[l] * (
        _mm(h * rsqrts[l], w_refs[l][0], compute_dtype) + b_refs[l][0, 0]
    )
    h = _act(z, w)
  out = s[depth] * (
      _mm(h * rsqrts[depth], w_refs[depth][0], compute_dtype)
      + b_refs[depth][0, 0]
  )
  pred_ref[0] = out


def _backward_kernel(depth, rsqrts, compute_dtype, h0_ref, *refs):
  """Backward for one grid cell: recompute forward, then reverse chain.

  Gradient outputs for weights/biases/scalars are accumulated across the
  row-tile grid dimension (same output block revisited; zeroed at tile 0).
  """
  num_w = depth + 1
  w_refs = refs[:num_w]
  b_refs = refs[num_w : 2 * num_w]
  scales_ref, logit_ref, g_ref = refs[2 * num_w : 2 * num_w + 3]
  out_refs = refs[2 * num_w + 3 :]
  dh0_ref = out_refs[0]
  dw_refs = out_refs[1 : 1 + num_w]
  db_refs = out_refs[1 + num_w : 1 + 2 * num_w]
  dscales_ref = out_refs[1 + 2 * num_w]
  dlogit_ref = out_refs[2 + 2 * num_w]

  t = pl.program_id(1)

  raw_s = scales_ref[0, 0]
  s = jax.nn.softplus(raw_s)
  ds_raw = jax.nn.sigmoid(raw_s)  # d softplus(raw)/d raw
  logit = logit_ref[0, 0, 0]
  w = jax.nn.sigmoid(logit)

  # --- Recompute forward, keeping pre-matmul inputs and pre-activations.
  hs = []  # h_l * rsqrt (the matmul LHS per layer)
  zs = []  # pre-activation z_l
  h = h0_ref[0]
  for l in range(depth):
    lhs = h * rsqrts[l]
    z = s[l] * (_mm(lhs, w_refs[l][0], compute_dtype) + b_refs[l][0, 0])
    hs.append(lhs)
    zs.append(z)
    h = _act(z, w)
  lhs_out = h * rsqrts[depth]
  v_out = (
      _mm(lhs_out, w_refs[depth][0], compute_dtype) + b_refs[depth][0, 0]
  )

  # --- Backward chain.
  g = g_ref[0]  # (tile, 1) cotangent of pred
  ds = [jnp.zeros((), jnp.float32)] * (depth + 1)
  dlogit_acc = jnp.zeros((), jnp.float32)

  ds[depth] = jnp.sum(g * v_out)
  dv = g * s[depth]  # (tile, 1)
  dw_out = _mm(lhs_out.T, dv, compute_dtype)
  db_out = jnp.sum(dv, axis=0)
  dh = _mm(dv, w_refs[depth][0].T, compute_dtype) * rsqrts[depth]

  dws = [None] * (depth + 1)
  dbs = [None] * (depth + 1)
  dws[depth] = dw_out
  dbs[depth] = db_out

  for l in reversed(range(depth)):
    dact_dz, dact_dw = _act_grad(zs[l], w)
    dlogit_acc = dlogit_acc + jnp.sum(dh * dact_dw)
    dz = dh * dact_dz
    # Scalar division hoisted out of the (tile, width) elementwise pass.
    ds[l] = jnp.sum(dz * zs[l]) / s[l]
    dv = dz * s[l]
    dws[l] = _mm(hs[l].T, dv, compute_dtype)
    dbs[l] = jnp.sum(dv, axis=0)
    dh = _mm(dv, w_refs[l][0].T, compute_dtype) * rsqrts[l]

  dh0_ref[0] = dh

  dscales_tile = jnp.stack(ds) * ds_raw
  dlogit_tile = dlogit_acc * w * (1.0 - w)

  dscales_2d = dscales_tile[None, :]
  dlogit_2d = dlogit_tile[None, None]

  @pl.when(t == 0)
  def _():
    for l in range(depth + 1):
      dw_refs[l][0] = dws[l]
      db_refs[l][0] = dbs[l][None, :]
    dscales_ref[0] = dscales_2d
    dlogit_ref[0] = dlogit_2d

  @pl.when(t != 0)
  def _():
    for l in range(depth + 1):
      dw_refs[l][0] += dws[l]
      db_refs[l][0] += dbs[l][None, :]
    dscales_ref[0] += dscales_2d
    dlogit_ref[0] += dlogit_2d


def _pad_rows(x, tile):
  n = x.shape[1]
  padded = math.ceil(n / tile) * tile
  if padded == n:
    return x
  return jnp.pad(x, ((0, 0), (0, padded - n)) + ((0, 0),) * (x.ndim - 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_field_mlp(depth, tile, precision, h0, weights, biases, scales_raw,
                    logit):
  """Fused ensemble MLP forward: (E, N, F) encoded inputs -> (E, N) preds.

  Args:
    depth: number of hidden layers (static).
    tile: row-tile size (static; 512 is a good default).
    precision: 'f32' or 'bf16' (bf16 MXU operands, f32 accumulation, for
      forward and backward matmuls alike).
    h0: (E, N, F) encoded features per member.
    weights: tuple of depth+1 arrays (E, fan_in_l, fan_out_l).
    biases: tuple of depth+1 arrays (E, fan_out_l).
    scales_raw: (E, depth+1) pre-softplus layer scales.
    logit: (E,) activation-blend logits.

  Returns:
    (E, N) predictions.
  """
  return _forward(depth, tile, precision, h0, weights, biases, scales_raw,
                  logit)


def _specs_common(depth, tile, e, f, widths):
  """(in_specs for h0+weights+biases+scalars, dims) shared by fwd/bwd."""
  del e
  fan_ins = [f] + list(widths[:-1])
  w_specs = [
      pl.BlockSpec(
          (1, fan_ins[l], widths[l]),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  b_specs = [
      pl.BlockSpec(
          (1, 1, widths[l]),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  h0_spec = pl.BlockSpec(
      (1, tile, f), lambda e_, t_: (e_, t_, 0), memory_space=pltpu.VMEM
  )
  scales_spec = pl.BlockSpec(
      (1, 1, depth + 1), lambda e_, t_: (e_, 0, 0), memory_space=pltpu.VMEM
  )
  logit_spec = pl.BlockSpec(
      (1, 1, 1), lambda e_, t_: (e_, 0, 0), memory_space=pltpu.VMEM
  )
  rows_spec = pl.BlockSpec(
      (1, tile, 1), lambda e_, t_: (e_, t_, 0), memory_space=pltpu.VMEM
  )
  return h0_spec, w_specs, b_specs, scales_spec, logit_spec, rows_spec, fan_ins


def _compute_dtype(precision):
  # 'highest' passes through as a sentinel interpreted by _mm/_mm_t
  # (Precision.HIGHEST multi-pass f32 arithmetic on the MXU).
  return {'f32': None, 'bf16': jnp.bfloat16, 'highest': 'highest'}[precision]


def _named_kernel(fn, name, *body_statics):
  """Wrap a kernel so its __name__ encodes parameters invisible to shapes.

  The compile cache keys Pallas programs by (name, shapes, specs); the
  compute dtype only changes the kernel *body* (in-kernel casts), so two
  precisions would otherwise collide and whichever compiled first would
  silently serve both (observed on the v5e remote-compile path). Any other
  body-only static (lik_scale, valid-row count, fourier/interaction
  arrangement, ...) has the same hazard — pass them as `body_statics` and
  they are folded into the name as a hash.
  """
  if body_statics:
    digest = zlib.crc32(repr(body_statics).encode()) & 0xFFFFFFFF
    name = f'{name}_{digest:08x}'

  def wrapper(*args, **kwargs):
    return fn(*args, **kwargs)

  wrapper.__name__ = name
  return wrapper


def _forward(depth, tile, precision, h0, weights, biases, scales_raw, logit):
  e, n, f = h0.shape
  widths = [w.shape[-1] for w in weights]
  rsqrts = tuple(
      1.0 / math.sqrt(fi) for fi in [f] + list(widths[:-1])
  )

  h0p = _pad_rows(h0, tile)
  npad = h0p.shape[1]
  grid = (e, npad // tile)

  h0_spec, w_specs, b_specs, scales_spec, logit_spec, rows_spec, _ = (
      _specs_common(depth, tile, e, f, widths)
  )
  pred = pl.pallas_call(
      _named_kernel(
          functools.partial(
              _forward_kernel, depth, rsqrts, _compute_dtype(precision)
          ),
          f'fused_mlp_fwd_{precision}',
      ),
      grid=grid,
      in_specs=[h0_spec, *w_specs, *b_specs, scales_spec, logit_spec],
      out_specs=rows_spec,
      out_shape=jax.ShapeDtypeStruct((e, npad, 1), jnp.float32),
      interpret=_interpret(),
  )(
      h0p,
      *weights,
      *[b[:, None, :] for b in biases],
      scales_raw[:, None, :],
      logit[:, None, None],
  )
  return pred[:, :n, 0]


def _forward_fwd(depth, tile, precision, h0, weights, biases, scales_raw,
                 logit):
  pred = _forward(depth, tile, precision, h0, weights, biases, scales_raw,
                  logit)
  return pred, (h0, weights, biases, scales_raw, logit)


def _forward_bwd(depth, tile, precision, residuals, g):
  h0, weights, biases, scales_raw, logit = residuals
  e, n, f = h0.shape
  widths = [w.shape[-1] for w in weights]
  rsqrts = tuple(1.0 / math.sqrt(fi) for fi in [f] + list(widths[:-1]))

  h0p = _pad_rows(h0, tile)
  gp = _pad_rows(g, tile)
  npad = h0p.shape[1]
  grid = (e, npad // tile)

  h0_spec, w_specs, b_specs, scales_spec, logit_spec, rows_spec, fan_ins = (
      _specs_common(depth, tile, e, f, widths)
  )
  dw_specs = [
      pl.BlockSpec(
          (1, fan_ins[l], widths[l]),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  out_shapes = (
      [jax.ShapeDtypeStruct((e, npad, f), jnp.float32)]
      + [
          jax.ShapeDtypeStruct((e, fan_ins[l], widths[l]), jnp.float32)
          for l in range(depth + 1)
      ]
      + [
          jax.ShapeDtypeStruct((e, 1, widths[l]), jnp.float32)
          for l in range(depth + 1)
      ]
      + [
          jax.ShapeDtypeStruct((e, 1, depth + 1), jnp.float32),
          jax.ShapeDtypeStruct((e, 1, 1), jnp.float32),
      ]
  )
  out_specs = (
      [h0_spec]
      + dw_specs
      + list(b_specs)
      + [scales_spec, logit_spec]
  )
  outs = pl.pallas_call(
      _named_kernel(
          functools.partial(
              _backward_kernel, depth, rsqrts, _compute_dtype(precision)
          ),
          f'fused_mlp_bwd_{precision}',
      ),
      grid=grid,
      in_specs=[
          h0_spec, *w_specs, *b_specs, scales_spec, logit_spec, rows_spec
      ],
      out_specs=out_specs,
      out_shape=out_shapes,
      interpret=_interpret(),
  )(
      h0p,
      *weights,
      *[b[:, None, :] for b in biases],
      scales_raw[:, None, :],
      logit[:, None, None],
      gp[:, :, None],
  )

  dh0 = outs[0][:, :n]
  num_w = depth + 1
  dweights = tuple(outs[1 : 1 + num_w])
  dbiases = tuple(o[:, 0, :] for o in outs[1 + num_w : 1 + 2 * num_w])
  dscales = outs[1 + 2 * num_w][:, 0, :]
  dlogit = outs[2 + 2 * num_w][:, 0, 0]
  return dh0, dweights, dbiases, dscales, dlogit


fused_field_mlp.defvjp(_forward_fwd, _forward_bwd)


# ---------------------------------------------------------------------------
# Features-major (transposed) kernels: the layout the trainers use.
#
# h0 arrives as (E, F, N) — the huge row axis on the lane dimension, so
# neither the input, the hidden states, nor any gradient buffer carries
# TPU tiling padding. All in-kernel contractions run over the tile (lane)
# axis or the fan dims via dot_general, with no materialized transposes.
# ---------------------------------------------------------------------------


def _mm_t(a, b, contract, compute_dtype):
  """dot_general contracting `contract` = ((a_axes), (b_axes)), f32 accum."""
  # Result minor dim = b's first non-contracted dim. Size-1 results stay
  # f32: Mosaic's multiply+reduce lowering for them trips a bf16->f32
  # vector.broadcast verification failure, and they are tiny VPU ops.
  # compute_dtype 'highest' selects multi-pass true-f32 MXU arithmetic
  # (the TPU default already truncates f32 dot operands to bf16).
  if compute_dtype == 'highest':
    return jax.lax.dot_general(
        a, b, (contract, ((), ())), precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
  (b_c,) = contract[1]
  b_free = b.shape[1 - b_c]
  if compute_dtype is not None and b_free > 1:
    # One-pass bf16 MXU operands by definition: pin DEFAULT (see _mm).
    return jax.lax.dot_general(
        a.astype(compute_dtype), b.astype(compute_dtype),
        (contract, ((), ())), precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
  return jax.lax.dot_general(
      a, b, (contract, ((), ())), preferred_element_type=jnp.float32
  )


def _forward_kernel_t(depth, rsqrts, compute_dtype, num_groups, *refs):
  """Features-major forward for one (member, row-tile) grid cell.

  h0 arrives as `num_groups` separate feature-group blocks, concatenated
  here in VMEM (avoids materializing the concat in HBM).
  """
  h0_refs = refs[:num_groups]
  refs = refs[num_groups:]
  num_w = depth + 1
  w_refs = refs[:num_w]
  b_refs = refs[num_w : 2 * num_w]
  scales_ref, logit_ref, pred_ref = refs[2 * num_w : 2 * num_w + 3]

  s = jax.nn.softplus(scales_ref[0, 0])
  w = jax.nn.sigmoid(logit_ref[0, 0, 0])

  h = jnp.concatenate([r[0] for r in h0_refs], axis=0)  # (F, tile)
  for l in range(depth):
    # (fan_out, tile) = W^T (fan_in, fan_out) . h (fan_in, tile)
    z = s[l] * (
        _mm_t(w_refs[l][0], h * rsqrts[l], ((0,), (0,)), compute_dtype)
        + b_refs[l][0]
    )
    h = _act(z, w)
  out = s[depth] * (
      _mm_t(w_refs[depth][0], h * rsqrts[depth], ((0,), (0,)), compute_dtype)
      + b_refs[depth][0]
  )  # (1, tile)
  pred_ref[0] = out


def _backward_kernel_t(
    depth, rsqrts, compute_dtype, group_dims, *refs
):
  """Features-major backward: recompute forward, reverse chain, accumulate."""
  num_groups = len(group_dims)
  h0_refs = refs[:num_groups]
  refs = refs[num_groups:]
  num_w = depth + 1
  w_refs = refs[:num_w]
  b_refs = refs[num_w : 2 * num_w]
  scales_ref, logit_ref, g_ref = refs[2 * num_w : 2 * num_w + 3]
  out_refs = refs[2 * num_w + 3 :]
  dh0_refs = out_refs[:num_groups]
  out_refs = out_refs[num_groups:]
  dw_refs = out_refs[:num_w]
  db_refs = out_refs[num_w : 2 * num_w]
  dscales_ref = out_refs[2 * num_w]
  dlogit_ref = out_refs[2 * num_w + 1]

  t = pl.program_id(1)

  raw_s = scales_ref[0, 0]
  s = jax.nn.softplus(raw_s)
  ds_raw = jax.nn.sigmoid(raw_s)
  w = jax.nn.sigmoid(logit_ref[0, 0, 0])

  # Recompute forward, keeping the scaled matmul inputs and pre-activations.
  hs, zs = [], []
  h = jnp.concatenate([r[0] for r in h0_refs], axis=0)
  for l in range(depth):
    lhs = h * rsqrts[l]  # (fan_in, tile)
    z = s[l] * (
        _mm_t(w_refs[l][0], lhs, ((0,), (0,)), compute_dtype) + b_refs[l][0]
    )
    hs.append(lhs)
    zs.append(z)
    h = _act(z, w)
  lhs_out = h * rsqrts[depth]
  v_out = (
      _mm_t(w_refs[depth][0], lhs_out, ((0,), (0,)), compute_dtype)
      + b_refs[depth][0]
  )  # (1, tile)

  g = g_ref[0]  # (1, tile)
  ds = [jnp.zeros((), jnp.float32)] * (depth + 1)
  dlogit_acc = jnp.zeros((), jnp.float32)

  ds[depth] = jnp.sum(g * v_out)
  dv = g * s[depth]  # (fan_out=1, tile)
  # dW (fan_in, fan_out) = lhs (fan_in, tile) . dv (fan_out, tile)^T
  dws = [None] * (depth + 1)
  dbs = [None] * (depth + 1)
  dws[depth] = _mm_t(lhs_out, dv, ((1,), (1,)), compute_dtype)
  dbs[depth] = jnp.sum(dv, axis=1, keepdims=True)  # (fan_out, 1)
  # dh (fan_in, tile) = W (fan_in, fan_out) . dv (fan_out, tile)
  dh = _mm_t(w_refs[depth][0], dv, ((1,), (0,)), compute_dtype) * rsqrts[depth]

  for l in reversed(range(depth)):
    dact_dz, dact_dw = _act_grad(zs[l], w)
    dlogit_acc = dlogit_acc + jnp.sum(dh * dact_dw)
    dz = dh * dact_dz
    # Scalar division hoisted out of the (width, tile) elementwise pass.
    ds[l] = jnp.sum(dz * zs[l]) / s[l]
    dv = dz * s[l]  # (fan_out, tile)
    dws[l] = _mm_t(hs[l], dv, ((1,), (1,)), compute_dtype)
    dbs[l] = jnp.sum(dv, axis=1, keepdims=True)
    dh = _mm_t(w_refs[l][0], dv, ((1,), (0,)), compute_dtype) * rsqrts[l]

  off = 0
  for ref, fg in zip(dh0_refs, group_dims):
    ref[0] = dh[off : off + fg]
    off += fg

  dscales_2d = (jnp.stack(ds) * ds_raw)[None, :]
  dlogit_2d = (dlogit_acc * w * (1.0 - w))[None, None]

  @pl.when(t == 0)
  def _():
    for l in range(depth + 1):
      dw_refs[l][0] = dws[l]
      db_refs[l][0] = dbs[l]
    dscales_ref[0] = dscales_2d
    dlogit_ref[0] = dlogit_2d

  @pl.when(t != 0)
  def _():
    for l in range(depth + 1):
      dw_refs[l][0] += dws[l]
      db_refs[l][0] += dbs[l]
    dscales_ref[0] += dscales_2d
    dlogit_ref[0] += dlogit_2d


def _pad_cols(x, tile):
  n = x.shape[-1]
  padded = math.ceil(n / tile) * tile
  if padded == n:
    return x
  return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, padded - n),))


def _specs_common_t(depth, tile, f, widths, group_dims):
  fan_ins = [f] + list(widths[:-1])
  w_specs = [
      pl.BlockSpec(
          (1, fan_ins[l], widths[l]),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  b_specs = [
      pl.BlockSpec(
          (1, widths[l], 1),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  h0_specs = [
      pl.BlockSpec(
          (1, fg, tile), lambda e_, t_: (e_, 0, t_), memory_space=pltpu.VMEM
      )
      for fg in group_dims
  ]
  scales_spec = pl.BlockSpec(
      (1, 1, depth + 1), lambda e_, t_: (e_, 0, 0), memory_space=pltpu.VMEM
  )
  logit_spec = pl.BlockSpec(
      (1, 1, 1), lambda e_, t_: (e_, 0, 0), memory_space=pltpu.VMEM
  )
  rows_spec = pl.BlockSpec(
      (1, 1, tile), lambda e_, t_: (e_, 0, t_), memory_space=pltpu.VMEM
  )
  return (
      h0_specs, w_specs, b_specs, scales_spec, logit_spec, rows_spec, fan_ins
  )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_field_mlp_t(depth, tile, precision, h0_groups, weights, biases,
                      scales_raw, logit):
  """Features-major fused MLP: encoded groups -> (E, N) predictions.

  The transposed twin of :func:`fused_field_mlp`; this is the layout the
  trainers use (rows on the lane axis, zero tiling padding). `h0_groups`
  is a tuple of per-feature-group arrays (E, f_g, N) — concatenated inside
  the kernel in VMEM, so the concatenation never materializes in HBM.
  """
  return _forward_t(depth, tile, precision, h0_groups, weights, biases,
                    scales_raw, logit)


def _forward_t(depth, tile, precision, h0_groups, weights, biases, scales_raw,
               logit):
  e, _, n = h0_groups[0].shape
  group_dims = tuple(g.shape[1] for g in h0_groups)
  f = sum(group_dims)
  widths = [w.shape[-1] for w in weights]
  rsqrts = tuple(1.0 / math.sqrt(fi) for fi in [f] + list(widths[:-1]))

  h0p = tuple(_pad_cols(g, tile) for g in h0_groups)
  npad = h0p[0].shape[-1]
  grid = (e, npad // tile)

  h0_specs, w_specs, b_specs, scales_spec, logit_spec, rows_spec, _ = (
      _specs_common_t(depth, tile, f, widths, group_dims)
  )
  pred = pl.pallas_call(
      _named_kernel(
          functools.partial(
              _forward_kernel_t, depth, rsqrts, _compute_dtype(precision),
              len(group_dims),
          ),
          f'fused_mlp_t_fwd_{precision}',
      ),
      grid=grid,
      in_specs=[*h0_specs, *w_specs, *b_specs, scales_spec, logit_spec],
      out_specs=rows_spec,
      out_shape=jax.ShapeDtypeStruct((e, 1, npad), jnp.float32),
      # The 16 MB scoped-VMEM default is conservative (v5e has 128 MB);
      # raise it so the multi-group double-buffered blocks fit.
      compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
      interpret=_interpret(),
  )(
      *h0p,
      *weights,
      *[b[:, :, None] for b in biases],
      scales_raw[:, None, :],
      logit[:, None, None],
  )
  return pred[:, 0, :n]


def _forward_t_fwd(depth, tile, precision, h0_groups, weights, biases,
                   scales_raw, logit):
  pred = _forward_t(depth, tile, precision, h0_groups, weights, biases,
                    scales_raw, logit)
  return pred, (h0_groups, weights, biases, scales_raw, logit)


def _forward_t_bwd(depth, tile, precision, residuals, g):
  h0_groups, weights, biases, scales_raw, logit = residuals
  e, _, n = h0_groups[0].shape
  group_dims = tuple(gr.shape[1] for gr in h0_groups)
  f = sum(group_dims)
  widths = [w.shape[-1] for w in weights]
  rsqrts = tuple(1.0 / math.sqrt(fi) for fi in [f] + list(widths[:-1]))

  h0p = tuple(_pad_cols(gr, tile) for gr in h0_groups)
  gp = _pad_cols(g, tile)
  npad = h0p[0].shape[-1]
  grid = (e, npad // tile)

  h0_specs, w_specs, b_specs, scales_spec, logit_spec, rows_spec, fan_ins = (
      _specs_common_t(depth, tile, f, widths, group_dims)
  )
  dw_specs = [
      pl.BlockSpec(
          (1, fan_ins[l], widths[l]),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  out_shapes = (
      [
          jax.ShapeDtypeStruct((e, fg, npad), jnp.float32)
          for fg in group_dims
      ]
      + [
          jax.ShapeDtypeStruct((e, fan_ins[l], widths[l]), jnp.float32)
          for l in range(depth + 1)
      ]
      + [
          jax.ShapeDtypeStruct((e, widths[l], 1), jnp.float32)
          for l in range(depth + 1)
      ]
      + [
          jax.ShapeDtypeStruct((e, 1, depth + 1), jnp.float32),
          jax.ShapeDtypeStruct((e, 1, 1), jnp.float32),
      ]
  )
  out_specs = (
      list(h0_specs) + dw_specs + list(b_specs) + [scales_spec, logit_spec]
  )
  outs = pl.pallas_call(
      _named_kernel(
          functools.partial(
              _backward_kernel_t, depth, rsqrts, _compute_dtype(precision),
              group_dims,
          ),
          f'fused_mlp_t_bwd_{precision}',
      ),
      grid=grid,
      in_specs=[
          *h0_specs, *w_specs, *b_specs, scales_spec, logit_spec, rows_spec
      ],
      out_specs=out_specs,
      out_shape=out_shapes,
      compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
      interpret=_interpret(),
  )(
      *h0p,
      *weights,
      *[b[:, :, None] for b in biases],
      scales_raw[:, None, :],
      logit[:, None, None],
      gp[:, None, :],
  )

  num_groups = len(group_dims)
  dh0 = tuple(o[:, :, :n] for o in outs[:num_groups])
  rest = outs[num_groups:]
  num_w = depth + 1
  dweights = tuple(rest[:num_w])
  dbiases = tuple(o[:, :, 0] for o in rest[num_w : 2 * num_w])
  dscales = rest[2 * num_w][:, 0, :]
  dlogit = rest[2 * num_w + 1][:, 0, 0]
  return dh0, dweights, dbiases, dscales, dlogit


fused_field_mlp_t.defvjp(_forward_t_fwd, _forward_t_bwd)


# ---------------------------------------------------------------------------
# Fused train-step kernel (NORMAL likelihood): encode + forward + loss +
# backward in ONE pallas_call, with activations saved in VMEM.
#
# Rationale (measured, v5e, 64x38k x width-512): the two-kernel custom-VJP
# path costs fwd 19 ms + bwd 37 ms (of which ~19 ms recomputes the forward
# it just ran, flash-style) plus ~12 ms of XLA encode fwd+VJP and ~1 GB of
# HBM traffic for the per-member (E, F, N) h0 and dh0 round-trips. Here one
# program per (member, row-tile) cell:
#   - encodes the tile from the SHARED raw inputs (scaled inputs, octave
#     Fourier features via the double-angle recurrence, precomputed seasonal
#     rows, interaction products) with a hand-derived backward — the only
#     learned encode inputs are the per-member scale adjustments, whose
#     gradients are tiny (D,) / (G,) vectors;
#   - runs the MLP forward keeping pre-matmul inputs and pre-activations
#     resident in VMEM (~4 MB/cell at width 512);
#   - computes the NORMAL negative log-likelihood, its pred-cotangent, and
#     the noise-scale gradient in a few VPU ops on the (1, tile) pred row;
#   - runs the backward chain from the saved activations (no recompute),
#     accumulating weight/bias/scalar gradients across row tiles in VMEM.
# Nothing larger than the raw (D + 2F_seasonal, N) inputs touches HBM.
# ---------------------------------------------------------------------------

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_TWO_PI = 2.0 * math.pi


def _encode_in_kernel(fourier_degrees, interactions, x, seasonal, lsa_col,
                      fs_col):
  """Encode one row tile inside the kernel; returns VJP residuals.

  Mirrors `field.encode_t_groups` exactly (group order: scaled inputs,
  per-dim octave Fourier, seasonal, interactions — reference
  models.py:242-251), with each octave after the first produced by the
  double-angle recurrence. `lsa_col` is the *effective* log scale (the
  static input_scales are pre-folded in by the caller, so the kernel
  captures no array constants and d/d(lsa) passes through unchanged).

  Returns:
    (h0, residuals): h0 is the (F, tile) encoded block; residuals carry
    the scaled inputs, the per-dim cos/sin octave chains, and the raw
    (pre-group-scale) rows needed by :func:`_encode_backward_in_kernel`.
  """
  sx = x * jnp.exp(-lsa_col)  # (D, tile)
  # Rank-0 per-group scales: Mosaic supports scalar->vector broadcasts but
  # not (1, 1) -> (rows, lanes) vector broadcasts.
  fs = [jax.nn.softplus(fs_col[i, 0]) for i in range(fs_col.shape[0])]

  raw_groups = [sx]
  chains = []  # per fourier dim: (coss list, sins list)
  for i, degree in enumerate(fourier_degrees):
    if degree <= 0:
      continue
    theta = _TWO_PI * sx[i : i + 1]  # (1, tile)
    c, s = jnp.cos(theta), jnp.sin(theta)
    coss, sins = [c], [s]
    for _ in range(degree - 1):
      c, s = 2.0 * c * c - 1.0, 2.0 * s * c
      coss.append(c)
      sins.append(s)
    denoms = [1.0 / (k + 1) for k in range(degree)]
    rows = jnp.concatenate(
        [ck * dk for ck, dk in zip(coss, denoms)]
        + [sk * dk for sk, dk in zip(sins, denoms)],
        axis=0,
    )  # (2*degree, tile)
    raw_groups.append(rows)
    chains.append((coss, sins))
  if seasonal is not None:
    raw_groups.append(seasonal)
  if interactions:
    raw_groups.append(
        jnp.concatenate(
            [sx[a : a + 1] * sx[b : b + 1] for a, b in interactions], axis=0
        )
    )

  h0 = jnp.concatenate(
      [g * fs[i] for i, g in enumerate(raw_groups)], axis=0
  )
  return h0, (sx, fs, raw_groups, chains)


def _encode_backward_in_kernel(fourier_degrees, interactions, dh0, residuals,
                               fs_col):
  """Backward of :func:`_encode_in_kernel` w.r.t. (lsa, fs_raw).

  The raw inputs are constants, so the only encode gradients are the
  per-member scale adjustments: d(feature_scales_raw) via the group inner
  products, and d(log_scale_adjustment) via d(scaled_x) — assembled from
  the direct group, the octave chains (d cos(2^k t)/dt = -2^k sin(2^k t)),
  and the interaction products — times d(sx)/d(lsa) = -sx.

  Returns:
    (dlsa (D, 1), dfs_raw (G, 1)) for this tile.
  """
  sx, fs, raw_groups, chains = residuals
  d = sx.shape[0]

  # Per-group scale gradients: dfs_g = sigmoid(raw_g) * <dh0_g, raw_group_g>.
  dfs_vals = []
  off = 0
  dh0_groups = []
  for g in raw_groups:
    fg = g.shape[0]
    dg = dh0[off : off + fg]
    dh0_groups.append(dg)
    dfs_vals.append(jnp.sum(dg * g))
    off += fg
  dfs = jnp.stack(dfs_vals)[:, None] * jax.nn.sigmoid(fs_col)

  # d(scaled_x) rows, accumulated per input dim (Mosaic has no scatter on
  # the sublane axis; D is tiny, so assemble by concatenation at the end).
  dsx_rows = [dh0_groups[0][i : i + 1] * fs[0] for i in range(d)]
  gi = 1
  ci = 0
  for i, degree in enumerate(fourier_degrees):
    if degree <= 0:
      continue
    dg = dh0_groups[gi] * fs[gi]  # (2*degree, tile)
    coss, sins = chains[ci]
    dtheta = jnp.zeros_like(sins[0])
    for k in range(degree):
      coef = (2.0**k) / (k + 1)
      dtheta = dtheta + coef * (
          dg[degree + k : degree + k + 1] * coss[k]
          - dg[k : k + 1] * sins[k]
      )
    dsx_rows[i] = dsx_rows[i] + _TWO_PI * dtheta
    gi += 1
    ci += 1
  if interactions:
    dg = dh0_groups[-1] * fs[len(raw_groups) - 1]  # (P, tile)
    for p, (a, b) in enumerate(interactions):
      dsx_rows[a] = dsx_rows[a] + dg[p : p + 1] * sx[b : b + 1]
      dsx_rows[b] = dsx_rows[b] + dg[p : p + 1] * sx[a : a + 1]

  dsx = jnp.concatenate(dsx_rows, axis=0)  # (D, tile)
  dlsa = jnp.sum(dsx * (-sx), axis=1, keepdims=True)  # (D, 1)
  return dlsa, dfs


def _likelihood_tile(distribution, pred, y, mask, obs0, obs1, obs2, lik_scale):
  """In-kernel loss, pred-cotangent, and observation-scalar gradients.

  Shared by the single-pass train kernel for all three observation models
  (semantics of models/likelihoods.py:32-77, hand-differentiated). The NB
  gammaln terms never touch `pred`, so the MLP backward needs no digamma;
  only the scalar shape gradient does (Stirling forms from ops/special —
  pure log/exp/mul, so Mosaic can lower them; `lax.lgamma` cannot).

  Args:
    distribution: 'NORMAL' | 'NB' | 'ZINB' (static).
    pred: (1, tile) field outputs.
    y: (1, tile) targets.
    mask: (1, tile) 1.0 for valid rows, 0.0 for padding.
    obs0, obs1, obs2: the member's observation scalars
      (log_noise_scale, nb_shape_raw, zinb_logit).
    lik_scale: static data_size/batch_size multiplier.

  Returns:
    (loss_tile (), g (1, tile) = d loss/d pred, dobs (3,)).
  """
  zero = jnp.zeros((), jnp.float32)
  if distribution == 'NORMAL':
    sigma = 0.01 + jnp.exp(obs0)
    inv_sigma2 = 1.0 / (sigma * sigma)
    r = (pred - y) * mask
    n_tile = jnp.sum(mask)
    loss = lik_scale * (
        0.5 * inv_sigma2 * jnp.sum(r * r)
        + n_tile * (jnp.log(sigma) + _HALF_LOG_2PI)
    )
    # d loss / d sigma = -sum(r^2)/sigma^3 + n/sigma, times dsigma/dp0.
    dnoise = (
        lik_scale
        * (sigma - 0.01)
        * (n_tile / sigma - jnp.sum(r * r) * inv_sigma2 / sigma)
    )
    g = lik_scale * inv_sigma2 * r
    return loss, g, jnp.stack([dnoise, zero, zero])

  # NB / ZINB: mean = softplus(pred), shape s = softplus(p1), r = 1/s,
  # logits l = log(r) - log(mean) (DeepAR parametrization).
  s = jax.nn.softplus(obs1)
  rr = 1.0 / s
  safe = jnp.maximum(pred, -15.0)
  # Stable log softplus(pred) and its derivative sigmoid/softplus -> 1
  # as pred -> -inf.
  lsp = jnp.where(pred < -15.0, pred, jnp.log(jax.nn.softplus(safe)))
  ratio = jnp.where(
      pred < -15.0,
      jnp.ones_like(pred),
      jax.nn.sigmoid(safe) / jax.nn.softplus(safe),
  )
  l = -jnp.log(s) - lsp
  sp_l = jax.nn.softplus(l)       # -log_sigmoid(-l)
  sp_nl = jax.nn.softplus(-l)     # -log_sigmoid(l)
  nb_lp = (
      special.gammaln_stirling(rr + y)
      - special.gammaln_stirling(1.0 + y)
      - special.gammaln_stirling(rr)
      - rr * sp_l
      - y * sp_nl
  )
  dlp_dl = -rr * jax.nn.sigmoid(l) + y * jax.nn.sigmoid(-l)
  # Total d nb_lp/d r: the explicit r terms plus l's log(r) dependence.
  dlp_dr = (
      special.digamma_stirling(rr + y)
      - special.digamma_stirling(rr)
      - sp_l
      + dlp_dl / rr
  )

  if distribution == 'ZINB':
    log_pi = -jax.nn.softplus(-obs2)
    log1m = -jax.nn.softplus(obs2)
    b = log1m + nb_lp
    m = jnp.maximum(log_pi, b)
    zero_lp = m + jnp.log(jnp.exp(log_pi - m) + jnp.exp(b - m))
    lp = jnp.where(y == 0, zero_lp, b)
    w_b = jax.nn.sigmoid(b - log_pi)   # d zero_lp / d b
    dlp_dnb = jnp.where(y == 0, w_b, jnp.ones_like(w_b))
    dlp_dp2 = jnp.where(
        y == 0,
        (1.0 - w_b) * jax.nn.sigmoid(-obs2) - w_b * jax.nn.sigmoid(obs2),
        -jax.nn.sigmoid(obs2) * jnp.ones_like(w_b),
    )
    dp2 = -lik_scale * jnp.sum(mask * dlp_dp2)
  else:
    lp = nb_lp
    dlp_dnb = jnp.ones_like(nb_lp)
    dp2 = zero

  loss = -lik_scale * jnp.sum(mask * lp)
  # d loss/d pred flows only through l; dl/dpred = -ratio.
  g = lik_scale * mask * dlp_dnb * dlp_dl * ratio
  dr_dp1 = -jax.nn.sigmoid(obs1) / (s * s)
  dp1 = -lik_scale * jnp.sum(mask * dlp_dnb * dlp_dr) * dr_dp1
  return loss, g, jnp.stack([zero, dp1, dp2])


def _train_kernel_raw(
    depth, rsqrts, n_valid, tile, subtiles, lik_scale, fourier_degrees,
    interactions, has_seasonal, compute_dtype, distribution, *refs
):
  """One (member, row-tile) cell: encode + forward + loss + backward.

  `subtiles` > 1 splits the row tile into independent column chunks whose
  compute chains only join at the final scalar/weight-gradient sums —
  giving the Mosaic/LLO scheduler freedom to overlap one chunk's VPU
  phases (encode trig, activation blend, likelihood) with another's MXU
  matmuls. Numerics are unchanged up to sum reassociation.

  `n_valid` is the count of real (non-padding) rows: a static int, or None
  to read it from a leading (1, 1) SMEM ref — the dynamic form lets each
  shard of a row-sharded mesh mask its own padded tail (shard_map runs one
  program, but shards' real-row counts differ when N % shards != 0).
  """
  if n_valid is None:
    n_valid = refs[0][0, 0]
    refs = refs[1:]
  x_ref = refs[0]
  refs = refs[1:]
  if has_seasonal:
    seasonal_ref, refs = refs[0], refs[1:]
  num_w = depth + 1
  w_refs = refs[:num_w]
  b_refs = refs[num_w : 2 * num_w]
  (lsa_ref, fs_ref, scales_ref, logit_ref, obs_ref, y_ref) = refs[
      2 * num_w : 2 * num_w + 6
  ]
  out_refs = refs[2 * num_w + 6 :]
  loss_ref = out_refs[0]
  dlsa_ref, dfs_ref = out_refs[1], out_refs[2]
  dw_refs = out_refs[3 : 3 + num_w]
  db_refs = out_refs[3 + num_w : 3 + 2 * num_w]
  dscales_ref = out_refs[3 + 2 * num_w]
  dlogit_ref = out_refs[3 + 2 * num_w + 1]
  dobs_ref = out_refs[3 + 2 * num_w + 2]

  t = pl.program_id(1)

  raw_s = scales_ref[0, 0]
  s = jax.nn.softplus(raw_s)
  ds_raw = jax.nn.sigmoid(raw_s)
  w = jax.nn.sigmoid(logit_ref[0, 0, 0])

  st = tile // subtiles

  def compute(x_sub, seasonal_sub, y_sub, base):
    """Encode + forward + loss + backward for one column chunk."""
    # --- Encode (saving the octave chains for the backward).
    h, enc_res = _encode_in_kernel(
        fourier_degrees, interactions, x_sub, seasonal_sub,
        lsa_ref[0], fs_ref[0],
    )

    # --- Forward, saving matmul inputs and pre-activations (VMEM-local).
    hs, zs = [], []
    for l in range(depth):
      lhs = h * rsqrts[l]
      z = s[l] * (
          _mm_t(w_refs[l][0], lhs, ((0,), (0,)), compute_dtype) + b_refs[l][0]
      )
      hs.append(lhs)
      zs.append(z)
      h = _act(z, w)
    lhs_out = h * rsqrts[depth]
    v_out = (
        _mm_t(w_refs[depth][0], lhs_out, ((0,), (0,)), compute_dtype)
        + b_refs[depth][0]
    )
    pred = s[depth] * v_out  # (1, st)

    # --- Observation-model loss over the valid rows of this chunk.
    # mask zeroes both the padded tail and its gradient contributions.
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, st), 1)
        < n_valid - t * tile - base
    ).astype(jnp.float32)
    loss_tile, g, dobs_tile = _likelihood_tile(
        distribution, pred, y_sub, mask,
        obs_ref[0, 0, 0], obs_ref[0, 1, 0], obs_ref[0, 2, 0], lik_scale,
    )

    # --- Backward from the loss' pred-cotangent, using saved activations.
    ds = [jnp.zeros((), jnp.float32)] * (depth + 1)
    dlogit_acc = jnp.zeros((), jnp.float32)

    ds[depth] = jnp.sum(g * v_out)
    dv = g * s[depth]
    dws = [None] * (depth + 1)
    dbs = [None] * (depth + 1)
    dws[depth] = _mm_t(lhs_out, dv, ((1,), (1,)), compute_dtype)
    dbs[depth] = jnp.sum(dv, axis=1, keepdims=True)
    dh = (
        _mm_t(w_refs[depth][0], dv, ((1,), (0,)), compute_dtype)
        * rsqrts[depth]
    )

    for l in reversed(range(depth)):
      dact_dz, dact_dw = _act_grad(zs[l], w)
      dlogit_acc = dlogit_acc + jnp.sum(dh * dact_dw)
      dz = dh * dact_dz
      # Scalar division hoisted out of the (width, st) elementwise pass.
      ds[l] = jnp.sum(dz * zs[l]) / s[l]
      dv = dz * s[l]
      dws[l] = _mm_t(hs[l], dv, ((1,), (1,)), compute_dtype)
      dbs[l] = jnp.sum(dv, axis=1, keepdims=True)
      dh = _mm_t(w_refs[l][0], dv, ((1,), (0,)), compute_dtype) * rsqrts[l]

    dlsa_tile, dfs_tile = _encode_backward_in_kernel(
        fourier_degrees, interactions, dh, enc_res, fs_ref[0]
    )
    return (loss_tile, dlsa_tile, dfs_tile, dws, dbs, ds, dlogit_acc,
            dobs_tile)

  # Each subtile accumulates straight into the output refs (load-add-store),
  # exactly like the accumulation across row tiles: Mosaic rejects
  # register-level adds of size-1-minor dot results ("only constant
  # accumulators supported"), but ref accumulation lowers fine.
  for k in range(subtiles):
    sl = slice(k * st, (k + 1) * st)
    (loss_tile, dlsa_tile, dfs_tile, dws, dbs, ds, dlogit_acc, dobs_tile) = (
        compute(
            x_ref[0][:, sl],
            seasonal_ref[0][:, sl] if has_seasonal else None,
            y_ref[0][:, sl],
            k * st,
        )
    )

    loss_2d = loss_tile[None, None]
    dscales_2d = (jnp.stack(ds) * ds_raw)[None, :]
    dlogit_2d = (dlogit_acc * w * (1.0 - w))[None, None]
    dobs_2d = dobs_tile[:, None]  # (3, 1)

    if k == 0:
      @pl.when(t == 0)
      def _(vals=(loss_2d, dlsa_tile, dfs_tile, tuple(dws), tuple(dbs),
                  dscales_2d, dlogit_2d, dobs_2d)):
        l2, dlsa2, dfs2, dws2, dbs2, dsc2, dlg2, dob2 = vals
        loss_ref[0] = l2
        dlsa_ref[0] = dlsa2
        dfs_ref[0] = dfs2
        for l in range(depth + 1):
          dw_refs[l][0] = dws2[l]
          db_refs[l][0] = dbs2[l]
        dscales_ref[0] = dsc2
        dlogit_ref[0] = dlg2
        dobs_ref[0] = dob2

      @pl.when(t != 0)
      def _(vals=(loss_2d, dlsa_tile, dfs_tile, tuple(dws), tuple(dbs),
                  dscales_2d, dlogit_2d, dobs_2d)):
        l2, dlsa2, dfs2, dws2, dbs2, dsc2, dlg2, dob2 = vals
        loss_ref[0] += l2
        dlsa_ref[0] += dlsa2
        dfs_ref[0] += dfs2
        for l in range(depth + 1):
          dw_refs[l][0] += dws2[l]
          db_refs[l][0] += dbs2[l]
        dscales_ref[0] += dsc2
        dlogit_ref[0] += dlg2
        dobs_ref[0] += dob2
    else:
      loss_ref[0] += loss_2d
      dlsa_ref[0] += dlsa_tile
      dfs_ref[0] += dfs_tile
      for l in range(depth + 1):
        dw_refs[l][0] += dws[l]
        db_refs[l][0] += dbs[l]
      dscales_ref[0] += dscales_2d
      dlogit_ref[0] += dlogit_2d
      dobs_ref[0] += dobs_2d


def fused_train(
    distribution, depth, tile, lik_scale, input_scales, fourier_degrees,
    interactions, x_t, seasonal_t, weights, biases, lsa, fs_raw, scales_raw,
    logit, obs_raw, y, precision='f32', subtiles=None, n_valid=None
):
  """Fused training objective from RAW inputs: loss AND grads, any likelihood.

  Computes, per ensemble member e,

      loss_e = lik_scale * sum_rows -log p(y | pred_e, obs-scalars_e)

  under NORMAL / NB / ZINB observation models (semantics of
  models/likelihoods.py, hand-differentiated in `_likelihood_tile`), where
  pred_e is the full field MLP applied to the in-kernel encoding of the raw
  inputs — together with gradients w.r.t. every learned input, all in a
  single Pallas program (see the section comment above). The caller adds
  the (parameter-only) prior term in XLA.

  Args:
    distribution: 'NORMAL' | 'NB' | 'ZINB' (static).
    depth: number of hidden layers (static).
    tile: row-tile size (static).
    lik_scale: static scalar multiplier of the negative log-likelihood.
    input_scales: static (D,) input scale divisors.
    fourier_degrees: static (D,) octave counts per input dim.
    interactions: static ((a, b), ...) input-dim pairs.
    x_t: (D, N) shared raw inputs, or (E, D, N) per-member rows. A leading
      dim of E/rep for integer rep > 1 is also accepted: each stored row
      group serves `rep` consecutive kernel members (used when MC draws
      are folded into the member axis — one copy of each member's batch
      feeds all of its draws, no HBM repeat).
    seasonal_t: (2F, N) shared precomputed seasonal rows (or (E, 2F, N) /
      (E/rep, 2F, N)); pass an array with first feature dim 0 when there
      are none.
    weights: tuple of depth+1 (E, fan_in, fan_out) arrays.
    biases: tuple of depth+1 (E, fan_out) arrays.
    lsa: (E, D) log scale adjustments.
    fs_raw: (E, G) pre-softplus feature-group scales.
    scales_raw: (E, depth+1) pre-softplus layer scales.
    logit: (E,) activation-blend logits.
    obs_raw: (E, 3) observation scalars per member:
      (log_noise_scale, nb_shape_raw, zinb_logit).
    y: (N,) shared targets or (E, N) per-member targets ((E/rep, N) group
      form accepted, as for `x_t`).
    precision: 'f32', 'bf16' (bf16 MXU operands, f32 accumulation; the
      encode, likelihood, and all size-1-minor dots stay f32), or
      'highest' (multi-pass true-f32 MXU arithmetic).
    subtiles: split each row tile into this many independent column chunks
      inside the kernel so one chunk's VPU phases can overlap another's
      MXU matmuls (None: BNF_FUSED_SUBTILES env var, default 1). Must
      divide `tile`. Numerics unchanged up to sum reassociation.
    n_valid: None (all N rows are real; the kernel's row mask covers only
      the tile-size padding), or a traced int32 scalar giving the count of
      real rows — rows at index >= n_valid contribute nothing to the loss
      or any gradient. Used by row-sharded training where each shard's
      real-row count differs (N % shards != 0): pass the local count.

  Returns:
    (losses, dlsa, dfs_raw, dweights, dbiases, dscales_raw, dlogit,
    dobs_raw) with `losses` of shape (E,) and every gradient shaped like
    its input (dobs_raw: (E, 3)).
  """
  subtiles = resolve_subtiles(subtiles)
  if tile % subtiles != 0:
    raise ValueError(f'{subtiles=} must divide {tile=}.')
  e = weights[0].shape[0]
  d_in = x_t.shape[-2]
  n = x_t.shape[-1]
  s2 = seasonal_t.shape[-2]
  has_seasonal = s2 > 0
  num_fourier = 2 * sum(dg for dg in fourier_degrees if dg > 0)
  f = d_in + num_fourier + s2 + len(interactions)
  g_dim = fs_raw.shape[-1]
  widths = [w.shape[-1] for w in weights]
  rsqrts = tuple(1.0 / math.sqrt(fi) for fi in [f] + list(widths[:-1]))

  def shared3(a):
    return _pad_cols(a[None] if a.ndim == 2 else a, tile)

  def spec_for(a, rows):
    """Block spec for a data input: shared (2-D), per-member (leading E),
    or per-member-group (leading E/rep for integer rep > 1 — the same rows
    serve `rep` consecutive kernel members; used when MC draws are folded
    into the member axis so each member's minibatch need not be
    materialized once per draw)."""
    if a.ndim == 2:
      index_map = lambda e_, t_: (0, 0, t_)
    else:
      rep = e // a.shape[0]
      if rep * a.shape[0] != e:
        raise ValueError(
            f'per-member input leading dim {a.shape[0]} must divide the '
            f'member count {e}.'
        )
      index_map = (
          (lambda e_, t_: (e_ // rep, 0, t_)) if rep > 1 else
          (lambda e_, t_: (e_, 0, t_))
      )
    return pl.BlockSpec((1, rows, tile), index_map, memory_space=pltpu.VMEM)

  x3 = shared3(x_t)
  x_spec = spec_for(x_t, d_in)
  inputs = [x3]
  in_specs = [x_spec]
  if has_seasonal:
    inputs.append(shared3(seasonal_t))
    in_specs.append(spec_for(seasonal_t, s2))
  npad = x3.shape[-1]
  grid = (e, npad // tile)

  y_per_member = y.ndim == 2
  y3 = _pad_cols(y[:, None, :] if y_per_member else y[None, None, :], tile)
  if y_per_member:
    y_rep = e // y.shape[0]
    if y_rep * y.shape[0] != e:
      raise ValueError(
          f'per-member y leading dim {y.shape[0]} must divide the member '
          f'count {e}.'
      )
    y_index_map = (
        (lambda e_, t_: (e_ // y_rep, 0, t_)) if y_rep > 1 else
        (lambda e_, t_: (e_, 0, t_))
    )
  else:
    y_index_map = lambda e_, t_: (0, 0, t_)
  y_spec = pl.BlockSpec((1, 1, tile), y_index_map, memory_space=pltpu.VMEM)

  fan_ins = [f] + list(widths[:-1])
  w_specs = [
      pl.BlockSpec(
          (1, fan_ins[l], widths[l]),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  b_specs = [
      pl.BlockSpec(
          (1, widths[l], 1),
          lambda e_, t_, l=l: (e_, 0, 0),
          memory_space=pltpu.VMEM,
      )
      for l in range(depth + 1)
  ]
  def col_spec(rows):
    return pl.BlockSpec(
        (1, rows, 1), lambda e_, t_: (e_, 0, 0), memory_space=pltpu.VMEM
    )

  scales_spec = pl.BlockSpec(
      (1, 1, depth + 1), lambda e_, t_: (e_, 0, 0), memory_space=pltpu.VMEM
  )
  scalar_spec = col_spec(1)

  out_shapes = (
      [
          jax.ShapeDtypeStruct((e, 1, 1), jnp.float32),  # loss
          jax.ShapeDtypeStruct((e, d_in, 1), jnp.float32),  # dlsa
          jax.ShapeDtypeStruct((e, g_dim, 1), jnp.float32),  # dfs
      ]
      + [
          jax.ShapeDtypeStruct((e, fan_ins[l], widths[l]), jnp.float32)
          for l in range(depth + 1)
      ]
      + [
          jax.ShapeDtypeStruct((e, widths[l], 1), jnp.float32)
          for l in range(depth + 1)
      ]
      + [
          jax.ShapeDtypeStruct((e, 1, depth + 1), jnp.float32),
          jax.ShapeDtypeStruct((e, 1, 1), jnp.float32),
          jax.ShapeDtypeStruct((e, 3, 1), jnp.float32),  # dobs
      ]
  )
  out_specs = (
      [scalar_spec, col_spec(d_in), col_spec(g_dim)]
      + w_specs
      + list(b_specs)
      + [scales_spec, scalar_spec, col_spec(3)]
  )
  # Fold the static input scales into the learned log-scale adjustment so
  # the kernel captures no array constants (d/d(lsa) is unchanged).
  lsa_eff = lsa + jnp.log(jnp.asarray(input_scales, jnp.float32))[None, :]

  dynamic_n = n_valid is not None
  nv_inputs, nv_specs = [], []
  if dynamic_n:
    nv_inputs = [jnp.asarray(n_valid, jnp.int32).reshape(1, 1)]
    nv_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]

  outs = pl.pallas_call(
      _named_kernel(
          functools.partial(
              _train_kernel_raw, depth, rsqrts,
              None if dynamic_n else n, tile, subtiles,
              float(lik_scale), tuple(fourier_degrees),
              tuple(interactions), has_seasonal, _compute_dtype(precision),
              distribution,
          ),
          f'fused_train_{distribution.lower()}_raw'
          f'_{"xm" if x_t.ndim == 3 else "xs"}'
          f'{"ym" if y_per_member else "ys"}_{precision}'
          f'{"_dynN" if dynamic_n else ""}',
          # Body-only statics: same-shape calls with different values MUST
          # NOT share a compiled kernel.
          float(lik_scale), None if dynamic_n else n, tuple(fourier_degrees),
          tuple(interactions), subtiles,
      ),
      grid=grid,
      in_specs=nv_specs + in_specs + [
          *w_specs, *b_specs, col_spec(d_in), col_spec(g_dim), scales_spec,
          scalar_spec, col_spec(3), y_spec,
      ],
      out_specs=out_specs,
      out_shape=out_shapes,
      # Precision.HIGHEST multi-pass dots need extra VMEM scratch (the
      # compiler splits operands into bf16 passes); 64M OOMs at width 512
      # x tile 2048 under 'highest'.
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=(100 if precision == 'highest' else 64) * 2**20
      ),
      interpret=_interpret(),
  )(
      *nv_inputs,
      *inputs,
      *weights,
      *[b[:, :, None] for b in biases],
      lsa_eff[:, :, None],
      fs_raw[:, :, None],
      scales_raw[:, None, :],
      logit[:, None, None],
      obs_raw[:, :, None],
      y3,
  )

  losses = outs[0][:, 0, 0]
  dlsa = outs[1][:, :, 0]
  dfs = outs[2][:, :, 0]
  rest = outs[3:]
  num_w = depth + 1
  dweights = tuple(rest[:num_w])
  dbiases = tuple(o[:, :, 0] for o in rest[num_w : 2 * num_w])
  dscales = rest[2 * num_w][:, 0, :]
  dlogit = rest[2 * num_w + 1][:, 0, 0]
  dobs = rest[2 * num_w + 2][:, :, 0]
  return losses, dlsa, dfs, dweights, dbiases, dscales, dlogit, dobs
