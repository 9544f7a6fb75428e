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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
  """Run Pallas in interpreter mode off-TPU (CPU tests / debugging)."""
  return jax.default_backend() != 'tpu'


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
  if compute_dtype is not None and b.shape[-1] > 1:
    a = a.astype(compute_dtype)
    b = b.astype(compute_dtype)
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
    ds[l] = jnp.sum(dz * (zs[l] / s[l]))
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
  return {'f32': None, 'bf16': jnp.bfloat16}[precision]


def _named_kernel(fn, name):
  """Wrap a kernel so its __name__ encodes parameters invisible to shapes.

  The compile cache keys Pallas programs by (name, shapes, specs); the
  compute dtype only changes the kernel *body* (in-kernel casts), so two
  precisions would otherwise collide and whichever compiled first would
  silently serve both (observed on the v5e remote-compile path).
  """
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
  (b_c,) = contract[1]
  b_free = b.shape[1 - b_c]
  if compute_dtype is not None and b_free > 1:
    a = a.astype(compute_dtype)
    b = b.astype(compute_dtype)
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
    ds[l] = jnp.sum(dz * (zs[l] / s[l]))
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
