"""Fused Pallas MLP kernel vs pure-JAX oracle (forward AND gradients).

Runs in Pallas interpreter mode on CPU; the same kernels compile on TPU.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesnf_tpu.ops import fused_mlp


def _reference_mlp(depth, h0, weights, biases, scales_raw, logit):
  """Pure-JAX transcription of the same math (per member, vmapped)."""

  def one_member(h, ws, bs, sr, lg):
    s = jax.nn.softplus(sr)
    w = jax.nn.sigmoid(lg)
    for l in range(depth):
      h = h / jnp.sqrt(h.shape[-1] * 1.0)
      z = s[l] * (h @ ws[l] + bs[l])
      h = w * jax.nn.elu(z) + (1 - w) * jnp.tanh(z)
    h = h / jnp.sqrt(h.shape[-1] * 1.0)
    return s[depth] * (h @ ws[depth] + bs[depth])[:, 0]

  return jax.vmap(one_member)(h0, weights, biases, scales_raw, logit)


def _make_inputs(e=3, n=70, f=12, width=16, depth=2, seed=0):
  rng = np.random.default_rng(seed)
  h0 = jnp.asarray(rng.normal(size=(e, n, f)).astype(np.float32))
  fan_ins = [f] + [width] * (depth - 1) + [width]
  fan_outs = [width] * depth + [1]
  weights = tuple(
      jnp.asarray(rng.normal(size=(e, fi, fo)).astype(np.float32) * 0.5)
      for fi, fo in zip(fan_ins, fan_outs)
  )
  biases = tuple(
      jnp.asarray(rng.normal(size=(e, fo)).astype(np.float32) * 0.3)
      for fo in fan_outs
  )
  scales_raw = jnp.asarray(rng.normal(size=(e, depth + 1)).astype(np.float32))
  logit = jnp.asarray(rng.normal(size=(e,)).astype(np.float32))
  return h0, weights, biases, scales_raw, logit


@pytest.mark.parametrize('depth', [1, 2, 3])
def test_forward_matches_oracle(depth):
  h0, weights, biases, scales_raw, logit = _make_inputs(depth=depth)
  got = fused_mlp.fused_field_mlp(
      depth, 32, 'f32', h0, weights, biases, scales_raw, logit
  )
  want = _reference_mlp(depth, h0, weights, biases, scales_raw, logit)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                             atol=2e-5)


def test_forward_row_padding():
  # n=70 with tile=32 pads to 96; padded rows must not leak into outputs.
  h0, weights, biases, scales_raw, logit = _make_inputs(n=70)
  got = fused_mlp.fused_field_mlp(2, 32, 'f32', h0, weights, biases, scales_raw, logit)
  assert got.shape == (3, 70)
  got_big_tile = fused_mlp.fused_field_mlp(
      2, 128, 'f32', h0, weights, biases, scales_raw, logit
  )
  np.testing.assert_allclose(
      np.asarray(got), np.asarray(got_big_tile), rtol=1e-5, atol=1e-6
  )


@pytest.mark.parametrize('depth', [1, 2])
def test_gradients_match_autodiff(depth):
  h0, weights, biases, scales_raw, logit = _make_inputs(depth=depth, n=64)
  y = jnp.asarray(
      np.random.default_rng(9).normal(size=(3, 64)).astype(np.float32)
  )

  def loss_fused(args):
    h0, weights, biases, scales_raw, logit = args
    pred = fused_mlp.fused_field_mlp(
        depth, 32, 'f32', h0, weights, biases, scales_raw, logit
    )
    return jnp.sum(jnp.square(pred - y) * jnp.linspace(0.5, 1.5, 64))

  def loss_ref(args):
    h0, weights, biases, scales_raw, logit = args
    pred = _reference_mlp(depth, h0, weights, biases, scales_raw, logit)
    return jnp.sum(jnp.square(pred - y) * jnp.linspace(0.5, 1.5, 64))

  args = (h0, weights, biases, scales_raw, logit)
  g_fused = jax.grad(loss_fused)(args)
  g_ref = jax.grad(loss_ref)(args)
  flat_fused, _ = jax.tree_util.tree_flatten(g_fused)
  flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
  assert len(flat_fused) == len(flat_ref)
  for a, b in zip(flat_fused, flat_ref):
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
    )


def test_gradient_row_padding_no_leak():
  # With n not a multiple of tile, padded rows carry zero cotangents and
  # must contribute nothing to weight gradients.
  h0, weights, biases, scales_raw, logit = _make_inputs(n=50)

  def loss(tile):
    pred = fused_mlp.fused_field_mlp(
        2, tile, 'f32', h0, weights, biases, scales_raw, logit
    )
    return jnp.sum(jnp.sin(pred))

  g_a = jax.grad(lambda _: loss(32))(0.0)  # dummy; compare full grads below
  del g_a
  ga = jax.grad(lambda w: jnp.sum(jnp.sin(fused_mlp.fused_field_mlp(
      2, 32, 'f32', h0, w, biases, scales_raw, logit))))(weights)
  gb = jax.grad(lambda w: jnp.sum(jnp.sin(fused_mlp.fused_field_mlp(
      2, 64, 'f32', h0, w, biases, scales_raw, logit))))(weights)
  for a, b in zip(ga, gb):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-5)


def test_bf16_kernel_close_to_f32():
  h0, weights, biases, scales_raw, logit = _make_inputs(n=64)
  a = fused_mlp.fused_field_mlp(2, 32, 'f32', h0, weights, biases,
                                scales_raw, logit)
  b = fused_mlp.fused_field_mlp(2, 32, 'bf16', h0, weights, biases,
                                scales_raw, logit)
  np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2,
                             atol=5e-2)


class TestTransposedKernels:

  @pytest.mark.parametrize('depth', [1, 2])
  def test_forward_matches_rowmajor(self, depth):
    h0, weights, biases, scales_raw, logit = _make_inputs(depth=depth, n=70)
    a = fused_mlp.fused_field_mlp(
        depth, 32, 'f32', h0, weights, biases, scales_raw, logit
    )
    b = fused_mlp.fused_field_mlp_t(
        depth, 32, 'f32', (jnp.swapaxes(h0, 1, 2),), weights, biases,
        scales_raw, logit
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                               atol=2e-5)

  def test_gradients_match_autodiff(self):
    depth = 2
    h0, weights, biases, scales_raw, logit = _make_inputs(depth=depth, n=64)
    h0_t = jnp.swapaxes(h0, 1, 2)
    y = jnp.asarray(
        np.random.default_rng(9).normal(size=(3, 64)).astype(np.float32)
    )

    def loss_t(args):
      h0_t, weights, biases, scales_raw, logit = args
      # Split h0 into two groups: exercises the in-VMEM concatenation and
      # per-group gradient outputs.
      groups = (h0_t[:, :5, :], h0_t[:, 5:, :])
      pred = fused_mlp.fused_field_mlp_t(
          depth, 32, 'f32', groups, weights, biases, scales_raw, logit
      )
      return jnp.sum(jnp.square(pred - y) * jnp.linspace(0.5, 1.5, 64))

    def loss_ref(args):
      h0_t, weights, biases, scales_raw, logit = args
      pred = _reference_mlp(
          depth, jnp.swapaxes(h0_t, 1, 2), weights, biases, scales_raw, logit
      )
      return jnp.sum(jnp.square(pred - y) * jnp.linspace(0.5, 1.5, 64))

    args = (h0_t, weights, biases, scales_raw, logit)
    g_t = jax.tree_util.tree_leaves(jax.grad(loss_t)(args))
    g_r = jax.tree_util.tree_leaves(jax.grad(loss_ref)(args))
    for a, b in zip(g_t, g_r):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4,
                                 atol=5e-4)
