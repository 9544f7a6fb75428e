"""Fused Pallas MLP kernel vs pure-JAX oracle (forward AND gradients).

Runs in Pallas interpreter mode on CPU; the same kernels compile on TPU.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesnf_tpu.ops import fused_mlp

# Row tile for kernels that place rows in the LAST block dimension
# (features-major forward, fused_train): Mosaic's compiled lowering
# requires that dimension be divisible by 128 (or equal the padded row
# count), a constraint the interpreter does not enforce. 32 keeps the
# default CPU-interpreter runs small and fast; the compiled sweep
# (BNF_TEST_PLATFORM=tpu, see tests/conftest.py) uses 128 so the SAME
# tests exercise the Mosaic-compiled kernels. Row-major kernels keep
# literal 32 (rows sit in the second-to-last dim, divisible-by-8 rule).
TILE = 32 if os.environ.get('BNF_TEST_PLATFORM', 'cpu') == 'cpu' else 128

# Tolerance scale for the compiled sweep: Mosaic's and XLA:TPU's
# transcendental approximations (tanh/exp/sin in encode + activation +
# likelihood) differ in the last ulps and the backward pass amplifies the
# difference on small scalar gradients (observed worst-case ~9e-4 relative
# vs the 2e-4 interpreter bound). Interpreter runs share libm with the
# oracle and keep the tight bounds.
TOL_SCALE = 1 if TILE == 32 else 8


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
        depth, TILE, 'f32', (jnp.swapaxes(h0, 1, 2),), weights, biases,
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
          depth, TILE, 'f32', groups, weights, biases, scales_raw, logit
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


class TestFusedTrain:
  """fused_train (raw-input single-pass loss+grad) vs autodiff oracle.

  The oracle is the pure-JAX path: `field.apply_field_t` +
  `likelihoods.log_likelihood` differentiated by autodiff. Covers all three
  observation models; the count models exercise the in-kernel Stirling
  gammaln/digamma (ops/special) against jax.scipy's implementations.
  """

  def _setup(self, distribution='NORMAL', n=70, per_member_x=False,
             interactions=((0, 1), (1, 2)), seasonal=True, seed=3,
             config=None):
    from bayesnf_tpu.models import field as field_lib
    from bayesnf_tpu.models import likelihoods

    if config is None:
      config = field_lib.FieldConfig.create(
          width=16,
          depth=2,
          input_scales=[50.0, 1.0, 1.0],
          fourier_degrees=[3, 2, 0],
          interactions=interactions,
          seasonality_periods=[7.0] if seasonal else [],
          num_seasonal_harmonics=[2] if seasonal else [],
      )
    e = 3
    rng = np.random.default_rng(seed)
    keys = jax.random.split(jax.random.PRNGKey(seed), e)
    params = tuple(jax.vmap(
        lambda k: field_lib.init_params(config, k))(keys))
    # Perturb the zero-initialized scalars so gradients are generic.
    params = tuple(
        p + 0.1 * jnp.asarray(rng.normal(size=p.shape).astype(np.float32))
        for p in params
    )

    def draw_y(shape):
      if distribution == 'NORMAL':
        return rng.normal(size=shape).astype(np.float32)
      # Counts with a few zeros (exercises the ZINB zero branch) and a
      # heavy tail (exercises gammaln at larger arguments).
      y = rng.poisson(rng.gamma(2.0, 4.0, size=shape)).astype(np.float32)
      flat = y.reshape(-1)
      flat[:: 7] = 0.0
      return flat.reshape(shape)

    if per_member_x:
      x = rng.normal(size=(e, n, config.num_inputs)).astype(np.float32) * 5
      x_t = jnp.asarray(np.swapaxes(x, 1, 2))
      seas = jnp.stack([
          field_lib.seasonal_features_for(config, jnp.asarray(x[i])).T
          for i in range(e)
      ])
      y = jnp.asarray(draw_y((e, n)))
    else:
      x = rng.normal(size=(n, config.num_inputs)).astype(np.float32) * 5
      x_t = jnp.asarray(x.T)
      seas = field_lib.seasonal_features_for(config, jnp.asarray(x)).T
      y = jnp.asarray(draw_y((n,)))
    return config, params, x_t, seas, y, likelihoods

  def _oracle(self, distribution, config, params, x_t, seas, y, likelihoods,
              lik_scale):
    from bayesnf_tpu.models import field as field_lib

    dist = likelihoods.LikelihoodDist(distribution)

    def member_loss(p, xt, st, yy):
      pred = field_lib.apply_field_t(config, p, xt, st)
      return -lik_scale * likelihoods.log_likelihood(dist, p, pred, yy)

    if x_t.ndim == 2:
      total = lambda ps: jax.vmap(
          member_loss, in_axes=(0, None, None, None)
      )(ps, x_t, seas, y).sum()
      losses_fn = lambda ps: jax.vmap(
          member_loss, in_axes=(0, None, None, None)
      )(ps, x_t, seas, y)
    else:
      total = lambda ps: jax.vmap(member_loss)(ps, x_t, seas, y).sum()
      losses_fn = lambda ps: jax.vmap(member_loss)(ps, x_t, seas, y)
    return losses_fn(params), jax.grad(total)(params)

  def _run_fused(self, distribution, config, params, x_t, seas, y, lik_scale,
                 precision='f32', subtiles=None, n_valid=None):
    from bayesnf_tpu.models import field as field_lib

    num_w = config.depth + 1
    weights = tuple(
        params[field_lib.IDX_FIRST_DENSE + 2 * l] for l in range(num_w))
    biases = tuple(
        params[field_lib.IDX_FIRST_DENSE + 2 * l + 1] for l in range(num_w))
    obs_raw = jnp.stack(
        [
            params[field_lib.IDX_LOG_NOISE_SCALE],
            params[field_lib.IDX_NB_SHAPE_RAW],
            params[field_lib.IDX_ZINB_LOGIT],
        ],
        axis=-1,
    )
    losses, dlsa, dfs, dws, dbs, dscales, dlogit, dobs = fused_mlp.fused_train(
        distribution, config.depth, TILE, lik_scale, config.input_scales,
        config.fourier_degrees, config.interactions, x_t, seas,
        weights, biases,
        params[field_lib.IDX_LOG_SCALE_ADJ],
        params[field_lib.IDX_FEATURE_SCALES],
        params[field_lib.IDX_LAYER_SCALES],
        params[field_lib.IDX_ACTIVATION_LOGIT],
        obs_raw,
        y,
        precision=precision,
        subtiles=subtiles,
        n_valid=n_valid,
    )
    pairs = {
        'dlsa': (dlsa, field_lib.IDX_LOG_SCALE_ADJ),
        'dfs': (dfs, field_lib.IDX_FEATURE_SCALES),
        'dscales': (dscales, field_lib.IDX_LAYER_SCALES),
        'dlogit': (dlogit, field_lib.IDX_ACTIVATION_LOGIT),
        'dnoise': (dobs[:, 0], field_lib.IDX_LOG_NOISE_SCALE),
        'dshape': (dobs[:, 1], field_lib.IDX_NB_SHAPE_RAW),
        'dzinb': (dobs[:, 2], field_lib.IDX_ZINB_LOGIT),
    }
    for l in range(num_w):
      pairs[f'dw{l}'] = (dws[l], field_lib.IDX_FIRST_DENSE + 2 * l)
      pairs[f'db{l}'] = (dbs[l], field_lib.IDX_FIRST_DENSE + 2 * l + 1)
    return losses, pairs

  # The observation scalars the oracle does NOT differentiate for a given
  # model (their gradient must come back exactly zero from the kernel).
  _UNUSED_OBS = {
      'NORMAL': ('dshape', 'dzinb'),
      'NB': ('dnoise', 'dzinb'),
      'ZINB': ('dnoise',),
  }

  @pytest.mark.parametrize('distribution', ['NORMAL', 'NB', 'ZINB'])
  @pytest.mark.parametrize('per_member_x', [False, True])
  def test_matches_autodiff(self, distribution, per_member_x):
    config, params, x_t, seas, y, likelihoods = self._setup(
        distribution=distribution, per_member_x=per_member_x)
    lik_scale = 1.75
    losses, pairs = self._run_fused(
        distribution, config, params, x_t, seas, y, lik_scale)
    want_losses, want_grads = self._oracle(
        distribution, config, params, x_t, seas, y, likelihoods, lik_scale)

    # Count-model losses include the Stirling-vs-lgamma difference
    # (~3e-4 relative worst-case, see ops/special).
    loss_rtol = (2e-4 if distribution == 'NORMAL' else 1e-3) * TOL_SCALE
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want_losses), rtol=loss_rtol)
    grad_tol = tuple(
        t * TOL_SCALE
        for t in ((2e-4, 2e-5) if distribution == 'NORMAL' else (2e-3, 2e-4))
    )
    for name, (got, idx) in pairs.items():
      want = np.asarray(want_grads[idx])
      if name in self._UNUSED_OBS[distribution]:
        np.testing.assert_array_equal(np.asarray(got), np.zeros_like(want),
                                      err_msg=name)
        continue
      np.testing.assert_allclose(
          np.asarray(got), want, rtol=grad_tol[0], atol=grad_tol[1],
          err_msg=name)

  def test_grouped_inputs_match_repeat(self):
    """Per-member-group inputs (leading dim E/rep) are served to `rep`
    consecutive members by the index maps — bitwise identical to feeding
    explicitly repeated inputs. This is the VI fused path's no-HBM-repeat
    contract for MC draws folded into the member axis."""
    config, params, x_t, seas, y, _ = self._setup(per_member_x=True)
    rep = 2
    # Member order must be draw-minor: kernel member m reads group m // rep.
    params_r = tuple(
        jnp.stack([p, p * 1.05 + 0.01], axis=1).reshape((-1,) + p.shape[1:])
        for p in params
    )
    lik_scale = 1.3
    got_l, got_pairs = self._run_fused(
        'NORMAL', config, params_r, x_t, seas, y, lik_scale)
    want_l, want_pairs = self._run_fused(
        'NORMAL', config, params_r,
        jnp.repeat(x_t, rep, axis=0), jnp.repeat(seas, rep, axis=0),
        jnp.repeat(y, rep, axis=0), lik_scale)
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(want_l))
    for name in got_pairs:
      np.testing.assert_array_equal(
          np.asarray(got_pairs[name][0]), np.asarray(want_pairs[name][0]),
          err_msg=name)

  def test_grouped_inputs_reject_non_divisor(self):
    config, params, x_t, seas, y, _ = self._setup(per_member_x=True)
    with pytest.raises(ValueError, match='must divide'):
      self._run_fused('NORMAL', config, params, x_t[:2], seas[:2], y, 1.0)

  @pytest.mark.parametrize('distribution', ['NORMAL', 'NB', 'ZINB'])
  def test_dynamic_n_valid_masks_padding(self, distribution):
    """Junk rows past a traced n_valid contribute nothing — exact match.

    The dynamic valid-row count is how row-sharded training masks each
    shard's padded tail (N % shards != 0) inside one SPMD program.
    """
    config, params, x_t, seas, y, _ = self._setup(distribution=distribution)
    n = x_t.shape[-1]
    pad = 13
    x_p = jnp.concatenate(
        [x_t, jnp.full(x_t.shape[:-1] + (pad,), 9.9, x_t.dtype)], axis=-1)
    seas_p = jnp.concatenate(
        [seas, jnp.full(seas.shape[:-1] + (pad,), -9.9, seas.dtype)], axis=-1)
    y_junk = 5.0 if distribution == 'NORMAL' else 17.0
    y_p = jnp.concatenate([y, jnp.full(y.shape[:-1] + (pad,), y_junk)],
                          axis=-1)
    losses, pairs = self._run_fused(
        distribution, config, params, x_t, seas, y, 1.25)
    losses_d, pairs_d = self._run_fused(
        distribution, config, params, x_p, seas_p, y_p, 1.25,
        n_valid=jnp.int32(n))
    np.testing.assert_array_equal(np.asarray(losses), np.asarray(losses_d))
    for name, (got, _) in pairs.items():
      np.testing.assert_array_equal(
          np.asarray(got), np.asarray(pairs_d[name][0]), err_msg=name)

  @pytest.mark.parametrize('distribution', ['NORMAL', 'NB'])
  def test_subtiles_match_autodiff(self, distribution):
    """The VPU/MXU-overlap subtile split changes scheduling, not results.

    At the interpreter tile (32) with n=70 this also exercises the
    fully-masked subtile (the last tile holds 6 valid rows; its second
    subtile holds none); at the compiled-sweep tile (128) the second
    subtile is partially masked instead.
    """
    config, params, x_t, seas, y, likelihoods = self._setup(
        distribution=distribution)
    lik_scale = 1.75
    losses, pairs = self._run_fused(
        distribution, config, params, x_t, seas, y, lik_scale, subtiles=2)
    want_losses, want_grads = self._oracle(
        distribution, config, params, x_t, seas, y, likelihoods, lik_scale)
    loss_rtol = (2e-4 if distribution == 'NORMAL' else 1e-3) * TOL_SCALE
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want_losses), rtol=loss_rtol)
    grad_tol = tuple(
        t * TOL_SCALE
        for t in ((2e-4, 2e-5) if distribution == 'NORMAL' else (2e-3, 2e-4))
    )
    for name, (got, idx) in pairs.items():
      if name in self._UNUSED_OBS[distribution]:
        continue
      np.testing.assert_allclose(
          np.asarray(got), np.asarray(want_grads[idx]),
          rtol=grad_tol[0], atol=grad_tol[1], err_msg=name)

  @pytest.mark.parametrize('distribution', ['NORMAL', 'NB'])
  def test_bf16_close_to_f32_oracle(self, distribution):
    """bf16 MXU operands: losses and grads track the f32 oracle.

    Tolerances are bf16-mantissa-scale (8 bits): relative agreement ~1-2%,
    with an absolute floor sized to each tensor's own magnitude so that
    near-zero entries don't demand impossible relative precision.
    """
    config, params, x_t, seas, y, likelihoods = self._setup(
        distribution=distribution)
    lik_scale = 1.75
    losses, pairs = self._run_fused(
        distribution, config, params, x_t, seas, y, lik_scale,
        precision='bf16')
    want_losses, want_grads = self._oracle(
        distribution, config, params, x_t, seas, y, likelihoods, lik_scale)

    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want_losses), rtol=2e-2)
    for name, (got, idx) in pairs.items():
      if name in self._UNUSED_OBS[distribution]:
        continue
      want = np.asarray(want_grads[idx])
      scale = max(float(np.abs(want).max()), 1e-3)
      np.testing.assert_allclose(
          np.asarray(got), want, rtol=2e-2, atol=2e-2 * scale, err_msg=name)

  def test_highest_matches_f32_oracle(self):
    """precision='highest' (multi-pass true-f32 MXU dots on TPU) matches
    the f32 oracle at f32 tolerances; in interpret mode the dots are
    already true f32, so agreement is near-exact."""
    config, params, x_t, seas, y, likelihoods = self._setup()
    lik_scale = 1.75
    losses, pairs = self._run_fused(
        'NORMAL', config, params, x_t, seas, y, lik_scale,
        precision='highest')
    want_losses, want_grads = self._oracle(
        'NORMAL', config, params, x_t, seas, y, likelihoods, lik_scale)
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want_losses), rtol=2e-4)
    for name, (got, idx) in pairs.items():
      if name in self._UNUSED_OBS['NORMAL']:
        continue
      np.testing.assert_allclose(
          np.asarray(got), np.asarray(want_grads[idx]), rtol=2e-4,
          atol=2e-5, err_msg=name)

  def test_kernel_name_encodes_body_statics(self):
    """Same-shape calls with different body-only statics must not share a
    compiled kernel: the name folds in lik_scale / n_valid / encode layout
    (the Pallas compile cache keys by (name, shapes, specs))."""
    base = ('fused', 1.75, 70, (3, 2, 0), ((0, 1),))
    names = set()
    for statics in [
        base,
        ('fused', 2.0, 70, (3, 2, 0), ((0, 1),)),     # lik_scale
        ('fused', 1.75, 64, (3, 2, 0), ((0, 1),)),    # n_valid
        ('fused', 1.75, 70, (2, 3, 0), ((0, 1),)),    # fourier arrangement
        ('fused', 1.75, 70, (3, 2, 0), ((1, 2),)),    # interactions
    ]:
      names.add(fused_mlp._named_kernel(lambda: None, *statics).__name__)
    assert len(names) == 5, names
    # Deterministic across processes (a stable digest, not id()-based).
    again = fused_mlp._named_kernel(lambda: None, *base).__name__
    assert again in names

  @pytest.mark.slow
  @pytest.mark.parametrize('case_seed', range(6))
  def test_random_config_sweep(self, case_seed):
    """Seeded fuzz over the config space the estimator can produce.

    Each case draws input dimensionality, width, depth, per-input Fourier
    degrees (including zeros), an interaction subset (possibly empty),
    0-2 seasonal factors, an odd row count, and an observation model, then
    checks fused_train's losses and every gradient against the autodiff
    oracle. Guards the kernel's static-config code paths (encode layout,
    group concat, fan-in chains) beyond the handful of hand-picked
    configurations above.
    """
    from bayesnf_tpu.models import field as field_lib

    rng = np.random.default_rng(1000 + case_seed)
    num_inputs = int(rng.integers(2, 5))
    width = int(rng.choice([8, 16, 40]))
    depth = int(rng.integers(1, 4))
    fourier_degrees = [int(rng.integers(0, 5)) for _ in range(num_inputs)]
    if not any(fourier_degrees):
      fourier_degrees[0] = 2
    all_pairs = [(i, j) for i in range(num_inputs)
                 for j in range(i + 1, num_inputs)]
    take = int(rng.integers(0, len(all_pairs) + 1))
    interactions = tuple(
        all_pairs[k] for k in sorted(
            rng.choice(len(all_pairs), size=take, replace=False))
    ) if take else ()
    n_seasonal = int(rng.integers(0, 3))
    periods = [float(p) for p in rng.choice([7.0, 12.0, 24.0], size=n_seasonal,
                                            replace=False)]
    harmonics = [int(rng.integers(1, 4)) for _ in range(n_seasonal)]
    n = int(rng.choice([33, 64, 70, 97]))
    distribution = str(rng.choice(['NORMAL', 'NB', 'ZINB']))

    config = field_lib.FieldConfig.create(
        width=width,
        depth=depth,
        input_scales=[50.0] + [1.0] * (num_inputs - 1),
        fourier_degrees=fourier_degrees,
        interactions=interactions,
        seasonality_periods=periods,
        num_seasonal_harmonics=harmonics,
    )
    config_, params, x_t, seas, y, likelihoods = self._setup(
        distribution=distribution, n=n, seed=100 + case_seed, config=config)
    lik_scale = float(rng.uniform(0.5, 3.0))
    losses, pairs = self._run_fused(
        distribution, config, params, x_t, seas, y, lik_scale)
    want_losses, want_grads = self._oracle(
        distribution, config, params, x_t, seas, y, likelihoods, lik_scale)

    loss_rtol = (2e-4 if distribution == 'NORMAL' else 1e-3) * TOL_SCALE
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want_losses), rtol=loss_rtol)
    grad_tol = tuple(
        t * TOL_SCALE
        for t in ((5e-4, 5e-5) if distribution == 'NORMAL' else (2e-3, 5e-4))
    )
    for name, (got, idx) in pairs.items():
      want = np.asarray(want_grads[idx])
      if name in self._UNUSED_OBS[distribution]:
        np.testing.assert_array_equal(np.asarray(got), np.zeros_like(want),
                                      err_msg=name)
        continue
      np.testing.assert_allclose(
          np.asarray(got), want, rtol=grad_tol[0], atol=grad_tol[1],
          err_msg=name)

  def test_no_seasonal_no_interactions(self):
    config, params, x_t, seas, y, likelihoods = self._setup(
        interactions=(), seasonal=False)
    assert seas.shape[0] == 0
    losses, _ = self._run_fused(
        'NORMAL', config, params, x_t, seas, y, 1.0)
    want_losses, _ = self._oracle(
        'NORMAL', config, params, x_t, seas, y, likelihoods, 1.0)
    np.testing.assert_allclose(
        np.asarray(losses), np.asarray(want_losses), rtol=2e-4 * TOL_SCALE)


def test_resolve_subtiles_env(monkeypatch):
  """The env knob resolves through a helper callers key their caches on."""
  monkeypatch.delenv('BNF_FUSED_SUBTILES', raising=False)
  assert fused_mlp.resolve_subtiles() == 1
  assert fused_mlp.resolve_subtiles(4) == 4
  monkeypatch.setenv('BNF_FUSED_SUBTILES', '2')
  assert fused_mlp.resolve_subtiles() == 2
  assert fused_mlp.resolve_subtiles(4) == 4  # explicit beats env
