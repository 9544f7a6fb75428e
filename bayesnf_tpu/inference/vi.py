"""Ensemble mean-field variational inference.

Semantics parity with the reference VI path
(`/root/reference/src/bayesnf/inference.py:203-231,336-373,626-764`), which
delegates the optimizer loop to `tfp.vi.fit_surrogate_posterior_stateless`.
Here the loop is owned end-to-end:

- Surrogate: independent Normal(loc, 1e-4 + softplus(raw_scale)) per
  parameter entry (reference inference.py:711-720).
- Surrogate init: loc ~ TruncatedNormal(0,1,-2,2) for weight matrices,
  0 elsewhere; raw_scale = softplus_inverse(0.3) (reference
  inference.py:203-231).
- Per-step loss (one member): mean over `sample_size` reparametrized draws z
  of [log q(z) - prior.log_prob(z) - loglik(z, batch) * (N/B) / kl_weight];
  the returned loss history is multiplied back by kl_weight (reference
  inference.py:687-709,755-758).
- The minibatch is re-drawn each step via a seeded permutation prefix
  (reference inference.py:704-709).

TPU-first redesign: one jit over the ('ens', 'data') mesh; members are a
leading sharded axis; `lax.scan` over steps with no host sync; posterior
draws are produced inside the same program.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bayesnf_tpu.inference import backends as backends_lib
from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.models import likelihoods
from bayesnf_tpu.models import priors
from bayesnf_tpu.ops import special
from bayesnf_tpu.parallel import mesh as mesh_lib
from bayesnf_tpu.parallel import minibatch as minibatch_lib


def init_surrogate(config: field_lib.FieldConfig, key: jax.Array):
  """Initialize one member's surrogate (locs, raw_scales) tuples."""
  specs = field_lib.param_specs(config)
  keys = jax.random.split(key, len(specs))
  locs, raw_scales = [], []
  raw_scale_init = float(np.log(np.expm1(0.3)))  # softplus_inverse(0.3)
  for spec, k in zip(specs, keys):
    if spec.is_matrix:
      locs.append(jax.random.truncated_normal(k, -2.0, 2.0, spec.shape))
    else:
      locs.append(jnp.zeros(spec.shape, dtype=jnp.float32))
    raw_scales.append(jnp.full(spec.shape, raw_scale_init, dtype=jnp.float32))
  return tuple(locs), tuple(raw_scales)


def surrogate_scales(raw_scales):
  return tuple(1e-4 + jax.nn.softplus(r) for r in raw_scales)


def _surrogate_sample(locs, scales, key, sample_shape=()):
  keys = jax.random.split(key, len(locs))
  return tuple(
      loc + scale * jax.random.normal(k, sample_shape + loc.shape)
      for loc, scale, k in zip(locs, scales, keys)
  )


def _surrogate_log_prob(locs, scales, z):
  total = jnp.zeros((), dtype=jnp.float32)
  for loc, scale, zi in zip(locs, scales, z):
    total += jnp.sum(special.normal_log_prob(zi, loc, scale))
  return total


@functools.lru_cache(maxsize=32)
def _make_vi_fn(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    num_steps: int,
    batch_size: int,
    data_size: int,
    learning_rate: float,
    sample_size: int,
    kl_weight: float,
    mesh,
    precision: str = 'f32',
    row_pad: int = 0,
):
  """Build the jitted ensemble-VI program for one static config.

  `row_pad`: trailing padding rows the caller appended so the stored rows
  divide the mesh's data axis; excluded from the likelihood via zero
  weights (full batch) or by never being indexed (minibatch permutation).
  """
  optimizer = optax.adam(learning_rate)
  d = config.num_inputs
  compute_dtype = {
      'f32': None, 'bf16': jnp.bfloat16, 'highest': 'highest'
  }[precision]
  full_batch = batch_size == data_size

  def unnormalized_target(z, aug_bt, y_b, w_b):
    # Features-major layout (rows on the TPU lane axis), as in the MAP path.
    pred = field_lib.apply_field_t(
        config, z, aug_bt[:d], aug_bt[d:], compute_dtype=compute_dtype
    )
    loglik = likelihoods.log_likelihood(
        distribution, z, pred, y_b, weights=w_b
    )
    return priors.prior_log_prob(config, z) + (
        loglik * (data_size / batch_size) / kl_weight
    )

  data_shards = mesh.shape[mesh_lib.DATA_AXIS]
  # Balanced-layout stored-position map for the minibatch permutation
  # (identity when there is no padding); see inference/map.py.
  stored_pos = (
      jnp.asarray(minibatch_lib.stored_positions(data_size, data_shards))
      if row_pad
      else None
  )

  def member_fit(surrogate, opt_state, key, aug_t, target):
    row_w = (
        minibatch_lib.valid_row_weights(data_size, data_shards)
        if row_pad and full_batch
        else None
    )

    def elbo_loss(surrogate, sample_key, aug_bt, y_b, w_b):
      locs, raw_scales = surrogate
      scales = surrogate_scales(raw_scales)
      z_draws = _surrogate_sample(locs, scales, sample_key, (sample_size,))

      def one_draw(z):
        return _surrogate_log_prob(locs, scales, z) - unnormalized_target(
            z, aug_bt, y_b, w_b
        )

      return jnp.mean(jax.vmap(one_draw)(z_draws))

    def one_step(carry, _):
      surrogate, opt_state, key = carry
      key, sample_key, batch_key = jax.random.split(key, 3)
      if batch_size < data_size:
        idx = jax.random.permutation(batch_key, data_size)[:batch_size]
        if stored_pos is not None:
          idx = stored_pos[idx]
        aug_bt, y_b = aug_t[:, idx], target[idx]
      else:
        aug_bt, y_b = aug_t, target
      loss, grads = jax.value_and_grad(elbo_loss)(
          surrogate, sample_key, aug_bt, y_b, row_w
      )
      updates, opt_state = optimizer.update(grads, opt_state)
      surrogate = optax.apply_updates(surrogate, updates)
      return (surrogate, opt_state, key), loss

    (surrogate, opt_state, key), losses = jax.lax.scan(
        one_step, (surrogate, opt_state, key), None, length=num_steps
    )
    return surrogate, opt_state, key, losses * kl_weight

  fit = jax.vmap(member_fit, in_axes=(0, 0, 0, None, None))

  ens = mesh_lib.ensemble_sharding(mesh)
  data = mesh_lib.data_sharding(mesh)
  data_t = mesh_lib.data_sharding_t(mesh)
  num_leaves = len(field_lib.param_specs(config))
  param_shards = (ens,) * num_leaves
  surr_shards = (param_shards, param_shards)
  opt_shards = backends_lib.adam_state_spec(
      config, learning_rate, ens, surrogate=True
  )
  return jax.jit(
      fit,
      in_shardings=(surr_shards, opt_shards, ens, data_t, data),
      out_shardings=(surr_shards, opt_shards, ens, ens),
      donate_argnums=(0, 1, 2),
  )


def init_vi_opt_state(learning_rate, surrogate):
  """Adam state for a batched (leading member axis) surrogate."""
  return jax.vmap(optax.adam(learning_rate).init)(surrogate)


@functools.lru_cache(maxsize=32)
def _make_vi_init_fn(
    config: field_lib.FieldConfig, learning_rate: float, padded: int, mesh=None
):
  """ONE jitted, module-cached program for the whole surrogate init:
  every key split, member surrogates, Adam state, per-member step keys.

  Cached at module scope — a jit wrapper created inside `fit_vi` would
  recompile on every fit (measured ~2x throughput loss per bench rep on
  the remote service); one program replaces ~60 primitive-sized eager
  setup compiles (inference/map.py `_make_init_fn`, roadmap item 3).
  The key derivation is the reference scheme verbatim (threefry is
  bit-identical under jit, so folding the splits in changes no RNG
  stream). With a (single-process) `mesh`, outputs come back already
  ensemble-sharded, matching the VI programs' in_shardings — the first
  chunk dispatches without eager per-leaf reshards. Multi-process
  callers pass mesh=None and globalize explicitly. `opt_seed` feeds the
  host-side streaming pipeline's batch schedule.
  """

  def init_all(seed):
    init_seed, opt_seed = jax.random.split(seed, 2)
    init_keys = jax.random.split(init_seed, padded)
    surrogate = jax.vmap(lambda k: init_surrogate(config, k))(init_keys)
    member_keys = jax.random.split(opt_seed, padded)
    return (
        surrogate,
        init_vi_opt_state(learning_rate, surrogate),
        member_keys,
        opt_seed,
    )

  if mesh is None:
    return jax.jit(init_all)
  ens = mesh_lib.ensemble_sharding(mesh)
  num_leaves = len(field_lib.param_specs(config))
  param_shards = (ens,) * num_leaves
  out_shardings = (
      (param_shards, param_shards),
      backends_lib.adam_state_spec(config, learning_rate, ens, surrogate=True),
      ens,
      mesh_lib.replicated_sharding(mesh),
  )
  return jax.jit(init_all, out_shardings=out_shardings)


def _make_elbo_losses(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    lik_scale: float,
    sample_size: int,
    precision: str,
    kernel: str,
    tile: int | None,
    subtiles: int,
    data_shards: int,
):
  """Per-step ensemble negative-ELBO function shared by the shard_map VI
  factories (`_make_shardmap_vi_fn`, `_make_stream_vi_fn`).

  Returns `elbo_losses(surrogate, sample_keys, aug_bt, y_b, n_valid=None)
  -> (E_local,)` per-member negative ELBO (mean over MC draws), where
  `aug_bt` is a shared (F, B) batch or per-member (E, F, B) batches.
  kernel='pallas' returns fully data-reduced losses (the custom-VJP NLL
  psums inside); kernel='xla' returns LOCAL losses with the replicated
  terms (log q, prior) pre-scaled by 1/data_shards so the caller's psum
  over 'data' counts them exactly once.
  """
  d = config.num_inputs
  num_w = config.depth + 1
  compute_dtype = {
      'f32': None, 'bf16': jnp.bfloat16, 'highest': 'highest'
  }[precision]

  def make_kernel_nll(aug_bt, y_b, n_valid=None):
    """lik_scale * -loglik as a custom-VJP op over the fused train kernel.

    The kernel (`fused_mlp.fused_train`, any observation model) produces
    the loss AND all its parameter gradients in one pass; wrapping it in
    `custom_vjp` (the forward saves the gradients as residuals, the
    backward scales them by the incoming per-member cotangent) lets JAX
    autodiff compose the rest of the ELBO — the reparametrized sampling,
    log q, and prior — around it untouched.
    """
    from bayesnf_tpu.ops import fused_mlp

    x_b = aug_bt[..., :d, :]
    seasonal_b = aug_bt[..., d:, :]

    def run_kernel(z_f):
      weights = tuple(
          z_f[field_lib.IDX_FIRST_DENSE + 2 * l] for l in range(num_w)
      )
      biases = tuple(
          z_f[field_lib.IDX_FIRST_DENSE + 2 * l + 1] for l in range(num_w)
      )
      obs_raw = jnp.stack(
          [
              z_f[field_lib.IDX_LOG_NOISE_SCALE],
              z_f[field_lib.IDX_NB_SHAPE_RAW],
              z_f[field_lib.IDX_ZINB_LOGIT],
          ],
          axis=-1,
      )
      return fused_mlp.fused_train(
          distribution.value,
          config.depth,
          tile,
          lik_scale,
          config.input_scales,
          config.fourier_degrees,
          config.interactions,
          x_b,
          seasonal_b,
          weights,
          biases,
          z_f[field_lib.IDX_LOG_SCALE_ADJ],
          z_f[field_lib.IDX_FEATURE_SCALES],
          z_f[field_lib.IDX_LAYER_SCALES],
          z_f[field_lib.IDX_ACTIVATION_LOGIT],
          obs_raw,
          y_b,
          precision=precision,
          subtiles=subtiles,
          n_valid=n_valid,
      )

    @jax.custom_vjp
    def kernel_nll(z_f):
      losses = run_kernel(z_f)[0]
      if data_shards > 1:
        losses = jax.lax.psum(losses, mesh_lib.DATA_AXIS)
      return losses

    def fwd(z_f):
      losses, dlsa, dfs, dws, dbs, dscales, dlogit, dobs = run_kernel(z_f)
      if data_shards > 1:
        # Row shards: the NLL is a sum over rows, so losses psum here and
        # the (local) gradient residuals psum after cotangent scaling.
        losses = jax.lax.psum(losses, mesh_lib.DATA_AXIS)
      return losses, (dlsa, dfs, dws, dbs, dscales, dlogit, dobs)

    def bwd(res, g):
      dlsa, dfs, dws, dbs, dscales, dlogit, dobs = res
      grads = field_lib.scatter_fused_train_grads(
          config, dlsa, dfs, dws, dbs, dscales, dlogit, dobs
      )
      def scaled(grad):
        out = grad * g.reshape((-1,) + (1,) * (grad.ndim - 1))
        if data_shards > 1:
          out = jax.lax.psum(out, mesh_lib.DATA_AXIS)
        return out
      return (tuple(scaled(gr) for gr in grads),)

    kernel_nll.defvjp(fwd, bwd)
    return kernel_nll

  def xla_nll(z, aug_bt, y_b, n_valid=None):
    """Local-shard NLL per (member, draw) via autodiff-able vmaps.

    Twin of the fused kernel's NLL with the same draw-minor flattening;
    per-member batches serve all of a member's draws through vmap axes
    (no S-fold materialization). Returns the LOCAL shard's row sum — the
    caller psums (kernel='xla' one_step) when the data axis is sharded.
    """

    def member(zm, aug_m, y_m):
      pred = field_lib.apply_field_t(
          config, zm, aug_m[:d], aug_m[d:], compute_dtype=compute_dtype
      )
      w = None
      if n_valid is not None:
        w = (jnp.arange(aug_m.shape[-1]) < n_valid).astype(jnp.float32)
      return -lik_scale * likelihoods.log_likelihood(
          distribution, zm, pred, y_m, weights=w
      )

    per_draw = jax.vmap(member, in_axes=(0, None, None))  # over S draws
    batch_axes = (0, None, None) if aug_bt.ndim == 2 else (0, 0, 0)
    nll = jax.vmap(per_draw, in_axes=batch_axes)(z, aug_bt, y_b)
    return nll.reshape(-1)  # (E_local * S,), draw-minor like z_f

  def elbo_losses(surrogate, sample_keys, aug_bt, y_b, n_valid=None):
    """(E_local,) per-member negative ELBO (mean over MC draws)."""
    locs, raw_scales = surrogate
    scales = surrogate_scales(raw_scales)
    # Per-member draws, exactly as the XLA path's per-member
    # `_surrogate_sample(locs, scales, sample_key, (sample_size,))`.
    z = jax.vmap(
        lambda l, s, k: _surrogate_sample(l, s, k, (sample_size,))
    )(locs, scales, sample_keys)  # leaves (E_local, S, ...)
    e_local = z[0].shape[0]
    z_f = tuple(p.reshape((e_local * sample_size,) + p.shape[2:]) for p in z)

    if kernel == 'pallas':
      # Per-member minibatches (leading dim E_local) feed the
      # (E_local * S)-member kernel directly: `fused_train`'s index maps
      # serve each member's one stored batch to all S of its draws — no
      # S-fold HBM materialization (the kernel member m reads batch group
      # m // S, matching the draw-major z_f reshape above). A shared
      # (F, B) batch feeds every kernel member, as in full batch.
      nll = make_kernel_nll(aug_bt, y_b, n_valid)(z_f)  # (ES,) reduced
      rs = 1.0
    else:
      nll = xla_nll(z, aug_bt, y_b, n_valid)  # (ES,) LOCAL shard sum
      rs = 1.0 / data_shards
    prior = jax.vmap(lambda p: priors.prior_log_prob(config, p))(z_f)
    target = (rs * prior - nll).reshape(e_local, sample_size)
    logq = jax.vmap(
        jax.vmap(_surrogate_log_prob, in_axes=(None, None, 0)),
        in_axes=(0, 0, 0),
    )(locs, scales, z)  # (E_local, S)
    return (rs * logq - target).mean(axis=1)

  return elbo_losses


@functools.lru_cache(maxsize=32)
def _make_shardmap_vi_fn(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    num_steps: int,
    batch_size: int,
    data_size: int,
    learning_rate: float,
    sample_size: int,
    kl_weight: float,
    mesh,
    precision: str = 'f32',
    tile: int | None = None,
    subtiles: int = 1,
    kernel: str = 'pallas',
):
  """Ensemble-VI step under explicit `jax.shard_map` over the mesh.

  `kernel='pallas'`: the ELBO's MC-sample axis is folded into the fused
  train kernel's *member* axis — each reparametrized draw carries its own
  sampled weights, so the local ensemble presents (E_local * sample_size)
  independent parameter sets to one `fused_train` invocation (any
  observation model), and each member's minibatch feeds all of its draws
  through the kernel's index maps (no S-fold HBM copy). `kernel='xla'`
  substitutes a vmapped autodiff NLL with identical RNG structure — the
  XLA twin for sharded-minibatch agreement testing. Per-member RNG (step
  key splits, draw sampling, minibatch permutation) matches `_make_vi_fn`
  exactly on an unsharded data axis, so backends agree up to matmul
  reassociation.

  A data axis > 1 is supported for BOTH regimes (see
  `inference/map.py:_make_shardmap_train_fn` — full batch psums the NLL
  and its gradients over 'data'; minibatch uses the per-shard local
  permutation of `parallel/minibatch.py`, resampled every step, and
  requires batch_size % data_shards == 0).
  """
  data_shards = mesh.shape[mesh_lib.DATA_AXIS]
  full_batch = batch_size == data_size
  if data_shards != 1 and not full_batch and batch_size % data_shards:
    raise ValueError(
        f'minibatch VI over a sharded data axis requires '
        f'batch_size % data_shards == 0 (got {batch_size=}, '
        f'{data_shards=}): each shard contributes batch_size/data_shards '
        "rows per step. Adjust batch_size or use backend='xla' (global-"
        'permutation fallback).'
    )
  local_rows, _ = minibatch_lib.shard_counts(data_size, data_shards)
  row_pad = local_rows * data_shards - data_size
  local_batch = batch_size // data_shards if data_shards > 1 else batch_size

  optimizer = optax.adam(learning_rate)
  if kernel == 'pallas':
    from bayesnf_tpu.ops import fused_mlp

    if tile is None:
      tile = fused_mlp.pick_tile(config.width, min(local_batch, local_rows))
  elif kernel != 'xla':
    raise ValueError(f'Unknown shard_map kernel: {kernel!r}')

  elbo_losses = _make_elbo_losses(
      config,
      distribution,
      lik_scale=(data_size / batch_size) / kl_weight,
      sample_size=sample_size,
      precision=precision,
      kernel=kernel,
      tile=tile,
      subtiles=subtiles,
      data_shards=data_shards,
  )

  def shard_fit(surrogate, opt_state, keys, aug_t, target):
    if row_pad and full_batch:
      # Balanced layout: each shard masks its own padded tail in-kernel.
      shard = jax.lax.axis_index(mesh_lib.DATA_AXIS)
      n_valid = minibatch_lib.local_valid_count(data_size, data_shards, shard)
    else:
      # Minibatch rows come from the valid prefix only — no mask needed.
      n_valid = None

    def one_step(carry, _):
      surrogate, opt_state, keys = carry
      split = jax.vmap(functools.partial(jax.random.split, num=3))(keys)
      keys, sample_keys, batch_keys = split[:, 0], split[:, 1], split[:, 2]
      if full_batch:
        aug_bt, y_b = aug_t, target
      elif data_shards == 1:
        idx = jax.vmap(
            lambda k: jax.random.permutation(k, data_size)[:batch_size]
        )(batch_keys)  # (E_local, B)
        aug_bt, y_b = aug_t[:, idx].transpose(1, 0, 2), target[idx]
      else:
        # Per-shard local resampling each step (documented RNG deviation;
        # see parallel/minibatch.py). Identical across shard_map kernels.
        shard = jax.lax.axis_index(mesh_lib.DATA_AXIS)
        nv = minibatch_lib.local_valid_count(data_size, data_shards, shard)
        idx = jax.vmap(
            lambda k: minibatch_lib.local_permutation(
                k, shard, local_rows, nv, local_batch
            )
        )(batch_keys)  # (E_local, B_local)
        aug_bt, y_b = aug_t[:, idx].transpose(1, 0, 2), target[idx]

      def total(surrogate):
        losses = elbo_losses(surrogate, sample_keys, aug_bt, y_b, n_valid)
        return losses.sum(), losses

      (_, losses), grads = jax.value_and_grad(total, has_aux=True)(surrogate)
      if kernel == 'xla' and data_shards > 1:
        # elbo_losses returned shard-local values (replicated terms
        # pre-scaled by 1/data_shards): reduce to the full ELBO here.
        losses = jax.lax.psum(losses, mesh_lib.DATA_AXIS)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, mesh_lib.DATA_AXIS), grads
        )
      updates, opt_state = jax.vmap(optimizer.update)(grads, opt_state)
      surrogate = optax.apply_updates(surrogate, updates)
      return (surrogate, opt_state, keys), losses

    (surrogate, opt_state, keys), losses = jax.lax.scan(
        one_step, (surrogate, opt_state, keys), None, length=num_steps
    )
    # (num_steps, E_local) -> (E_local, num_steps), x kl_weight as in the
    # reference's returned history (inference.py:755-758).
    return surrogate, opt_state, keys, losses.T * kl_weight

  num_leaves = len(field_lib.param_specs(config))
  p_ens = jax.sharding.PartitionSpec(mesh_lib.ENSEMBLE_AXIS)
  # Rows shard over 'data' (replication when the axis is 1).
  p_rows_t = jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS)
  p_rows = jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS)
  params_spec = (p_ens,) * num_leaves
  surr_spec = (params_spec, params_spec)
  opt_spec = backends_lib.adam_state_spec(
      config, learning_rate, p_ens, surrogate=True
  )
  sharded = jax.shard_map(
      shard_fit,
      mesh=mesh,
      in_specs=(surr_spec, opt_spec, p_ens, p_rows_t, p_rows),
      out_specs=(surr_spec, opt_spec, p_ens, p_ens),
      check_vma=False,
  )
  return jax.jit(sharded, donate_argnums=(0, 1, 2))


@functools.lru_cache(maxsize=32)
def _make_stream_vi_fn(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    slice_steps: int,
    batch_size: int,
    data_size: int,
    learning_rate: float,
    sample_size: int,
    kl_weight: float,
    mesh,
    precision: str = 'f32',
    tile: int | None = None,
    subtiles: int = 1,
    kernel: str = 'pallas',
    member_remix: bool = False,
):
  """One slice of the host-streaming VI loop as a jitted program.

  Advances every surrogate by `slice_steps` ELBO steps on host-assembled
  batches: (S, F, B) inputs shared across members AND across each
  member's MC draws (the kernel/vmap broadcast a shared batch exactly as
  in full-batch training), batch rows sharded over 'data'. Device RNG is
  only used for the reparametrized draws — the minibatch sequence comes
  from the host stream (`parallel/streaming.py`, per-step resample).

  `member_remix`: same scheme as the MAP stream trainer — one extra
  raw-key argument, each member repartitions the slice's S x B rows into
  its own batches on device (per-member SGD-noise decorrelation at zero
  extra transfer; the slice size becomes the semantic remix window).
  """
  data_shards = mesh.shape[mesh_lib.DATA_AXIS]
  if batch_size % data_shards:
    raise ValueError(
        f'streaming VI over a sharded data axis requires '
        f'batch_size % data_shards == 0 (got {batch_size=}, {data_shards=}).'
    )
  local_batch = batch_size // data_shards
  if kernel == 'pallas':
    from bayesnf_tpu.ops import fused_mlp

    if tile is None:
      tile = fused_mlp.pick_tile(config.width, local_batch)
  elif kernel != 'xla':
    raise ValueError(f'Unknown shard_map kernel: {kernel!r}')

  optimizer = optax.adam(learning_rate)
  elbo_losses = _make_elbo_losses(
      config,
      distribution,
      lik_scale=(data_size / batch_size) / kl_weight,
      sample_size=sample_size,
      precision=precision,
      kernel=kernel,
      tile=tile,
      subtiles=subtiles,
      data_shards=data_shards,
  )

  def shard_fit_slice(surrogate, opt_state, keys, aug_s, y_s, *maybe_key):
    def one_step(carry, batch):
      surrogate, opt_state, keys = carry
      aug_bt, y_b = batch
      # Two-way split (no batch keys — the host stream owns batching).
      split = jax.vmap(functools.partial(jax.random.split, num=2))(keys)
      keys, sample_keys = split[:, 0], split[:, 1]

      def total(surrogate):
        losses = elbo_losses(surrogate, sample_keys, aug_bt, y_b, None)
        return losses.sum(), losses

      (_, losses), grads = jax.value_and_grad(total, has_aux=True)(surrogate)
      if kernel == 'xla' and data_shards > 1:
        # elbo_losses returned shard-local values (replicated terms
        # pre-scaled by 1/data_shards): reduce to the full ELBO here.
        losses = jax.lax.psum(losses, mesh_lib.DATA_AXIS)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, mesh_lib.DATA_AXIS), grads
        )
      updates, opt_state = jax.vmap(optimizer.update)(grads, opt_state)
      surrogate = optax.apply_updates(surrogate, updates)
      return (surrogate, opt_state, keys), losses

    if member_remix:
      # Per-member repartition of the slice pool (plan shared with the MAP
      # trainer — `parallel/streaming.member_remix_plan`).
      from bayesnf_tpu.parallel import streaming as streaming_lib

      pool_aug, pool_y, idx_s = streaming_lib.member_remix_plan(
          maybe_key[0], aug_s, y_s, surrogate[0][0].shape[0]
      )

      def remix_step(carry, idx_b):
        aug_b = jnp.moveaxis(pool_aug[:, idx_b], 0, 1)  # (E, F, B)
        return one_step(carry, (aug_b, pool_y[idx_b]))

      (surrogate, opt_state, keys), losses = jax.lax.scan(
          remix_step, (surrogate, opt_state, keys), idx_s
      )
    else:
      (surrogate, opt_state, keys), losses = jax.lax.scan(
          one_step, (surrogate, opt_state, keys), (aug_s, y_s)
      )
    # (S, E_local) -> (E_local, S), x kl_weight as in the reference's
    # returned history (inference.py:755-758).
    return surrogate, opt_state, keys, losses.T * kl_weight

  num_leaves = len(field_lib.param_specs(config))
  p_ens = jax.sharding.PartitionSpec(mesh_lib.ENSEMBLE_AXIS)
  p_slice_t = jax.sharding.PartitionSpec(None, None, mesh_lib.DATA_AXIS)
  p_slice = jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS)
  params_spec = (p_ens,) * num_leaves
  surr_spec = (params_spec, params_spec)
  opt_spec = backends_lib.adam_state_spec(
      config, learning_rate, p_ens, surrogate=True
  )
  in_specs = (surr_spec, opt_spec, p_ens, p_slice_t, p_slice)
  if member_remix:
    in_specs = in_specs + (jax.sharding.PartitionSpec(),)
  sharded = jax.shard_map(
      shard_fit_slice,
      mesh=mesh,
      in_specs=in_specs,
      out_specs=(surr_spec, opt_spec, p_ens, p_ens),
      check_vma=False,
  )
  return jax.jit(sharded, donate_argnums=(0, 1, 2))


@functools.lru_cache(maxsize=32)
def _make_vi_draw_fn(config: field_lib.FieldConfig, num_samples: int, mesh):
  """Jitted posterior-draw program: (surrogate, keys) -> param draws."""

  def member_draw(surrogate, key):
    locs, raw_scales = surrogate
    return _surrogate_sample(
        locs, surrogate_scales(raw_scales), key, (num_samples,)
    )

  draw = jax.vmap(member_draw)
  ens = mesh_lib.ensemble_sharding(mesh)
  num_leaves = len(field_lib.param_specs(config))
  param_shards = (ens,) * num_leaves
  return jax.jit(
      draw,
      in_shardings=((param_shards, param_shards), ens),
      out_shardings=param_shards,
  )


def fit_vi(
    aug_features,
    target,
    seed: jax.Array,
    observation_model: str,
    config: field_lib.FieldConfig,
    ensemble_size: int,
    learning_rate: float,
    num_epochs: int,
    sample_size_divergence: int = 5,
    sample_size_posterior: int = 30,
    kl_weight: float = 1.0,
    batch_size: int | None = None,
    mesh=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int | None = None,
    precision: str = 'f32',
    backend: str = 'auto',
    stream_chunk_steps: int | None = None,
    stream_member_remix: bool = False,
):
  """Fit an ensemble of mean-field surrogate posteriors.

  Args:
    aug_features: (N, D + 2F) inputs with precomputed seasonal features.
    target: (N,) targets.
    seed: PRNG key.
    observation_model: 'NORMAL' | 'NB' | 'ZINB'.
    config: static model config.
    ensemble_size: total surrogates to fit (any positive int; padded to the
      mesh, padding dropped — fixes reference issue #28).
    learning_rate: Adam learning rate.
    num_epochs: total optimization steps (callers pre-scale by N // B,
      matching the reference's `_scale_epochs_by_batch_size`).
    sample_size_divergence: MC samples per ELBO estimate.
    sample_size_posterior: posterior draws returned per surrogate.
    kl_weight: KL(q||p) weight in the ELBO.
    batch_size: minibatch rows; None means full batch.
    mesh: ('ens', 'data') mesh; defaults to all devices on 'ens'.
    checkpoint_dir: when set, optimization runs in `checkpoint_every`-step
      chunks persisted via orbax; an existing checkpoint resumes bit-exactly.
    checkpoint_every: steps per checkpoint chunk (default: 10% of steps).
    precision: 'f32' (default; on TPU the MXU already computes f32 dots
      with bf16 operands), 'bf16' (explicit bf16 MXU operands, f32
      accumulation), or 'highest' (multi-pass true-f32 MXU arithmetic).
    backend: 'xla', 'pallas' (fused Pallas MLP kernels with the MC-sample
      axis folded into the kernel member axis; a sharded data axis is
      supported both full-batch — NLL/grads psum over 'data' — and
      minibatch, where each shard resamples batch_size/data_shards of its
      own rows per step via the scheme shared with the XLA shard_map
      twin; requires batch_size % data_shards == 0), or 'auto' (pallas on
      TPU when the mesh/batch allow it, with loud fallback to xla on
      kernel build failure; xla otherwise).
    stream_chunk_steps: when set (minibatch fits only), the dataset stays
      in HOST memory — pass `aug_features` as numpy/memmap — and batches
      stream to the mesh in slices of this many steps, double-buffered
      (datasets larger than HBM). Batches are drawn per step (fresh
      permutation prefix, the reference's VI semantics) but SHARED across
      members, deterministically in (seed, step) — a documented RNG
      deviation; see `parallel/streaming.py`.
    stream_member_remix: (streaming only) each member repartitions every
      transferred slice's rows into its own batches on device — per-member
      SGD-noise decorrelation at zero extra transfer (scheme and measured
      effect: inference/map.py + PARITY.md). Makes `stream_chunk_steps`
      the semantic remix window (checkpoint chunks must cover whole
      windows; validated).

  Returns:
    (surrogate, losses, draws):
      surrogate: (locs, raw_scales) tuples with leading member axis E.
      losses: (E, num_steps) per-member loss history (x kl_weight).
      draws: flat param tuple with leading axes (E, sample_size_posterior).
  """
  from bayesnf_tpu.inference import backends
  from bayesnf_tpu.parallel import distributed as dist_lib

  if mesh is None:
    mesh = mesh_lib.default_mesh()
  data_size = int(target.shape[0])
  if batch_size is None or batch_size > data_size:
    batch_size = data_size
  data_shards = mesh.shape[mesh_lib.DATA_AXIS]
  streaming = stream_chunk_steps is not None
  if streaming:
    if int(stream_chunk_steps) < 1:
      raise ValueError(f'{stream_chunk_steps=} must be a positive int.')
    if batch_size == data_size:
      raise ValueError(
          'stream_chunk_steps requires minibatch VI (batch_size < '
          'len(table)): a full-batch fit re-reads the whole dataset every '
          'step, which defeats streaming — set batch_size or drop the flag.'
      )
    if batch_size % data_shards:
      raise ValueError(
          f'streaming VI over a sharded data axis requires '
          f'batch_size % data_shards == 0 (got {batch_size=}, '
          f'{data_shards=}): each slice batch splits evenly over shards.'
      )
  elif stream_member_remix:
    raise ValueError(
        'stream_member_remix applies to host-streaming fits only '
        '(set stream_chunk_steps); on-device minibatch VI already '
        'resamples per member.'
    )
  auto_resolved = backend == 'auto'
  backend = backends.resolve_backend(
      backend,
      mesh,
      full_batch=batch_size == data_size,
      batch_divisible=batch_size % data_shards == 0,
  )
  multiproc = dist_lib.is_multiprocess_mesh(mesh)
  distribution = likelihoods.LikelihoodDist(observation_model)

  padded = mesh_lib.pad_ensemble_size(ensemble_size, mesh)
  surrogate, opt_state, member_keys, opt_seed = _make_vi_init_fn(
      config, float(learning_rate), padded, None if multiproc else mesh
  )(seed)

  if streaming:
    # Host-resident dataset (no-copy views for float32 numpy input); no
    # device transfer, no padded-row layout — streamed batches are full.
    aug_host_t = np.asarray(aug_features, dtype=np.float32).T
    target_host = np.asarray(target, dtype=np.float32)
    aug_t = target = None
    row_pad = 0
  else:
    # One jitted, row-sharded layout program; uneven data axes store the
    # balanced padded layout (each shard a valid prefix) and both
    # backends exclude the padding exactly (see ensemble_map).
    row_pad = (-data_size) % data_shards
    aug_t, target = minibatch_lib.make_layout_fn(
        data_size, data_shards, None if multiproc else mesh
    )(aug_features, target)

  num_steps = int(num_epochs)
  start_step = 0
  loss_chunks = []
  checkpointer = None
  if checkpoint_dir is not None:
    from bayesnf_tpu.utils import checkpoint as ckpt_lib

    fp_kwargs = dict(
        kind='vi',
        config=config,
        distribution=distribution.value,
        ensemble_size=ensemble_size,
        learning_rate=float(learning_rate),
        # num_steps intentionally excluded: extending a run is a
        # supported resume.
        batch_size=int(batch_size),
        data_size=data_size,
        sample_size_divergence=int(sample_size_divergence),
        kl_weight=float(kl_weight),
        precision=precision,
        # Resolved backend: see inference/map.py — a resume must not
        # silently mix xla- and pallas-chunk numerics.
        backend=backend,
        # Data-axis extent fixes row layout, psum grouping, and the
        # sharded-minibatch RNG scheme (see inference/map.py).
        data_shards=data_shards,
        # Streaming uses the shared host-side batch scheme — resuming
        # one scheme under the other would silently change batches.
        stream=streaming,
    )
    # With member remix the slice size is the remix window; keys appear
    # ONLY when remix is on so feature keys never churn pre-existing
    # non-remix fingerprints; one interim release always wrote the keys,
    # so non-remix digests of that recipe are accepted as legacy (see
    # inference/map.py).
    if streaming and stream_member_remix:
      fp_kwargs.update(
          stream_remix=True, stream_remix_window=int(stream_chunk_steps)
      )
      legacy = ()
    else:
      legacy = (
          ckpt_lib.run_fingerprint(
              **fp_kwargs, stream_remix=False, stream_remix_window=None
          ),
      )
    checkpointer = ckpt_lib.TrainCheckpointer(
        checkpoint_dir,
        fingerprint=ckpt_lib.run_fingerprint(**fp_kwargs),
        legacy_fingerprints=legacy,
    )
    restored = checkpointer.restore_latest()
    if restored is not None:
      # Restored host leaves land directly on the VI program's layout
      # (multi-process placement happens below via make_global instead).
      place = jnp.asarray
      if not multiproc:
        ens_restore = mesh_lib.ensemble_sharding(mesh)
        place = lambda x: jax.device_put(np.asarray(x), ens_restore)
      locs_scales = restored.params  # (locs..., raw_scales...) flat tuple
      num_leaves = len(locs_scales) // 2
      surrogate = (
          tuple(place(p) for p in locs_scales[:num_leaves]),
          tuple(place(p) for p in locs_scales[num_leaves:]),
      )
      opt_state = restored.opt_state(template=opt_state, place=place)
      member_keys = place(restored.keys)
      loss_chunks = [np.asarray(l) for l in restored.losses]
      start_step = restored.epoch
    if checkpoint_every is None:
      checkpoint_every = max(1, num_steps // 10)

  if multiproc:
    # Multi-process SPMD: every process computes the same full host values
    # (same script, same seed — and the same restored checkpoint) and
    # contributes its local shards (see inference/map.py).
    ens = mesh_lib.ensemble_sharding(mesh)
    surrogate = jax.tree_util.tree_map(
        lambda x: dist_lib.make_global(x, ens), surrogate
    )
    opt_state = jax.tree_util.tree_map(
        lambda x: dist_lib.make_global(x, ens), opt_state
    )
    member_keys = dist_lib.make_global(member_keys, ens)
    if not streaming:  # streamed slices are globalized per transfer instead
      aug_t = dist_lib.make_global(aug_t, mesh_lib.data_sharding_t(mesh))
      target = dist_lib.make_global(target, mesh_lib.data_sharding(mesh))

  def make_fit(chunk_steps):
    if backend not in ('pallas', 'xla'):
      raise ValueError(f'Unknown backend: {backend!r}')
    # Shard_map routing mirrors inference/map.py: pallas always; xla too
    # for a sharded-data divisible minibatch, so both backends share the
    # per-shard permutation scheme. Recomputed each call because
    # `backend` can flip to 'xla' on a pallas probe fallback.
    use_shardmap = backend == 'pallas' or (
        data_shards > 1
        and batch_size < data_size
        and batch_size % data_shards == 0
    )
    if use_shardmap:
      if backend == 'pallas':
        from bayesnf_tpu.ops import fused_mlp

        # Resolved here so the env knob is part of the lru_cache key.
        subtiles = fused_mlp.resolve_subtiles()
      else:
        subtiles = 1
      return _make_shardmap_vi_fn(
          config,
          distribution,
          chunk_steps,
          int(batch_size),
          data_size,
          float(learning_rate),
          int(sample_size_divergence),
          float(kl_weight),
          mesh,
          precision,
          subtiles=subtiles,
          kernel=backend,
      )
    return _make_vi_fn(
        config,
        distribution,
        chunk_steps,
        int(batch_size),
        data_size,
        float(learning_rate),
        int(sample_size_divergence),
        float(kl_weight),
        mesh,
        precision,
        row_pad=row_pad,
    )

  step = start_step
  # Probe AOT program + the (chunk, resolved subtiles) key it was traced
  # under; reuse requires an exact key match (see inference/map.py — a
  # BNF_FUSED_SUBTILES change mid-run must be a miss, not a stale reuse).
  probe_fn = None
  probe_key = None

  def pallas_probe_key(chunk_steps):
    from bayesnf_tpu.ops import fused_mlp

    return (chunk_steps, fused_mlp.resolve_subtiles())

  if streaming:
    from bayesnf_tpu.parallel import streaming as streaming_lib

    stream = streaming_lib.HostBatchStream(
        aug_host_t, target_host, int(batch_size), opt_seed,
        per_step_resample=True,
    )
    if stream_member_remix:
      streaming_lib.validate_remix_alignment(
          int(stream_chunk_steps),
          step,
          None if checkpointer is None else checkpoint_every,
      )
    # Built only when remix is on: the fold_in inside is an eager
    # device dispatch (docs/roadmap.md item 3 discipline).
    slice_extra_fn = (
        streaming_lib.remix_slice_key_fn(opt_seed)
        if stream_member_remix
        else None
    )

    def make_stream_fn(slice_steps, kernel):
      if kernel not in ('pallas', 'xla'):
        raise ValueError(f'Unknown backend: {kernel!r}')
      if kernel == 'pallas':
        from bayesnf_tpu.ops import fused_mlp

        subtiles = fused_mlp.resolve_subtiles()
      else:
        subtiles = 1
      return _make_stream_vi_fn(
          config,
          distribution,
          slice_steps,
          int(batch_size),
          data_size,
          float(learning_rate),
          int(sample_size_divergence),
          float(kl_weight),
          mesh,
          precision,
          subtiles=subtiles,
          kernel=kernel,
          member_remix=bool(stream_member_remix),
      )

    def on_chunk(state, losses_c, steps_done):
      # VI history is per-step (no epoch averaging), as in the resident
      # path.
      loss_chunks.append(losses_c)
      if checkpointer is not None:
        from bayesnf_tpu.utils import checkpoint as ckpt_lib

        chunk_surrogate, chunk_opt_state, chunk_keys = state
        checkpointer.save(
            ckpt_lib.TrainState.from_opt_state(
                params=jax.tree_util.tree_map(
                    dist_lib.host_value,
                    tuple(chunk_surrogate[0]) + tuple(chunk_surrogate[1]),
                ),
                opt_state=jax.tree_util.tree_map(
                    dist_lib.host_value, chunk_opt_state
                ),
                keys=dist_lib.host_value(chunk_keys),
                losses=loss_chunks,
                epoch=steps_done,
            )
        )

    (surrogate, opt_state, member_keys), backend = (
        streaming_lib.run_stream_driver(
            stream,
            mesh=mesh,
            multiproc=multiproc,
            backend=backend,
            auto_resolved=auto_resolved,
            make_fn=make_stream_fn,
            probe_key_extra=lambda: pallas_probe_key(0)[1],
            state=(surrogate, opt_state, member_keys),
            start_step=step,
            num_steps=num_steps,
            slice_steps=int(stream_chunk_steps),
            checkpoint_steps=(
                None if checkpointer is None else checkpoint_every
            ),
            on_chunk=on_chunk,
            slice_extra_fn=slice_extra_fn,
        )
    )
    step = num_steps  # the non-streaming loop below is a no-op
  while step < num_steps:
    chunk = (
        num_steps - step
        if checkpointer is None
        else min(checkpoint_every, num_steps - step)
    )
    if auto_resolved and backend == 'pallas':
      # AOT trace-and-compile probe: catch kernel *build* failures while
      # the donated inputs are still intact; execution-time failures past
      # this point propagate unmasked (see inference/map.py).
      probe_key = pallas_probe_key(chunk)
      try:
        fit_fn = make_fit(chunk).lower(
            surrogate, opt_state, member_keys, aug_t, target
        ).compile()
        probe_fn = fit_fn
      except Exception as err:  # pylint: disable=broad-except
        backends.warn_pallas_fallback(err)
        backend = 'xla'
        probe_key = None
        fit_fn = make_fit(chunk)
      auto_resolved = False  # probe once; later chunks fail loudly
    elif backend == 'pallas' and probe_key == pallas_probe_key(chunk):
      fit_fn = probe_fn
    else:
      fit_fn = make_fit(chunk)
    surrogate, opt_state, member_keys, losses = fit_fn(
        surrogate, opt_state, member_keys, aug_t, target
    )
    loss_chunks.append(dist_lib.host_value(losses))
    step += chunk
    # Final chunk checkpointed too: a completed run re-invoked with the
    # same directory resumes at step == num_steps and is a no-op.
    if checkpointer is not None:
      from bayesnf_tpu.utils import checkpoint as ckpt_lib

      # Gather and save are both collectives on a multi-process mesh (see
      # inference/map.py): every process calls save, orbax's primary
      # writes, its internal barriers prevent races.
      checkpointer.save(
          ckpt_lib.TrainState.from_opt_state(
              params=jax.tree_util.tree_map(
                  dist_lib.host_value,
                  tuple(surrogate[0]) + tuple(surrogate[1]),
              ),
              opt_state=jax.tree_util.tree_map(
                  dist_lib.host_value, opt_state
              ),
              keys=dist_lib.host_value(member_keys),
              losses=loss_chunks,
              epoch=step,
          )
      )
  if checkpointer is not None:
    checkpointer.close()

  draw = _make_vi_draw_fn(config, int(sample_size_posterior), mesh)
  draws = draw(surrogate, member_keys)
  losses = jnp.concatenate([jnp.asarray(l) for l in loss_chunks], axis=-1)

  if multiproc:
    # Gather cross-process-sharded results to full host values everywhere.
    surrogate = jax.tree_util.tree_map(dist_lib.host_value, surrogate)
    draws = tuple(dist_lib.host_value(p) for p in draws)

  if padded != ensemble_size:
    surrogate = jax.tree_util.tree_map(lambda p: p[:ensemble_size], surrogate)
    losses = losses[:ensemble_size]
    draws = tuple(p[:ensemble_size] for p in draws)
  return surrogate, losses, draws
