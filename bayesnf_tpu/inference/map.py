"""Ensemble MAP / MLE trainer.

Semantics parity with the reference trainer
(`/root/reference/src/bayesnf/inference.py:376-458,510-623`):

- loss = -(loglik * N/B + prior_weight * prior_log_prob); MLE is
  prior_weight == 0 (reference spatiotemporal.py:551).
- init: noise scale <- log(nanstd(y)/2), weight matrices <-
  TruncatedNormal(0,1,-2,2), everything else <- 0.
- Adam, `lax.scan` over epochs containing `lax.scan` over minibatches;
  per-epoch reshuffle only when batch_size < N; ragged final batch dropped;
  per-epoch loss = mean over steps.
- `num_splits` sequential host loop over ensemble chunks (a memory seam and
  the natural checkpoint boundary), concatenated on the member axis.

TPU-first redesign (not a translation):

- One `jax.jit` over an explicit ('ens', 'data') mesh replaces
  `pmap(vmap(...))`: ensemble members are a leading GSPMD-sharded axis,
  training data is row-sharded over the 'data' axis, and XLA inserts the
  (only) collectives — the loss/grad all-reduce when data_devices > 1.
- Seasonal features are precomputed once and carried alongside the inputs
  (the reference recomputes them inside every step).
- Any ensemble size runs on any device count via member-axis padding
  (fixes reference issue #28).
- The whole `num_epochs x num_batches` optimization is a single fused XLA
  program with no host sync; loss history is carried in the scan.
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
from bayesnf_tpu.parallel import mesh as mesh_lib
from bayesnf_tpu.parallel import minibatch as minibatch_lib


@functools.lru_cache(maxsize=32)
def _make_train_fn(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    num_epochs: int,
    batch_size: int,
    data_size: int,
    learning_rate: float,
    prior_weight: float,
    mesh,
    precision: str = 'f32',
    grad_row_chunk: int = 8192,
    row_pad: int = 0,
):
  """Build the jitted ensemble training program for one static config.

  `precision`: 'f32' (default; on TPU the MXU already computes f32 dots
  with bf16 operands), 'bf16' (explicit bf16 MXU operands, f32
  accumulation and parameters), or 'highest' (multi-pass true-f32 MXU
  arithmetic).

  `grad_row_chunk`: rows per gradient-accumulation chunk. Each SGD step
  computes its gradient by scanning over row chunks and summing — exact
  (the loss is a sum over rows), but the live activation footprint is one
  (width, chunk) buffer instead of (width, batch), which keeps arbitrarily
  large batches (e.g. the sst config's 221k-row full batch x 64 members)
  inside HBM.

  `row_pad`: total padding rows the caller added (balanced layout — see
  `parallel/minibatch.py`) so the row count divides the mesh's data axis
  (N % data_devices != 0). Pad rows are excluded exactly: a zero weight
  removes them from the full-batch loss, and the minibatch permutation
  indexes original rows and maps them through the stored layout, never
  touching padding.
  """
  optimizer = optax.adam(learning_rate)
  num_batches = data_size // batch_size
  compute_dtype = {
      'f32': None, 'bf16': jnp.bfloat16, 'highest': 'highest'
  }[precision]
  d = config.num_inputs
  lik_scale = data_size / batch_size
  full_batch = batch_size == data_size
  step_rows = batch_size + row_pad if full_batch else batch_size
  num_chunks = max(1, -(-step_rows // grad_row_chunk))
  padded_rows = num_chunks * grad_row_chunk

  def chunk_loglik(params, aug_ct, y_c, w_c):
    pred = field_lib.apply_field_t(
        config, params, aug_ct[:d], aug_ct[d:], compute_dtype=compute_dtype
    )
    return -lik_scale * likelihoods.log_likelihood(
        distribution, params, pred, y_c, weights=w_c
    )

  def prior_loss(params):
    if prior_weight == 0.0:
      return jnp.zeros((), jnp.float32)
    return -prior_weight * priors.prior_log_prob(config, params)

  def step_value_and_grad(params, aug_bt, y_b, w_b):
    """Loss and gradient for one SGD batch via chunked accumulation.

    `w_b` is an optional (step_rows,) validity weight vector (None when
    every row is real).
    """
    if num_chunks == 1:
      def whole(params):
        return chunk_loglik(params, aug_bt, y_b, w_b) + prior_loss(params)

      return jax.value_and_grad(whole)(params)

    pad = padded_rows - step_rows
    aug_p = jnp.pad(aug_bt, ((0, 0), (0, pad)))
    y_p = jnp.pad(y_b, (0, pad))
    w_p = jnp.pad(jnp.ones_like(y_b) if w_b is None else w_b, (0, pad))
    aug_c = jnp.moveaxis(
        aug_p.reshape(-1, num_chunks, grad_row_chunk), 1, 0
    )
    y_c = y_p.reshape(num_chunks, grad_row_chunk)
    w_c = w_p.reshape(num_chunks, grad_row_chunk)

    loss0, grads0 = jax.value_and_grad(prior_loss)(params)

    def body(carry, chunk):
      loss_acc, grad_acc = carry
      a, yy, ww = chunk
      l, g = jax.value_and_grad(chunk_loglik)(params, a, yy, ww)
      return (
          loss_acc + l,
          jax.tree_util.tree_map(jnp.add, grad_acc, g),
      ), None

    (loss, grads), _ = jax.lax.scan(
        body, (loss0, grads0), (aug_c, y_c, w_c)
    )
    return loss, grads

  data_shards = mesh.shape[mesh_lib.DATA_AXIS]
  # Original-row -> stored-position map of the balanced layout (identity
  # when there is no padding): the minibatch permutation draws original
  # rows, reference-compatibly, and gathers their stored positions.
  stored_pos = (
      jnp.asarray(minibatch_lib.stored_positions(data_size, data_shards))
      if row_pad
      else None
  )

  def member_train(params, opt_state, key, aug_t, target):
    # Validity weights for the stored rows: zero for the balanced layout's
    # padding (present only on full-batch fits over an uneven data axis).
    row_w = (
        minibatch_lib.valid_row_weights(data_size, data_shards)
        if row_pad and full_batch
        else None
    )

    def one_step(carry, batch):
      params, opt_state = carry
      aug_bt, y_b = batch
      loss, grads = step_value_and_grad(params, aug_bt, y_b, row_w)
      updates, opt_state = optimizer.update(grads, opt_state)
      params = optax.apply_updates(params, updates)
      return (params, opt_state), loss

    def one_epoch(carry, _):
      params, opt_state, key = carry
      key, permute_key = jax.random.split(key)
      if batch_size < data_size:
        perm = jax.random.permutation(permute_key, data_size)
        keep = perm[: num_batches * batch_size]
        if stored_pos is not None:
          keep = stored_pos[keep]
        aug_e = jnp.moveaxis(
            aug_t[:, keep].reshape(-1, num_batches, batch_size), 1, 0
        )  # (num_batches, D + 2F, batch)
        y_e = target[keep].reshape(num_batches, batch_size)
      else:
        aug_e = aug_t[jnp.newaxis]
        y_e = target[jnp.newaxis]
      (params, opt_state), losses = jax.lax.scan(
          one_step, (params, opt_state), (aug_e, y_e)
      )
      return (params, opt_state, key), losses.mean()

    (params, opt_state, key), losses = jax.lax.scan(
        one_epoch, (params, opt_state, key), None, length=num_epochs
    )
    return params, opt_state, key, losses

  train = jax.vmap(member_train, in_axes=(0, 0, 0, None, None))

  ens = mesh_lib.ensemble_sharding(mesh)
  data = mesh_lib.data_sharding(mesh)
  data_t = mesh_lib.data_sharding_t(mesh)  # rows are axis 1 of aug_t
  num_leaves = len(field_lib.param_specs(config))
  params_shard = (ens,) * num_leaves
  opt_shard = backends_lib.adam_state_spec(config, learning_rate, ens)
  return jax.jit(
      train,
      in_shardings=(params_shard, opt_shard, ens, data_t, data),
      out_shardings=(params_shard, opt_shard, ens, ens),
      donate_argnums=(0, 1, 2),
  )


def init_opt_state(config, learning_rate, params):
  """Adam state for a batched (leading member axis) params tuple."""
  return jax.vmap(optax.adam(learning_rate).init)(tuple(params))


@functools.lru_cache(maxsize=32)
def _make_init_fn(
    config: field_lib.FieldConfig, learning_rate: float, padded: int, mesh=None
):
  """ONE jitted program for the whole ensemble init: every key split,
  member params, Adam state, and the per-member training keys.

  Cached at module scope: a jit wrapper created inside `ensemble_map`
  would recompile on EVERY fit (each `jax.jit` object has its own cache),
  which a bench rep measured as a ~2x throughput loss on the remote
  service. `log_noise_init` is a traced argument so one executable serves
  every dataset at a given (config, lr, member-count) — and the whole
  init is one program instead of ~60 primitive-sized eager compiles
  (docs/roadmap.md item 3). The key derivation is the reference scheme
  verbatim (split(seed) -> init keys / optimizer seed, inference.py:
  571-575) — threefry is bit-identical under jit, so folding the splits
  in changes no RNG stream.

  With a (single-process) `mesh`, outputs come back already
  ensemble-sharded — matching the train programs' in_shardings, so the
  first training chunk dispatches without an eager per-leaf reshard
  (which compiled one `_multi_slice` program per distinct leaf shape).
  Multi-process callers pass mesh=None and globalize explicitly.
  `opt_seed` is returned for the host-side streaming pipeline, which
  derives its batch schedule from it.
  """

  def init_all(seed, log_noise_init):
    init_seed, opt_seed = jax.random.split(seed, 2)
    init_keys = jax.random.split(init_seed, padded)
    params = jax.vmap(
        lambda k: field_lib.init_params(
            config, k, log_noise_scale_init=log_noise_init
        )
    )(init_keys)
    member_keys = jax.random.split(opt_seed, padded)
    return (
        params,
        init_opt_state(config, learning_rate, params),
        member_keys,
        opt_seed,
    )

  if mesh is None:
    return jax.jit(init_all)
  ens = mesh_lib.ensemble_sharding(mesh)
  num_leaves = len(field_lib.param_specs(config))
  out_shardings = (
      (ens,) * num_leaves,
      backends_lib.adam_state_spec(config, learning_rate, ens),
      ens,
      mesh_lib.replicated_sharding(mesh),
  )
  return jax.jit(init_all, out_shardings=out_shardings)


def _make_losses_and_grads(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    lik_scale: float,
    prior_weight: float,
    precision: str,
    kernel: str,
    tile: int | None,
    subtiles: int,
    data_shards: int,
):
  """Per-step ensemble (losses, grads) function shared by the shard_map
  factories (`_make_shardmap_train_fn`, `_make_stream_train_fn`).

  Returns a function `(params_b, aug_b, y_b, n_valid=None) -> (losses,
  grads)` where `aug_b` is either a shared (F, B) batch or per-member
  (E, F, B) batches; losses/grads are psum'd over the 'data' axis when it
  is sharded, and the (parameter-only) prior term is added once per member
  after the reduction.
  """
  d = config.num_inputs
  num_w = config.depth + 1
  compute_dtype = {
      'f32': None, 'bf16': jnp.bfloat16, 'highest': 'highest'
  }[precision]

  def xla_losses_and_grads(params_b, aug_b, y_b, n_valid=None):
    """Autodiff twin of `fused_losses_and_grads` (same signature/shapes)."""

    def member_loss(params, aug_bt, y_m):
      pred = field_lib.apply_field_t(
          config, params, aug_bt[:d], aug_bt[d:], compute_dtype=compute_dtype
      )
      w = None
      if n_valid is not None:
        w = (jnp.arange(aug_bt.shape[-1]) < n_valid).astype(jnp.float32)
      return -lik_scale * likelihoods.log_likelihood(
          distribution, params, pred, y_m, weights=w
      )

    in_axes = (0, None, None) if aug_b.ndim == 2 else (0, 0, 0)
    losses, grads = jax.vmap(
        jax.value_and_grad(member_loss), in_axes=in_axes
    )(params_b, aug_b, y_b)
    grads = list(grads)
    if data_shards > 1:
      losses = jax.lax.psum(losses, mesh_lib.DATA_AXIS)
      grads = [jax.lax.psum(g, mesh_lib.DATA_AXIS) for g in grads]
    if prior_weight != 0.0:
      prior_losses, prior_grads = jax.vmap(
          jax.value_and_grad(
              lambda p: -prior_weight * priors.prior_log_prob(config, p)
          )
      )(params_b)
      losses = losses + prior_losses
      grads = [g + pg for g, pg in zip(grads, prior_grads)]
    return losses, tuple(grads)

  def fused_losses_and_grads(params_b, aug_b, y_b, n_valid=None):
    """Losses and grads via the single-pass fused train kernel.

    One Pallas program per step, any observation model: in-kernel encode
    (octave Fourier via the double-angle recurrence, hand-derived backward)
    + forward + likelihood + backward with activations resident in VMEM —
    no second forward, no recompute, no XLA encode/likelihood segments, and
    no per-member (E, F, N) h0/dh0 HBM round-trips. Only the
    (parameter-only) prior term stays in XLA.
    """
    from bayesnf_tpu.ops import fused_mlp

    weights = tuple(
        params_b[field_lib.IDX_FIRST_DENSE + 2 * l] for l in range(num_w)
    )
    biases = tuple(
        params_b[field_lib.IDX_FIRST_DENSE + 2 * l + 1] for l in range(num_w)
    )
    x_b = aug_b[..., :d, :]
    seasonal_b = aug_b[..., d:, :]
    obs_raw = jnp.stack(
        [
            params_b[field_lib.IDX_LOG_NOISE_SCALE],
            params_b[field_lib.IDX_NB_SHAPE_RAW],
            params_b[field_lib.IDX_ZINB_LOGIT],
        ],
        axis=-1,
    )
    losses, dlsa, dfs, dws, dbs, dscales, dlogit, dobs = (
        fused_mlp.fused_train(
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
            params_b[field_lib.IDX_LOG_SCALE_ADJ],
            params_b[field_lib.IDX_FEATURE_SCALES],
            params_b[field_lib.IDX_LAYER_SCALES],
            params_b[field_lib.IDX_ACTIVATION_LOGIT],
            obs_raw,
            y_b,
            precision=precision,
            subtiles=subtiles,
            n_valid=n_valid,
        )
    )
    grads = field_lib.scatter_fused_train_grads(
        config, dlsa, dfs, dws, dbs, dscales, dlogit, dobs
    )
    if data_shards > 1:
      # Each device saw only its row shard; the loss is a sum over rows,
      # so summing losses/grads over 'data' is exact. The prior term is
      # added after the reduction so it counts once per member.
      losses = jax.lax.psum(losses, mesh_lib.DATA_AXIS)
      grads = [jax.lax.psum(g, mesh_lib.DATA_AXIS) for g in grads]
    if prior_weight != 0.0:
      prior_losses, prior_grads = jax.vmap(
          jax.value_and_grad(
              lambda p: -prior_weight * priors.prior_log_prob(config, p)
          )
      )(params_b)
      losses = losses + prior_losses
      grads = [g + pg for g, pg in zip(grads, prior_grads)]
    return losses, tuple(grads)

  return fused_losses_and_grads if kernel == 'pallas' else xla_losses_and_grads


@functools.lru_cache(maxsize=32)
def _make_shardmap_train_fn(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    num_epochs: int,
    batch_size: int,
    data_size: int,
    learning_rate: float,
    prior_weight: float,
    mesh,
    precision: str = 'f32',
    tile: int | None = None,
    subtiles: int = 1,
    kernel: str = 'pallas',
):
  """Ensemble training step under explicit `jax.shard_map` over the mesh.

  `kernel='pallas'` (the TPU-fast path) computes each step's loss/grad for
  the whole local ensemble in one fused Pallas program
  (`ops.fused_mlp.fused_train`; Pallas calls cannot be GSPMD-partitioned,
  hence shard_map). `kernel='xla'` substitutes a vmapped autodiff
  loss/grad with identical structure — it exists so a sharded-data
  minibatch run has an XLA twin using the *same* per-shard RNG scheme,
  making cross-backend agreement exact (up to matmul reassociation).

  A data axis > 1 is supported for BOTH regimes:

  - FULL BATCH (the large-N regime the axis exists for): each device runs
    the kernel on its row shard and per-member losses/gradients `psum`
    over 'data' — exact, since the loss is a sum over rows. Any N works:
    rows are stored in the balanced layout (`parallel/minibatch.py`) and
    each shard masks its padded tail via a dynamic in-kernel valid-row
    count.
  - MINIBATCH SGD: per-shard local permutation — every epoch each member
    reshuffles each shard's own rows and draws `batch_size / data_shards`
    rows per step from that shard (requires divisibility; a documented
    RNG deviation from the single-shard scheme, see
    `parallel/minibatch.py`). Losses/grads still psum over 'data'.
  """
  data_shards = mesh.shape[mesh_lib.DATA_AXIS]
  full_batch = batch_size == data_size
  if data_shards != 1 and not full_batch and batch_size % data_shards:
    raise ValueError(
        f'minibatch training over a sharded data axis requires '
        f'batch_size % data_shards == 0 (got {batch_size=}, '
        f'{data_shards=}): each shard contributes batch_size/data_shards '
        "rows per step. Adjust batch_size or use backend='xla' (global-"
        'permutation fallback).'
    )
  local_rows, _ = minibatch_lib.shard_counts(data_size, data_shards)
  row_pad = local_rows * data_shards - data_size
  local_batch = batch_size // data_shards if data_shards > 1 else batch_size

  optimizer = optax.adam(learning_rate)
  num_batches = data_size // batch_size
  if kernel == 'pallas':
    from bayesnf_tpu.ops import fused_mlp

    if tile is None:
      tile = fused_mlp.pick_tile(config.width, min(local_batch, local_rows))
  elif kernel != 'xla':
    raise ValueError(f'Unknown shard_map kernel: {kernel!r}')

  losses_and_grads = _make_losses_and_grads(
      config,
      distribution,
      lik_scale=data_size / batch_size,
      prior_weight=prior_weight,
      precision=precision,
      kernel=kernel,
      tile=tile,
      subtiles=subtiles,
      data_shards=data_shards,
  )

  def shard_train(params_b, opt_b, keys_b, aug_t, target):
    if row_pad and full_batch:
      # Balanced layout: every shard holds a valid prefix of n_s rows
      # (counts differ by at most 1); the kernel masks the padded tail.
      shard = jax.lax.axis_index(mesh_lib.DATA_AXIS)
      n_valid = minibatch_lib.local_valid_count(data_size, data_shards, shard)
    else:
      # Minibatch rows are gathered from the valid prefix only (below), so
      # every batch row is real and the kernel needs no mask.
      n_valid = None

    def one_step(carry, batch):
      params_b, opt_b = carry
      aug_b, y_b = batch
      losses, grads = losses_and_grads(params_b, aug_b, y_b, n_valid)
      updates, opt_b = jax.vmap(optimizer.update)(grads, opt_b)
      params_b = optax.apply_updates(params_b, updates)
      return (tuple(params_b), opt_b), losses

    def one_epoch(carry, _):
      params_b, opt_b, keys_b = carry
      split = jax.vmap(functools.partial(jax.random.split, num=2))(keys_b)
      keys_b, permute_keys = split[:, 0], split[:, 1]
      if full_batch:
        aug_e = aug_t[jnp.newaxis]
        y_e = target[jnp.newaxis]
      else:
        if data_shards == 1:
          # Single shard: reference-compatible per-member global
          # permutation (ragged tail dropped).
          idx = jax.vmap(
              lambda k: jax.random.permutation(k, data_size)[
                  : num_batches * local_batch
              ]
          )(permute_keys)  # (E, consumed)
        else:
          # Per-shard local permutation of this shard's valid prefix
          # (documented RNG deviation; see parallel/minibatch.py). Both
          # shard_map kernels run exactly this code.
          shard = jax.lax.axis_index(mesh_lib.DATA_AXIS)
          nv = minibatch_lib.local_valid_count(data_size, data_shards, shard)
          idx = jax.vmap(
              lambda k: minibatch_lib.local_permutation(
                  k, shard, local_rows, nv, num_batches * local_batch
              )
          )(permute_keys)  # (E, consumed)
        # Per-member gathered batches, features-major: (nb, E, F, B_local).
        aug_e = jnp.moveaxis(
            aug_t[:, idx].reshape(
                -1, idx.shape[0], num_batches, local_batch
            ),
            2,
            0,
        ).transpose(0, 2, 1, 3)
        y_e = jnp.moveaxis(
            target[idx].reshape(idx.shape[0], num_batches, local_batch), 1, 0
        )
      (params_b, opt_b), losses = jax.lax.scan(
          one_step, (params_b, opt_b), (aug_e, y_e)
      )
      return (params_b, opt_b, keys_b), losses.mean(axis=0)

    (params_b, opt_b, keys_b), losses = jax.lax.scan(
        one_epoch, (params_b, opt_b, keys_b), None, length=num_epochs
    )
    # losses: (num_epochs, E_local) -> (E_local, num_epochs)
    return params_b, opt_b, keys_b, losses.T

  num_leaves = len(field_lib.param_specs(config))
  p_ens = jax.sharding.PartitionSpec(mesh_lib.ENSEMBLE_AXIS)
  # Rows shard over 'data' (replication when the axis is 1).
  p_rows_t = jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS)
  p_rows = jax.sharding.PartitionSpec(mesh_lib.DATA_AXIS)
  params_spec = (p_ens,) * num_leaves
  opt_spec = backends_lib.adam_state_spec(config, learning_rate, p_ens)
  sharded = jax.shard_map(
      shard_train,
      mesh=mesh,
      in_specs=(params_spec, opt_spec, p_ens, p_rows_t, p_rows),
      out_specs=(params_spec, opt_spec, p_ens, p_ens),
      # Pallas out_shapes carry no varying-mesh-axes metadata; skip the check.
      check_vma=False,
  )
  return jax.jit(sharded, donate_argnums=(0, 1, 2))


@functools.lru_cache(maxsize=32)
def _make_stream_train_fn(
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    slice_steps: int,
    batch_size: int,
    data_size: int,
    learning_rate: float,
    prior_weight: float,
    mesh,
    precision: str = 'f32',
    tile: int | None = None,
    subtiles: int = 1,
    kernel: str = 'pallas',
    member_remix: bool = False,
):
  """One slice of the host-streaming training loop as a jitted program.

  The program advances every ensemble member by `slice_steps` SGD steps on
  host-assembled batches: inputs are (S, F, B) batches shared across
  members (see `parallel/streaming.py` for the RNG scheme) with the batch
  dimension sharded over the mesh's 'data' axis; params/optimizer state
  shard over 'ens' and are donated, so steady-state HBM holds the model
  state plus the slice buffers in flight — never the dataset.

  `member_remix` decorrelates the members' SGD noise at ZERO extra
  host->device traffic: the program takes one extra raw-key argument and
  each member repartitions the slice's S x B transferred rows into its
  OWN S batches (a per-member device-side permutation of the resident
  pool). Every member still consumes every transferred row exactly once
  per slice — only batch composition differs — restoring the reference's
  per-member gradient-noise independence (inference.py:593-597) at the
  remix-window (= slice) granularity. With remix the slice size is
  SEMANTIC (it is the remix window), so the slice-size bit-invariance of
  the default scheme deliberately does not hold; measured ensemble
  statistics in PARITY.md.
  """
  data_shards = mesh.shape[mesh_lib.DATA_AXIS]
  if batch_size % data_shards:
    raise ValueError(
        f'streaming training over a sharded data axis requires '
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
  losses_and_grads = _make_losses_and_grads(
      config,
      distribution,
      lik_scale=data_size / batch_size,
      prior_weight=prior_weight,
      precision=precision,
      kernel=kernel,
      tile=tile,
      subtiles=subtiles,
      data_shards=data_shards,
  )

  def shard_train_slice(params_b, opt_b, aug_s, y_s, *maybe_key):
    # aug_s: (S, F, local_batch), y_s: (S, local_batch) — every batch row
    # is a real row (the host stream never pads), so no validity mask.
    def one_step(carry, batch):
      params_b, opt_b = carry
      aug_b, y_b = batch
      losses, grads = losses_and_grads(params_b, aug_b, y_b, None)
      updates, opt_b = jax.vmap(optimizer.update)(grads, opt_b)
      params_b = optax.apply_updates(params_b, updates)
      return (tuple(params_b), opt_b), losses

    if member_remix:
      # Per-member repartition of the slice pool (plan shared with the VI
      # trainer — `parallel/streaming.member_remix_plan` documents the
      # scheme and its RNG contract).
      from bayesnf_tpu.parallel import streaming as streaming_lib

      pool_aug, pool_y, idx_s = streaming_lib.member_remix_plan(
          maybe_key[0], aug_s, y_s, params_b[0].shape[0]
      )

      def remix_step(carry, idx_b):
        aug_b = jnp.moveaxis(pool_aug[:, idx_b], 0, 1)  # (E, F, B)
        return one_step(carry, (aug_b, pool_y[idx_b]))

      (params_b, opt_b), losses = jax.lax.scan(
          remix_step, (params_b, opt_b), idx_s
      )
    else:
      (params_b, opt_b), losses = jax.lax.scan(
          one_step, (params_b, opt_b), (aug_s, y_s)
      )
    # losses: (S, E_local) -> (E_local, S)
    return params_b, opt_b, losses.T

  num_leaves = len(field_lib.param_specs(config))
  p_ens = jax.sharding.PartitionSpec(mesh_lib.ENSEMBLE_AXIS)
  p_slice_t = jax.sharding.PartitionSpec(None, None, mesh_lib.DATA_AXIS)
  p_slice = jax.sharding.PartitionSpec(None, mesh_lib.DATA_AXIS)
  p_rep = jax.sharding.PartitionSpec()
  params_spec = (p_ens,) * num_leaves
  opt_spec = backends_lib.adam_state_spec(config, learning_rate, p_ens)
  in_specs = (params_spec, opt_spec, p_slice_t, p_slice)
  if member_remix:
    in_specs = in_specs + (p_rep,)
  sharded = jax.shard_map(
      shard_train_slice,
      mesh=mesh,
      in_specs=in_specs,
      out_specs=(params_spec, opt_spec, p_ens),
      # Pallas out_shapes carry no varying-mesh-axes metadata; skip the check.
      check_vma=False,
  )
  return jax.jit(sharded, donate_argnums=(0, 1))


def ensemble_map(
    aug_features: jax.Array,
    target: jax.Array,
    config: field_lib.FieldConfig,
    distribution: likelihoods.LikelihoodDist,
    ensemble_size: int,
    learning_rate: float,
    num_epochs: int,
    seed: jax.Array,
    batch_size: int | None = None,
    prior_weight: float = 1.0,
    mesh=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int | None = None,
    precision: str = 'f32',
    backend: str = 'auto',
    stream_chunk_steps: int | None = None,
    stream_member_remix: bool = False,
) -> tuple[tuple, jax.Array]:
  """Train `ensemble_size` independent MAP/MLE members on one mesh.

  Args:
    aug_features: (N, D + 2F) training inputs with precomputed seasonal
      features appended (see `field_lib.seasonal_features_for`).
    target: (N,) training targets.
    config: static model config.
    distribution: observation model.
    ensemble_size: total number of members to train (any positive int).
    learning_rate: Adam learning rate.
    num_epochs: epochs (scan length).
    seed: PRNG key.
    batch_size: minibatch rows; None means full batch.
    prior_weight: prior multiplier in the loss (0 == MLE).
    mesh: ('ens', 'data') mesh; defaults to all devices on 'ens'.
    checkpoint_dir: when set, training runs in `checkpoint_every`-epoch
      chunks and persists (params, opt state, RNG keys, losses, epoch)
      after each chunk; an existing checkpoint in the directory resumes
      the run bit-exactly.
    checkpoint_every: epochs per checkpoint chunk (default: 10% of
      num_epochs, at least 1).
    precision: 'f32' (default; on TPU the MXU already computes f32 dots
      with bf16 operands), 'bf16' (explicit bf16 MXU operands, f32
      parameters and accumulation), or 'highest' (multi-pass true-f32
      MXU arithmetic, ~2-3x slower matmuls).
    backend: 'xla', 'pallas' (fused Pallas MLP kernels via shard_map; a
      sharded data axis is supported both full-batch — losses/grads psum
      over 'data' — and minibatch, where each shard contributes
      batch_size/data_shards rows per step via a per-shard local
      permutation shared with the XLA shard_map twin; requires
      batch_size % data_shards == 0), or 'auto' (pallas on TPU when the
      mesh/batch allow it, with loud fallback to xla on kernel build
      failure; xla otherwise).
    stream_chunk_steps: when set (minibatch fits only), the dataset stays
      in HOST memory — pass `aug_features` as a numpy array or memmap —
      and batches are assembled on host and shipped in slices of this
      many SGD steps, double-buffered against device compute. Device HBM
      then holds O(slices in flight x batch rows) instead of O(N): the
      regime for datasets larger than (aggregate) HBM. Uses one shared
      per-epoch permutation across members, deterministic in (seed,
      epoch) — a documented RNG deviation; see `parallel/streaming.py`.
    stream_member_remix: (streaming only) each member repartitions every
      transferred slice's rows into its OWN batches on device —
      per-member SGD-noise decorrelation (the property the shared stream
      gives up; measured in PARITY.md) at zero extra host->device
      traffic. Makes `stream_chunk_steps` semantic (it is the remix
      window): slice-size bit-invariance does not hold, and checkpoint
      chunks must align to whole slices (validated).

  Returns:
    (params, losses): params is the flat tuple with leading member axis
    (ensemble_size, ...); losses has shape (ensemble_size, num_epochs).
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
          'stream_chunk_steps requires minibatch training (batch_size < '
          'len(table)): a full-batch fit re-reads the whole dataset every '
          'step, which defeats streaming — set batch_size or drop the flag.'
      )
    if batch_size % data_shards:
      raise ValueError(
          f'streaming training over a sharded data axis requires '
          f'batch_size % data_shards == 0 (got {batch_size=}, '
          f'{data_shards=}): each slice batch splits evenly over shards.'
      )
  elif stream_member_remix:
    raise ValueError(
        'stream_member_remix applies to host-streaming fits only '
        '(set stream_chunk_steps); on-device minibatch training already '
        'permutes per member.'
    )
  auto_resolved = backend == 'auto'
  backend = backends.resolve_backend(
      backend,
      mesh,
      full_batch=batch_size == data_size,
      batch_divisible=batch_size % data_shards == 0,
  )
  multiproc = dist_lib.is_multiprocess_mesh(mesh)

  padded = mesh_lib.pad_ensemble_size(ensemble_size, mesh)

  target_scale = np.nanstd(np.asarray(target))
  log_noise_init = np.log(target_scale / 2.0)

  params, opt_state, member_keys, opt_seed = _make_init_fn(
      config, float(learning_rate), padded, None if multiproc else mesh
  )(seed, np.float32(log_noise_init))

  if streaming:
    # The dataset stays HOST-resident (numpy or memmap; np.asarray and .T
    # are no-copy views for a float32 numpy input — a row gather on the
    # transposed view reads contiguous source rows): no device transfer
    # here, and no padded-row layout — streamed batches are always full.
    aug_host_t = np.asarray(aug_features, dtype=np.float32).T
    target_host = np.asarray(target, dtype=np.float32)
    aug_t = target = None
    row_pad = 0
  else:
    # Features-major device layout (rows on the TPU lane dimension), with
    # the balanced stored-row layout when the data axis is uneven
    # (N % data_devices != 0) — each shard holds a valid prefix, counts
    # differing by at most 1 (parallel/minibatch.py). Both backends
    # exclude the padding exactly (zero weights on the GSPMD path, an
    # in-kernel valid-row mask under shard_map), and minibatch
    # permutations never index it. One jitted, row-sharded program
    # (docs/roadmap.md item 3 — was an eager transpose + convert + pads).
    row_pad = (-data_size) % data_shards
    aug_t, target = minibatch_lib.make_layout_fn(
        data_size, data_shards, None if multiproc else mesh
    )(aug_features, target)

  num_epochs = int(num_epochs)
  start_epoch = 0
  loss_chunks = []

  checkpointer = None
  if checkpoint_dir is not None:
    from bayesnf_tpu.utils import checkpoint as ckpt_lib

    fp_kwargs = dict(
        kind='map',
        config=config,
        distribution=distribution.value,
        ensemble_size=ensemble_size,
        learning_rate=float(learning_rate),
        # num_epochs intentionally excluded: extending a completed or
        # interrupted run with a larger budget is a supported resume.
        batch_size=int(batch_size),
        data_size=data_size,
        prior_weight=float(prior_weight),
        precision=precision,
        # The RESOLVED backend: 'auto' picks per-platform, and the two
        # backends differ numerically up to matmul reassociation, so a
        # resume must refuse to continue xla-written chunks on pallas
        # (or vice versa) rather than silently mixing numerics.
        backend=backend,
        # The data-axis extent fixes the row layout, the psum
        # reduction grouping, AND the sharded-minibatch RNG scheme —
        # a resume on a different extent would silently change all
        # three.
        data_shards=data_shards,
        # Streaming uses a different (shared host-side) permutation
        # scheme than on-device training — resuming one under the
        # other would silently change every subsequent batch.
        stream=streaming,
    )
    # With member remix the slice size is the remix WINDOW — a semantic
    # quantity a resume must not change (the shared scheme's slice size
    # is pure transfer granularity and stays out of the fingerprint).
    # The keys appear ONLY when remix is on: feature keys must not churn
    # the fingerprints of runs that never used the feature (a version
    # upgrade would refuse every pre-existing checkpoint directory for
    # no reason), and their absence still distinguishes remix from
    # non-remix. One interim release always wrote the keys — its
    # non-remix digests are accepted as legacy so those directories keep
    # resuming.
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
      # Restored host leaves go straight onto the train program's layout
      # (multi-process placement happens below via make_global instead).
      place = jnp.asarray
      if not multiproc:
        ens_restore = mesh_lib.ensemble_sharding(mesh)
        place = lambda x: jax.device_put(np.asarray(x), ens_restore)
      params = tuple(place(p) for p in restored.params)
      opt_state = restored.opt_state(template=opt_state, place=place)
      member_keys = place(restored.keys)
      loss_chunks = [np.asarray(l) for l in restored.losses]
      start_epoch = restored.epoch
    if checkpoint_every is None:
      checkpoint_every = max(1, num_epochs // 10)

  if multiproc:
    # Multi-process SPMD: every process computes the same full host values
    # (same script, same seed — and the same restored checkpoint) and
    # contributes its local shards; a plain jit call cannot auto-shard
    # process-local arrays onto a global mesh.
    ens = mesh_lib.ensemble_sharding(mesh)
    params = tuple(dist_lib.make_global(p, ens) for p in params)
    opt_state = jax.tree_util.tree_map(
        lambda x: dist_lib.make_global(x, ens), opt_state
    )
    member_keys = dist_lib.make_global(member_keys, ens)
    if not streaming:  # streamed slices are globalized per transfer instead
      aug_t = dist_lib.make_global(aug_t, mesh_lib.data_sharding_t(mesh))
      target = dist_lib.make_global(target, mesh_lib.data_sharding(mesh))

  def make_train(chunk_epochs):
    if backend not in ('pallas', 'xla'):
      raise ValueError(f'Unknown backend: {backend!r}')
    # Sharded-data minibatch with a shard-divisible batch runs the
    # shard_map program even on the XLA backend: both backends then share
    # the per-shard permutation scheme (parallel/minibatch.py), so they
    # agree batch-for-batch and rows never leave their shard. A
    # non-divisible batch keeps the GSPMD path (global permutation,
    # reference RNG). Recomputed here because `backend` can flip to 'xla'
    # on a pallas probe fallback.
    use_shardmap = backend == 'pallas' or (
        data_shards > 1
        and batch_size < data_size
        and batch_size % data_shards == 0
    )
    if use_shardmap:
      if backend == 'pallas':
        from bayesnf_tpu.ops import fused_mlp

        # Resolve the env var HERE so it participates in the factory's
        # lru_cache key (a changed knob must not reuse a stale program).
        subtiles = fused_mlp.resolve_subtiles()
      else:
        subtiles = 1
      return _make_shardmap_train_fn(
          config,
          distribution,
          chunk_epochs,
          int(batch_size),
          data_size,
          float(learning_rate),
          float(prior_weight),
          mesh,
          precision,
          subtiles=subtiles,
          kernel=backend,
      )
    return _make_train_fn(
        config,
        distribution,
        chunk_epochs,
        int(batch_size),
        data_size,
        float(learning_rate),
        float(prior_weight),
        mesh,
        precision,
        row_pad=row_pad,
    )

  epoch = start_epoch
  # The probe's AOT program (jit dispatch never sees .lower().compile()
  # results, so later chunks must reuse it or pay a second compile). Only
  # one program is ever held: the probe runs once, and reuse requires the
  # SAME chunk size and the SAME resolved subtile knob it was traced under
  # (the resolve_subtiles contract — an env var changed mid-run must be a
  # cache miss, not a silent reuse of the old tiling).
  probe_fn = None
  probe_key = None

  def pallas_probe_key(chunk_epochs):
    from bayesnf_tpu.ops import fused_mlp

    return (chunk_epochs, fused_mlp.resolve_subtiles())

  if streaming:
    from bayesnf_tpu.parallel import streaming as streaming_lib

    num_batches = data_size // batch_size
    stream = streaming_lib.HostBatchStream(
        aug_host_t, target_host, int(batch_size), opt_seed
    )
    if stream_member_remix:
      streaming_lib.validate_remix_alignment(
          int(stream_chunk_steps),
          epoch * num_batches,
          None if checkpointer is None else checkpoint_every * num_batches,
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
      return _make_stream_train_fn(
          config,
          distribution,
          slice_steps,
          int(batch_size),
          data_size,
          float(learning_rate),
          float(prior_weight),
          mesh,
          precision,
          subtiles=subtiles,
          kernel=kernel,
          member_remix=bool(stream_member_remix),
      )

    def on_chunk(state, losses_c, steps_done):
      # Per-epoch loss = mean over the epoch's steps (the losses_
      # contract); chunks are whole epochs by construction.
      chunk_epochs = losses_c.shape[-1] // num_batches
      loss_chunks.append(
          losses_c.reshape(
              losses_c.shape[0], chunk_epochs, num_batches
          ).mean(axis=-1)
      )
      if checkpointer is not None:
        from bayesnf_tpu.utils import checkpoint as ckpt_lib

        chunk_params, chunk_opt_state = state
        checkpointer.save(
            ckpt_lib.TrainState.from_opt_state(
                params=jax.tree_util.tree_map(
                    dist_lib.host_value, tuple(chunk_params)
                ),
                opt_state=jax.tree_util.tree_map(
                    dist_lib.host_value, chunk_opt_state
                ),
                keys=dist_lib.host_value(member_keys),
                losses=loss_chunks,
                epoch=steps_done // num_batches,
            )
        )

    (params, opt_state), backend = streaming_lib.run_stream_driver(
        stream,
        mesh=mesh,
        multiproc=multiproc,
        backend=backend,
        auto_resolved=auto_resolved,
        make_fn=make_stream_fn,
        probe_key_extra=lambda: pallas_probe_key(0)[1],
        state=(tuple(params), opt_state),
        start_step=epoch * num_batches,
        num_steps=num_epochs * num_batches,
        slice_steps=int(stream_chunk_steps),
        checkpoint_steps=(
            None if checkpointer is None else checkpoint_every * num_batches
        ),
        on_chunk=on_chunk,
        slice_extra_fn=slice_extra_fn,
    )
    epoch = num_epochs  # the non-streaming loop below is a no-op

  while epoch < num_epochs:
    chunk = (
        num_epochs - epoch
        if checkpointer is None
        else min(checkpoint_every, num_epochs - epoch)
    )
    if auto_resolved and backend == 'pallas':
      # Auto-selected pallas may fail to *build* on an exotic config.
      # Probe by tracing + compiling ahead-of-time — donated buffers are
      # untouched until the compiled program executes, so the xla retry
      # sees intact inputs; an *execution*-time failure past this point
      # propagates unmasked (the donated inputs may already be consumed,
      # and masking e.g. a runtime OOM behind an 'Array has been deleted'
      # retry error would hide the actionable failure).
      probe_key = pallas_probe_key(chunk)
      try:
        train_fn = make_train(chunk).lower(
            tuple(params), opt_state, member_keys, aug_t, target
        ).compile()
        probe_fn = train_fn
      except Exception as err:  # pylint: disable=broad-except
        backends.warn_pallas_fallback(err)
        backend = 'xla'
        probe_key = None
        train_fn = make_train(chunk)
      auto_resolved = False  # probe once; later chunks fail loudly
    elif backend == 'pallas' and probe_key == pallas_probe_key(chunk):
      train_fn = probe_fn
    else:
      train_fn = make_train(chunk)
    params, opt_state, member_keys, losses = train_fn(
        tuple(params), opt_state, member_keys, aug_t, target
    )
    loss_chunks.append(dist_lib.host_value(losses))
    epoch += chunk
    # The final chunk is checkpointed too: re-invoking a completed run with
    # the same directory resumes at epoch == num_epochs and is a no-op.
    if checkpointer is not None:
      from bayesnf_tpu.utils import checkpoint as ckpt_lib

      # On a multi-process mesh both the gather and the orbax save are
      # collectives: every process calls save with the same (host) state,
      # orbax's primary process writes and its internal barriers keep the
      # rest from racing ahead of an in-flight checkpoint.
      checkpointer.save(
          ckpt_lib.TrainState.from_opt_state(
              params=jax.tree_util.tree_map(
                  dist_lib.host_value, tuple(params)
              ),
              opt_state=jax.tree_util.tree_map(
                  dist_lib.host_value, opt_state
              ),
              keys=dist_lib.host_value(member_keys),
              losses=loss_chunks,
              epoch=epoch,
          )
      )
  if checkpointer is not None:
    checkpointer.close()

  if multiproc:
    # Gather the cross-process-sharded ensemble so every process returns
    # the full (host numpy) result — the reference's contract of fully
    # addressable params_/losses_ on every host.
    params = tuple(dist_lib.host_value(p) for p in params)
  losses = jnp.concatenate([jnp.asarray(l) for l in loss_chunks], axis=-1)
  if padded != ensemble_size:
    params = tuple(p[:ensemble_size] for p in params)
    losses = losses[:ensemble_size]
  return params, losses


def fit_map(
    aug_features,
    target,
    seed: jax.Array,
    observation_model: str,
    config: field_lib.FieldConfig,
    num_particles: int,
    learning_rate: float,
    num_epochs: int,
    prior_weight: float = 1.0,
    batch_size: int | None = None,
    num_splits: int = 1,
    mesh=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int | None = None,
    precision: str = 'f32',
    backend: str = 'auto',
    stream_chunk_steps: int | None = None,
    stream_member_remix: bool = False,
) -> tuple[tuple, np.ndarray]:
  """Fit a MAP/MLE ensemble, optionally in sequential memory-bounded splits.

  When `checkpoint_dir` is given, each split checkpoints into its own
  subdirectory and an interrupted fit resumes where it stopped.

  Returns:
    (params, losses) as host numpy, with the flat member axis leading:
    params leaves (num_particles, ...), losses (num_particles, num_epochs).
  """
  distribution = likelihoods.LikelihoodDist(observation_model)
  if num_particles % num_splits != 0:
    raise ValueError(
        f'{num_particles=} must be divisible by {num_splits=}.'
    )
  per_split = num_particles // num_splits

  params_splits, losses_splits = [], []
  for i in range(num_splits):
    # Seed handling mirrors the reference (inference.py:432-438): unchanged
    # when num_splits == 1, folded otherwise.
    seed_i = jax.random.fold_in(seed, i) if num_splits > 1 else seed
    params_i, losses_i = ensemble_map(
        aug_features,
        target,
        config,
        distribution,
        ensemble_size=per_split,
        learning_rate=learning_rate,
        num_epochs=num_epochs,
        seed=seed_i,
        batch_size=batch_size,
        prior_weight=prior_weight,
        mesh=mesh,
        checkpoint_dir=(
            None if checkpoint_dir is None else f'{checkpoint_dir}/split_{i}'
        ),
        checkpoint_every=checkpoint_every,
        precision=precision,
        backend=backend,
        stream_chunk_steps=stream_chunk_steps,
        stream_member_remix=stream_member_remix,
    )
    params_splits.append(jax.tree_util.tree_map(np.array, params_i))
    losses_splits.append(np.array(losses_i))

  params = jax.tree_util.tree_map(
      lambda *ts: np.concatenate(ts, axis=0), *params_splits
  )
  losses = np.concatenate(losses_splits, axis=0)
  return params, losses
