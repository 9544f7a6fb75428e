"""Out-of-core (host-streamed) prediction.

The in-memory predictor (`inference/predict.py`) ships the whole feature
grid to the device and keeps O(members x N) forecast parameters in HBM —
the right call whenever it fits. This module is the predict-side twin of
the host-streaming trainers (`parallel/streaming.py`): the grid stays in
host RAM (or a memmap), row chunks stream through the device one at a
time, and results assemble into host numpy buffers — so a model that can
only be *trained* by streaming can also *predict* on a grid of the same
scale. The reference bounds predict memory with a host chunk loop for the
same reason (`/root/reference/src/bayesnf/inference.py:129-200`); here the
semantics are redesigned to keep the exact-quantile contract:

- **Two passes.** The exact mixture quantiles root-find on a GLOBAL
  bracket (`[min mu - 5 max sigma, max mu + 5 max sigma]`, and the
  Chebyshev bound for counts) whose extrema span all rows. Pass 1 runs the
  forward per chunk, assembles per-row forecast parameters into host
  buffers, and folds each chunk's masked extrema into running statistics
  (min/max are exact, so chunked running extrema equal the whole-array
  reductions). Pass 2 root-finds each chunk with the global bracket.
  Because the Chandrupatla iteration is elementwise per row once the
  bracket is fixed, the streamed output is **bit-identical** to the
  in-memory path (tested). One exception: `approximate_quantiles=True`
  (the moment-matching heuristic, NORMAL only) is ulp-close rather than
  bitwise — its mean/sqrt chain fuses differently in the streamed
  program (means stay bitwise either way).
- **Device-resident chunk cache.** Pass 1 keeps each chunk's pass-2
  parameter leaves alive on the device, chunk by chunk, until a byte
  budget (`stream_cache_bytes`) is reached; pass 2 consumes cached chunks
  with ZERO host->device traffic (and, for count models, cached chunks
  skip the device->host fetch of leaves the public output never needs).
  Only chunks past the budget spill to host buffers and re-upload —
  with a one-chunk lookahead so the (async) upload overlaps the previous
  chunk's root-find. On grids whose pass-2 leaves fit the budget the
  streamed path therefore transfers exactly what the in-memory path
  does: the grid up, the public outputs down.
- **Device memory is O(chunk) + the explicit cache budget, not O(N).**
  Each pass holds one in-flight chunk plus one being assembled (async
  dispatch gives the double buffering, exactly as in
  `parallel/streaming.py`); `stream_cache_bytes=0` restores the strict
  O(chunk) envelope.
- **One compiled program per pass.** Every chunk is host-padded to a fixed
  `stream_chunk_rows` shape (the pad tail is masked out of the statistics
  and sliced off the outputs), so the whole streamed predict costs two
  compilations regardless of grid size.
- Mesh placement and the fused Pallas forward ride the same
  `_forecast_params_chunked` program as the in-memory path, so streamed
  prediction is also row-parallel over a mesh (multi-process meshes
  globalize each chunk and gather each result, as in the trainers).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from bayesnf_tpu.inference import predict as predict_lib
from bayesnf_tpu.inference import quantiles as quantiles_lib
from bayesnf_tpu.models import distributions as dist_lib
from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.models import likelihoods
from bayesnf_tpu.parallel import distributed as distributed_lib
from bayesnf_tpu.parallel import mesh as mesh_lib


def _resolve_rows(stream_chunk_rows: int, chunk_size: int, n: int) -> int:
  """Host chunk rows: a positive multiple of the device chunk size.

  Aligning the host chunk to the device chunk keeps the device-side
  `lax.map` chunk boundaries of pass 1 identical to the in-memory
  program's (the forward is row-independent either way; alignment just
  avoids wasted pad compute).
  """
  if n < 1:
    raise ValueError(
        'streamed prediction needs at least one row (got an empty table).'
    )
  rows = max(int(stream_chunk_rows), 1)
  rows = -(-rows // chunk_size) * chunk_size
  return min(rows, -(-n // chunk_size) * chunk_size)


@functools.lru_cache(maxsize=32)
def _make_stream_forward_fn(
    config, distribution, chunk_size, mesh, backend, rows, with_count_means
):
  """Pass-1 program: encode + forecast params + masked bracket extrema.

  Takes (params_flat, x_chunk (rows, D), valid scalar, stats_in); rows
  past `valid` are host zero-padding, masked out of the statistics.
  Returns (per-row leaves (K, rows) / scalar leaves (K,), stats tuple).
  The running bracket extrema thread THROUGH the program: `stats_in` is
  the previous chunk's output (seeded with the fold identities), folded
  in-program — so the global statistics accumulate entirely on the device
  with zero per-chunk host round-trips (at ~27 ms per round-trip on a
  remote-tunneled transport the old per-chunk scalar fetches dominated
  the streamed wall). Chunked min/max folds are exact, so the final
  stats still equal the in-memory whole-array reductions bit-for-bit.

  For count models, `with_count_means` appends the observation means as
  an extra leaf; when False they are still computed for the bracket
  statistics but never leave the device (no per-chunk transfer for a
  leaf the caller would drop).
  """

  def fwd(params_flat, x_chunk, valid, stats_in):
    aug = field_lib.aug_features(config, x_chunk)
    fp = predict_lib._forecast_params_chunked(  # pylint: disable=protected-access
        config, distribution, params_flat, aug, chunk_size=chunk_size,
        mesh=mesh, backend=backend,
    )
    mask = jnp.arange(rows) < valid
    if distribution == likelihoods.LikelihoodDist.NORMAL:
      means, scale = fp
      stats = (
          jnp.minimum(stats_in[0], jnp.amin(jnp.where(mask, means, jnp.inf))),
          jnp.maximum(
              stats_in[1], jnp.amax(jnp.where(mask, means, -jnp.inf))
          ),
      )
      return fp, stats
    total_count, logits, *maybe_pi = fp
    obs_d = dist_lib.count_obs_dist(total_count, logits, *maybe_pi)
    obs_mean = obs_d.mean()
    stats = (
        jnp.maximum(
            stats_in[0], jnp.amax(jnp.where(mask, obs_mean, -jnp.inf))
        ),
        jnp.maximum(
            stats_in[1], jnp.amax(jnp.where(mask, obs_d.stddev(), -jnp.inf))
        ),
    )
    return (fp + (obs_mean,) if with_count_means else fp), stats

  return jax.jit(fwd)


def _stats_seed(distribution):
  """Fold identities for the running bracket extrema."""
  if distribution == likelihoods.LikelihoodDist.NORMAL:
    return (np.float32(np.inf), np.float32(-np.inf))  # (min mean, max mean)
  return (np.float32(-np.inf), np.float32(-np.inf))  # (max mean, max std)


@functools.lru_cache(maxsize=32)
def _make_stream_quantile_fn(
    distribution, quantiles, ens_shape, approximate
):
  """Pass-2 program: per-chunk mixture-quantile root-finds, global bracket.

  Takes the chunk's per-row parameter slices in the flat (K, rows) compute
  layout (the public ensemble axes are restored in-program — no host-side
  reshape copies) plus the pass-1 global statistics; computes the bracket
  from them with the same float ops as the in-memory engine, so the
  per-lane root trajectories are bit-identical. The flat layout is also
  what pass 1's forward emits, so device-cached chunks feed this program
  directly, with no host round-trip at all. All quantiles come back as
  ONE stacked (num_quantiles, rows) array — one fetch per chunk instead
  of one per quantile (round-trip latency, not bandwidth, dominates the
  tiny per-quantile results).
  """
  axis = tuple(range(len(ens_shape)))

  def expand(leaf):
    return leaf.reshape(ens_shape + leaf.shape[1:])

  if distribution == likelihoods.LikelihoodDist.NORMAL:

    def quant(means, scale, min_mean, max_mean):
      means = expand(means)
      scales = expand(scale)[..., jnp.newaxis]
      if approximate:
        return jnp.stack([
            quantiles_lib.normal_mixture_quantile_approx(
                means, scales, q, axis
            )
            for q in quantiles
        ])
      max_scale = jnp.amax(scales)
      return jnp.stack([
          quantiles_lib.normal_mixture_quantile_root(
              means, scales, q, axis, stats=(min_mean, max_mean, max_scale)
          )
          for q in quantiles
      ])

    return jax.jit(quant)

  def quant_count(total_count, logits, maybe_pi, max_mean, max_std):
    obs_d = dist_lib.count_obs_dist(
        expand(total_count), expand(logits), *map(expand, maybe_pi)
    )
    return jnp.stack([
        quantiles_lib.count_mixture_quantile_root(
            obs_d, q, ensemble_axes=axis, stats=(max_mean, max_std)
        )
        for q in quantiles
    ])

  return jax.jit(quant_count)


def _chunk_ranges(n, rows):
  for lo in range(0, n, rows):
    yield lo, min(lo + rows, n)


class _ChunkIO:
  """Shared host<->device plumbing for both streaming passes.

  Uploads are replicated over the mesh (globalized on multi-process
  meshes); `fetch` gathers full host values on every process. `drain`
  implements the depth-1 pipeline: the caller dispatches chunk k+1 before
  fetching chunk k, so host assembly and transfer overlap device compute
  (async dispatch — the same double buffering as `parallel/streaming.py`).
  """

  def __init__(self, mesh, multiproc):
    self.mesh = mesh
    self.multiproc = multiproc
    self._sharding = (
        mesh_lib.replicated_sharding(mesh) if mesh is not None else None
    )
    self._pending = None

  def put(self, x):
    if isinstance(x, jax.Array):
      # Already device-resident (a threaded stat, a kept scalar leaf, a
      # cached chunk): pass through — it was produced under this same
      # mesh context, so placement is already right.
      return x
    if self.multiproc:
      return distributed_lib.make_global(x, self._sharding)
    if self._sharding is not None:
      return jax.device_put(x, self._sharding)
    return jnp.asarray(x)

  def fetch(self, x):
    if self.multiproc:
      return distributed_lib.host_value(x)
    return np.asarray(x)

  def dispatch(self, bounds, out, store):
    prev, self._pending = self._pending, (bounds, out, store)
    if prev is not None:
      prev[2](prev[0], prev[1])

  def drain(self):
    if self._pending is not None:
      bounds, out, store = self._pending
      self._pending = None
      store(bounds, out)


def _stream_forecast_params(
    features, distribution, params_flat, config, chunk_size, mesh, backend,
    multiproc, rows, with_count_means, host_leaf_ids=None,
    cache_leaf_ids=(), cache_bytes=0,
):
  """Pass 1: host-chunked forward; returns leaves + DEVICE stats + cache.

  Per-row leaves come back as (K, N) float32 numpy host buffers where the
  caller asked for them (`host_leaf_ids`) or a chunk spilled — and None
  for cache-only leaves that never spilled; scalar (per-member constant)
  leaves come back as (K,) DEVICE arrays (kept from the first chunk —
  fetch only if you need host values); stats are device f32 scalars
  (exact running extrema — pass 2 feeds them straight back without a
  host round-trip). For count models with `with_count_means`, the
  observation means (the public predict output) are assembled as an
  extra trailing buffer.

  `cache_leaf_ids` names the per-row leaf indices pass 2 will consume and
  `host_leaf_ids` (None = all per-row leaves) the leaves the caller needs
  as host buffers. The union of the two is *retained*: the leading
  chunks' device arrays for retained leaves stay alive — up to
  `cache_bytes` total — and come back in the `cache` dict
  (chunk_index -> {leaf_id: (K, rows) device array}). A cached chunk
  makes NO device->host transfer at all: cache-only leaves never leave
  the device, and host-needed leaves assemble AFTER the loop in one
  batched concat + fetch per leaf (one round-trip instead of one per
  chunk — latency, not bandwidth, dominates remote transports; the
  concat transiently doubles that leaf's cached footprint). Host buffers
  for leaves only ever needed on spill stay None when everything fits.
  Scalar (per-member constant) leaves and the running bracket statistics
  also stay device-side until a single fetch at the end. The
  chunks-cached count is a pure function of shapes and the budget, so
  multi-process collective schedules stay aligned.
  """
  n, _ = features.shape
  k = int(params_flat[0].shape[0])
  # NORMAL ignores the flag; normalizing it keeps the compiled-program
  # cache to one entry for both public callers.
  wants_mean = bool(with_count_means) and (
      distribution != likelihoods.LikelihoodDist.NORMAL
  )
  fwd = _make_stream_forward_fn(
      config, distribution, chunk_size, mesh, backend, rows, wants_mean
  )
  io = _ChunkIO(mesh, multiproc)

  retained_ids = tuple(
      sorted(
          set(cache_leaf_ids)
          | (set(host_leaf_ids) if host_leaf_ids is not None else set())
      )
  ) if cache_bytes else ()
  num_chunks = -(-n // rows)
  per_chunk_cache_bytes = len(retained_ids) * k * rows * 4
  max_cached = (
      min(num_chunks, int(cache_bytes) // per_chunk_cache_bytes)
      if per_chunk_cache_bytes
      else 0
  )
  cache = {}

  buffers = None
  scalar_dev = {}
  stats = tuple(io.put(s) for s in _stats_seed(distribution))

  def buffer_for(i):
    if buffers[i] is None:
      buffers[i] = np.empty((k, n), dtype=np.float32)
    return buffers[i]

  def store(bounds, out):
    nonlocal buffers
    lo, hi, cached = bounds
    leaves, _ = out
    if buffers is None:
      buffers = [None] * len(leaves)
    for i, leaf in enumerate(leaves):
      if np.ndim(leaf) == 2:
        if not cached:
          buffer_for(i)[:, lo:hi] = io.fetch(leaf)[:, : hi - lo]
      elif i not in scalar_dev:
        # Scalar leaves are chunk-invariant (per-member constants): keep
        # the first chunk's device array and fetch once after the loop.
        scalar_dev[i] = leaf

  for ci, (lo, hi) in enumerate(_chunk_ranges(n, rows)):
    x_np = features[lo:hi]
    if hi - lo < rows:
      x_np = np.concatenate(
          [x_np, np.zeros((rows - (hi - lo), x_np.shape[1]), np.float32)]
      )
    out = fwd(params_flat, io.put(x_np), jnp.int32(hi - lo), stats)
    stats = out[1]
    cached = ci < max_cached
    if cached:
      cache[ci] = {i: out[0][i] for i in retained_ids}
    io.dispatch((lo, hi, cached), out, store)
  io.drain()

  # Deferred assembly: host-needed leaves of the cached range, one
  # batched device concat + fetch per leaf (the concat and row trim run
  # on device; only the valid columns transfer).
  if cache:
    valid = min(max_cached * rows, n)
    for i in retained_ids:
      if host_leaf_ids is None or i in host_leaf_ids:
        full = jnp.concatenate(
            [cache[ci][i] for ci in range(max_cached)], axis=1
        )[:, :valid]
        buffer_for(i)[:, :valid] = io.fetch(full)

  leaves = tuple(
      scalar_dev[i] if buf is None and i in scalar_dev else buf
      for i, buf in enumerate(buffers)
  )
  return leaves, stats, cache


def _prepare_streamed_inputs(features, params, ensemble_dims, mesh, backend):
  """Streamed entry contract: the in-memory resolution + param flattening.

  Delegates mesh/backend resolution to `predict._prepare_predict_inputs`
  (`features_on_host=True` keeps the grid a host numpy array — only the
  params are placed), so the streamed and in-memory paths cannot drift
  apart; then flattens the public ensemble axes for the chunk programs.
  """
  (features, params, mesh, multiproc, backend, auto_resolved) = (
      predict_lib._prepare_predict_inputs(  # pylint: disable=protected-access
          features, params, mesh, backend, features_on_host=True
      )
  )
  ens_shape = tuple(params[0].shape[:ensemble_dims])
  k = int(np.prod(ens_shape))
  params_flat = tuple(
      p.reshape((k,) + p.shape[ensemble_dims:]) for p in params
  )
  return features, params_flat, ens_shape, mesh, multiproc, backend, (
      auto_resolved
  )


def forecast_params_bnf_streamed(
    features,
    observation_model: str,
    params,
    config: field_lib.FieldConfig,
    ensemble_dims: int = 2,
    chunk_size: int = 4096,
    mesh=None,
    backend: str = 'auto',
    stream_chunk_rows: int = 65536,
    stream_cache_bytes: int = 1 << 30,
):
  """Host-streamed twin of `predict.forecast_params_bnf`.

  Same contract (per-row leaves `ensemble_shape + (N,)`, scalar leaves
  `ensemble_shape`), but inputs stream from host RAM in
  `stream_chunk_rows`-row chunks and the returned leaves are host numpy
  buffers — device memory stays O(chunk) plus the `stream_cache_bytes`
  budget (chunks within the budget assemble in one batched fetch per
  leaf instead of one round-trip per chunk; 0 restores strict O(chunk)).
  Bit-identical to the in-memory path (the forward is row-independent;
  tested).
  """
  distribution = likelihoods.LikelihoodDist(observation_model)
  assert ensemble_dims >= 1
  (features, params_flat, ens_shape, mesh, multiproc, backend,
   auto_resolved) = _prepare_streamed_inputs(
       features, params, ensemble_dims, mesh, backend
   )
  rows = _resolve_rows(stream_chunk_rows, int(chunk_size), features.shape[0])
  # Per-row leaf indices of `likelihoods.forecast_params` per model (the
  # remaining leaves are per-member scalars).
  if distribution == likelihoods.LikelihoodDist.NORMAL:
    row_ids = (0,)
  elif distribution == likelihoods.LikelihoodDist.NB:
    row_ids = (1,)
  else:
    row_ids = (1, 2)

  def run(resolved):
    leaves, _, _ = _stream_forecast_params(
        features, distribution, params_flat, config, int(chunk_size), mesh,
        resolved, multiproc, rows, with_count_means=False,
        host_leaf_ids=row_ids, cache_bytes=stream_cache_bytes,
    )
    io = _ChunkIO(mesh, multiproc)
    return tuple(
        io.fetch(l) if isinstance(l, jax.Array) else l for l in leaves
    )

  leaves = predict_lib._run_with_pallas_fallback(  # pylint: disable=protected-access
      run, backend, auto_resolved
  )
  return tuple(l.reshape(ens_shape + l.shape[1:]) for l in leaves)


def predict_bnf_streamed(
    features,
    observation_model: str,
    params,
    config: field_lib.FieldConfig,
    quantiles,
    ensemble_dims: int = 2,
    approximate_quantiles: bool = False,
    chunk_size: int = 4096,
    mesh=None,
    backend: str = 'auto',
    stream_chunk_rows: int = 65536,
    stream_cache_bytes: int = 1 << 30,
):
  """Host-streamed twin of `predict.predict_bnf` (same output contract).

  Means come back as a host numpy `ensemble_shape + (N,)` buffer and each
  quantile as a host numpy (N,) array, bit-identical to the in-memory
  program (means always; exact quantiles always; the
  `approximate_quantiles` heuristic is ulp-close — module docstring);
  device memory stays O(stream_chunk_rows) plus the
  `stream_cache_bytes` pass-2 cache budget throughout (0 disables the
  cache for a strict O(chunk) envelope). See the module docstring for the
  two-pass global-bracket scheme and the cache/prefetch design.
  """
  distribution = likelihoods.LikelihoodDist(observation_model)
  assert ensemble_dims >= 1
  (features, params_flat, ens_shape, mesh, multiproc, backend,
   auto_resolved) = _prepare_streamed_inputs(
       features, params, ensemble_dims, mesh, backend
   )
  n = features.shape[0]
  chunk_size = int(chunk_size)
  rows = _resolve_rows(stream_chunk_rows, chunk_size, n)
  q_tuple = tuple(float(q) for q in quantiles)

  # Leaf roles per observation model: which pass-1 per-row leaves the
  # public output needs on host, and which ones pass 2 root-finds on
  # (cached device-side up to the budget).
  if distribution == likelihoods.LikelihoodDist.NORMAL:
    host_ids, cache_ids = (0,), (0,)   # means: public output AND pass-2 input
  elif distribution == likelihoods.LikelihoodDist.NB:
    host_ids, cache_ids = (2,), (1,)   # obs means public; logits pass-2 only
  else:
    host_ids, cache_ids = (3,), (1, 2)  # + zero-inflation logit

  def run(resolved):
    leaves, stats, cache = _stream_forecast_params(
        features, distribution, params_flat, config, chunk_size, mesh,
        resolved, multiproc, rows, with_count_means=True,
        host_leaf_ids=host_ids, cache_leaf_ids=cache_ids,
        cache_bytes=stream_cache_bytes,
    )
    quant = _make_stream_quantile_fn(
        distribution, q_tuple, ens_shape, bool(approximate_quantiles)
    )
    io = _ChunkIO(mesh, multiproc)
    q_out = [np.empty((n,), dtype=np.float32) for _ in q_tuple]

    def pad_flat(buf, lo, hi):
      """Chunk slice of a (K, N) host buffer, zero-padded to `rows`
      columns (the compute layout — ensemble axes restore in-program)."""
      sl = buf[:, lo:hi]
      if hi - lo < rows:
        sl = np.concatenate(
            [sl, np.zeros((sl.shape[0], rows - (hi - lo)), np.float32)], -1
        )
      return sl

    def chunk_inputs(ci, lo, hi):
      """Pass-2 per-row leaves for chunk `ci`: device-cached arrays when
      pass 1 kept them, else (async) uploads of the host-buffer slices."""
      if ci in cache:
        return tuple(cache[ci][i] for i in cache_ids)
      return tuple(
          io.put(pad_flat(leaves[i], lo, hi)) for i in cache_ids
      )

    def store(bounds, out):
      lo, hi = bounds
      got = io.fetch(out)  # ONE stacked (num_quantiles, rows) fetch
      for qi, dst in enumerate(q_out):
        dst[lo:hi] = got[qi, : hi - lo]

    if distribution == likelihoods.LikelihoodDist.NORMAL:
      means_buf, scale = leaves
      head = io.put(scale)
    elif distribution == likelihoods.LikelihoodDist.NB:
      total_count, _, mean_buf = leaves
      head = io.put(total_count)
    else:
      total_count, _, _, mean_buf = leaves
      head = io.put(total_count)
    s0, s1 = stats  # device scalars — no host round-trip

    ranges = list(_chunk_ranges(n, rows))
    # One-chunk lookahead: a spilled chunk's upload is initiated before
    # the previous chunk's result fetch blocks, so host->device transfer
    # overlaps the device root-find (cached chunks make this a no-op).
    # Cached chunks' stacked quantile outputs stay on device (tiny:
    # num_quantiles rows per chunk) and assemble in ONE batched
    # concat + fetch after the loop; spilled chunks fetch through the
    # depth-1 pipeline, one stacked transfer each.
    q_cached_dev = []
    pending_inputs = chunk_inputs(0, *ranges[0])
    for ci, (lo, hi) in enumerate(ranges):
      ins, pending_inputs = pending_inputs, None
      if ci + 1 < len(ranges):
        pending_inputs = chunk_inputs(ci + 1, *ranges[ci + 1])
      if distribution == likelihoods.LikelihoodDist.NORMAL:
        out = quant(ins[0], head, s0, s1)
      else:
        out = quant(head, ins[0], ins[1:], s0, s1)
      if ci in cache:
        q_cached_dev.append(out)
      else:
        io.dispatch((lo, hi), out, store)
      # A consumed spilled chunk's device buffers free as soon as the
      # root-find retires; cached chunks stay alive by design (the cache
      # budget is the explicit bound).
    io.drain()
    if q_cached_dev:
      valid = min(len(q_cached_dev) * rows, n)
      got = io.fetch(jnp.concatenate(q_cached_dev, axis=1)[:, :valid])
      for qi, dst in enumerate(q_out):
        dst[:valid] = got[qi]

    if distribution == likelihoods.LikelihoodDist.NORMAL:
      means = means_buf.reshape(ens_shape + (n,))
    else:
      means = mean_buf.reshape(ens_shape + (n,))
    return means, list(q_out)

  return predict_lib._run_with_pallas_fallback(  # pylint: disable=protected-access
      run, backend, auto_resolved
  )
