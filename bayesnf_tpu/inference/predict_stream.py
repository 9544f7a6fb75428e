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
  reductions). Pass 2 re-uploads each chunk's parameters and root-finds
  with the global bracket. Because the Chandrupatla iteration is
  elementwise per row once the bracket is fixed, the streamed output is
  **bit-identical** to the in-memory path (tested).
- **Device memory is O(chunk), not O(N).** Each pass holds one in-flight
  chunk plus one being assembled (async dispatch gives the double
  buffering, exactly as in `parallel/streaming.py`).
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

  Takes (params_flat, x_chunk (rows, D), valid scalar); rows past `valid`
  are host zero-padding, masked out of the statistics. Returns
  (per-row leaves (K, rows) / scalar leaves (K,), stats tuple). For count
  models, `with_count_means` appends the observation means as an extra
  leaf; when False they are still computed for the bracket statistics but
  never leave the device (no per-chunk transfer for a leaf the caller
  would drop).
  """

  def fwd(params_flat, x_chunk, valid):
    aug = field_lib.aug_features(config, x_chunk)
    fp = predict_lib._forecast_params_chunked(  # pylint: disable=protected-access
        config, distribution, params_flat, aug, chunk_size=chunk_size,
        mesh=mesh, backend=backend,
    )
    mask = jnp.arange(rows) < valid
    if distribution == likelihoods.LikelihoodDist.NORMAL:
      means, scale = fp
      stats = (
          jnp.amin(jnp.where(mask, means, jnp.inf)),
          jnp.amax(jnp.where(mask, means, -jnp.inf)),
      )
      return fp, stats
    total_count, logits, *maybe_pi = fp
    obs_d = dist_lib.count_obs_dist(total_count, logits, *maybe_pi)
    obs_mean = obs_d.mean()
    stats = (
        jnp.amax(jnp.where(mask, obs_mean, -jnp.inf)),
        jnp.amax(jnp.where(mask, obs_d.stddev(), -jnp.inf)),
    )
    return (fp + (obs_mean,) if with_count_means else fp), stats

  return jax.jit(fwd)


@functools.lru_cache(maxsize=32)
def _make_stream_quantile_fn(
    distribution, quantiles, ensemble_dims, approximate
):
  """Pass-2 program: per-chunk mixture-quantile root-finds, global bracket.

  Takes the chunk's per-row parameter slices (public ensemble axes
  restored) plus the pass-1 global statistics; computes the bracket from
  them with the same float ops as the in-memory engine, so the per-lane
  root trajectories are bit-identical.
  """
  axis = tuple(range(ensemble_dims))

  if distribution == likelihoods.LikelihoodDist.NORMAL:

    def quant(means, scale, min_mean, max_mean):
      scales = scale[..., jnp.newaxis]
      if approximate:
        return tuple(
            quantiles_lib.normal_mixture_quantile_approx(
                means, scales, q, axis
            )
            for q in quantiles
        )
      max_scale = jnp.amax(scale)
      return tuple(
          quantiles_lib.normal_mixture_quantile_root(
              means, scales, q, axis, stats=(min_mean, max_mean, max_scale)
          )
          for q in quantiles
      )

    return jax.jit(quant)

  def quant_count(total_count, logits, maybe_pi, max_mean, max_std):
    obs_d = dist_lib.count_obs_dist(total_count, logits, *maybe_pi)
    return tuple(
        quantiles_lib.count_mixture_quantile_root(
            obs_d, q, ensemble_axes=axis, stats=(max_mean, max_std)
        )
        for q in quantiles
    )

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
    multiproc, rows, with_count_means,
):
  """Pass 1: host-chunked forward; returns host leaves + global stats.

  Per-row leaves come back as (K, N) float32 numpy buffers; scalar leaves
  as (K,) numpy; stats as a tuple of numpy f32 scalars (running extrema,
  exact). For count models with `with_count_means`, the observation means
  (the public predict output) are assembled as an extra trailing buffer.
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

  buffers = None
  scalar_leaves = {}
  stats = None

  def store(bounds, out):
    nonlocal buffers, stats
    lo, hi = bounds
    leaves, chunk_stats = out
    if buffers is None:
      buffers = [
          np.empty((k, n), dtype=np.float32) if np.ndim(l) == 2 else None
          for l in leaves
      ]
    for i, leaf in enumerate(leaves):
      if np.ndim(leaf) == 2:
        buffers[i][:, lo:hi] = io.fetch(leaf)[:, : hi - lo]
      elif i not in scalar_leaves:
        # Scalar leaves are chunk-invariant (per-member constants):
        # fetch once instead of re-transferring (and, on multi-process
        # meshes, re-gathering) identical values every chunk. Every
        # process stores on the same first chunk, so collective counts
        # stay aligned.
        scalar_leaves[i] = io.fetch(leaf)
    chunk_stats = tuple(io.fetch(s) for s in chunk_stats)
    if stats is None:
      stats = chunk_stats
    elif distribution == likelihoods.LikelihoodDist.NORMAL:
      stats = (
          np.minimum(stats[0], chunk_stats[0]),
          np.maximum(stats[1], chunk_stats[1]),
      )
    else:
      stats = tuple(np.maximum(a, b) for a, b in zip(stats, chunk_stats))

  for lo, hi in _chunk_ranges(n, rows):
    x_np = features[lo:hi]
    if hi - lo < rows:
      x_np = np.concatenate(
          [x_np, np.zeros((rows - (hi - lo), x_np.shape[1]), np.float32)]
      )
    out = fwd(params_flat, io.put(x_np), jnp.int32(hi - lo))
    io.dispatch((lo, hi), out, store)
  io.drain()

  leaves = tuple(
      scalar_leaves[i] if buf is None else buf
      for i, buf in enumerate(buffers)
  )
  return leaves, stats


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
):
  """Host-streamed twin of `predict.forecast_params_bnf`.

  Same contract (per-row leaves `ensemble_shape + (N,)`, scalar leaves
  `ensemble_shape`), but inputs stream from host RAM in
  `stream_chunk_rows`-row chunks and the returned leaves are host numpy
  buffers — device memory stays O(chunk). Bit-identical to the in-memory
  path (the forward is row-independent; tested).
  """
  distribution = likelihoods.LikelihoodDist(observation_model)
  assert ensemble_dims >= 1
  (features, params_flat, ens_shape, mesh, multiproc, backend,
   auto_resolved) = _prepare_streamed_inputs(
       features, params, ensemble_dims, mesh, backend
   )
  rows = _resolve_rows(stream_chunk_rows, int(chunk_size), features.shape[0])

  def run(resolved):
    leaves, _ = _stream_forecast_params(
        features, distribution, params_flat, config, int(chunk_size), mesh,
        resolved, multiproc, rows, with_count_means=False,
    )
    return leaves

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
):
  """Host-streamed twin of `predict.predict_bnf` (same output contract).

  Means come back as a host numpy `ensemble_shape + (N,)` buffer and each
  quantile as a host numpy (N,) array, bit-identical to the in-memory
  program; device memory stays O(stream_chunk_rows) throughout. See the
  module docstring for the two-pass global-bracket scheme.
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

  def run(resolved):
    leaves, stats = _stream_forecast_params(
        features, distribution, params_flat, config, chunk_size, mesh,
        resolved, multiproc, rows, with_count_means=True,
    )
    quant = _make_stream_quantile_fn(
        distribution, q_tuple, int(ensemble_dims), bool(approximate_quantiles)
    )
    io = _ChunkIO(mesh, multiproc)
    q_out = [np.empty((n,), dtype=np.float32) for _ in q_tuple]

    def pad(buf, lo, hi):
      """Chunk slice of a (K, N) buffer, zero-padded to `rows` columns,
      with the public ensemble axes restored."""
      sl = buf[:, lo:hi]
      if hi - lo < rows:
        sl = np.concatenate(
            [sl, np.zeros((sl.shape[0], rows - (hi - lo)), np.float32)], -1
        )
      return sl.reshape(ens_shape + (rows,))

    def store(bounds, out):
      lo, hi = bounds
      for dst, got in zip(q_out, out):
        dst[lo:hi] = io.fetch(got)[: hi - lo]

    if distribution == likelihoods.LikelihoodDist.NORMAL:
      means_buf, scale = leaves
      scale_dev = io.put(scale.reshape(ens_shape))
      s0 = io.put(stats[0])
      s1 = io.put(stats[1])
      for lo, hi in _chunk_ranges(n, rows):
        out = quant(io.put(pad(means_buf, lo, hi)), scale_dev, s0, s1)
        io.dispatch((lo, hi), out, store)
      io.drain()
      means = means_buf.reshape(ens_shape + (n,))
      return means, list(q_out)

    if distribution == likelihoods.LikelihoodDist.NB:
      total_count, logits_buf, mean_buf = leaves
      pi_buf = None
    else:
      total_count, logits_buf, pi_buf, mean_buf = leaves
    tc_dev = io.put(total_count.reshape(ens_shape))
    s0 = io.put(stats[0])
    s1 = io.put(stats[1])
    for lo, hi in _chunk_ranges(n, rows):
      maybe_pi = (io.put(pad(pi_buf, lo, hi)),) if pi_buf is not None else ()
      out = quant(tc_dev, io.put(pad(logits_buf, lo, hi)), maybe_pi, s0, s1)
      io.dispatch((lo, hi), out, store)
    io.drain()
    means = mean_buf.reshape(ens_shape + (n,))
    return means, list(q_out)

  return predict_lib._run_with_pallas_fallback(  # pylint: disable=protected-access
      run, backend, auto_resolved
  )
