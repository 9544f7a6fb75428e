"""Trainer-backend resolution.

The trainers run on one of two backends (reference has a single code path,
`/root/reference/src/bayesnf/inference.py:510-623` — the split is a
TPU-first addition):

- 'xla': the GSPMD-partitioned pure-JAX program. Works on any platform and
  any ('ens', 'data') mesh shape.
- 'pallas': the single-pass fused train kernel (`ops/fused_mlp.fused_train`)
  under `shard_map`. ~2.8x faster than 'xla' on TPU, but interpreter-slow
  off-TPU. A sharded data axis is supported both full-batch (the kernel
  runs per row shard; losses/grads psum over 'data') and minibatch (each
  shard contributes batch_size/data_shards rows per step via a per-shard
  local permutation — requires batch_size % data_shards == 0; see
  parallel/minibatch.py). A sharded non-divisible minibatch needs 'xla'
  (global permutation gather).

'auto' (the default at the estimator API) picks 'pallas' exactly when it is
the right choice — running on TPU with an unsharded data axis or a
full-batch fit — and 'xla' otherwise. Callers that auto-resolved to 'pallas' fall back to 'xla' with a
loud warning if the kernel program fails to build, so an exotic
configuration can never make the *default* path worse than the reference
semantics ('xla' is always available).
"""

import sys
import traceback

import jax

from bayesnf_tpu.parallel import mesh as mesh_lib

BACKENDS = ('xla', 'pallas', 'auto')


def resolve_backend(
    backend: str, mesh, full_batch: bool = False,
    batch_divisible: bool = False,
) -> str:
  """Resolve 'auto' to a concrete trainer backend for this mesh/platform.

  Pallas is eligible on TPU when the data axis is unsharded, or — when it
  is sharded — for full-batch training (the fused kernel runs per row
  shard and losses/grads are psum'd over 'data'; any N — rows use the
  balanced layout and each shard masks its tail in-kernel) and for
  minibatch SGD with `batch_divisible` (batch_size % data_shards == 0;
  each shard contributes batch_size/data_shards rows per step through the
  per-shard permutation scheme of parallel/minibatch.py). A sharded
  non-divisible minibatch needs the XLA backend (global permutation
  gather). `batch_divisible` defaults to False — the fail-safe direction:
  a caller that omits it on a sharded-data minibatch gets 'xla' (always
  correct) rather than a kernel whose permutation scheme its batch cannot
  satisfy.
  """
  if backend not in BACKENDS:
    raise ValueError(f'Unknown backend: {backend!r} (expected {BACKENDS}).')
  if backend != 'auto':
    return backend
  if jax.default_backend() == 'tpu' and (
      mesh.shape[mesh_lib.DATA_AXIS] == 1 or full_batch or batch_divisible
  ):
    return 'pallas'
  return 'xla'


def adam_state_spec(config, learning_rate: float, leaf, surrogate: bool = False):
  """Sharding tree shaped like the trainers' batched Adam state.

  Built with `jax.eval_shape` (trace-only): the `jnp.zeros` template it
  replaces compiled one eager broadcast per distinct parameter-leaf shape
  just to learn the optimizer state's pytree structure — ~8 of the
  cold-fit setup subcompiles of docs/roadmap.md item 3, each ~0.5 s of
  service RPC on a remote-attached device.

  Args:
    config: static model config (fixes the parameter leaves).
    learning_rate: Adam learning rate (optax needs it to build the state).
    leaf: the per-leaf spec to broadcast over the state tree — a
      `PartitionSpec` (shard_map factories) or `NamedSharding` (GSPMD
      in/out shardings).
    surrogate: True for the VI trainers, whose parameter pytree is the
      (locs, raw_scales) surrogate pair.
  """
  import optax

  from bayesnf_tpu.models import field as field_lib

  template = tuple(
      jax.ShapeDtypeStruct((1,) + s.shape, jax.numpy.float32)
      for s in field_lib.param_specs(config)
  )
  if surrogate:
    template = (template, template)
  state = jax.eval_shape(optax.adam(learning_rate).init, template)
  return jax.tree_util.tree_map(lambda _: leaf, state)


def warn_pallas_fallback(err: Exception) -> None:
  """Loud stderr warning when an auto-selected pallas program fails to build.

  Loud on purpose (mirrors bench.py): a silent fallback would let a fused
  kernel compile regression masquerade as a mere slowdown.
  """
  print(
      'WARNING: auto-selected pallas backend failed to build; '
      'falling back to xla:',
      file=sys.stderr,
  )
  traceback.print_exception(err, limit=3, file=sys.stderr)
