"""Checkpoint / resume for ensemble training state (orbax-backed).

The reference has no checkpointing (SURVEY.md §5): a fit is one synchronous
call and any failure loses the run. Here MAP/MLE training can periodically
persist (params, optimizer state, RNG key, loss history, epoch) and resume
exactly where it stopped — the loss history and final params of a resumed
run match an uninterrupted one bit-for-bit (same RNG stream, same scan).
"""

import dataclasses
import hashlib
import json
import os
import re

import jax
import numpy as np

try:
  import orbax.checkpoint as ocp
  from etils import epath  # orbax dependency; speaks local + gs:// paths

  _HAS_ORBAX = True
except ImportError:  # pragma: no cover - orbax is in the base image
  _HAS_ORBAX = False


@dataclasses.dataclass
class TrainState:
  """Host-side snapshot of an in-flight ensemble training run.

  The optimizer state is stored as *flat leaves*: orbax restores generic
  pytrees without preserving NamedTuple node types (optax states), so the
  caller re-unflattens with a treedef built from a freshly-initialized
  optimizer template (`jax.tree_util.tree_unflatten`).
  """

  params: tuple
  opt_leaves: list
  keys: jax.Array
  losses: list  # list of (E, chunk) arrays accumulated so far
  epoch: int

  @classmethod
  def from_opt_state(cls, params, opt_state, keys, losses, epoch):
    return cls(
        params=tuple(params),
        opt_leaves=jax.tree_util.tree_leaves(opt_state),
        keys=keys,
        losses=list(losses),
        epoch=epoch,
    )

  def opt_state(self, template, place=None):
    """Rebuild the optimizer state pytree from a same-structure template.

    `place` overrides the per-leaf device placement (default: plain
    `jnp.asarray`). Trainers pass a sharded `jax.device_put` so restored
    state lands directly in the train program's layout — a host->device
    transfer, compiling nothing (placing single-device arrays onto a mesh
    afterwards would compile one reshard program per leaf shape).
    """
    treedef = jax.tree_util.tree_structure(template)
    place = jnp_asarray if place is None else place
    return jax.tree_util.tree_unflatten(
        treedef, [place(l) for l in self.opt_leaves]
    )

  def to_pytree(self):
    return {
        'params': list(self.params),
        'opt_leaves': list(self.opt_leaves),
        'keys': self.keys,
        'losses': list(self.losses),
        'epoch': np.asarray(self.epoch),
    }

  @classmethod
  def from_pytree(cls, tree):
    return cls(
        params=tuple(tree['params']),
        opt_leaves=list(tree['opt_leaves']),
        keys=tree['keys'],
        losses=list(tree['losses']),
        epoch=int(tree['epoch']),
    )


def jnp_asarray(x):
  import jax.numpy as jnp

  return jnp.asarray(x)


def run_fingerprint(**kwargs) -> str:
  """Stable short digest of a training run's identifying configuration.

  Trainers pass every argument that determines the shape *and meaning* of
  the checkpointed state (model config, objective, ensemble size, optimizer
  settings, epoch budget, ...). A checkpoint directory written under one
  fingerprint refuses to restore under another — catching both the
  late-shape-error case (different model config) and the silent case
  (same shapes, different run).
  """
  blob = repr(sorted(kwargs.items()))
  return hashlib.sha256(blob.encode('utf-8')).hexdigest()[:16]


def _normalize_directory(directory: str) -> str:
  """Absolutize local paths; pass remote URIs through untouched.

  `os.path.abspath` would mangle a remote URI (gs://bucket ->
  <cwd>/gs:/bucket), silently redirecting a pod's collective checkpoint
  to per-host local disk. Remote paths go to orbax verbatim; the marker
  IO uses etils epath, which speaks both.
  """
  if re.match(r'^[a-zA-Z][a-zA-Z0-9+.-]*://', str(directory)):
    return str(directory)
  return os.path.abspath(directory)


class TrainCheckpointer:
  """Thin orbax CheckpointManager wrapper keyed by epoch.

  When `fingerprint` is given, it is persisted as `fingerprint.json` next
  to the checkpoint steps; re-opening the directory with a different
  fingerprint raises immediately instead of failing late (or silently
  resuming the wrong run).
  """

  def __init__(
      self,
      directory: str,
      max_to_keep: int = 2,
      fingerprint: str | None = None,
      legacy_fingerprints: tuple[str, ...] = (),
  ):
    """`legacy_fingerprints`: additional digests accepted as THIS run.

    The digest recipe can evolve (e.g. the stream-remix keys became
    conditional so feature additions stop churning pre-existing
    fingerprints); directories whose marker carries a superseded digest
    of the SAME configuration must keep resuming. A matched legacy
    marker is left in place — the directory stays resumable by both the
    old and new recipe.
    """
    if not _HAS_ORBAX:
      raise ImportError('orbax-checkpoint is required for checkpointing.')
    directory = _normalize_directory(directory)
    self._manager = ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )
    self._fingerprint = fingerprint
    self._accepted = (
        (fingerprint,) + tuple(legacy_fingerprints)
        if fingerprint is not None
        else ()
    )
    self._meta_path = os.path.join(directory, 'fingerprint.json')
    if fingerprint is not None:
      stored = self._read_marker()
      if stored in self._accepted[1:]:
        # Superseded digest of this same configuration: keep resuming
        # (and keep the marker — see the docstring).
        self._fingerprint = stored
        stored = fingerprint  # skip the mismatch branch below
      if stored is not None and stored != fingerprint:
        if self._manager.latest_step() is not None:
          self._manager.close()
          raise ValueError(
              f'Checkpoint directory {directory!r} was written by a run '
              f'with a different configuration (stored fingerprint '
              f'{stored}, this run {fingerprint}). Use a fresh directory, '
              'or delete the stale checkpoints.'
          )
        # A marker with zero saved steps is debris from a run that died
        # before its first checkpoint — nothing to resume, claim the
        # directory for this configuration instead of refusing. (If the
        # marker's writer is in fact still alive and pre-first-save, the
        # save-time re-check below makes ITS first save fail loudly
        # rather than letting two runs interleave.)
        stored = None
      if stored is None and jax.process_index() == 0:
        # Single writer in multi-process runs (process 0 also owns the
        # checkpoint saves); other processes only validate.
        self._write_marker(fingerprint)

  def _write_marker(self, fingerprint: str):
    # The marker must appear atomically: other processes read it
    # concurrently from their __init__ validation, and a torn read of a
    # half-written file would crash them inside the collective save.
    # Locally, write-to-temp + os.replace publishes in one step; object
    # stores (gs://, s3://) publish uploads atomically on completion.
    payload = json.dumps({'fingerprint': fingerprint})
    path = epath.Path(self._meta_path)
    if str(path).startswith('/'):  # local filesystem
      tmp = path.parent / f'.fingerprint.{os.getpid()}.tmp'
      tmp.write_text(payload)
      os.replace(str(tmp), str(path))
    else:
      path.write_text(payload)

  def _read_marker(self):
    path = epath.Path(self._meta_path)
    if not path.exists():
      return None
    try:
      return json.loads(path.read_text()).get('fingerprint')
    except (json.JSONDecodeError, ValueError):
      # A torn/empty marker can only be external damage (writes publish
      # atomically); treat it as absent rather than crashing a collective.
      return None

  def save(self, state: TrainState):
    if self._fingerprint is not None:
      stored = self._read_marker()
      if stored != self._fingerprint:
        raise ValueError(
            'Checkpoint directory was claimed by a different run since '
            f'this one started (marker fingerprint {stored}, this run '
            f'{self._fingerprint}); refusing to interleave saves.'
        )
    self._manager.save(
        state.epoch, args=ocp.args.StandardSave(state.to_pytree())
    )
    self._manager.wait_until_finished()

  def restore_latest(self) -> TrainState | None:
    step = self._manager.latest_step()
    if step is None:
      return None
    tree = self._manager.restore(step)
    return TrainState.from_pytree(tree)

  def close(self):
    self._manager.close()
