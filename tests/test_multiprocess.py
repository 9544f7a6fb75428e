"""Real multi-process (multi-host rehearsal) validation.

The reference never ran its multi-device path in CI at all (SURVEY.md §4);
beyond the virtual 8-device single-process mesh the rest of this suite
uses, these tests launch TWO separate Python processes, join them through
`jax.distributed` (Gloo CPU collectives), build the host-major
('ens', 'data') `multihost_mesh`, and run the actual MAP and VI trainers
across the process boundary — the closest rehearsal of a pod-slice run
that a single machine can provide.

Checked: both processes return identical, fully-addressable results
(params_/losses_ contract), and those results match a single-process fit
of the same seeds on an identically-shaped mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesnf_tpu.inference import map as map_lib
from bayesnf_tpu.inference import predict as predict_lib
from bayesnf_tpu.inference import vi as vi_lib
from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.models import likelihoods
from bayesnf_tpu.parallel import mesh as mesh_lib

_WORKER = os.path.join(os.path.dirname(__file__), '_multiprocess_worker.py')


def _free_port():
  s = socket.socket()
  s.bind(('localhost', 0))
  port = s.getsockname()[1]
  s.close()
  return port


# Signatures of the known-flaky Gloo/coordination rendezvous: the CPU
# collectives' context init holds a hardcoded ~30 s GetKeyValue deadline
# inside jax, which a loaded host (pytest -n contention, a concurrent
# bench) can blow through no matter how generous the worker
# `communicate` bound is. A matching failure relaunches the whole gang
# on a fresh port instead of failing the suite (VERDICT r4 item 4).
#
# Two signature classes with different retry policies (loaded suite
# runs taught the distinction the hard way):
#
# - CONTEXT-FORMATION failures retry regardless of run phase. Gloo
#   forms a separate communicator per distinct device group, each with
#   its own ~30 s KV rendezvous — so the flake can fire at ANY later
#   collective that first touches a new group (observed post-warm-up
#   even after the worker's full-device allgather probe), and no phase
#   sentinel can cover every communicator. The signature itself is
#   specific to communicator formation: product logic cannot corrupt
#   the KV rendezvous, and a deterministic cross-process desync would
#   fail all bounded attempts and still surface.
# - BROAD timeout spellings (a bare mid-collective DEADLINE_EXCEEDED, a
#   coordination barrier timeout) retry ONLY when the failed worker
#   died before its `WORKER_INIT_OK` sentinel (printed after
#   `jax.distributed.initialize` + a warm-up allgather): after it, such
#   a failure is a real deadlock or a crashed peer — never retried.
_CONTEXT_FORMATION_ERRORS = (
    'Gloo context initialization failed',
    'initialization_timeout',
    'Failed to connect to the coordination service',
)
_RENDEZVOUS_ERRORS = _CONTEXT_FORMATION_ERRORS + (
    'DEADLINE_EXCEEDED',
    'Barrier timed out',
)
_INIT_SENTINEL = 'WORKER_INIT_OK'


def _launch_gang(num_processes, data_devices_per_host, ckpt_dir,
                 devices_per_process, mode):
  port = _free_port()
  env = dict(os.environ)
  env.pop('XLA_FLAGS', None)  # worker sets its own device-count flag
  env['JAX_PLATFORMS'] = 'cpu'
  procs = [
      subprocess.Popen(
          [sys.executable, _WORKER, str(i), str(num_processes), str(port),
           str(data_devices_per_host), ckpt_dir or 'none',
           str(devices_per_process), mode],
          stdout=subprocess.PIPE,
          stderr=subprocess.PIPE,
          env=env,
          text=True,
      )
      for i in range(num_processes)
  ]
  outs = []
  for p in procs:
    # Generous bound: the workers compile dozens of programs and the
    # suite runs under pytest -n parallel load — 600 s flaked once under
    # a 4-way xdist run while the bench occupied the host; alone the
    # pair finishes in ~200 s.
    try:
      out, err = p.communicate(timeout=1500)
    except subprocess.TimeoutExpired:
      for q in procs:
        if q.poll() is None:
          q.kill()
      out, err = p.communicate()
    outs.append((p.returncode, out, err))
  return outs


def _run_workers(data_devices_per_host, ckpt_dir=None, num_processes=2,
                 devices_per_process=4, mode='full', attempts=3):
  last_failure = None
  for _ in range(attempts):
    outs = _launch_gang(
        num_processes, data_devices_per_host, ckpt_dir, devices_per_process,
        mode,
    )
    failures = [(rc, o, e) for rc, o, e in outs if rc != 0]
    if failures:
      rc, o, e = failures[0]
      last_failure = f'worker failed (rc={rc}):\n{o}\n{e}'
      context_flake = any(
          sig in e or sig in o
          for _, o, e in failures
          for sig in _CONTEXT_FORMATION_ERRORS
      )
      pre_init = [
          (o, e) for _, o, e in failures if _INIT_SENTINEL not in o
      ]
      pre_init_flake = pre_init and any(
          sig in e or sig in o
          for o, e in pre_init
          for sig in _RENDEZVOUS_ERRORS
      )
      if context_flake or pre_init_flake:
        continue  # environment flake: retry the gang on a fresh port
      break
    results = {}
    for _, out, _ in outs:
      for line in out.splitlines():
        if line.startswith('WORKER_RESULT '):
          r = json.loads(line[len('WORKER_RESULT '):])
          results[r['process_id']] = r
    assert set(results) == set(range(num_processes)), (
        f'missing worker output: {results.keys()}'
    )
    return results
  raise AssertionError(last_failure)


def _reference_fit(data_devices):
  """Same fits on this process' identically-shaped 8-device mesh.

  Returns in-memory MAP/VI losses and predict outputs, plus host-STREAMED
  MAP/VI losses (same seeds, same mesh shape) — the single-process truth
  the two-process streamed fits must reproduce.
  """
  config = field_lib.FieldConfig.create(
      width=16,
      depth=2,
      input_scales=[50.0, 1.0],
      fourier_degrees=[3, 2],
      interactions=[(0, 1)],
      seasonality_periods=[7.0],
      num_seasonal_harmonics=[2],
  )
  rng = np.random.default_rng(0)
  x = rng.normal(size=(96, 2)).astype(np.float32) * 5
  y = rng.normal(size=(96,)).astype(np.float32)
  seasonal = field_lib.seasonal_features_for(config, jnp.asarray(x))
  aug = jnp.concatenate([jnp.asarray(x), seasonal], axis=-1)
  mesh = mesh_lib.default_mesh(data_devices=data_devices)

  params, losses = map_lib.ensemble_map(
      aug, jnp.asarray(y), config, likelihoods.LikelihoodDist.NORMAL,
      ensemble_size=6, learning_rate=0.01, num_epochs=4,
      seed=jax.random.PRNGKey(0), batch_size=32, prior_weight=1.0,
      mesh=mesh, backend='xla',
  )
  _, vi_losses, _ = vi_lib.fit_vi(
      aug, jnp.asarray(y), jax.random.PRNGKey(1), 'NORMAL', config,
      ensemble_size=4, learning_rate=0.01, num_epochs=3,
      sample_size_divergence=2, sample_size_posterior=2, batch_size=32,
      mesh=mesh, backend='xla',
  )
  pred_means, pred_qs = predict_lib.predict_bnf(
      x, 'NORMAL', params, config, quantiles=(0.1, 0.9),
      ensemble_dims=1, chunk_size=32, mesh=mesh,
  )
  _, stream_losses = map_lib.ensemble_map(
      np.asarray(aug), np.asarray(y), config,
      likelihoods.LikelihoodDist.NORMAL,
      ensemble_size=6, learning_rate=0.01, num_epochs=4,
      seed=jax.random.PRNGKey(0), batch_size=32, prior_weight=1.0,
      mesh=mesh, backend='xla', stream_chunk_steps=2,
  )
  _, stream_vi_losses, _ = vi_lib.fit_vi(
      np.asarray(aug), np.asarray(y), jax.random.PRNGKey(1), 'NORMAL',
      config, ensemble_size=4, learning_rate=0.01, num_epochs=3,
      sample_size_divergence=2, sample_size_posterior=2, batch_size=32,
      mesh=mesh, backend='xla', stream_chunk_steps=2,
  )
  return (
      np.asarray(losses),
      np.asarray(vi_losses),
      np.asarray(pred_means),
      [np.asarray(q) for q in pred_qs],
      np.asarray(stream_losses),
      np.asarray(stream_vi_losses),
  )


def test_rendezvous_retry_classification(monkeypatch):
  """The flake-retry gate: scripted gang outcomes drive the 3 branches.

  Pure-logic test (no subprocesses): `_launch_gang` is replaced with a
  script of per-attempt outcomes, checking that (a) a pre-sentinel
  failure with a rendezvous signature retries and eventually succeeds,
  (b) a post-sentinel failure with the same signature fails immediately
  (a real collective deadlock must not be retried into a flaky pass),
  (c) a pre-sentinel failure WITHOUT a rendezvous signature (e.g. an
  import error) fails immediately, and (d) retries are bounded.
  """
  ok = [(0, f'{_INIT_SENTINEL}\nWORKER_RESULT {{"process_id": {i}}}', '')
        for i in range(2)]
  flake = [
      (0, f'{_INIT_SENTINEL}\nWORKER_RESULT {{"process_id": 0}}', ''),
      (1, '', 'Gloo context initialization failed: DEADLINE_EXCEEDED'),
  ]
  deadlock = [
      (0, f'{_INIT_SENTINEL}\nWORKER_RESULT {{"process_id": 0}}', ''),
      (1, _INIT_SENTINEL, 'DEADLINE_EXCEEDED in all-reduce'),
  ]
  late_context = [
      (0, f'{_INIT_SENTINEL}\nWORKER_RESULT {{"process_id": 0}}', ''),
      (1, _INIT_SENTINEL,
       'Gloo context initialization failed: DEADLINE_EXCEEDED'),
  ]
  crash = [
      (0, f'{_INIT_SENTINEL}\nWORKER_RESULT {{"process_id": 0}}', ''),
      (1, '', "ImportError: No module named 'nope'"),
  ]

  def scripted(outcomes):
    script = list(outcomes)
    calls = []

    def fake_launch(*args, **kwargs):
      calls.append(1)
      return script.pop(0)

    return fake_launch, calls

  self_mod = sys.modules[__name__]

  # (a) one flaky attempt, then success -> retried, results returned.
  fake, calls = scripted([flake, ok])
  monkeypatch.setattr(self_mod, '_launch_gang', fake)
  results = _run_workers(1)
  assert len(calls) == 2 and set(results) == {0, 1}

  # (b) post-sentinel bare DEADLINE_EXCEEDED -> NO retry (real deadlock
  # or crashed peer fails immediately).
  fake, calls = scripted([deadlock, ok])
  monkeypatch.setattr(self_mod, '_launch_gang', fake)
  with pytest.raises(AssertionError, match='all-reduce'):
    _run_workers(1)
  assert len(calls) == 1

  # (b2) but a post-sentinel CONTEXT-FORMATION failure retries: Gloo
  # forms a communicator per device group, so its rendezvous flake can
  # fire at any later collective that first touches a new group.
  fake, calls = scripted([late_context, ok])
  monkeypatch.setattr(self_mod, '_launch_gang', fake)
  results = _run_workers(1)
  assert len(calls) == 2 and set(results) == {0, 1}

  # (c) pre-sentinel failure without a rendezvous signature -> no retry.
  fake, calls = scripted([crash, ok])
  monkeypatch.setattr(self_mod, '_launch_gang', fake)
  with pytest.raises(AssertionError, match='ImportError'):
    _run_workers(1)
  assert len(calls) == 1

  # (d) persistent flake -> bounded attempts, then the failure surfaces.
  fake, calls = scripted([flake, flake, flake, flake])
  monkeypatch.setattr(self_mod, '_launch_gang', fake)
  with pytest.raises(AssertionError, match='Gloo context'):
    _run_workers(1, attempts=3)
  assert len(calls) == 3


@pytest.mark.slow
@pytest.mark.parametrize('data_devices_per_host', [1, 2])
def test_two_process_fit_matches_single_process(
    data_devices_per_host, tmp_path
):
  ckpt_dir = str(tmp_path / 'ckpt') if data_devices_per_host == 1 else None
  results = _run_workers(data_devices_per_host, ckpt_dir=ckpt_dir)
  r0, r1 = results[0], results[1]

  # Both processes hold the FULL result (the reference's fully-addressable
  # params_/losses_ contract), identically.
  assert r0['mesh_shape'] == {
      'ens': 8 // data_devices_per_host, 'data': data_devices_per_host
  }
  assert r0['map_losses'] == r1['map_losses']
  assert r0['map_param_sums'] == r1['map_param_sums']
  assert r0['vi_losses'] == r1['vi_losses']
  assert r0['vi_draw_sum'] == r1['vi_draw_sum']
  assert np.all(np.isfinite(np.asarray(r0['map_losses'])))
  assert np.all(np.isfinite(np.asarray(r0['vi_losses'])))

  # Padding contract survives multi-process: 6 members on an 8-wide axis.
  assert np.asarray(r0['map_losses']).shape == (6, 4)
  assert all(s[0] == 6 for s in r0['map_param_shapes'])

  # Row-parallel predict over the multi-process mesh: both processes hold
  # the full (means, quantiles) host arrays, identically.
  assert r0['predict_mean_shape'] == [6, 96]
  assert r0['predict_means'] == r1['predict_means']
  assert r0['predict_quantiles'] == r1['predict_quantiles']

  # The distribution-object path (likelihood_model's engine) over the
  # multi-process mesh: full host arrays, identical on every process.
  assert r0['forecast_param_shapes'] == [[6, 96], [6]]  # NORMAL (loc, scale)
  assert r0['forecast_param_sums'] == r1['forecast_param_sums']
  assert np.all(np.isfinite(np.asarray(r0['forecast_param_sums'])))

  # Host-streaming over the multi-process mesh: both processes assemble
  # identical batch streams and hold identical full results.
  assert r0['stream_map_losses'] == r1['stream_map_losses']
  assert r0['stream_map_param_sums'] == r1['stream_map_param_sums']
  assert r0['stream_vi_losses'] == r1['stream_vi_losses']
  assert np.all(np.isfinite(np.asarray(r0['stream_map_losses'])))
  assert np.all(np.isfinite(np.asarray(r0['stream_vi_losses'])))

  # Out-of-core streamed predict over the multi-process mesh: identical
  # full host buffers on both processes, matching the in-memory predict
  # the workers ran on the same params (different partitioned program —
  # ulp-level agreement, see tests/test_predict_stream.py).
  assert r0['stream_predict_means'] == r1['stream_predict_means']
  assert r0['stream_predict_quantiles'] == r1['stream_predict_quantiles']
  np.testing.assert_allclose(
      np.asarray(r0['stream_predict_means']),
      np.asarray(r0['predict_means']),
      rtol=1e-6, atol=1e-7,
  )
  for got_q, mem_q in zip(
      r0['stream_predict_quantiles'], r0['predict_quantiles']
  ):
    np.testing.assert_allclose(
        np.asarray(got_q), np.asarray(mem_q), rtol=1e-6, atol=1e-7
    )

  # And the numbers match a single-process run of the same seeds on an
  # identically-shaped mesh (reduction order may differ when the data
  # axis is sharded, hence allclose rather than equality).
  want_map, want_vi, want_means, want_qs, want_stream, want_stream_vi = (
      _reference_fit(data_devices_per_host)
  )
  np.testing.assert_allclose(
      np.asarray(r0['map_losses']), want_map, rtol=1e-5
  )
  np.testing.assert_allclose(np.asarray(r0['vi_losses']), want_vi, rtol=1e-5)
  np.testing.assert_allclose(
      np.asarray(r0['predict_means']).reshape(6, 96), want_means, rtol=1e-4
  )
  for got_q, want_q in zip(r0['predict_quantiles'], want_qs):
    np.testing.assert_allclose(np.asarray(got_q), want_q, rtol=1e-4)
  np.testing.assert_allclose(
      np.asarray(r0['stream_map_losses']), want_stream, rtol=1e-5
  )
  np.testing.assert_allclose(
      np.asarray(r0['stream_vi_losses']), want_stream_vi, rtol=1e-5
  )

  if ckpt_dir is not None:
    # Checkpoint/resume across the process boundary (process 0 writes, all
    # processes restore): interrupted-at-epoch-2 + resumed run must match
    # the uninterrupted 4-epoch fit exactly, on both processes.
    assert r0['ckpt_map_losses'] == r0['map_losses']
    assert r1['ckpt_map_losses'] == r0['map_losses']
    # Mid-stream resume across the process boundary: the resumed streamed
    # fit must land on the uninterrupted streamed fit's exact losses.
    assert r0['ckpt_stream_map_losses'] == r0['stream_map_losses']
    assert r1['ckpt_stream_map_losses'] == r0['stream_map_losses']


@pytest.mark.slow
def test_four_process_2x2_grid():
  """4 processes x 2 virtual devices: the ('ens', 'data') = (4, 2) grid.

  The 2-process legs above shard one mesh axis across the process
  boundary at a time; this leg shards BOTH at once — host-major ensemble
  placement (each host's 2 devices form one within-host data group),
  cross-host ensemble gathers, and streamed globalization over a 2-D
  multi-process grid (VERDICT r4 item 5). Light worker mode: MAP +
  streamed MAP + both predict paths (VI/checkpoint coverage is owned by
  the 2-process legs — the collective topology, not the objective, is
  what changes here).
  """
  results = _run_workers(
      data_devices_per_host=2, num_processes=4, devices_per_process=2,
      mode='light',
  )
  r0 = results[0]
  assert r0['mesh_shape'] == {'ens': 4, 'data': 2}

  # Every process holds identical full results.
  for pid in (1, 2, 3):
    rp = results[pid]
    assert rp['map_losses'] == r0['map_losses']
    assert rp['map_param_sums'] == r0['map_param_sums']
    assert rp['predict_means'] == r0['predict_means']
    assert rp['predict_quantiles'] == r0['predict_quantiles']
    assert rp['stream_map_losses'] == r0['stream_map_losses']
    assert rp['stream_map_param_sums'] == r0['stream_map_param_sums']
    assert rp['stream_predict_means'] == r0['stream_predict_means']
    assert rp['stream_predict_quantiles'] == r0['stream_predict_quantiles']

  assert np.asarray(r0['map_losses']).shape == (6, 4)
  assert np.all(np.isfinite(np.asarray(r0['map_losses'])))
  assert np.all(np.isfinite(np.asarray(r0['stream_map_losses'])))

  # Streamed predict agrees with the in-memory predict the same workers
  # ran (different partitioned program — ulp-level, as in the 2-proc leg).
  np.testing.assert_allclose(
      np.asarray(r0['stream_predict_means']),
      np.asarray(r0['predict_means']),
      rtol=1e-6, atol=1e-7,
  )

  # And the numbers match a single-process run of the same seeds on an
  # identically-shaped (4, 2) mesh.
  want_map, _, want_means, want_qs, want_stream, _ = _reference_fit(
      data_devices=2
  )
  np.testing.assert_allclose(
      np.asarray(r0['map_losses']), want_map, rtol=1e-5
  )
  np.testing.assert_allclose(
      np.asarray(r0['predict_means']).reshape(6, 96), want_means, rtol=1e-4
  )
  for got_q, want_q in zip(r0['predict_quantiles'], want_qs):
    np.testing.assert_allclose(np.asarray(got_q), want_q, rtol=1e-4)
  np.testing.assert_allclose(
      np.asarray(r0['stream_map_losses']), want_stream, rtol=1e-5
  )
