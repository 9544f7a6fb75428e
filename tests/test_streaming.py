"""Host-streaming minibatch pipeline tests.

The streaming regime (`stream_chunk_steps`) keeps the dataset in host RAM
and ships batches in slices of S steps (`parallel/streaming.py`). Its
invariants, each tested here:

- slice-size invariance: the slice size is pure transfer granularity —
  results are BIT-identical for any `stream_chunk_steps`.
- backend agreement: the same host batch sequence drives both shard_map
  kernels ('xla' and 'pallas').
- shard-count invariance: a streamed batch splits over the 'data' axis
  and losses/grads psum — shard count only reassociates the sums.
- deterministic replay: epoch permutations derive from (seed, epoch), so
  checkpoint resume reproduces the uninterrupted run bit-for-bit without
  storing stream state.
"""

import numpy as np
import pandas as pd
import jax
import pytest

from bayesnf_tpu.inference import map as map_lib
from bayesnf_tpu.models import field as field_lib
from bayesnf_tpu.models import likelihoods
from bayesnf_tpu.parallel import mesh as mesh_lib
from bayesnf_tpu.parallel import streaming as streaming_lib
from bayesnf_tpu.spatiotemporal import BayesianNeuralFieldMAP


def _setup(n=50):
  config = field_lib.FieldConfig.create(
      width=8, depth=1, input_scales=[30.0, 1.0], fourier_degrees=[2, 2],
      interactions=[], seasonality_periods=[8.0], num_seasonal_harmonics=[2],
  )
  rng = np.random.default_rng(1)
  x = np.stack(
      [np.arange(n, dtype=np.float32), rng.normal(size=n).astype(np.float32)],
      -1,
  )
  y = (x[:, 1] + np.sin(x[:, 0] / 5)).astype(np.float32)
  aug = field_lib.aug_features_host(config, x)
  return config, aug, y


def _run(config, aug, y, **kwargs):
  kwargs.setdefault('backend', 'xla')
  return map_lib.ensemble_map(
      aug, y, config, likelihoods.LikelihoodDist.NORMAL,
      ensemble_size=3, learning_rate=0.01, num_epochs=4,
      seed=jax.random.PRNGKey(0), batch_size=10, **kwargs,
  )


class TestHostBatchStream:

  def test_each_epoch_is_a_permutation(self):
    _, aug, y = _setup(n=23)
    stream = streaming_lib.HostBatchStream(
        aug.T, y, batch_size=5, seed=jax.random.PRNGKey(3)
    )
    # 4 batches/epoch (ragged tail of 3 rows dropped).
    for epoch in range(2):
      rows = [stream._batch_rows(epoch * 4 + b) for b in range(4)]
      flat = np.concatenate(rows)
      assert len(np.unique(flat)) == 20  # no repeats within an epoch
    # Different epochs draw different permutations...
    e0 = np.concatenate([stream._batch_rows(b) for b in range(4)])
    e1 = np.concatenate([stream._batch_rows(4 + b) for b in range(4)])
    assert not np.array_equal(e0, e1)
    # ...but replay is deterministic (resume contract): a fresh stream at
    # the same seed reproduces any step's batch, in any order.
    replay = streaming_lib.HostBatchStream(
        aug.T, y, batch_size=5, seed=jax.random.PRNGKey(3)
    )
    for step in (7, 0, 5, 3):
      np.testing.assert_array_equal(
          replay._batch_rows(step), stream._batch_rows(step)
      )

  def test_per_step_resample_is_cheap_and_deterministic(self):
    _, aug, y = _setup(n=23)
    stream = streaming_lib.HostBatchStream(
        aug.T, y, batch_size=5, seed=jax.random.PRNGKey(3),
        per_step_resample=True,
    )
    for step in (0, 1, 9):
      rows = stream._batch_rows(step)
      assert len(np.unique(rows)) == 5  # without replacement
      np.testing.assert_array_equal(
          rows,
          streaming_lib.step_sample(stream._entropy, step, 23, 5),
      )
    assert not np.array_equal(stream._batch_rows(0), stream._batch_rows(1))
    # O(batch) per step, not O(N): a huge virtual dataset must not stall
    # batch assembly (a full permutation at this size takes ~10 s).
    import time

    t0 = time.perf_counter()
    big = streaming_lib.step_sample(stream._entropy, 0, 10**8, 4096)
    assert time.perf_counter() - t0 < 1.0
    assert len(np.unique(big)) == 4096

  def test_slices_tile_the_step_range(self):
    _, aug, y = _setup(n=20)
    stream = streaming_lib.HostBatchStream(
        aug.T, y, batch_size=5, seed=jax.random.PRNGKey(0)
    )
    seen = []
    for step, aug_s, y_s in stream.slices(2, 9, 4):
      assert aug_s.shape[1:] == (aug.shape[1], 5)
      assert aug_s.shape[0] == y_s.shape[0]
      seen.extend(range(step, step + aug_s.shape[0]))
    assert seen == list(range(2, 11))


class TestStreamingTrainer:

  def test_slice_size_is_bit_invariant(self):
    config, aug, y = _setup()
    mesh = mesh_lib.default_mesh(jax.devices()[:4], data_devices=2)
    p1, l1 = _run(config, aug, y, mesh=mesh, stream_chunk_steps=3)
    p2, l2 = _run(config, aug, y, mesh=mesh, stream_chunk_steps=20)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for a, b in zip(p1, p2):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_pallas_kernel_agrees_with_xla(self):
    config, aug, y = _setup()
    mesh = mesh_lib.default_mesh(jax.devices()[:4], data_devices=2)
    p_x, _ = _run(config, aug, y, mesh=mesh, stream_chunk_steps=3)
    p_p, _ = _run(
        config, aug, y, mesh=mesh, stream_chunk_steps=3, backend='pallas'
    )
    for a, b in zip(p_x, p_p):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
      )

  def test_data_shard_count_only_reassociates(self):
    config, aug, y = _setup()
    mesh1 = mesh_lib.default_mesh(jax.devices()[:4], data_devices=1)
    mesh2 = mesh_lib.default_mesh(jax.devices()[:4], data_devices=2)
    p1, _ = _run(config, aug, y, mesh=mesh1, stream_chunk_steps=3)
    p2, _ = _run(config, aug, y, mesh=mesh2, stream_chunk_steps=3)
    for a, b in zip(p1, p2):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
      )

  def test_checkpoint_resume_is_bit_exact(self, tmp_path):
    config, aug, y = _setup()
    p_ref, l_ref = _run(config, aug, y, stream_chunk_steps=3)
    ckdir = str(tmp_path / 'ck')
    # Interrupted run: 2 of 4 epochs, then resume to 4.
    map_lib.ensemble_map(
        aug, y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=3, learning_rate=0.01, num_epochs=2,
        seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
        stream_chunk_steps=3, checkpoint_dir=ckdir, checkpoint_every=2,
    )
    p_res, l_res = _run(
        config, aug, y, stream_chunk_steps=3,
        checkpoint_dir=ckdir, checkpoint_every=2,
    )
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_res))
    for a, b in zip(p_ref, p_res):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_streaming_checkpoint_refuses_on_device_resume(self, tmp_path):
    # The stream's shared host permutation differs from the on-device
    # per-member scheme; resuming across the two would silently change
    # every subsequent batch, so the fingerprint must refuse.
    config, aug, y = _setup()
    ckdir = str(tmp_path / 'ck')
    map_lib.ensemble_map(
        aug, y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=3, learning_rate=0.01, num_epochs=2,
        seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
        stream_chunk_steps=3, checkpoint_dir=ckdir, checkpoint_every=2,
    )
    with pytest.raises(ValueError, match='different configuration'):
      map_lib.ensemble_map(
          aug, y, config, likelihoods.LikelihoodDist.NORMAL,
          ensemble_size=3, learning_rate=0.01, num_epochs=4,
          seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
          checkpoint_dir=ckdir, checkpoint_every=2,
      )

  def test_full_batch_stream_raises(self):
    config, aug, y = _setup()
    with pytest.raises(ValueError, match='minibatch'):
      map_lib.ensemble_map(
          aug, y, config, likelihoods.LikelihoodDist.NORMAL,
          ensemble_size=3, learning_rate=0.01, num_epochs=4,
          seed=jax.random.PRNGKey(0), batch_size=None, backend='xla',
          stream_chunk_steps=3,
      )

  def test_indivisible_sharded_batch_raises(self):
    config, aug, y = _setup()
    mesh = mesh_lib.default_mesh(jax.devices()[:4], data_devices=2)
    with pytest.raises(ValueError, match='data_shards'):
      map_lib.ensemble_map(
          aug, y, config, likelihoods.LikelihoodDist.NORMAL,
          ensemble_size=3, learning_rate=0.01, num_epochs=4,
          seed=jax.random.PRNGKey(0), batch_size=7, mesh=mesh,
          backend='xla', stream_chunk_steps=3,
      )


class TestVIStreaming:

  def _run_vi(self, config, aug, y, **kwargs):
    from bayesnf_tpu.inference import vi as vi_lib

    kwargs.setdefault('backend', 'xla')
    kwargs.setdefault('num_epochs', 6)
    kwargs.setdefault('batch_size', 10)
    return vi_lib.fit_vi(
        aug, y, jax.random.PRNGKey(0), 'NORMAL', config,
        ensemble_size=3, learning_rate=0.01,
        sample_size_divergence=2, sample_size_posterior=2, **kwargs,
    )

  def test_slice_size_is_bit_invariant(self):
    config, aug, y = _setup(n=40)
    mesh = mesh_lib.default_mesh(jax.devices()[:4], data_devices=2)
    s1, l1, _ = self._run_vi(config, aug, y, mesh=mesh, stream_chunk_steps=2)
    s2, l2, _ = self._run_vi(config, aug, y, mesh=mesh, stream_chunk_steps=6)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for a, b in zip(s1[0] + s1[1], s2[0] + s2[1]):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_pallas_kernel_agrees_with_xla(self):
    config, aug, y = _setup(n=40)
    mesh = mesh_lib.default_mesh(jax.devices()[:4], data_devices=2)
    s_x, _, _ = self._run_vi(config, aug, y, mesh=mesh, stream_chunk_steps=2)
    s_p, _, _ = self._run_vi(
        config, aug, y, mesh=mesh, stream_chunk_steps=2, backend='pallas'
    )
    for a, b in zip(s_x[0] + s_x[1], s_p[0] + s_p[1]):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-5
      )

  def test_checkpoint_resume_is_bit_exact(self, tmp_path):
    config, aug, y = _setup(n=40)
    s_ref, l_ref, _ = self._run_vi(config, aug, y, stream_chunk_steps=2)
    ckdir = str(tmp_path / 'ck')
    self._run_vi(
        config, aug, y, num_epochs=4, stream_chunk_steps=2,
        checkpoint_dir=ckdir, checkpoint_every=2,
    )
    s_res, l_res, _ = self._run_vi(
        config, aug, y, stream_chunk_steps=2,
        checkpoint_dir=ckdir, checkpoint_every=2,
    )
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_res))
    for a, b in zip(s_ref[0] + s_ref[1], s_res[0] + s_res[1]):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_full_batch_stream_raises(self):
    config, aug, y = _setup(n=40)
    with pytest.raises(ValueError, match='minibatch'):
      self._run_vi(config, aug, y, batch_size=None, stream_chunk_steps=2)

  def test_member_remix_differs_and_resumes_bit_exact(self, tmp_path):
    config, aug, y = _setup(n=40)
    kwargs = dict(stream_chunk_steps=2, stream_member_remix=True)
    s_shared, l_shared, _ = self._run_vi(config, aug, y, stream_chunk_steps=2)
    s_ref, l_ref, _ = self._run_vi(config, aug, y, **kwargs)
    assert np.all(np.isfinite(np.asarray(l_ref)))
    assert not np.array_equal(np.asarray(l_shared), np.asarray(l_ref))
    # Checkpoint resume replays identical remix windows (6 steps total,
    # checkpoint chunks of 2 steps = 1 window each).
    ckdir = str(tmp_path / 'ck')
    self._run_vi(
        config, aug, y, num_epochs=4, checkpoint_dir=ckdir,
        checkpoint_every=2, **kwargs,
    )
    s_res, l_res, _ = self._run_vi(
        config, aug, y, checkpoint_dir=ckdir, checkpoint_every=2, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_res))
    for a, b in zip(s_ref[0] + s_ref[1], s_res[0] + s_res[1]):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_member_remix_requires_streaming(self):
    config, aug, y = _setup(n=40)
    with pytest.raises(ValueError, match='host-streaming'):
      self._run_vi(config, aug, y, stream_member_remix=True)

  def test_estimator_fit_smoke(self):
    from bayesnf_tpu.spatiotemporal import BayesianNeuralFieldVI

    n = 60
    rng = np.random.default_rng(0)
    t = np.arange(n, dtype=float) % 40
    lat = rng.normal(size=n)
    y = np.sin(2 * np.pi * t / 8) * 4 + lat + 0.1 * rng.normal(size=n)
    df = pd.DataFrame({'time': t, 'lat': lat, 'y': y})
    m = BayesianNeuralFieldVI(
        width=8, depth=1, seasonality_periods=[8.0],
        feature_cols=['time', 'lat'], target_col='y',
        observation_model='NORMAL', timetype='float', standardize=['lat'],
    )
    m.fit(
        df, seed=jax.random.PRNGKey(0), ensemble_size=2, num_epochs=2,
        batch_size=15, sample_size_divergence=2, sample_size_posterior=3,
        backend='xla', stream_chunk_steps=3,
    )
    # _scale_epochs_by_batch_size: steps = 2 * (60 // 15) = 8.
    assert m.losses_.shape[-1] == 8
    assert int(np.prod(m.losses_.shape[:-1])) == 2
    assert np.isfinite(np.asarray(m.losses_)).all()
    means, _ = m.predict(df, quantiles=(0.5,))
    assert np.isfinite(np.asarray(means)).all()


class TestMemmapStreaming:

  def test_memmap_dataset_matches_ram_bitwise(self, tmp_path):
    # The larger-than-RAM regime: the augmented matrix lives in a disk
    # memmap (assembled in place by aug_features_host(out=...)), and the
    # streamed fit gathers batch rows straight from it — results must be
    # bit-identical to the in-RAM streamed fit.
    config, aug, y = _setup()
    mm = np.memmap(
        str(tmp_path / 'aug.f32'), dtype=np.float32, mode='w+',
        shape=aug.shape,
    )
    rng = np.random.default_rng(1)
    x = np.stack(
        [np.arange(50, dtype=np.float32),
         rng.normal(size=50).astype(np.float32)], -1,
    )
    out = field_lib.aug_features_host(config, x, out=mm)
    assert out is mm
    np.testing.assert_array_equal(np.asarray(mm), aug)
    p_ram, l_ram = _run(config, aug, y, stream_chunk_steps=3)
    p_mm, l_mm = _run(config, mm, y, stream_chunk_steps=3)
    np.testing.assert_array_equal(np.asarray(l_ram), np.asarray(l_mm))
    for a, b in zip(p_ram, p_mm):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_out_shape_validation(self):
    config, aug, _ = _setup(n=10)
    bad = np.empty((10, aug.shape[1] + 1), dtype=np.float32)
    with pytest.raises(ValueError, match='out must be float32'):
      field_lib.aug_features_host(
          config, aug[:, :2], out=bad
      )


class TestMemberRemix:
  """stream_member_remix: per-member device-side slice repartitioning."""

  def test_remix_differs_from_shared_but_trains(self):
    config, aug, y = _setup()
    p_shared, l_shared = _run(config, aug, y, stream_chunk_steps=3)
    p_remix, l_remix = _run(
        config, aug, y, stream_chunk_steps=3, stream_member_remix=True
    )
    assert np.all(np.isfinite(np.asarray(l_remix)))
    # Different batch composition per member => different trajectories.
    assert not np.array_equal(np.asarray(l_shared), np.asarray(l_remix))
    assert not np.array_equal(np.asarray(p_shared[0]), np.asarray(p_remix[0]))

  def test_remix_is_deterministic_in_seed(self):
    config, aug, y = _setup()
    p1, l1 = _run(
        config, aug, y, stream_chunk_steps=3, stream_member_remix=True
    )
    p2, l2 = _run(
        config, aug, y, stream_chunk_steps=3, stream_member_remix=True
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for a, b in zip(p1, p2):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_remix_pallas_agrees_with_xla(self):
    config, aug, y = _setup()
    mesh = mesh_lib.default_mesh(jax.devices()[:4], data_devices=2)
    p_x, _ = _run(
        config, aug, y, mesh=mesh, stream_chunk_steps=3,
        stream_member_remix=True,
    )
    p_p, _ = _run(
        config, aug, y, mesh=mesh, stream_chunk_steps=3,
        stream_member_remix=True, backend='pallas',
    )
    for a, b in zip(p_x, p_p):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
      )

  def test_remix_checkpoint_resume_is_bit_exact(self, tmp_path):
    config, aug, y = _setup()
    # 4 batches/epoch (n=50, batch=10 -> 5? n=50//10=5 batches/epoch);
    # checkpoint_every=2 epochs => 10-step chunks, window 5 divides them.
    kwargs = dict(stream_chunk_steps=5, stream_member_remix=True)
    p_ref, l_ref = _run(config, aug, y, **kwargs)
    ckdir = str(tmp_path / 'ck')
    map_lib.ensemble_map(
        aug, y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=3, learning_rate=0.01, num_epochs=2,
        seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
        checkpoint_dir=ckdir, checkpoint_every=2, **kwargs,
    )
    p_res, l_res = _run(
        config, aug, y, checkpoint_dir=ckdir, checkpoint_every=2, **kwargs
    )
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_res))
    for a, b in zip(p_ref, p_res):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

  def test_remix_checkpoint_refuses_shared_resume(self, tmp_path):
    # Remix and shared-permutation streams compose different batches; the
    # remix keys enter the fingerprint ONLY when remix is on (so non-remix
    # fingerprints never churn across versions), but their absence must
    # still distinguish the two schemes and refuse a cross-resume.
    config, aug, y = _setup()
    ckdir = str(tmp_path / 'ck')
    map_lib.ensemble_map(
        aug, y, config, likelihoods.LikelihoodDist.NORMAL,
        ensemble_size=3, learning_rate=0.01, num_epochs=2,
        seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
        stream_chunk_steps=5, checkpoint_dir=ckdir, checkpoint_every=2,
    )
    with pytest.raises(ValueError, match='different configuration'):
      map_lib.ensemble_map(
          aug, y, config, likelihoods.LikelihoodDist.NORMAL,
          ensemble_size=3, learning_rate=0.01, num_epochs=4,
          seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
          stream_chunk_steps=5, stream_member_remix=True,
          checkpoint_dir=ckdir, checkpoint_every=2,
      )

  def test_remix_misaligned_checkpoint_raises(self, tmp_path):
    config, aug, y = _setup()
    with pytest.raises(ValueError, match='remix window'):
      map_lib.ensemble_map(
          aug, y, config, likelihoods.LikelihoodDist.NORMAL,
          ensemble_size=3, learning_rate=0.01, num_epochs=4,
          seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
          stream_chunk_steps=3, stream_member_remix=True,
          checkpoint_dir=str(tmp_path / 'ck'), checkpoint_every=1,
      )

  def test_remix_requires_streaming(self):
    config, aug, y = _setup()
    with pytest.raises(ValueError, match='host-streaming'):
      map_lib.ensemble_map(
          aug, y, config, likelihoods.LikelihoodDist.NORMAL,
          ensemble_size=3, learning_rate=0.01, num_epochs=4,
          seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
          stream_member_remix=True,
      )

  def test_remix_misaligned_resume_extension_raises(self, tmp_path):
    # num_epochs is deliberately outside the checkpoint fingerprint
    # (extending a run is a supported resume), but with remix the resume
    # must land on a window boundary: a completed 1-epoch run here ends at
    # step 5 (5 batches/epoch), which sits mid-window for window=4 —
    # silently restarting windows there would diverge from a fresh 2-epoch
    # run's schedule, so it must raise instead.
    config, aug, y = _setup()
    ckdir = str(tmp_path / 'ck')
    base = dict(
        ensemble_size=3, learning_rate=0.01,
        seed=jax.random.PRNGKey(0), batch_size=10, backend='xla',
        stream_chunk_steps=4, stream_member_remix=True,
        checkpoint_dir=ckdir, checkpoint_every=4,
    )
    map_lib.ensemble_map(
        aug, y, config, likelihoods.LikelihoodDist.NORMAL,
        num_epochs=1, **base,
    )
    with pytest.raises(ValueError, match='window boundary'):
      map_lib.ensemble_map(
          aug, y, config, likelihoods.LikelihoodDist.NORMAL,
          num_epochs=2, **base,
      )

  def test_validate_remix_alignment_contract(self):
    streaming_lib.validate_remix_alignment(4, 0, None)
    streaming_lib.validate_remix_alignment(4, 8, 8)
    with pytest.raises(ValueError, match='remix window'):
      streaming_lib.validate_remix_alignment(4, 0, 6)
    with pytest.raises(ValueError, match='window boundary'):
      streaming_lib.validate_remix_alignment(4, 6, 8)


class TestSharedPermutationEquivalence:
  """Quantifies the documented streaming RNG deviation.

  Streaming shares ONE host permutation per epoch across all ensemble
  members (`parallel/streaming.py:20-30`); the reference permutes per
  member (`inference.py:593-597`). The claim is that the shared scheme
  costs nothing statistically — members already differ by init. This test
  measures it: same budget, same seeds, streamed vs on-device minibatch
  MAP ensembles on a held-out split, comparing RMSE, 95% coverage, fair
  CRPS, and ensemble member spread. Deterministic (fixed seeds); the
  measured values are recorded in PARITY.md.
  """

  @pytest.mark.slow
  def test_streamed_matches_on_device_ensemble_statistics(self):
    from bayesnf_tpu import metrics

    n, n_test = 360, 180
    rng = np.random.default_rng(7)
    t_all = np.arange(n + n_test, dtype=float) % 48
    lat_all = rng.normal(size=n + n_test)
    y_all = (
        np.sin(2 * np.pi * t_all / 8) * 4
        + lat_all
        + 0.3 * rng.normal(size=n + n_test)
    )
    df = pd.DataFrame({'time': t_all, 'lat': lat_all, 'y': y_all})
    train, test = df.iloc[:n], df.iloc[n:]

    def fit_and_eval(**stream_kwargs):
      m = BayesianNeuralFieldMAP(
          width=16, depth=1, seasonality_periods=[8.0],
          feature_cols=['time', 'lat'], target_col='y',
          observation_model='NORMAL', timetype='float', standardize=['lat'],
      )
      m.fit(
          train, seed=jax.random.PRNGKey(0), ensemble_size=8,
          num_epochs=150, learning_rate=0.02, batch_size=60, backend='xla',
          **stream_kwargs,
      )
      means, (q025, q975) = m.predict(test, quantiles=(0.025, 0.975))
      member_means = np.asarray(means).reshape(8, -1)
      yhat = member_means.mean(0)
      y_true = test.y.values
      return {
          'rmse': float(metrics.rmse(y_true, yhat)),
          'coverage': float(
              metrics.coverage(y_true, np.asarray(q025), np.asarray(q975))
          ),
          'crps': float(np.mean(metrics.crps_ensemble(y_true, member_means))),
          'spread': float(np.mean(member_means.std(axis=0))),
      }

    on_device = fit_and_eval()
    streamed = fit_and_eval(stream_chunk_steps=6)
    remixed = fit_and_eval(stream_chunk_steps=6, stream_member_remix=True)

    # Equal-budget agreement bands. The schemes see DIFFERENT batch
    # sequences (that is the deviation), so point-identity is impossible;
    # the bands assert point accuracy and calibration survive. Measured
    # (3-seed sweep, PARITY.md): shared batches keep RMSE/coverage but
    # correlate the members' SGD noise — spread ~0.55x, CRPS +10-17% —
    # which stream_member_remix recovers at zero extra transfer.
    for name, got in (('streamed', streamed), ('remixed', remixed)):
      assert got['rmse'] < 1.25 * on_device['rmse'] + 1e-6, (
          name, on_device, got)
      assert got['crps'] < 1.25 * on_device['crps'] + 1e-6, (
          name, on_device, got)
      assert abs(got['coverage'] - on_device['coverage']) < 0.15, (
          name, on_device, got)
    assert 0.5 < (streamed['spread'] + 1e-9) / (
        on_device['spread'] + 1e-9
    ) < 2.0, (on_device, streamed)
    # Remix restores per-member gradient-noise decorrelation: spread and
    # CRPS must land meaningfully closer to the on-device ensemble than
    # the shared-permutation stream's.
    assert remixed['spread'] > streamed['spread'], (streamed, remixed)
    assert 0.7 < (remixed['spread'] + 1e-9) / (
        on_device['spread'] + 1e-9
    ) < 1.5, (on_device, remixed)
    print('PARITY shared-permutation:', {'on_device': on_device,
                                         'streamed': streamed,
                                         'remixed': remixed})


class TestEstimatorStreaming:

  def test_fit_predict_and_learning(self):
    n = 100
    rng = np.random.default_rng(0)
    t = np.arange(n, dtype=float) % 40
    lat = rng.normal(size=n)
    y = np.sin(2 * np.pi * t / 8) * 4 + lat + 0.1 * rng.normal(size=n)
    df = pd.DataFrame({'time': t, 'lat': lat, 'y': y})
    m = BayesianNeuralFieldMAP(
        width=8, depth=1, seasonality_periods=[8.0],
        feature_cols=['time', 'lat'], target_col='y',
        observation_model='NORMAL', timetype='float', standardize=['lat'],
    )
    m.fit(
        df, seed=jax.random.PRNGKey(0), ensemble_size=8, num_epochs=120,
        learning_rate=0.02, batch_size=25, backend='xla',
        stream_chunk_steps=8,
    )
    assert m.losses_.shape == (8, 1, 120)
    assert np.mean(m.losses_[..., -10:]) < np.mean(m.losses_[..., :10])
    means, quants = m.predict(df, quantiles=(0.5,))
    yhat = np.asarray(means).mean((0, 1))
    rmse = np.sqrt(np.mean((yhat - df.y.values) ** 2))
    assert rmse < 0.8 * df.y.std()
