"""Hardware self-test: Pallas/XLA backend agreement on the attached device.

Qualification tool for a new chip, topology, or toolchain bump: runs the
REAL production paths (`inference.map.fit_map`, `inference.vi.fit_vi`,
`inference.predict.predict_bnf`) twice — fused-Pallas backend vs the
portable XLA backend — on a small synthetic spatiotemporal workload and
asserts the two executables agree within kernel tolerances for every
observation model. The reference has no equivalent (it ships exactly one
code path); here two independently-written backends make divergence the
key hardware/compiler risk, and this catches it in seconds on-device.

Usage:

    python -m bayesnf_tpu.cli.selftest            # current JAX backend
    python -m bayesnf_tpu.cli.selftest --epochs 50 --rows 1024

Prints one line per check and a final JSON summary; exit code is non-zero
on any disagreement. On CPU the Pallas kernels run in interpreter mode
(slow — keep --rows/--epochs small); on TPU the compiled kernels are
exercised, which is the intended use.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from bayesnf_tpu.inference import map as map_lib
from bayesnf_tpu.inference import predict as predict_lib
from bayesnf_tpu.inference import vi as vi_lib
from bayesnf_tpu.models import field as field_lib


def _workload(rows, width, seed=0):
  """Small but representative config + synthetic data (counts included)."""
  config = field_lib.FieldConfig.create(
      width=width,
      depth=2,
      input_scales=[168.0, 1.0, 1.0],
      fourier_degrees=[5, 3, 3],
      interactions=[(0, 1), (1, 2)],
      seasonality_periods=[24.0, 24.0 * 7],
      num_seasonal_harmonics=[3, 2],
  )
  rng = np.random.default_rng(seed)
  t = np.arange(rows, dtype=np.float32) % 720.0
  space = rng.normal(size=(rows, 2)).astype(np.float32)
  x = np.concatenate([t[:, None], space], axis=-1)
  rate = np.exp(
      1.0
      + 0.8 * np.sin(2 * np.pi * t / 24.0)
      + 0.3 * space[:, 0]
  )
  y_counts = rng.poisson(rate).astype(np.float32)
  y_counts[:: 11] = 0.0  # exercise the ZINB zero branch
  y_normal = (rate + rng.normal(scale=0.5, size=rows)).astype(np.float32)

  x = jnp.asarray(x)
  aug = field_lib.aug_features(config, x)
  return config, aug, jnp.asarray(y_normal), jnp.asarray(y_counts)


def _loss_agreement(name, losses_a, losses_b, rtol, checks):
  a = np.asarray(losses_a, dtype=np.float64)
  b = np.asarray(losses_b, dtype=np.float64)
  # Per-member final losses: the kernel-vs-XLA tolerance contract
  # (tests/test_inference.py uses the same comparison at CI shapes).
  # Pure relative error is well-conditioned here: losses are O(1e2) and
  # bounded away from zero. Predictions are NOT (they cross zero) — those
  # go through `_pred_agreement` instead.
  rel = np.max(np.abs(a - b) / (np.abs(b) + 1e-6))
  ok = bool(rel < rtol)
  checks.append({'check': name, 'max_rel': float(rel), 'tol': rtol, 'ok': ok})
  print(f'{"PASS" if ok else "FAIL"} {name}: max_rel={rel:.2e} (tol {rtol})')
  return ok


def _pred_agreement(name, pred_a, pred_b, rtol, data_scale, checks):
  """Scale-aware agreement for signed predictions.

  Pure relative error |a-b|/|b| is ill-conditioned where predictions cross
  zero (a 5e-4 absolute difference near b=0 reads as 'rel=0.2'). Contract:
  |a - b| <= atol + rtol * max(|a|, |b|) elementwise, with atol tied to the
  scale of the *data* (rtol * std(y)) rather than of the predictions — a
  barely-trained model predicts near zero, and the f32 kernel-vs-XLA
  forward-pass floor (~1e-4 absolute at these magnitudes) is hardware
  agreement, not divergence, whenever it is tiny against the observable
  signal.
  """
  a = np.asarray(pred_a, dtype=np.float64)
  b = np.asarray(pred_b, dtype=np.float64)
  atol = rtol * max(float(data_scale), 1e-12)
  err = np.max(np.abs(a - b) / (atol + rtol * np.maximum(np.abs(a), np.abs(b))))
  ok = bool(err <= 1.0)
  checks.append({'check': name, 'scaled_err': float(err), 'atol': atol,
                 'rtol': rtol, 'ok': ok})
  print(f'{"PASS" if ok else "FAIL"} {name}: scaled_err={err:.2e} '
        f'(tol: |a-b| <= {atol:.2e} + {rtol}*max|a|,|b|)')
  return ok


def _count_quantile_agreement(name, q_a, q_b, checks):
  """Integer quantiles sit on a discretization cliff: the root-find's ceil
  flips a whole count when the two backends' CDFs differ in the last few
  ulps at an integer boundary. Agreement contract: every row within one
  count, and at most max(1, 1% of rows) rows differ at all (the floor of
  one keeps the bound meaningful at small --rows, where a single flip
  exceeds 1%)."""
  a = np.asarray(q_a, dtype=np.float64)
  b = np.asarray(q_b, dtype=np.float64)
  max_abs = float(np.max(np.abs(a - b))) if a.size else 0.0
  mismatches = int(np.sum(a != b))
  allowed = max(1, int(np.ceil(0.01 * a.size)))
  ok = bool(max_abs <= 1.0 and mismatches <= allowed)
  checks.append({'check': name, 'max_abs_counts': max_abs,
                 'mismatches': mismatches, 'allowed_mismatches': allowed,
                 'ok': ok})
  print(f'{"PASS" if ok else "FAIL"} {name}: max_abs={max_abs:.0f} counts, '
        f'mismatches={mismatches}/{a.size} '
        f'(tol: <=1 count, <={allowed} rows)')
  return ok


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--rows', type=int, default=512)
  parser.add_argument('--width', type=int, default=64)
  parser.add_argument('--epochs', type=int, default=30)
  parser.add_argument('--ensemble', type=int, default=4)
  parser.add_argument('--rtol', type=float, default=5e-3,
                      help='relative tolerance on final per-member losses')
  parser.add_argument('--json-out', type=str, default=None,
                      help='also write the full JSON summary (per-check '
                           'detail, device, args) to this path')
  args = parser.parse_args(argv)

  backend = jax.default_backend()
  print(f'device backend: {backend} ({jax.devices()[0].device_kind})')
  config, aug, y_normal, y_counts = _workload(args.rows, args.width)

  checks = []
  t0 = time.perf_counter()
  for distribution in ('NORMAL', 'NB', 'ZINB'):
    y = y_normal if distribution == 'NORMAL' else y_counts
    results = {}
    for train_backend in ('xla', 'pallas'):
      params, losses = map_lib.fit_map(
          aug, y,
          seed=jax.random.PRNGKey(7),
          observation_model=distribution,
          config=config,
          num_particles=args.ensemble,
          learning_rate=0.005,
          num_epochs=args.epochs,
          backend=train_backend,
      )
      results[train_backend] = (params, losses[:, -1])
    _loss_agreement(
        f'map/{distribution} final losses',
        results['pallas'][1], results['xla'][1], args.rtol, checks,
    )

    # Predict agreement on the params the XLA fit produced (shared input
    # to both predict programs; count models exercise the root-finder).
    p = tuple(x[jnp.newaxis] for x in results['xla'][0])  # (1, E, ...)
    if distribution == 'NORMAL':
      normal_params = results['xla'][0]  # for the streamed-predict leg
    preds = {}
    for predict_backend in ('xla', 'pallas'):
      means, (q50, q975) = predict_lib.predict_bnf(
          aug[:, : config.num_inputs],
          distribution,
          p,
          config,
          quantiles=(0.5, 0.975),
          ensemble_dims=2,
          backend=predict_backend,
      )
      preds[predict_backend] = (means, q50, q975)
    count_model = distribution != 'NORMAL'
    for i, part in enumerate(('means', 'q50', 'q975')):
      name = f'predict/{distribution} {part}'
      if count_model and part != 'means':
        _count_quantile_agreement(
            name, preds['pallas'][i], preds['xla'][i], checks)
      else:
        _pred_agreement(
            name, preds['pallas'][i], preds['xla'][i], args.rtol,
            np.std(np.asarray(y)), checks)

  # VI: ELBO trajectory agreement (NORMAL is the representative cell; the
  # per-distribution kernel bodies are already covered by the MAP loop).
  vi_losses = {}
  vi_draws = {}
  for train_backend in ('xla', 'pallas'):
    _, losses, draws = vi_lib.fit_vi(
        aug, y_normal,
        seed=jax.random.PRNGKey(7),
        observation_model='NORMAL',
        config=config,
        ensemble_size=args.ensemble,
        learning_rate=0.01,
        num_epochs=args.epochs,
        sample_size_divergence=3,
        sample_size_posterior=4,
        kl_weight=0.1,
        backend=train_backend,
    )
    vi_losses[train_backend] = np.asarray(losses)[:, -1]
    vi_draws[train_backend] = draws
  _loss_agreement(
      'vi/NORMAL final losses',
      vi_losses['pallas'], vi_losses['xla'], args.rtol, checks,
  )

  # VI predict: the ensemble_dims=3 path (groups x samples x members) —
  # means + an exact mixture quantile over the posterior-draw ensemble,
  # backend agreement on the XLA fit's draws.
  vi_p = tuple(d[jnp.newaxis] for d in vi_draws['xla'])  # (1, E, S, ...)
  vi_preds = {}
  for predict_backend in ('xla', 'pallas'):
    means, (q50,) = predict_lib.predict_bnf(
        aug[:, : config.num_inputs], 'NORMAL', vi_p, config,
        quantiles=(0.5,), ensemble_dims=3, backend=predict_backend,
    )
    vi_preds[predict_backend] = (means, q50)
  for i, part in enumerate(('means', 'q50')):
    _pred_agreement(
        f'vi-predict/NORMAL {part}',
        vi_preds['pallas'][i], vi_preds['xla'][i], args.rtol,
        np.std(np.asarray(y_normal)), checks)

  # likelihood_model's engine: raw forecast distribution parameters
  # (loc/scale, total_count/logits/pi) must agree across backends — this
  # is the path `estimator.likelihood_model` serves distributions from.
  p_zinb = tuple(x[jnp.newaxis] for x in results['xla'][0])  # last MAP fit
  fp_by_backend = {}
  for predict_backend in ('xla', 'pallas'):
    fp_by_backend[predict_backend] = predict_lib.forecast_params_bnf(
        aug[:, : config.num_inputs], 'ZINB', p_zinb, config,
        ensemble_dims=2, backend=predict_backend,
    )
  for i, part in enumerate(('total_count', 'logits', 'pi')):
    _pred_agreement(
        f'likelihood-model/ZINB {part}',
        fp_by_backend['pallas'][i], fp_by_backend['xla'][i], args.rtol,
        float(np.std(np.asarray(fp_by_backend['xla'][i]))) or 1.0, checks)

  # Streaming: host-resident dataset shipped to the device in step slices.
  # Two on-device contracts: (a) backend agreement on a streamed minibatch
  # fit; (b) slice-size bit-invariance — the slice size is pure transfer
  # granularity and must not change the math (tests/test_streaming.py
  # proves this on the CPU interpreter; this is the compiled-device leg).
  aug_host = np.asarray(aug)
  # Streaming requires a true minibatch (batch < rows); cap at rows // 2 so
  # small --rows invocations stay legal instead of crashing the self-test.
  stream_batch = max(1, min(max(32, args.rows // 4), args.rows // 2))
  stream_losses = {}
  for train_backend in ('xla', 'pallas'):
    _, losses = map_lib.fit_map(
        aug_host, y_normal,
        seed=jax.random.PRNGKey(7),
        observation_model='NORMAL',
        config=config,
        num_particles=args.ensemble,
        learning_rate=0.005,
        num_epochs=args.epochs,
        batch_size=stream_batch,
        backend=train_backend,
        stream_chunk_steps=2,
    )
    stream_losses[train_backend] = losses
  _loss_agreement(
      'stream/NORMAL final losses',
      stream_losses['pallas'][:, -1], stream_losses['xla'][:, -1],
      args.rtol, checks,
  )
  _, losses_s3 = map_lib.fit_map(
      aug_host, y_normal,
      seed=jax.random.PRNGKey(7),
      observation_model='NORMAL',
      config=config,
      num_particles=args.ensemble,
      learning_rate=0.005,
      num_epochs=args.epochs,
      batch_size=stream_batch,
      backend='pallas',
      stream_chunk_steps=3,
  )
  bit_ok = bool(np.array_equal(stream_losses['pallas'], losses_s3))
  checks.append({'check': 'stream/NORMAL slice bit-invariance',
                 'bitwise_equal': bit_ok, 'ok': bit_ok})
  print(f'{"PASS" if bit_ok else "FAIL"} stream/NORMAL slice '
        f'bit-invariance: chunk_steps 2 vs 3 '
        f'{"bitwise equal" if bit_ok else "DIFFER"}')

  # Count-model streaming: the in-kernel Stirling gammaln path under the
  # streamed slice program, backend agreement.
  nb_stream_losses = {}
  for train_backend in ('xla', 'pallas'):
    _, losses = map_lib.fit_map(
        aug_host, y_counts,
        seed=jax.random.PRNGKey(7),
        observation_model='NB',
        config=config,
        num_particles=args.ensemble,
        learning_rate=0.005,
        num_epochs=args.epochs,
        batch_size=stream_batch,
        backend=train_backend,
        stream_chunk_steps=2,
    )
    nb_stream_losses[train_backend] = losses
  _loss_agreement(
      'stream/NB final losses',
      nb_stream_losses['pallas'][:, -1], nb_stream_losses['xla'][:, -1],
      args.rtol, checks,
  )

  # VI streaming: per-step host-resampled batches through the fused
  # kernel; backend agreement on the final ELBO.
  vi_stream_losses = {}
  for train_backend in ('xla', 'pallas'):
    _, losses, _ = vi_lib.fit_vi(
        aug_host, y_normal,
        seed=jax.random.PRNGKey(7),
        observation_model='NORMAL',
        config=config,
        ensemble_size=args.ensemble,
        learning_rate=0.01,
        num_epochs=args.epochs,
        sample_size_divergence=3,
        sample_size_posterior=2,
        kl_weight=0.1,
        batch_size=stream_batch,
        backend=train_backend,
        stream_chunk_steps=2,
    )
    vi_stream_losses[train_backend] = np.asarray(losses)[:, -1]
  _loss_agreement(
      'stream-vi/NORMAL final losses',
      vi_stream_losses['pallas'], vi_stream_losses['xla'], args.rtol, checks,
  )

  # Out-of-core streamed predict: host-chunked rows with the global-
  # bracket two-pass scheme must reproduce the in-memory predict program
  # on-device (same backend, meshless => bit-level expected; tolerance
  # guards against cross-program fusion ulps on real hardware).
  pred_backend = 'pallas' if backend == 'tpu' else 'xla'
  p_norm = tuple(x[jnp.newaxis] for x in normal_params)
  sp_kwargs = dict(
      quantiles=(0.5, 0.975), ensemble_dims=2, backend=pred_backend,
  )
  mem = predict_lib.predict_bnf(
      aug[:, : config.num_inputs], 'NORMAL', p_norm, config, **sp_kwargs
  )
  streamed = predict_lib.predict_bnf(
      np.asarray(aug[:, : config.num_inputs]), 'NORMAL', p_norm, config,
      stream_chunk_rows=max(64, args.rows // 3), **sp_kwargs
  )
  _pred_agreement(
      'stream-predict/NORMAL means', streamed[0], mem[0], args.rtol,
      np.std(np.asarray(y_normal)), checks)
  for qi, part in enumerate(('q50', 'q975')):
    _pred_agreement(
        f'stream-predict/NORMAL {part}', streamed[1][qi], mem[1][qi],
        args.rtol, np.std(np.asarray(y_normal)), checks)

  ok = all(c['ok'] for c in checks)
  summary = {
      'backend': backend,
      'ok': ok,
      'num_checks': len(checks),
      'wall_s': round(time.perf_counter() - t0, 1),
      'failed': [c['check'] for c in checks if not c['ok']],
  }
  if args.json_out:
    with open(args.json_out, 'w') as f:
      json.dump(
          {
              **summary,
              'device_kind': jax.devices()[0].device_kind,
              'num_devices': jax.device_count(),
              'args': {
                  'rows': args.rows, 'width': args.width,
                  'epochs': args.epochs, 'ensemble': args.ensemble,
                  'rtol': args.rtol,
              },
              'checks': checks,
          },
          f,
          indent=2,
      )
      f.write('\n')
  print(json.dumps(summary))
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main())
