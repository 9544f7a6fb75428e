"""Test configuration: force an 8-device virtual CPU mesh.

The reference's CI never exercised its multi-device path (single CPU device).
Here every test runs against 8 virtual CPU devices so the sharded ensemble
path is what is actually tested.
"""

import os

import sys

# Force CPU even if the environment points at a TPU (e.g. JAX_PLATFORMS=axon):
# the test suite is designed around a deterministic 8-device virtual mesh.
# Exception: BNF_TEST_PLATFORM=tpu keeps the attached TPU so the Pallas
# tests exercise the Mosaic-COMPILED kernels instead of the interpreter
# (fewer devices — mesh-shape tests will skip/shrink; used for the
# per-round on-device evidence sweep, see PARITY.md). In TPU mode the
# default matmul precision is pinned to 'highest': the numeric-oracle
# tests compare a kernel against an XLA reference at CPU-exact f32
# tolerances, and on TPU the default f32 dot feeds the MXU bf16 operands
# with accumulation orders that differ between Mosaic and XLA — pinning
# 'highest' makes both sides compute exact f32 so the same tolerances
# hold (the bf16 fast path has its own explicitly-tolerated tests).
_TEST_PLATFORM = os.environ.get('BNF_TEST_PLATFORM', 'cpu')
if _TEST_PLATFORM == 'cpu':
  os.environ['JAX_PLATFORMS'] = 'cpu'
  flags = os.environ.get('XLA_FLAGS', '')
  if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()
else:
  os.environ.setdefault('JAX_DEFAULT_MATMUL_PRECISION', 'highest')

# Persist compiled programs across suite runs: the suite is
# compile-dominated (hundreds of distinct programs, >1 s each), and the
# topology (8 virtual CPU devices) is fixed here so cache keys are stable.
# A warm cache roughly halves suite wall-clock. Opt out by setting the
# var to the empty string.
if 'JAX_COMPILATION_CACHE_DIR' not in os.environ:
  os.environ['JAX_COMPILATION_CACHE_DIR'] = os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      '.pytest_jax_cache',
  )

# Pytest plugins (e.g. jaxtyping) may import jax before this conftest runs,
# at which point jax has already bound jax_platforms from the environment —
# override it through the config API too.
if 'jax' in sys.modules:
  import jax

  if _TEST_PLATFORM == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
  else:
    jax.config.update('jax_default_matmul_precision', 'highest')

import pytest


@pytest.fixture(autouse=True, scope='module')
def _clear_jax_caches_between_modules():
  """Drop compiled executables after each test module.

  The full suite compiles hundreds of distinct programs into one process;
  on jax 0.9 the XLA:CPU JIT has been observed to segfault inside
  `backend_compile_and_load` only after ~200 in-process compilations
  (every module passes in isolation). Bounding the live-executable count
  keeps the process inside the regime that works. Modules rarely share
  program shapes, so the lost cache hits are negligible.
  """
  yield
  import jax

  jax.clear_caches()
