"""Profiling hooks: XLA trace capture and throughput counters.

The reference has no profiling at all (SURVEY.md §5 — only CLI wall-clock).
Here every fit can drop an xprof trace (`jax.profiler`) and report
member-steps/sec/chip, the framework's headline throughput metric.
"""

import contextlib
import dataclasses
import time

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
  """Capture a jax.profiler trace into `trace_dir` when it is set."""
  if not trace_dir:
    yield
    return
  with jax.profiler.trace(trace_dir):
    yield


@dataclasses.dataclass
class ThroughputReport:
  """Throughput of one training call."""

  member_steps: int
  seconds: float
  num_chips: int

  @property
  def member_steps_per_sec_per_chip(self) -> float:
    return self.member_steps / self.seconds / max(self.num_chips, 1)

  def __str__(self):
    return (
        f'{self.member_steps} member-steps in {self.seconds:.2f}s on '
        f'{self.num_chips} chip(s) = '
        f'{self.member_steps_per_sec_per_chip:.1f} member-steps/s/chip'
    )


class StepTimer:
  """Times a block and converts it to a ThroughputReport.

  Example:
    with StepTimer(member_steps=epochs * batches * ensemble) as t:
      losses = train(...)
      jax.block_until_ready(losses)
    print(t.report)
  """

  def __init__(self, member_steps: int, num_chips: int | None = None):
    self.member_steps = member_steps
    self.num_chips = num_chips or jax.device_count()
    self.report = None

  def __enter__(self):
    self._start = time.perf_counter()
    return self

  def __exit__(self, *exc):
    self.report = ThroughputReport(
        member_steps=self.member_steps,
        seconds=time.perf_counter() - self._start,
        num_chips=self.num_chips,
    )
    return False
