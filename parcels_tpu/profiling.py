"""Profiling / tracing hooks (SURVEY.md §5: TPU-build observability).

The reference has no profiler beyond tqdm + I/O counters; the TPU build
exposes the native JAX/XLA tooling instead:

- ``trace(logdir)``: context manager capturing a full device trace
  (TensorBoard / Perfetto readable) around any simulation code.
- ``annotate(name)``: named region that shows up inside the trace.
- ``ParticleSet.last_run_stats``: per-execute dict with wall time, chunk
  count and particle-steps/s (populated by every ``execute`` call).
- ``FieldSet.window_stats``: windowed-streaming load/byte counters
  (the reference WindowedArray's ``loads``/``bytes_read`` equivalent).
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["annotate", "trace"]


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a JAX device trace of the enclosed block into ``logdir``."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with annotate("rk4 chunk"): ...``."""
    return jax.profiler.TraceAnnotation(name)
