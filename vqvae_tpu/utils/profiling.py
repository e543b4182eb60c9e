"""Profiling and tracing utilities.

The reference has no tracing beyond epoch timers (SURVEY.md §5); here:
- ``stage_timer``: wall-clock context manager feeding the pipeline's
  per-stage timings (the framework's headline metric),
- ``profile_trace``: ``jax.profiler`` trace context (view in TensorBoard
  or Perfetto) gated by ``VQVAE_TPU_PROFILE_DIR``.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def stage_timer(name: str, sink: Optional[Dict[str, float]] = None
                ) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt
        print(f"[timer] {name}: {dt:.2f}s")


@contextlib.contextmanager
def profile_trace(name: str = "trace") -> Iterator[None]:
    """Capture a jax profiler trace when VQVAE_TPU_PROFILE_DIR is set."""
    out_dir = os.environ.get("VQVAE_TPU_PROFILE_DIR")
    if not out_dir:
        yield
        return
    import jax

    path = os.path.join(out_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
    print(f"[profile] trace written to {path}")
