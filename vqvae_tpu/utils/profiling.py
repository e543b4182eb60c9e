"""Profiling and tracing utilities.

The reference has no tracing beyond epoch timers (SURVEY.md §5); here:
- ``stage_timer``: wall-clock context manager feeding the pipeline's
  per-stage timings (the framework's headline metric),
- ``profile_trace``: ``jax.profiler`` trace context (view in TensorBoard
  or Perfetto) gated by ``VQVAE_TPU_PROFILE_DIR``,
- ``CompileStats``: counts XLA backend compiles + total compile seconds
  (remote compiles dominate one-shot runs on this platform; the pipeline
  prints the per-stage program count so regressions are visible).
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


class CompileStats:
    """Counts XLA backend compiles via jax.monitoring.

    Install once per process; ``snapshot()`` + ``delta()`` give per-stage
    counts. Thread-safe enough for the single-threaded pipeline driver.
    """

    _installed: Optional["CompileStats"] = None

    def __init__(self) -> None:
        self.count = 0
        self.seconds = 0.0

    def _on_event(self, name: str, secs: float, **kw) -> None:
        if name == "/jax/core/compile/backend_compile_duration":
            self.count += 1
            self.seconds += secs

    @classmethod
    def install(cls) -> "CompileStats":
        if cls._installed is None:
            import jax.monitoring

            inst = cls()
            jax.monitoring.register_event_duration_secs_listener(
                inst._on_event)
            cls._installed = inst
        return cls._installed

    def snapshot(self) -> Dict[str, float]:
        return {"programs": self.count, "compile_seconds": self.seconds}

    def delta(self, since: Dict[str, float]) -> Dict[str, float]:
        return {"programs": self.count - since["programs"],
                "compile_seconds": round(
                    self.seconds - since["compile_seconds"], 2)}


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
