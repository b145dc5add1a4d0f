"""Device profiling hooks (SURVEY.md §5.1: "jax.profiler traces + per-stage device
timings" as the TPU equivalent of the reference's trace/timing stack)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Iterator


@contextlib.contextmanager
def device_trace(log_dir: str | Path = "/tmp/thr_profile") -> Iterator[Path]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto) around a block:

        with device_trace("/tmp/trace") as d:
            engine.retrieve_batch(queries)
    """
    import jax

    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Wall-clock stage timer mirroring RetrievalResult.timings aggregation for
    arbitrary host code paths."""

    def __init__(self) -> None:
        self.timings: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[f"{name}_ms"] = (time.perf_counter() - t0) * 1e3
