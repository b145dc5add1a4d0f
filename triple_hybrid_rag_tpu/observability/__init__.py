"""Observability: metrics, debug timing, structured trace events.

Parity with the reference's observability stack (SURVEY.md §5.1/§5.5):
``rag_metrics`` singleton with Prometheus text exposition
(``/root/reference/src/voice_agent/observability/rag_metrics.py:24-481``), ``@debug_timed``
aggregating decorator (``observability/timing.py:29-54``), and typed trace events
(``observability/trace.py:40-120``).
"""

from .metrics import MetricsRegistry, rag_metrics
from .timing import debug_timed, timing_stats, reset_timing_stats
from .trace import Trace, TraceRecorder

__all__ = [
    "MetricsRegistry",
    "rag_metrics",
    "debug_timed",
    "timing_stats",
    "reset_timing_stats",
    "Trace",
    "TraceRecorder",
]
