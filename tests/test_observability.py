"""Observability tests (metrics/timing/trace — reference rag_metrics parity)."""

import threading

import pytest

from triple_hybrid_rag_tpu.observability.metrics import (
    DEFAULT_MS_BUCKETS,
    MetricsRegistry,
)
from triple_hybrid_rag_tpu.observability.timing import (
    debug_timed,
    enable_timing,
    reset_timing_stats,
    timing_stats,
)
from triple_hybrid_rag_tpu.observability.trace import TraceRecorder


def test_counter_inc_and_labels():
    m = MetricsRegistry()
    c = m.counter("queries_total")
    c.inc()
    c.inc(2, labels={"channel": "lexical"})
    assert c.value() == 1
    assert c.value({"channel": "lexical"}) == 2
    assert m.counter("queries_total") is c  # idempotent getter


def test_gauge_set_inc_dec():
    g = MetricsRegistry().gauge("inflight")
    g.set(5)
    g.inc()
    g.dec(2)
    assert g.value() == 4


def test_histogram_buckets_and_stats():
    m = MetricsRegistry()
    h = m.histogram("latency_ms", buckets=(10, 100, 1000))
    for v in (5, 50, 500, 5000):
        h.observe(v)
    assert h.count() == 4
    assert h.sum() == 5555
    text = m.prometheus_text()
    assert 'latency_ms_bucket{le="10"} 1' in text
    assert 'latency_ms_bucket{le="100"} 2' in text
    assert 'latency_ms_bucket{le="+Inf"} 4' in text
    assert "latency_ms_count 4" in text


def test_prometheus_exposition_format():
    m = MetricsRegistry()
    m.counter("a_total").inc(3)
    m.gauge("b_gauge").set(1.5)
    text = m.prometheus_text()
    assert "# TYPE a_total counter" in text
    assert "a_total 3" in text
    assert "b_gauge 1.5" in text


def test_time_context_manager():
    m = MetricsRegistry()
    with m.time("op_ms"):
        pass
    assert m.histogram("op_ms").count() == 1


def test_metric_type_conflict():
    m = MetricsRegistry()
    m.counter("x")
    with pytest.raises(TypeError):
        m.gauge("x")


def test_thread_safety_smoke():
    m = MetricsRegistry()
    c = m.counter("n")

    def work():
        for _ in range(1000):
            c.inc()

    threads = [threading.Thread(target=work) for _ in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert c.value() == 8000


def test_debug_timed_gated():
    reset_timing_stats()
    enable_timing(False)

    @debug_timed("myop")
    def f():
        return 42

    assert f() == 42
    assert timing_stats() == {}  # zero overhead when off
    enable_timing(True)
    try:
        f()
        f()
        stats = timing_stats()["myop"]
        assert stats["count"] == 2
        assert stats["avg_ms"] >= 0
    finally:
        enable_timing(False)
        reset_timing_stats()


def test_trace_recorder():
    r = TraceRecorder(capacity=4)
    r.query_begin("q1", "hello " * 100)  # long field gets truncated
    r.stage("q1", "fusion", 1.234)
    r.query_end("q1", 3, False)
    events = r.events()
    assert [e.event for e in events] == ["query_begin", "stage", "query_end"]
    assert len(events[0].fields["query"]) <= 200
    assert events[0].seq < events[1].seq < events[2].seq
    # ring bounded
    for i in range(10):
        r.emit("x", "q2", i=i)
    assert len(r.events()) == 4
