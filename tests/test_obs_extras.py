"""Logging config + latency visualization tests."""

import io
import json
import logging

from triple_hybrid_rag_tpu.observability.latency_viz import (
    render_summary,
    render_waterfall,
    stage_summary,
)
from triple_hybrid_rag_tpu.observability.logging_config import configure_logging, get_logger
from triple_hybrid_rag_tpu.observability.trace import TraceRecorder


def test_json_logging():
    stream = io.StringIO()
    logger = configure_logging(level="DEBUG", fmt="json", stream=stream, logger_name="thr_test")
    logger.info("hello %s", "world", extra={"ctx_query_id": "q1"})
    line = stream.getvalue().strip()
    payload = json.loads(line)
    assert payload["message"] == "hello world"
    assert payload["level"] == "info"
    assert payload["query_id"] == "q1"


def test_text_logging():
    stream = io.StringIO()
    logger = configure_logging(fmt="text", stream=stream, logger_name="thr_test2")
    logger.warning("careful")
    assert "careful" in stream.getvalue()
    assert get_logger("thr_test2") is logger


def test_stage_summary_and_render():
    r = TraceRecorder()
    for ms in (1.0, 2.0, 3.0):
        r.stage("q", "fusion", ms)
    r.stage("q", "rerank", 10.0)
    summary = stage_summary(r)
    assert summary["fusion"]["count"] == 3
    assert summary["fusion"]["p50_ms"] == 2.0
    text = render_summary(r)
    assert "rerank" in text and "fusion" in text
    assert "█" in text
    assert render_summary(TraceRecorder()) == "(no stage traces recorded)"


def test_render_waterfall():
    text = render_waterfall({"planning_ms": 1.0, "retrieval_ms": 3.0, "total_ms": 4.0})
    assert "planning_ms" in text and "total" in text


def test_end_to_end_viz_from_retriever(small_config):
    """The retriever's trace emission feeds the visualizer."""
    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.corpus import CorpusStore
    from triple_hybrid_rag_tpu.observability.trace import tracer
    from triple_hybrid_rag_tpu.retrieval import Retriever

    tracer.clear()
    cfg = small_config.replace(graph_enabled=False, embedding_dtype="float32",
                               safety_threshold=0.2)
    store = CorpusStore()
    p, c = HierarchicalChunker(cfg).chunk_document(
        "Invoices settle in thirty days.", hashlib.sha256(b"x").hexdigest()
    )
    store.add_chunks(p, c)
    Retriever(store, cfg).retrieve("invoice settlement")
    assert "retrieval_ms" in render_summary(tracer) or "fusion_ms" in render_summary(tracer)
