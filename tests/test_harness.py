"""Scenario tool-harness tests (reference tool_tests/harness parity)."""

import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.facade import RAG
from triple_hybrid_rag_tpu.harness import (
    HarnessRunner,
    Scenario,
    expect_refusal,
    expect_sources,
    expect_success,
    expect_text_contains,
)
from triple_hybrid_rag_tpu.tools import make_knowledge_tools


@pytest.fixture
def registry(small_config):
    cfg = small_config.replace(
        graph_enabled=True, embedding_dtype="float32", safety_threshold=0.6,
        rerank_backend="maxsim",
    )
    rag = RAG(config=cfg)
    rag.ingest_text(
        "Acme Corp settles invoices within thirty days. Maria Silva works for Acme Corp.",
        name="pay.md",
    )
    return make_knowledge_tools(rag)


def test_harness_runs_and_summarizes(registry):
    runner = HarnessRunner(registry)
    summary = runner.run(
        [
            Scenario("hit", "search_knowledge_base", {"query": "invoice settlement days"},
                     [expect_success, expect_sources(1), expect_text_contains("invoices")]),
            Scenario("refusal", "search_knowledge_base", {"query": "qqq zzz gibberish"},
                     [expect_refusal]),
            Scenario("entity", "lookup_entity", {"name": "Acme Corp"}, [expect_success]),
        ]
    )
    assert summary["total"] == 3
    assert summary["passed"] == 3
    assert all(r["duration_ms"] >= 0 for r in summary["results"])


def test_harness_reports_failures(registry):
    runner = HarnessRunner(registry)
    summary = runner.run(
        [Scenario("wrong_expectation", "search_knowledge_base",
                  {"query": "invoice settlement days"}, [expect_refusal])]
    )
    assert summary["failed"] == 1
    assert summary["results"][0]["failures"]


def test_unknown_tool_scenario(registry):
    runner = HarnessRunner(registry)
    summary = runner.run([Scenario("nope", "no_such_tool", {}, [expect_success])])
    assert summary["failed"] == 1
