"""Config system tests (reference flag-system parity, SURVEY.md §5.6)."""

import dataclasses

import pytest

from triple_hybrid_rag_tpu.config import RAGConfig, get_settings, reset_settings


def test_defaults_match_reference():
    cfg = RAGConfig()
    # RRF / weights / thresholds (reference config.py:305-314, fusion.py:22)
    assert cfg.rrf_k == 60
    assert cfg.lexical_weight == pytest.approx(0.7)
    assert cfg.semantic_weight == pytest.approx(0.8)
    assert cfg.graph_weight == pytest.approx(1.0)
    assert cfg.safety_threshold == pytest.approx(0.6)
    assert cfg.denoise_alpha == pytest.approx(0.6)
    # channel top-k defaults (reference config.py:310-314)
    assert (cfg.lexical_top_k, cfg.semantic_top_k, cfg.graph_top_k) == (50, 100, 50)
    # deliberate divergence from the reference's rerank_top_k=20: the 50-deep
    # pool (= the reference reranker's own candidate cap, reranker.py:383)
    # measured +1.9pp recall@10 at 33k docs and 5/6 seed cells (config.py:113)
    assert (cfg.rerank_top_k, cfg.final_top_k) == (50, 5)
    # chunk sizing (reference rag2/chunker.py:30-51)
    assert cfg.parent_chunk_tokens == 1000
    assert cfg.child_chunk_tokens == 200
    assert cfg.child_chunk_overlap_tokens == 50
    # Matryoshka truncation (reference embedder.py:40-68)
    assert cfg.embedding_dim == 1024


def test_frozen_and_hashable():
    cfg = RAGConfig()
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.rrf_k = 10  # type: ignore[misc]
    assert hash(cfg) == hash(RAGConfig())
    assert hash(cfg) != hash(cfg.replace(rrf_k=10))


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("RAG_GRAPH_ENABLED", "false")
    monkeypatch.setenv("RAG_RRF_K", "30")
    monkeypatch.setenv("RAG_SAFETY_THRESHOLD", "0.25")
    monkeypatch.setenv("RAG_PLANNER_BACKEND", "llm")
    cfg = RAGConfig.from_env()
    assert cfg.graph_enabled is False
    assert cfg.rrf_k == 30
    assert cfg.safety_threshold == pytest.approx(0.25)
    assert cfg.planner_backend == "llm"


def test_env_optional_str_fields(monkeypatch):
    """None-default Optional[str] fields (encoder_params_path) parse from env;
    empty values keep None."""
    monkeypatch.setenv("RAG_ENCODER_PARAMS_PATH", "/some/weights.npz")
    assert RAGConfig.from_env().encoder_params_path == "/some/weights.npz"
    monkeypatch.setenv("RAG_ENCODER_PARAMS_PATH", "  ")
    assert RAGConfig.from_env().encoder_params_path is None


def test_singleton_reset(monkeypatch):
    reset_settings()
    a = get_settings()
    assert get_settings() is a
    reset_settings()
    assert get_settings() is not a


def test_round_capacity():
    cfg = RAGConfig(capacity_round=1024)
    assert cfg.round_capacity(1) == 1024
    assert cfg.round_capacity(1024) == 1024
    assert cfg.round_capacity(1025) == 2048
