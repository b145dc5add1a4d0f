"""Model layer: embedders, query planner, rerankers, entity extraction.

The reference delegates all model inference to external OpenAI-compatible HTTP servers
(vLLM/LM Studio Qwen3-VL family, OpenAI GPT-5 — SURVEY.md layer map "model-serving
boundary"). Here the default models run *on the same TPU mesh as the indexes* (batched
on-mesh inference), with deterministic hash-based fallbacks for tests and a pluggable
host-callable protocol for wiring external model servers when desired.
"""

from .embedder import BowHashEmbedder, Embedder, HashEmbedder
from .http_clients import (
    HTTPChatJSON,
    HTTPEmbedder,
    HTTPRerankerFn,
    HTTPVisionOCR,
    make_extractor_fn,
    make_planner_fn,
    wire_http_models,
)
from .planner import QueryPlanner, RuleBasedPlanner

__all__ = [
    "Embedder",
    "HashEmbedder",
    "BowHashEmbedder",
    "QueryPlanner",
    "RuleBasedPlanner",
    "HTTPEmbedder",
    "HTTPRerankerFn",
    "HTTPChatJSON",
    "HTTPVisionOCR",
    "make_planner_fn",
    "make_extractor_fn",
    "wire_http_models",
]
