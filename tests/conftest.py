"""Test configuration: force a virtual 8-device CPU platform for sharding tests.

The reference gates its E2E tests on a live Postgres (``tests/test_rag2_e2e.py:36-39``); the
TPU-native analogue is an 8-device virtual CPU mesh via
``--xla_force_host_platform_device_count`` so multi-chip sharding compiles and executes
without TPU hardware (SURVEY.md §4.2). Must run before the first ``import jax``.
"""

import os

# NOTE: this environment pre-imports jax and force-selects an 'axon' TPU platform via
# sitecustomize (JAX_PLATFORMS=axon in the outer env). Backends initialize lazily, so
# overriding the config here — before any array is created — pins the suite to the
# virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from triple_hybrid_rag_tpu.config import RAGConfig, reset_settings  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_settings():
    reset_settings()
    yield
    reset_settings()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def small_config():
    """Config sized for tiny unit-test corpora (fast compiles)."""
    return RAGConfig(
        lexical_top_k=8,
        semantic_top_k=8,
        graph_top_k=8,
        rerank_top_k=8,
        final_top_k=5,
        max_query_terms=8,
        doc_term_capacity=32,
        capacity_round=8,
        embedding_dim=32,
        embedding_dim_full=64,
        maxsim_dim=16,
        maxsim_doc_tokens=16,
        maxsim_query_tokens=8,
        graph_max_degree=8,
        graph_max_entities_per_chunk=8,
        # hash embedder keeps unit-test compiles tiny; the packaged trained encoder
        # ("auto" default) gets its own dedicated tests (test_pretrain.py)
        embedder_backend="bowhash",
        ner_retry_sleep_cap_s=0.01,  # retry-ladder tests must not sleep for real
    )


# Deterministic hash-seeded embeddings: same text => same vector. This mirrors the
# reference's E2E mock-embedding strategy (tests/test_rag2_e2e.py:46-58).
def hash_embedding(text: str, dim: int) -> np.ndarray:
    import hashlib

    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
    g = np.random.default_rng(seed)
    v = g.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture
def hash_embedder():
    return hash_embedding
