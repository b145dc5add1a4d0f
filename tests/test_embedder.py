"""Embedder tests: determinism, similarity structure, degradation ladder."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.models.embedder import (
    BowHashEmbedder,
    FailSoftEmbedder,
    HashEmbedder,
)


def test_hash_embedder_deterministic_unit():
    e = HashEmbedder(dim=64)
    a = e.embed_query("hello world")
    b = e.embed_query("hello world")
    np.testing.assert_array_equal(a, b)
    assert np.isclose(np.linalg.norm(a), 1.0, atol=1e-5)
    c = e.embed_query("different")
    assert abs(a @ c) < 0.5  # near-orthogonal


def test_hash_embedder_batch_matches_single():
    e = HashEmbedder(dim=32)
    batch = e.embed_texts(["a", "b"])
    np.testing.assert_array_equal(batch[0], e.embed_query("a"))
    assert e.embed_texts([]).shape == (0, 32)


def test_bow_embedder_similarity_structure():
    e = BowHashEmbedder(dim=256, config=RAGConfig())
    a = e.embed_query("payment invoice billing schedule")
    b = e.embed_query("invoice payment for billing")
    c = e.embed_query("fox wildlife forest habitat")
    assert a @ b > 0.6  # shared vocabulary -> similar
    assert a @ c < 0.3  # disjoint vocabulary -> dissimilar


def test_bow_embedder_empty_text():
    e = BowHashEmbedder(dim=64, config=RAGConfig())
    assert not np.any(e.embed_texts(["the a of"])[0])  # all stopwords -> zero vector
    with pytest.raises(ValueError):
        e.embed_query("the a of")


def test_failsoft_wrapper_zero_vectors():
    class Flaky:
        dim = 16

        def embed_texts(self, texts):
            raise RuntimeError("bulk endpoint down")

        def embed_query(self, text):
            if "bad" in text:
                raise RuntimeError("boom")
            return np.ones(16, np.float32)

    e = FailSoftEmbedder(Flaky())
    out = e.embed_texts(["ok", "bad one", "ok2"])
    assert out.shape == (3, 16)
    assert np.all(out[1] == 0) and np.all(out[0] == 1)
    assert e.last_errors == [1]
