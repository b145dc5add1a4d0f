"""Analyzer + vocabulary tests."""

from triple_hybrid_rag_tpu.analyzer import (
    Analyzer,
    Vocabulary,
    strip_accents,
    term_frequencies,
    trigram_similarity,
)
from triple_hybrid_rag_tpu.config import RAGConfig


def test_tokenize_basic():
    a = Analyzer(RAGConfig())
    toks = a.tokenize("The quick brown Fox jumps over the lazy dog!")
    assert "the" not in toks  # stopword
    assert "fox" in toks and "quick" in toks


def test_tokenize_portuguese_accents():
    a = Analyzer(RAGConfig())
    toks = a.tokenize("A renovação do contrato não será automática")
    assert "renovacao" in toks  # accent-stripped
    assert "contrato" in toks
    assert "nao" not in toks  # PT stopword (accent-stripped form)
    assert "sera" in toks


def test_min_token_len():
    a = Analyzer(RAGConfig(analyzer_min_token_len=3))
    assert "ab" not in a.tokenize("ab abc")
    assert "abc" in a.tokenize("ab abc")


def test_keywords_order_and_dedup():
    a = Analyzer(RAGConfig())
    kws = a.keywords("payment terms payment conditions of the contract", max_keywords=3)
    assert kws == ["payment", "term", "condition"]  # light-stemmed, order-preserving


def test_stemming():
    from triple_hybrid_rag_tpu.analyzer import s_stem

    assert s_stem("receipts") == "receipt"
    assert s_stem("contratos") == "contrato"
    assert s_stem("policies") == "policy"
    assert s_stem("nacoes") == "nacao"  # accent-stripped nações
    assert s_stem("class") == "class"  # -ss preserved
    assert s_stem("bonus") == "bonus"  # -us preserved
    assert s_stem("does") == "doe"  # conservative; consistency is what matters
    a = Analyzer(RAGConfig(analyzer_stemming="none"))
    assert "receipts" in a.tokenize("receipts")


def test_strip_accents():
    assert strip_accents("ação ünïcodé") == "acao unicode"


def test_vocabulary_roundtrip():
    v = Vocabulary()
    ids = v.encode(["alpha", "beta", "alpha"], add=True)
    assert ids == [0, 1, 0]
    assert v.get("beta") == 1
    assert v.get("missing") == -1
    v2 = Vocabulary.from_list(v.to_list())
    assert v2.get("alpha") == 0 and len(v2) == 2


def test_term_frequencies_skips_oov():
    assert term_frequencies([0, 1, 1, -1, 2, 1]) == {0: 1, 1: 3, 2: 1}


def test_trigram_similarity():
    assert trigram_similarity("contrato", "contrato") == 1.0
    assert trigram_similarity("contrato", "contratos") > 0.5
    assert trigram_similarity("contrato", "zebra") < 0.2
    assert trigram_similarity("", "x") == 0.0
