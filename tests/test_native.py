"""Native C++ fast-path parity tests: the .so must reproduce the Python pipeline
byte-for-byte on EN/PT corpora (tokens, vocab, CSR, term table, search results)."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu import native
from triple_hybrid_rag_tpu.analyzer import Analyzer, Vocabulary
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.index.bm25_index import build_bm25_index, tokenize_corpus

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib not built: {native.load_error()}"
)

CORPUS = [
    "The quick brown foxes jump over the lazy dogs near the river banks.",
    "A renovação do contrato não será automática; as cláusulas exigem aviso prévio.",
    "Payment schedules, invoices and receipts are processed quarterly (Q1-Q4).",
    "Os preços das ações subiram 3,5% após o anúncio das fusões e aquisições.",
    "Mixed língua text with naïve café-style wörds and UPPERCASE TERMS.",
    "",
    "short",
    "repetition repetition repetition repetition unique",
]


def test_tokenization_parity():
    cfg = RAGConfig()
    py = Analyzer(cfg)
    na = native.NativeAnalyzer(cfg)
    native_lists = na.token_lists(CORPUS)
    terms = na.vocab_terms()
    for text, ids in zip(CORPUS, native_lists):
        assert [terms[t] for t in ids] == py.tokenize(text), text


def test_vocab_parity():
    cfg = RAGConfig()
    py_tokens, py_vocab = tokenize_corpus(CORPUS, Analyzer(cfg))
    na = native.NativeAnalyzer(cfg)
    na_lists = na.token_lists(CORPUS)
    assert na.vocab_terms() == list(py_vocab.terms)
    assert na_lists == py_tokens  # identical ids in identical order


@pytest.mark.parametrize("df_cap", [0, 2])
def test_index_build_parity(df_cap):
    cfg = RAGConfig(
        capacity_round=8, doc_term_capacity=8, max_query_terms=8, bm25_df_cap=df_cap
    )
    idx_native = build_bm25_index(CORPUS, cfg)  # native path (use_native default on)
    idx_python = build_bm25_index(CORPUS, cfg.replace(use_native=False))
    np.testing.assert_array_equal(np.asarray(idx_native.offsets), np.asarray(idx_python.offsets))
    np.testing.assert_array_equal(np.asarray(idx_native.lengths), np.asarray(idx_python.lengths))
    np.testing.assert_array_equal(
        np.asarray(idx_native.postings_doc), np.asarray(idx_python.postings_doc)
    )
    np.testing.assert_allclose(
        np.asarray(idx_native.postings_tf), np.asarray(idx_python.postings_tf)
    )
    np.testing.assert_allclose(
        np.asarray(idx_native.contrib_denom_k1), np.asarray(idx_python.contrib_denom_k1)
    )
    np.testing.assert_allclose(np.asarray(idx_native.idf), np.asarray(idx_python.idf))
    assert idx_native.l_max == idx_python.l_max
    assert idx_native.overflow_docs == idx_python.overflow_docs
    # term-table: identical arrays — non-overflow rows share first-occurrence slot
    # order, overflow rows are canonicalized to term-id-ascending in both paths
    np.testing.assert_array_equal(
        np.asarray(idx_native.term_ids), np.asarray(idx_python.term_ids)
    )
    np.testing.assert_allclose(
        np.asarray(idx_native.term_weights), np.asarray(idx_python.term_weights), rtol=1e-6
    )


def test_search_parity():
    cfg = RAGConfig(capacity_round=8, doc_term_capacity=16, max_query_terms=8)
    idx_native = build_bm25_index(CORPUS, cfg)
    idx_python = build_bm25_index(CORPUS, cfg.replace(use_native=False))
    an = Analyzer(cfg)
    for q in ["quick foxes", "renovação contrato", "payment invoice receipts", "ações fusões"]:
        kws = an.tokenize(q)
        for backend in ("postings", "termtable"):
            import jax.numpy as jnp

            qt_n = jnp.asarray(idx_native.encode_query(kws))
            qt_p = jnp.asarray(idx_python.encode_query(kws))
            np.testing.assert_allclose(
                np.asarray(idx_native.score(qt_n, backend=backend)),
                np.asarray(idx_python.score(qt_p, backend=backend)),
                rtol=1e-6,
            )


def test_overflow_top_weight_selection():
    """Native overflow selection keeps the same top-weight terms as Python."""
    cfg = RAGConfig(doc_term_capacity=4, capacity_round=8, max_query_terms=8)
    docs = ["alpha beta gamma delta epsilon zeta eta theta " + "alpha " * 5, "alpha beta"]
    nat = build_bm25_index(docs, cfg)
    py = build_bm25_index(docs, cfg.replace(use_native=False))
    assert nat.overflow_docs == py.overflow_docs == 1
    ni = np.asarray(nat.term_ids)[0]
    pi = np.asarray(py.term_ids)[0]
    nat_terms = {nat.vocab.term(t) for t in ni[ni >= 0]}
    py_terms = {py.vocab.term(t) for t in pi[pi >= 0]}
    assert nat_terms == py_terms


def test_fold_parity_all_covered_codepoints():
    """Native fold tables are code-generated from analyzer.fold_char; sweep every
    covered codepoint (plus combining marks and a sample of out-of-range chars) so
    an index built by either tokenizer is queryable by the other (ADVICE round 1:
    ß/æ/Extended-B divergence made native-built vocabs OOV for Python queries)."""
    import unicodedata

    from triple_hybrid_rag_tpu.analyzer import COMBINING_RANGE, FOLD_RANGES

    cfg = RAGConfig(analyzer_stemming="none", analyzer_min_token_len=2)
    py = Analyzer(cfg)
    na = native.NativeAnalyzer(cfg)
    cps = [cp for lo, hi in FOLD_RANGES for cp in range(lo, hi)]
    cps += list(range(*COMBINING_RANGE))
    cps += [0x3B1, 0x410, 0x4E2D, 0x1F600]  # Greek, Cyrillic, CJK, emoji: separators
    # embed each codepoint mid-token: fold differences change the token string
    texts = [f"qz{chr(cp)}qz" for cp in cps]
    # also NFD'd forms of precomposed chars (combining-mark skip path)
    texts += [f"qz{unicodedata.normalize('NFD', chr(cp))}qz" for cp in range(0xC0, 0x100)]
    native_lists = na.token_lists(texts)
    terms = na.vocab_terms()
    for text, ids in zip(texts, native_lists):
        assert [terms[t] for t in ids] == py.tokenize(text), (
            f"codepoint U+{ord(text[2]):04X} diverged"
        )


def test_empty_and_edge_inputs():
    cfg = RAGConfig(capacity_round=8)
    na = native.NativeAnalyzer(cfg)
    assert na.token_lists([""]) == [[]]
    assert na.token_lists(["   \n\t  "]) == [[]]
    idx = build_bm25_index([], cfg)
    assert idx.n_docs == 0


def test_build_library_helper():
    assert native.build_library() is True


def test_native_folds_kelvin_and_angstrom_signs():
    """U+212A/U+212B fold like Python str.lower() ('k'/'a') — previously the only
    two codepoints where the native and Python tokenizers diverged (scientific
    text: a natively-built index was unqueryable for such terms)."""
    from triple_hybrid_rag_tpu import native as native_mod

    if not native_mod.available():
        pytest.skip("native library not built")
    from triple_hybrid_rag_tpu.analyzer import Analyzer
    from triple_hybrid_rag_tpu.config import RAGConfig

    cfg = RAGConfig()
    text = "temperature 300K kelvin Ångstrom units"
    py = Analyzer(cfg).tokenize(text)
    na = native_mod.NativeAnalyzer(cfg)
    tokens, offs = na.tokenize_batch([text])
    native_terms = [na.vocab_terms()[t] for t in tokens]
    assert native_terms == py, (native_terms, py)
