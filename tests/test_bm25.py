"""BM25 engine tests: both device layouts vs an independent NumPy oracle
(SURVEY.md §4.2 tier 1: pure-jnp unit tests vs NumPy oracles)."""

import math

import numpy as np
import pytest

from triple_hybrid_rag_tpu.analyzer import Analyzer
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.index.bm25_index import build_bm25_index

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a fast auburn fox leaped across a sleepy canine",
    "payment terms require settlement within thirty days of invoice",
    "the contract termination clause requires ninety days notice",
    "quarterly payment schedules and invoice processing procedures",
    "brown bears and red foxes inhabit the northern forest",
    "notice of termination must be delivered in writing",
    "the fox is a small omnivorous mammal",
]


def numpy_bm25_oracle(docs_tokens, query_tokens, k1, b):
    """Independent Okapi BM25 implementation (term-frequency dicts, pure Python/NumPy)."""
    n = len(docs_tokens)
    dls = np.array([len(d) for d in docs_tokens], dtype=np.float64)
    avgdl = dls.mean()
    df = {}
    for toks in docs_tokens:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    scores = np.zeros(n)
    for t in set(query_tokens):
        if t not in df:
            continue
        idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
        for d, toks in enumerate(docs_tokens):
            tf = toks.count(t)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * dls[d] / avgdl)
            scores[d] += idf * tf * (k1 + 1) / denom
    return scores


@pytest.fixture
def cfg(small_config):
    return small_config


@pytest.fixture
def index(cfg):
    return build_bm25_index(DOCS, cfg)


@pytest.mark.parametrize("backend", ["postings", "termtable"])
@pytest.mark.parametrize(
    "query",
    [
        "quick brown fox",
        "payment invoice",
        "termination notice period",
        "fox",
        "nonexistent zebra tokens",
        "the a of",  # all stopwords -> empty query
    ],
)
def test_scores_match_numpy_oracle(index, cfg, backend, query):
    analyzer = Analyzer(cfg)
    docs_tokens = [analyzer.tokenize(d) for d in DOCS]
    q_tokens = analyzer.tokenize(query)

    oracle = numpy_bm25_oracle(docs_tokens, q_tokens, cfg.bm25_k1, cfg.bm25_b)
    import jax.numpy as jnp

    qt = jnp.asarray(index.encode_query(q_tokens))
    got = np.asarray(index.score(qt, backend=backend))[: len(DOCS)]
    np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-5)


def test_backends_agree(index, cfg):
    import jax.numpy as jnp

    analyzer = Analyzer(cfg)
    for q in ["fox forest", "payment termination", "invoice days notice"]:
        qt = jnp.asarray(index.encode_query(analyzer.tokenize(q)))
        a = np.asarray(index.score(qt, backend="postings"))
        b = np.asarray(index.score(qt, backend="termtable"))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_search_returns_relevant_top1(index, cfg):
    analyzer = Analyzer(cfg)
    ids, scores = index.search(analyzer.tokenize("payment invoice settlement"))
    ids = np.asarray(ids)
    assert ids[0] == 2  # the payment-terms doc
    s = np.asarray(scores)
    assert s[0] >= s[1] or ids[1] == -1


def test_search_masks_nonmatching(index, cfg):
    analyzer = Analyzer(cfg)
    ids, scores = index.search(analyzer.tokenize("zebra quantum"))
    assert np.all(np.asarray(ids) == -1)
    assert np.all(np.isinf(np.asarray(scores)))


def test_empty_query(index):
    ids, _ = index.search([])
    assert np.all(np.asarray(ids) == -1)


def test_duplicate_query_terms_not_double_counted(index, cfg):
    import jax.numpy as jnp

    analyzer = Analyzer(cfg)
    q1 = jnp.asarray(index.encode_query(analyzer.tokenize("fox")))
    q2 = jnp.asarray(index.encode_query(analyzer.tokenize("fox fox fox")))
    np.testing.assert_allclose(
        np.asarray(index.score(q1)), np.asarray(index.score(q2)), rtol=1e-6
    )


def test_capacity_padding_scores_zero(index):
    import jax.numpy as jnp

    analyzer_cfg = index.config
    qt = jnp.asarray(index.encode_query(["fox"]))
    scores = np.asarray(index.score(qt))
    assert scores.shape[0] == index.n_pad
    assert np.all(scores[len(DOCS):] == 0.0)


@pytest.mark.parametrize(
    "query",
    ["quick brown fox", "payment invoice", "fox", "nonexistent zebra", "the a of"],
)
def test_sorted_topk_matches_dense_path(index, cfg, query):
    """score_postings_topk (sort-based sparse) must agree with dense scoring + top-k."""
    import jax.numpy as jnp

    analyzer = Analyzer(cfg)
    qt = jnp.asarray(index.encode_query(analyzer.tokenize(query)))
    ids_s, vals_s = index.search_sorted(qt, 8)
    dense_scores = np.asarray(index.score(qt, backend="postings"))
    ids_s, vals_s = np.asarray(ids_s), np.asarray(vals_s)
    # every returned (id, score) must match the dense score exactly
    for i, v in zip(ids_s, vals_s):
        if i >= 0:
            assert dense_scores[i] == pytest.approx(v, rel=1e-4)
    # the returned set must be the true top-k of the dense scores
    want = set(np.where(dense_scores > 0)[0][np.argsort(-dense_scores[dense_scores > 0])][:8])
    got = set(ids_s[ids_s >= 0].tolist())
    assert got == want


def test_df_cap_truncates_but_keeps_high_tf():
    cfg = RAGConfig(bm25_df_cap=2, capacity_round=8, max_query_terms=8, doc_term_capacity=32)
    docs = ["fox", "fox fox", "fox fox fox", "fox fox fox fox"]
    idx = build_bm25_index(docs, cfg)
    assert idx.l_max == 2
    import jax.numpy as jnp

    qt = jnp.asarray(idx.encode_query(["fox"]))
    ids, vals = idx.search_sorted(qt, 4)
    ids = np.asarray(ids)
    kept = set(ids[ids >= 0].tolist())
    assert kept == {2, 3}  # the two highest-tf docs survive the cap


def test_overflow_cap_keeps_top_weights():
    """Docs over doc_term_capacity keep their *highest-contribution* terms; the error of
    the termtable layout vs exact postings is bounded by the dropped (lowest) weights."""
    import jax.numpy as jnp

    cfg = RAGConfig(doc_term_capacity=4, capacity_round=8, max_query_terms=8)
    docs = ["alpha beta gamma delta epsilon zeta eta theta " + "alpha " * 5, "alpha beta"]
    idx = build_bm25_index(docs, cfg)
    assert idx.overflow_docs == 1

    # exact per-term contributions for doc 0 from the postings (ground truth)
    contribs = {}
    for term in ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]:
        qt = jnp.asarray(idx.encode_query([term]))
        contribs[term] = float(np.asarray(idx.score(qt, backend="postings"))[0])
    kept = set(
        np.asarray(idx.term_ids)[0][np.asarray(idx.term_ids)[0] >= 0].tolist()
    )
    kept_terms = {idx.vocab.term(t) for t in kept}
    assert len(kept_terms) == 4
    # every kept term's exact contribution >= every dropped term's
    dropped_terms = set(contribs) - kept_terms
    assert min(contribs[t] for t in kept_terms) >= max(contribs[t] for t in dropped_terms) - 1e-6
    # kept terms still score via termtable; dropped terms score 0 there (bounded error)
    some_kept = next(iter(kept_terms))
    qt = jnp.asarray(idx.encode_query([some_kept]))
    assert np.asarray(idx.score(qt, backend="termtable"))[0] > 0


def test_tiered_matches_untiered(index, cfg):
    """score_postings_topk_tiered must reproduce the untiered op exactly (same
    postings, same summation order via original slot keys)."""
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.ops.bm25 import score_postings_topk_tiered

    analyzer = Analyzer(cfg)
    for q in ["quick brown fox", "payment invoice", "fox forest", "the a of"]:
        kws = analyzer.tokenize(q)
        qt = jnp.asarray(index.encode_query(kws))
        ids_u, vals_u = index.search_sorted(qt, 8)
        st, ss, lt, ls = index.encode_query_tiered(kws)
        ids_t, vals_t = score_postings_topk_tiered(
            index.offsets, index.lengths, index.postings_doc, index.postings_weight,
            jnp.asarray(st), jnp.asarray(ss), jnp.asarray(lt), jnp.asarray(ls),
            l_small=min(cfg.bm25_small_window, index.l_max),
            l_max=index.l_max, n_pad=index.n_pad, top_k=8,
        )
        np.testing.assert_array_equal(np.asarray(ids_u), np.asarray(ids_t)), q
        np.testing.assert_array_equal(np.asarray(vals_u), np.asarray(vals_t)), q
