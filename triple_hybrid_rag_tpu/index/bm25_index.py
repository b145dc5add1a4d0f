"""BM25 index build: corpus -> device arrays (both lexical layouts).

The host-side analogue of Postgres building its GIN index over ``to_tsvector`` columns
(``/root/reference/database/migrations/20260114_rag2_schema.sql:146-152,184``): run once per
(re)build, all subsequent queries are pure device compute. Produces both the CSR postings
layout and the doc-major term table (see ``ops/bm25.py`` for the layout rationale) from a
single pass over tokenized children.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..analyzer import Analyzer, Vocabulary
from ..config import RAGConfig
from ..ops.bm25 import (
    DOC_PAD,
    QUERY_PAD,
    score_postings,
    score_termtable,
)
from ..ops.topk import masked_top_k


@dataclass
class BM25Index:
    """Device-resident lexical index. All arrays are jnp; static ints specialize jits."""

    # CSR postings layout
    offsets: jax.Array  # i32[V + 1]
    lengths: jax.Array  # i32[V]
    postings_doc: jax.Array  # i32[nnz + l_max]
    postings_tf: jax.Array  # f32[nnz + l_max]
    # doc-major term-table layout
    term_ids: jax.Array  # i32[n_pad, L]
    term_weights: jax.Array  # f32[n_pad, L] precomputed BM25 contributions
    # shared per-doc stats
    contrib_denom_k1: jax.Array  # f32[n_pad]
    idf: jax.Array  # f32[V]
    # static metadata
    n_docs: int
    n_pad: int
    l_max: int  # max document frequency (postings window)
    vocab: Vocabulary
    config: RAGConfig
    overflow_docs: int = 0  # docs whose unique terms exceeded doc_term_capacity
    # host NumPy copies of the CSR (offsets, lengths, postings_doc, postings_tf):
    # kept so re-sharding never reads device arrays back (device->host is the slow
    # direction on tunneled dev chips; on production hosts it merely saves a copy)
    host_csr: Optional[tuple] = None
    # precomputed per-posting BM25 contribution (idf + tf saturation + length norm
    # folded at build): the query path gathers (doc, weight) only
    postings_weight: Optional[jax.Array] = None  # f32[nnz + l_max]
    host_weights: Optional[np.ndarray] = None

    def encode_query(self, keywords: Sequence[str]) -> np.ndarray:
        """Keywords -> padded i32[max_query_terms] term-id vector (OOV/pad = -1).

        Host-side query analysis, mirroring ``plainto_tsquery`` at the SQL boundary."""
        q = self.config.max_query_terms
        ids: List[int] = []
        seen: set[int] = set()
        for kw in keywords:
            tid = self.vocab.get(kw)
            if tid >= 0 and tid not in seen:
                seen.add(tid)
                ids.append(tid)
            if len(ids) >= q:
                break
        out = np.full((q,), QUERY_PAD, dtype=np.int32)
        out[: len(ids)] = ids
        return out

    def encode_query_tiered(self, keywords: Sequence[str]):
        """Split encoded query terms into (small, large) df tiers for the tiered sorted
        path. Returns (small_terms, small_slots, large_terms, large_slots) padded i32
        arrays; slots are the ORIGINAL query positions (ulp-exact order parity).
        Large-tier overflow drops the most common terms (least informative)."""
        qt = self.encode_query(keywords)
        if self.host_csr is not None:
            stored_df = np.asarray(self.host_csr[1])
        else:
            stored_df = np.asarray(self.lengths)
        qs_cap = self.config.max_query_terms
        ql_cap = self.config.bm25_large_slots
        small_w = self.config.bm25_small_window
        small, large = [], []  # (term, slot)
        for slot, t in enumerate(qt):
            if t < 0:
                continue
            (small if stored_df[t] <= small_w else large).append((int(t), slot))
        # rank by idf (monotone in TRUE df): under bm25_df_cap every over-cap
        # term's STORED df ties at the cap, which would degrade "drop the most
        # common" to query-position order and could drop the rarest terms
        idf = np.asarray(self.idf)
        large.sort(key=lambda ts: -float(idf[ts[0]]))  # keep rarest; drop most common
        large = large[:ql_cap]

        def pad(pairs, cap):
            terms = np.full((cap,), -1, np.int32)
            slots = np.zeros((cap,), np.int32)
            for i, (t, s) in enumerate(pairs[:cap]):
                terms[i], slots[i] = t, s
            return terms, slots

        st, ss = pad(small, qs_cap)
        lt, ls = pad(large, ql_cap)
        return st, ss, lt, ls

    def score(self, query_terms: jax.Array, backend: Optional[str] = None) -> jax.Array:
        """Dense f32[n_pad] BM25 scores for one padded query-term vector."""
        backend = backend or self.config.lexical_backend
        if backend == "auto":
            # postings wins when the corpus is large relative to matched postings;
            # termtable wins once scatter cost dominates (big corpora, many queries).
            backend = "termtable" if self.n_docs >= 4096 else "postings"
        if backend == "postings":
            return score_postings(
                self.offsets,
                self.lengths,
                self.postings_doc,
                self.postings_tf,
                self.contrib_denom_k1,
                self.idf,
                jnp.float32(self.config.bm25_k1 + 1.0),
                query_terms,
                l_max=self.l_max,
                n_pad=self.n_pad,
            )
        if backend == "termtable":
            return score_termtable(self.term_ids, self.term_weights, query_terms)
        raise ValueError(f"unknown lexical backend {backend!r}")

    def search(
        self,
        keywords: Sequence[str],
        top_k: Optional[int] = None,
        row_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Full lexical channel: keywords -> (ids i32[k], scores f32[k]).

        Replaces the ``rag2_lexical_search`` SQL RPC (20260114_rag2_schema.sql:341-374);
        ``row_mask`` is the org/collection scoping the reference enforces with RLS."""
        k = top_k or self.config.lexical_top_k
        qt = jnp.asarray(self.encode_query(keywords))
        backend = self.config.lexical_backend
        if backend == "sorted" or (
            backend == "auto" and self.n_docs >= 4096 and self.postings_weight is not None
        ):
            # sorted sparse path: O(matched postings), no dense score vector — the
            # same backend the engine uses, so staged and engine stay consistent
            return self.search_sorted(qt, k, row_mask)
        return masked_top_k(self.score(qt), k, valid=row_mask)

    def search_sorted(
        self,
        query_terms: jax.Array,
        top_k: int,
        row_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Sort-based sparse top-k (O(matched postings), no dense score vector) —
        the scatter-free TPU path for large corpora; see ops.bm25.score_postings_topk."""
        if self.postings_weight is not None:
            from ..ops.bm25 import score_postings_topk_pre

            return score_postings_topk_pre(
                self.offsets, self.lengths, self.postings_doc, self.postings_weight,
                query_terms, row_mask,
                l_max=self.l_max, n_pad=self.n_pad, top_k=top_k,
            )
        from ..ops.bm25 import score_postings_topk

        return score_postings_topk(
            self.offsets, self.lengths, self.postings_doc, self.postings_tf,
            self.contrib_denom_k1, self.idf,
            jnp.float32(self.config.bm25_k1 + 1.0), query_terms, row_mask,
            l_max=self.l_max, n_pad=self.n_pad, top_k=top_k,
        )


def tokenize_corpus(
    texts: Sequence[str], analyzer: Analyzer, vocab: Optional[Vocabulary] = None
) -> Tuple[List[List[int]], Vocabulary]:
    """Tokenize + encode all documents, growing the vocabulary."""
    vocab = vocab or Vocabulary()
    return [vocab.encode(analyzer.tokenize(t), add=True) for t in texts], vocab


def build_bm25_index(
    texts: Sequence[str],
    config: RAGConfig,
    analyzer: Optional[Analyzer] = None,
    vocab: Optional[Vocabulary] = None,
    token_ids: Optional[List[List[int]]] = None,
) -> BM25Index:
    """Build the lexical index from child-chunk texts.

    Uses the C++ fast path (``native.py``) for tokenization + postings assembly when
    available and enabled; otherwise the pure-Python/NumPy build. Both produce
    identical arrays (parity-tested in tests/test_native.py)."""
    # native path only when the STOCK analyzer semantics apply: a custom Analyzer
    # SUBCLASS (different stopwords/stemming) must tokenize the index itself, or
    # queries analyzed with it would silently mismatch the index vocabulary. A
    # stock instance is purely config-derived, which the C++ path mirrors
    # (parity-tested), so it stays on the fast path.
    stock_analyzer = analyzer is None or type(analyzer) is Analyzer
    # the C++ tokenizer ALWAYS accent-folds; with strip_accents=False the python
    # query analyzer emits accented tokens that would be OOV against a
    # native-built vocabulary — keep such configs on the python build
    if (
        token_ids is None and vocab is None and stock_analyzer
        and config.use_native and config.analyzer_strip_accents
    ):
        from .. import native

        if native.available():
            return _build_native(texts, config)
    analyzer = analyzer or Analyzer(config)
    if token_ids is None:
        token_ids, vocab = tokenize_corpus(texts, analyzer, vocab)
    assert vocab is not None
    n_docs = len(token_ids)
    n_pad = config.round_capacity(max(n_docs, 1))
    vsize = max(len(vocab), 1)

    # per-doc tf maps and lengths
    doc_tfs: List[Dict[int, int]] = []
    doc_lengths = np.zeros((n_pad,), dtype=np.float32)
    for d, toks in enumerate(token_ids):
        tf: Dict[int, int] = {}
        for t in toks:
            if t >= 0:
                tf[t] = tf.get(t, 0) + 1
        doc_tfs.append(tf)
        doc_lengths[d] = len(toks)
    avgdl = float(doc_lengths[:n_docs].mean()) if n_docs else 1.0

    # document frequency and CSR assembly (term-major)
    df = np.zeros((vsize,), dtype=np.int64)
    for tf in doc_tfs:
        for t in tf:
            df[t] += 1
    # impact pruning: cap each term's stored postings at bm25_df_cap, keeping the
    # highest-tf entries (ultra-common terms carry near-zero idf; the cap bounds the
    # sorted-path gather window). idf still uses the TRUE df.
    cap = config.bm25_df_cap if config.bm25_df_cap > 0 else 0
    stored_df = np.minimum(df, cap) if cap else df.copy()
    l_max = int(stored_df.max()) if n_docs else 1
    l_max = max(l_max, 1)
    offsets = np.zeros((vsize + 1,), dtype=np.int32)
    np.cumsum(stored_df, out=offsets[1:])
    nnz = int(offsets[-1])
    postings_doc = np.full((nnz + l_max,), n_pad, dtype=np.int32)
    postings_tf = np.zeros((nnz + l_max,), dtype=np.float32)
    if cap:
        # term-major assembly with per-term top-tf selection
        term_postings: Dict[int, List[Tuple[int, int]]] = {}
        for d, tf in enumerate(doc_tfs):
            for t, cnt in tf.items():
                term_postings.setdefault(t, []).append((d, cnt))
        for t, plist in term_postings.items():
            if len(plist) > cap:
                plist = sorted(plist, key=lambda x: -x[1])[:cap]
                plist.sort()  # keep doc order within the window
            base = offsets[t]
            for i, (d, cnt) in enumerate(plist):
                postings_doc[base + i] = d
                postings_tf[base + i] = cnt
    else:
        cursor = offsets[:-1].copy()
        for d, tf in enumerate(doc_tfs):
            for t, cnt in tf.items():
                postings_doc[cursor[t]] = d
                postings_tf[cursor[t]] = cnt
                cursor[t] += 1

    # shared stats — pure NumPy on host: the build path must not issue eager device ops
    # (each one is a dispatch; prohibitive over remote-TPU links)
    denom = (
        config.bm25_k1
        * (1.0 - config.bm25_b + config.bm25_b * doc_lengths / max(avgdl, 1e-6))
    ).astype(np.float32)
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5)).astype(np.float32)

    # doc-major term table with precomputed contributions; overflow keeps top-L by weight
    L = config.doc_term_capacity
    term_ids = np.full((n_pad, L), DOC_PAD, dtype=np.int32)
    term_weights = np.zeros((n_pad, L), dtype=np.float32)
    k1p1 = config.bm25_k1 + 1.0
    overflow = 0
    for d, tf in enumerate(doc_tfs):
        if not tf:
            continue
        ts = np.fromiter(tf.keys(), dtype=np.int32, count=len(tf))
        cs = np.fromiter(tf.values(), dtype=np.float32, count=len(tf))
        w = idf[ts] * cs * k1p1 / (cs + denom[d])
        if len(ts) > L:
            overflow += 1
            # two-key (weight desc, term-id asc) selection + canonical term-id-ascending
            # slot order — matches the native overflow path exactly even on tied weights
            keep = np.lexsort((ts, -w))[:L]
            keep = keep[np.argsort(ts[keep], kind="stable")]
            ts, w = ts[keep], w[keep]
        term_ids[d, : len(ts)] = ts
        term_weights[d, : len(ts)] = w

    stored_df_i32 = stored_df.astype(np.int32)
    pw = _fold_posting_weights(
        postings_doc, postings_tf, nnz, stored_df, idf, denom, n_pad, k1p1
    )
    return BM25Index(
        offsets=jnp.asarray(offsets),
        lengths=jnp.asarray(stored_df_i32),  # stored window; idf keeps true df
        postings_doc=jnp.asarray(postings_doc),
        postings_tf=jnp.asarray(postings_tf),
        term_ids=jnp.asarray(term_ids),
        term_weights=jnp.asarray(term_weights),
        contrib_denom_k1=jnp.asarray(denom),
        idf=jnp.asarray(idf),
        n_docs=n_docs,
        n_pad=n_pad,
        l_max=l_max,
        vocab=vocab,
        config=config,
        overflow_docs=overflow,
        host_csr=(offsets, stored_df_i32, postings_doc, postings_tf),
        postings_weight=jnp.asarray(pw),
        host_weights=pw,
    )


def _fold_posting_weights(
    postings_doc: np.ndarray,
    postings_tf: np.ndarray,
    nnz: int,
    stored_df: np.ndarray,
    idf: np.ndarray,
    denom: np.ndarray,
    n_pad: int,
    k1p1: float,
) -> np.ndarray:
    """Per-posting BM25 contribution: idf[t] * tf * (k1+1) / (tf + denom[d])."""
    pw = np.zeros_like(postings_tf)
    if nnz:
        term_of = np.repeat(np.arange(stored_df.shape[0]), stored_df)
        docs = np.clip(postings_doc[:nnz], 0, n_pad - 1)
        tfs = postings_tf[:nnz]
        pw[:nnz] = idf[term_of] * tfs * k1p1 / (tfs + denom[docs])
    return pw


def _build_native(texts: Sequence[str], config: RAGConfig) -> BM25Index:
    """C++ fast-path build: native tokenization + postings assembly, NumPy finish.

    Produces arrays identical to the Python build (same analyzer semantics, same
    df capping by top-tf, same layouts)."""
    from .. import native

    na = native.NativeAnalyzer(config)
    if texts:
        tokens, tok_offsets = na.tokenize_batch(list(texts), add_to_vocab=True)
    else:
        tokens = np.zeros(0, np.int32)
        tok_offsets = np.zeros(1, np.int64)
    vocab = Vocabulary.from_list(na.vocab_terms())
    n_docs = len(texts)
    n_pad = config.round_capacity(max(n_docs, 1))
    vsize = max(len(vocab), 1)

    df, doc_len = native.native_postings_count(tokens, tok_offsets, vsize)
    doc_lengths = np.zeros(n_pad, np.float32)
    doc_lengths[:n_docs] = doc_len
    avgdl = float(doc_lengths[:n_docs].mean()) if n_docs else 1.0

    denom = (
        config.bm25_k1
        * (1.0 - config.bm25_b + config.bm25_b * doc_lengths / max(avgdl, 1e-6))
    ).astype(np.float32)
    idf = np.log1p((n_docs - df + 0.5) / (df + 0.5)).astype(np.float32)
    k1p1 = config.bm25_k1 + 1.0

    res = native.native_postings_fill(
        tokens, tok_offsets, vsize, df, idf, denom[:n_docs], k1p1,
        config.doc_term_capacity,
    )

    # df capping (top-tf per oversized term, matching the Python build)
    cap = config.bm25_df_cap if config.bm25_df_cap > 0 else 0
    full_offsets = res["csr_offsets"]
    pd_full, pt_full = res["postings_doc"], res["postings_tf"]
    if cap:
        stored_df = np.minimum(df, cap)
        offsets = np.zeros(vsize + 1, np.int64)
        np.cumsum(stored_df, out=offsets[1:])
        nnz = int(offsets[-1])
        l_max = max(int(stored_df.max()) if n_docs else 1, 1)
        postings_doc = np.full(nnz + l_max, n_pad, np.int32)
        postings_tf = np.zeros(nnz + l_max, np.float32)
        for t in range(vsize):
            s, e = int(full_offsets[t]), int(full_offsets[t + 1])
            if e - s <= cap:
                o = int(offsets[t])
                postings_doc[o : o + e - s] = pd_full[s:e]
                postings_tf[o : o + e - s] = pt_full[s:e]
            else:
                # deterministic two-key selection (tf desc, doc asc) — identical to the
                # pure-Python build's stable sorted(key=-tf)[:cap] over a doc-ascending
                # list, so native and Python indexes store the same postings even when
                # tfs tie at the cap boundary (lexsort: last key is primary).
                sel = np.lexsort((np.arange(e - s), -pt_full[s:e]))[:cap]
                sel.sort()  # keep doc-ascending order inside the window
                o = int(offsets[t])
                postings_doc[o : o + cap] = pd_full[s:e][sel]
                postings_tf[o : o + cap] = pt_full[s:e][sel]
        stored_df_i32 = stored_df.astype(np.int32)
    else:
        l_max = max(int(df.max()) if n_docs else 1, 1)
        nnz = int(full_offsets[-1])
        offsets = full_offsets
        postings_doc = np.full(nnz + l_max, n_pad, np.int32)
        postings_tf = np.zeros(nnz + l_max, np.float32)
        postings_doc[:nnz] = pd_full
        postings_tf[:nnz] = pt_full
        stored_df_i32 = df.astype(np.int32)

    # term table: fold idf + tf saturation into weights (query-independent)
    L = config.doc_term_capacity
    table_ids_small = res["table_ids"]
    table_tfs_small = res["table_tfs"]
    term_ids = np.full((n_pad, L), DOC_PAD, dtype=np.int32)
    term_weights = np.zeros((n_pad, L), dtype=np.float32)
    if n_docs:
        term_ids[:n_docs] = table_ids_small
        valid_slots = table_ids_small >= 0
        safe_ids = np.where(valid_slots, table_ids_small, 0)
        tfs = table_tfs_small
        w = idf[safe_ids] * tfs * k1p1 / (tfs + denom[:n_docs, None])
        term_weights[:n_docs] = np.where(valid_slots, w, 0.0)

    nnz_total = int(offsets[-1])
    pw = _fold_posting_weights(
        postings_doc, postings_tf, nnz_total, stored_df_i32.astype(np.int64),
        idf, denom, n_pad, k1p1,
    )
    return BM25Index(
        offsets=jnp.asarray(offsets.astype(np.int32)),
        lengths=jnp.asarray(stored_df_i32),
        postings_doc=jnp.asarray(postings_doc),
        postings_tf=jnp.asarray(postings_tf),
        term_ids=jnp.asarray(term_ids),
        term_weights=jnp.asarray(term_weights),
        contrib_denom_k1=jnp.asarray(denom),
        idf=jnp.asarray(idf),
        n_docs=n_docs,
        n_pad=n_pad,
        l_max=l_max,
        vocab=vocab,
        config=config,
        overflow_docs=res["overflow_docs"],
        host_csr=(offsets.astype(np.int32), stored_df_i32, postings_doc, postings_tf),
        postings_weight=jnp.asarray(pw),
        host_weights=pw,
    )
