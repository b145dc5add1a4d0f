"""Device-resident BM25 scoring: the TPU-native lexical channel.

Replaces PostgreSQL full-text search — the GIN-index postings scan and ``ts_rank_cd`` scoring
inside ``rag2_lexical_search`` (``/root/reference/database/migrations/20260114_rag2_schema.sql:341-374``).
Exact score parity with ``ts_rank_cd`` is impossible (different formula); we implement Okapi
BM25 and target rank-quality parity (SURVEY.md §7 hard part (d)).

Two interchangeable device layouts, validated against each other and a NumPy oracle:

1. **CSR postings, term-at-a-time** (:func:`score_postings`): classic inverted index as three
   flat arrays (offsets / doc ids / tfs). Each of the ``Q`` query-term slots dynamic-slices a
   fixed ``l_max`` window out of the flat postings (contiguous -> DMA-friendly), masks by the
   true df, and scatter-adds contributions into a dense score vector. Minimal HBM traffic
   (reads only the query terms' postings) but relies on XLA scatter; best for small/medium
   corpora and CPU tests.

2. **Doc-major term table** (:func:`score_termtable`): each document row stores its unique
   terms ``term_ids[N, L]`` alongside *precomputed query-independent BM25 contributions*
   ``term_weights[N, L]`` (idf and length normalization folded in at build time). A query is
   a membership test: ``score[d] = sum_l w[d,l] * [ids[d,l] in query]``. Pure VPU compare+
   select+reduce over contiguous memory — no gather, no scatter, trivially shardable and
   batchable, and the layout the Pallas lexical kernel consumes. This is the production path
   at 1M-chunk scale.

Both paths use static shapes throughout: query terms are padded to ``max_query_terms`` slots
with a -1 sentinel (OOV terms map to -1 and are masked), scores are dense over the padded
capacity, and invalid documents simply score 0.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["score_postings", "score_termtable", "QUERY_PAD", "DOC_PAD"]

QUERY_PAD = -1  # query slot sentinel (also the OOV term id)
DOC_PAD = -2  # term-table pad sentinel; distinct from QUERY_PAD so pads never match


@functools.partial(jax.jit, static_argnames=("l_max", "n_pad"))
def score_postings(
    offsets: jax.Array,  # i32[V + 1] CSR term offsets into the flat postings
    lengths: jax.Array,  # i32[V] per-term document frequency
    postings_doc: jax.Array,  # i32[nnz_pad] doc row per posting (tail-padded by l_max)
    postings_tf: jax.Array,  # f32[nnz_pad] term frequency per posting
    contrib_denom_k1: jax.Array,  # f32[n_pad] per-doc k1*(1-b+b*dl/avgdl)
    idf: jax.Array,  # f32[V] per-term idf
    k1_plus1: jax.Array,  # f32[] scalar k1+1
    query_terms: jax.Array,  # i32[Q] padded query term ids (-1 = empty slot)
    *,
    l_max: int,  # static: max document frequency (postings window width)
    n_pad: int,  # static: padded corpus capacity
) -> jax.Array:
    """Term-at-a-time CSR scoring. Returns dense f32[n_pad] BM25 scores."""
    q_slots = query_terms.shape[0]
    positions = jnp.arange(l_max, dtype=jnp.int32)

    def body(q: jax.Array, scores: jax.Array) -> jax.Array:
        t_raw = query_terms[q]
        q_valid = t_raw >= 0
        t = jnp.where(q_valid, t_raw, 0)
        start = offsets[t]
        df = lengths[t]
        docs = jax.lax.dynamic_slice(postings_doc, (start,), (l_max,))
        tfs = jax.lax.dynamic_slice(postings_tf, (start,), (l_max,))
        valid = (positions < df) & q_valid
        denom = contrib_denom_k1[jnp.clip(docs, 0, n_pad - 1)]
        contrib = idf[t] * tfs * k1_plus1 / (tfs + denom)
        contrib = jnp.where(valid, contrib, 0.0)
        # invalid postings scatter into the spill slot n_pad (dropped on return)
        target = jnp.where(valid, docs, n_pad)
        return scores.at[target].add(contrib, mode="drop")

    scores = jax.lax.fori_loop(
        0, q_slots, body, jnp.zeros((n_pad + 1,), jnp.float32), unroll=True
    )
    return scores[:n_pad]


@jax.jit
def score_termtable(
    term_ids: jax.Array,  # i32[N, L] unique terms per doc (DOC_PAD = empty slot)
    term_weights: jax.Array,  # f32|bf16[N, L] precomputed BM25 contribution per (doc, term)
    query_terms: jax.Array,  # i32[Q] padded query term ids (QUERY_PAD = empty slot)
) -> jax.Array:
    """Doc-major membership scoring. Returns dense f32[N] BM25 scores.

    The (N, L, Q) comparison is expressed as a broadcast so XLA fuses the equality, the
    any-reduce, and the weighted sum into a single pass over the term table (verified via
    jaxpr/fusion inspection; the Pallas variant in ``ops/pallas`` makes the fusion explicit).
    """
    # [N, L, Q]: does doc term (d, l) equal any query term? DOC_PAD never equals QUERY_PAD.
    match = (term_ids[:, :, None] == query_terms[None, None, :]).any(axis=-1)
    return jnp.sum(
        jnp.where(match, term_weights.astype(jnp.float32), 0.0), axis=1
    )


def score_termtable_batch(
    term_ids: jax.Array,
    term_weights: jax.Array,
    query_terms_batch: jax.Array,  # i32[B, Q]
) -> jax.Array:
    """Batched variant: scores f32[B, N]. One streaming pass over the table per vmap lane;
    XLA shares the table read across the batch where possible."""
    return jax.vmap(lambda qt: score_termtable(term_ids, term_weights, qt))(
        query_terms_batch
    )


@functools.partial(jax.jit, static_argnames=("l_max", "n_pad", "top_k"))
def score_postings_topk(
    offsets: jax.Array,  # i32[V + 1]
    lengths: jax.Array,  # i32[V]
    postings_doc: jax.Array,  # i32[nnz_pad]
    postings_tf: jax.Array,  # f32[nnz_pad]
    contrib_denom_k1: jax.Array,  # f32[n_pad]
    idf: jax.Array,  # f32[V]
    k1_plus1: jax.Array,  # f32[]
    query_terms: jax.Array,  # i32[Q]
    row_mask: Optional[jax.Array] = None,  # bool[n_pad] row filter (collection scoping)
    *,
    l_max: int,
    n_pad: int,
    top_k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sort-based sparse BM25 top-k: the TPU-native term-at-a-time path.

    Scatter is the classic TPU weakness, so instead of accumulating into a dense
    ``f32[N]`` score vector (:func:`score_postings`) this op stays entirely in the
    *sparse* domain — work is O(matched postings), independent of corpus size:

        1. gather each query term's postings window (contiguous dynamic-slices),
        2. sort the (doc_id, contribution) pairs by doc_id (TPU sorts are fast,
           bitonic over a few tens of thousands of elements),
        3. segmented-sum runs of equal doc_id via cumsum differences at run ends,
        4. top-k over the per-run totals.

    Returns (ids i32[top_k], scores f32[top_k]) with -1/-inf invalid slots — the same
    contract as ``masked_top_k``, so it drops into the fusion stage directly.

    Requires a capped ``l_max`` (per-term postings window). Ultra-common terms beyond
    the cap carry near-zero idf; the index builder truncates their postings to the
    highest-tf entries (impact pruning) so the cap costs essentially nothing in rank
    quality while bounding both memory and compute.

    Determinism: runs are at most ``Q`` elements (a doc appears once per term window),
    so per-run totals are computed with a *segmented doubling reduction* over a
    canonical within-run order ((doc, query-slot) two-key sort). The summation tree
    depends only on run-relative offsets — never on what precedes the run — so scores
    are bit-identical whether a doc is scored on a full corpus or any shard slice
    (the property that makes the sharded engine's merge reproduce single-device
    results exactly).
    """
    q_slots = query_terms.shape[0]
    positions = jnp.arange(l_max, dtype=jnp.int32)

    def gather_term(q: jax.Array):
        t_raw = query_terms[q]
        q_valid = t_raw >= 0
        t = jnp.where(q_valid, t_raw, 0)
        start = offsets[t]
        df = lengths[t]
        docs = jax.lax.dynamic_slice(postings_doc, (start,), (l_max,))
        tfs = jax.lax.dynamic_slice(postings_tf, (start,), (l_max,))
        valid = (positions < df) & q_valid
        denom = contrib_denom_k1[jnp.clip(docs, 0, n_pad - 1)]
        contrib = idf[t] * tfs * k1_plus1 / (tfs + denom)
        contrib = jnp.where(valid, contrib, 0.0)
        docs = jnp.where(valid, docs, jnp.int32(n_pad))  # invalid -> sentinel (sorts last)
        slots = jnp.full((l_max,), q, jnp.int32)
        return docs, slots, contrib

    docs, slots, contribs = jax.vmap(gather_term)(jnp.arange(q_slots))
    return _sparse_topk_from_windows(docs, slots, contribs, q_slots, n_pad, top_k, row_mask)


@functools.partial(jax.jit, static_argnames=("l_max", "n_pad", "top_k"))
def score_postings_topk_pre(
    offsets: jax.Array,  # i32[V + 1]
    lengths: jax.Array,  # i32[V]
    postings_doc: jax.Array,  # i32[nnz_pad]
    postings_weight: jax.Array,  # f32[nnz_pad] PRECOMPUTED BM25 contribution per posting
    query_terms: jax.Array,  # i32[Q]
    row_mask: Optional[jax.Array] = None,  # bool[n_pad] row filter (collection scoping)
    *,
    l_max: int,
    n_pad: int,
    top_k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Precomputed-impact variant of :func:`score_postings_topk`.

    The BM25 contribution of a (term, doc) posting depends on nothing query-specific, so
    the index builder folds idf + tf saturation + length norm into one weight per
    posting (same trick as the doc-major term table). The query path then gathers only
    (doc, weight) pairs — no random per-posting ``denom[doc]`` gather, no arithmetic —
    roughly halving lexical HBM traffic. Scores/determinism identical to the unfused op.
    """
    q_slots = query_terms.shape[0]
    positions = jnp.arange(l_max, dtype=jnp.int32)

    def gather_term(q: jax.Array):
        t_raw = query_terms[q]
        q_valid = t_raw >= 0
        t = jnp.where(q_valid, t_raw, 0)
        start = offsets[t]
        df = lengths[t]
        docs = jax.lax.dynamic_slice(postings_doc, (start,), (l_max,))
        w = jax.lax.dynamic_slice(postings_weight, (start,), (l_max,))
        valid = (positions < df) & q_valid
        contrib = jnp.where(valid, w, 0.0)
        docs = jnp.where(valid, docs, jnp.int32(n_pad))
        slots = jnp.full((l_max,), q, jnp.int32)
        return docs, slots, contrib

    docs, slots, contribs = jax.vmap(gather_term)(jnp.arange(q_slots))
    return _sparse_topk_from_windows(docs, slots, contribs, q_slots, n_pad, top_k, row_mask)


def _sparse_topk_from_windows(
    docs, slots, contribs, q_slots: int, n_pad: int, top_k: int,
    row_mask: Optional[jax.Array] = None,
    combine: str = "sum",
    run_bound: Optional[int] = None,
):
    """Shared tail: 2-key sort, segmented doubling reduction, top-k over run starts.

    ``combine`` selects the per-document reduction over its matched windows:
    "sum" (BM25 term contributions) or "max" (graph best-entity semantics —
    ops/graph.graph_sparse_topk). ``run_bound`` caps the doubling depth when the
    caller knows runs are shorter than ``q_slots`` (e.g. a chunk can match at
    most M mention slots however many entities are activated)."""
    flat_docs = docs.reshape(-1)
    flat_slots = slots.reshape(-1)
    flat_scores = contribs.reshape(-1)
    p = flat_docs.shape[0]

    # canonical order: by doc id, then by query slot (equal-doc runs become contiguous
    # with a partition-independent internal order)
    sorted_docs, _, sorted_scores = jax.lax.sort(
        (flat_docs, flat_slots, flat_scores), dimension=-1, num_keys=2
    )

    # segmented suffix-reduction by doubling: after step k, acc[i] = reduction of run
    # elements in [i, i + 2^k); runs never exceed run_bound (default q_slots) elements
    acc = sorted_scores
    step = 1
    bound = q_slots if run_bound is None else min(run_bound, q_slots)
    while step < bound:
        shifted_acc = jnp.concatenate([acc[step:], jnp.zeros((step,), acc.dtype)])
        shifted_doc = jnp.concatenate(
            [sorted_docs[step:], jnp.full((step,), -9, jnp.int32)]
        )
        if combine == "max":
            # max is idempotent: overlapping [i, i+2^k) windows are harmless
            acc = jnp.maximum(
                acc, jnp.where(shifted_doc == sorted_docs, shifted_acc, -jnp.inf)
            )
        else:
            acc = acc + jnp.where(shifted_doc == sorted_docs, shifted_acc, 0.0)
        step <<= 1

    prev_docs = jnp.concatenate([jnp.full((1,), -9, jnp.int32), sorted_docs[:-1]])
    is_start = sorted_docs != prev_docs  # acc at run starts = full run total

    ok_row = is_start & (sorted_docs < n_pad)
    if row_mask is not None:
        ok_row = ok_row & row_mask[jnp.clip(sorted_docs, 0, n_pad - 1)]
    score_at_start = jnp.where(ok_row, acc, -jnp.inf)
    vals, pos = jax.lax.top_k(score_at_start, min(top_k, p))
    ids = sorted_docs[pos]
    ok = vals > -jnp.inf
    ids = jnp.where(ok, ids, -1).astype(jnp.int32)
    vals = jnp.where(ok, vals, -jnp.inf)
    if min(top_k, p) < top_k:
        pad = top_k - min(top_k, p)
        ids = jnp.concatenate([ids, jnp.full((pad,), -1, jnp.int32)])
        vals = jnp.concatenate([vals, jnp.full((pad,), -jnp.inf, jnp.float32)])
    return ids, vals


def bm25_idf(n_docs: int | jax.Array, df: jax.Array) -> jax.Array:
    """Okapi BM25 idf with the +1 smoothing that keeps it positive."""
    return jnp.log1p((n_docs - df + 0.5) / (df + 0.5))


def bm25_denom_k1(
    doc_lengths: jax.Array, avgdl: jax.Array, k1: float, b: float
) -> jax.Array:
    """Per-document ``k1 * (1 - b + b * dl / avgdl)`` — the tf-saturation denominator."""
    return k1 * (1.0 - b + b * doc_lengths / jnp.maximum(avgdl, 1e-6))


@functools.partial(jax.jit, static_argnames=("l_small", "l_max", "n_pad", "top_k"))
def score_postings_topk_tiered(
    offsets: jax.Array,  # i32[V + 1]
    lengths: jax.Array,  # i32[V]
    postings_doc: jax.Array,  # i32[nnz_pad]
    postings_weight: jax.Array,  # f32[nnz_pad] precomputed impacts
    small_terms: jax.Array,  # i32[Qs] term ids with stored df <= l_small (-1 pad)
    small_slots: jax.Array,  # i32[Qs] ORIGINAL query slot index of each small term
    large_terms: jax.Array,  # i32[Ql] high-df term ids (-1 pad)
    large_slots: jax.Array,  # i32[Ql] original slot index of each large term
    row_mask: Optional[jax.Array] = None,
    *,
    l_small: int,
    l_max: int,
    n_pad: int,
    top_k: int,
) -> Tuple[jax.Array, jax.Array]:
    """df-tiered variant of :func:`score_postings_topk_pre`.

    The sorted-path cost is the total gathered window width. A fixed ``l_max`` window
    for every query slot wastes most of it on rare terms (df << l_max), so the host
    splits query terms into a small tier (window ``l_small``) and a large tier (window
    ``l_max``, few slots): P shrinks from ``Q * l_max`` to
    ``Qs * l_small + Ql * l_max`` (~3-4x). Exact for every term admitted to a slot —
    tiering changes window sizes, never which postings are read. Carrying the ORIGINAL
    query-slot index as the sort's secondary key keeps the within-run summation order
    (and therefore every ulp of every score) identical to the untiered op.
    """

    def gather(terms: jax.Array, slots: jax.Array, window: int):
        positions = jnp.arange(window, dtype=jnp.int32)

        def one(i: jax.Array):
            t_raw = terms[i]
            valid_t = t_raw >= 0
            t = jnp.where(valid_t, t_raw, 0)
            start = offsets[t]
            df = lengths[t]
            docs = jax.lax.dynamic_slice(postings_doc, (start,), (window,))
            w = jax.lax.dynamic_slice(postings_weight, (start,), (window,))
            valid = (positions < df) & valid_t
            contrib = jnp.where(valid, w, 0.0)
            docs = jnp.where(valid, docs, jnp.int32(n_pad))
            slot = jnp.full((window,), slots[i], jnp.int32)
            return docs, slot, contrib

        return jax.vmap(one)(jnp.arange(terms.shape[0]))

    ds, ss, cs = gather(small_terms, small_slots, min(l_small, l_max))
    dl, sl, cl = gather(large_terms, large_slots, l_max)
    docs = jnp.concatenate([ds.reshape(-1), dl.reshape(-1)])
    slots = jnp.concatenate([ss.reshape(-1), sl.reshape(-1)])
    contribs = jnp.concatenate([cs.reshape(-1), cl.reshape(-1)])
    q_slots = int(small_terms.shape[0] + large_terms.shape[0])
    return _sparse_topk_from_windows(
        docs[None], slots[None], contribs[None], q_slots, n_pad, top_k, row_mask
    )
