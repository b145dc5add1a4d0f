"""Device graph ops: k-hop entity expansion over padded adjacency.

Replaces PuppyGraph's Cypher traversal (``MATCH path = (e)-[*1..hops]-(related)`` with
``graph_score = 1/(1+distance)`` — ``/root/reference/triple-hybrid-rag/src/triple_hybrid_rag/graph/puppygraph.py:130-167``)
and the SQL fallback's entity->relations->mentions->chunks walk
(``/root/reference/src/voice_agent/rag2/graph_search.py:249-405``).

TPU encoding: the entity graph is a *padded neighbor table* ``nbr[E, D]`` (row e lists up to
D neighbor entity rows, -1 padded) — dense, static-shape, gather-friendly. K-hop BFS is
``hops`` rounds of gather+min (label-correcting relaxation): exactly the same frontier
expansion a graph database performs, but as data-parallel VPU work over every entity at
once. Entity hop-distances become chunk scores through a second padded table
``chunk_entities[N, M]`` via gather+max — no scatter anywhere in the query path.

Graphs here are small relative to the corpus (thousands of entities for 1M chunks), so the
whole traversal lives comfortably in VMEM and costs microseconds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF_DIST = jnp.float32(1e9)


@functools.partial(jax.jit, static_argnames=("hops",))
def khop_distances(
    nbr: jax.Array,  # i32[E, D] neighbor entity rows (-1 = pad)
    seeds: jax.Array,  # bool[E] seed entities (hop distance 0)
    *,
    hops: int,
) -> jax.Array:
    """f32[E] minimum hop distance from any seed, INF_DIST when unreachable in ``hops``."""
    e_pad = nbr.shape[0]
    valid_nbr = nbr >= 0
    safe_nbr = jnp.clip(nbr, 0, e_pad - 1)
    dist = jnp.where(seeds, 0.0, INF_DIST)

    def body(_, d):
        nd = jnp.where(valid_nbr, d[safe_nbr], INF_DIST)  # [E, D] neighbor distances
        best = jnp.min(nd, axis=1) + 1.0
        return jnp.minimum(d, best)

    return jax.lax.fori_loop(0, hops, body, dist)


@functools.partial(jax.jit, static_argnames=("hops",))
def khop_entity_scores(nbr: jax.Array, seeds: jax.Array, *, hops: int) -> jax.Array:
    """f32[E] graph scores ``1 / (1 + distance)`` (reference puppygraph.py:152-167),
    zero for entities unreachable within ``hops``."""
    dist = khop_distances(nbr, seeds, hops=hops)
    reachable = dist <= float(hops)
    return jnp.where(reachable, 1.0 / (1.0 + dist), 0.0)


@jax.jit
def chunk_scores_from_entities(
    chunk_entities: jax.Array,  # i32[N, M] entity rows mentioned per chunk (-1 = pad)
    entity_scores: jax.Array,  # f32[E]
) -> jax.Array:
    """f32[N] per-chunk graph score = max over its mentioned entities' scores.

    Max (not sum) mirrors the reference's DISTINCT-chunk shortest-path semantics: a chunk
    scores by its best-connected entity."""
    e_pad = entity_scores.shape[0]
    valid = chunk_entities >= 0
    safe = jnp.clip(chunk_entities, 0, e_pad - 1)
    s = jnp.where(valid, entity_scores[safe], 0.0)
    return jnp.max(s, axis=1)


def chunk_scores_from_entities_batch(
    chunk_entities: jax.Array,  # i32[N, M] entity rows mentioned per chunk (-1 = pad)
    entity_scores: jax.Array,  # f32[B, E] per-query entity scores
) -> jax.Array:
    """f32[B, N] per-chunk graph scores for a whole query batch in ONE gather.

    The batched engine's hot form of :func:`chunk_scores_from_entities`. Doing
    the gather per query (vmap over B) issues B x N x M random *scalar* gathers
    — measured 41 ms/batch at 1M chunks x B=64 on v5e, the single most
    expensive stage of the whole program. Gathering instead from the
    transposed [E, B] table makes each gathered element a contiguous B-lane
    vector shared by every query, collapsing the stage to one N x M row gather
    (~50x less gather overhead; the [N, M, B] intermediate fuses into the max
    reduction)."""
    e_pad = entity_scores.shape[1]
    valid = chunk_entities >= 0  # [N, M]
    safe = jnp.clip(chunk_entities, 0, e_pad - 1)
    ent_t = entity_scores.T  # [E, B]; B on lanes -> row gathers are contiguous
    s = jnp.where(valid[:, :, None], ent_t[safe], 0.0)  # [N, M, B]
    return jnp.max(s, axis=1).T  # [B, N]


def graph_topk_batch(
    chunk_entities: jax.Array,  # i32[N, M] entity rows per chunk (-1 = pad)
    entity_scores: jax.Array,  # f32[B, E] per-query entity scores
    k: int,
    valid: jax.Array | None = None,  # bool[B, N] per-query row masks
    query_on: jax.Array | None = None,  # bool[B] graph channel active per query
    bucket: int = 16,
    block: int = 1 << 19,
    entity_ranks: jax.Array | None = None,  # u8[B, E] monotone score ranks (0 = off)
) -> tuple[jax.Array, jax.Array]:
    """Exact batched graph top-k WITHOUT materializing per-chunk scores.

    ``chunk_scores_from_entities_batch`` + a batched top-k materializes an
    [N, M, B] gather intermediate — 8 GB at N=8M, M=4, B=64, the allocation
    that OOMed the 8M one-chip run. This computes per-bucket score maxima in
    N-blocks (``lax.map`` bounds the transient to block x M x B), selects the
    top-k buckets, and rescores only the k x bucket member rows — the same
    exactness construction as ``ops.topk.bucketed_masked_top_k_batch`` (and
    the fused dense kernel): any bucket holding a top-k chunk has a maximum
    >= the k-th value; the final (score desc, id asc) sort reproduces
    ``masked_top_k``'s tie-break. Scores <= 0 never surface (graph floor).

    ``entity_ranks`` (optional) supplies a u8 [B, E] table whose ordering is
    MONOTONE in ``entity_scores`` (e.g. hops+1-distance; 0 = inactive). The
    bucket-maxima scan then gathers 1-byte lanes instead of f32 — 4x less HBM
    gather traffic on the stage that dominates full-pipeline device time at 1M
    chunks — while the member rescore keeps exact f32 scores. Selection is
    unchanged: rank order == score order, and ties resolve by bucket/chunk id
    in both encodings.

    Returns (ids i32[B, k], scores f32[B, k]) with -1 / -inf invalid slots.
    """
    from .topk import NEG_INF

    n, m = chunk_entities.shape
    b, e_pad = entity_scores.shape
    use_ranks = entity_ranks is not None
    if use_ranks:
        ent_t = entity_ranks.T  # [E, B] u8: B on lanes -> contiguous row gathers
        if query_on is not None:
            ent_t = jnp.where(query_on[None, :], ent_t, 0)
        zero = jnp.uint8(0)
    else:
        ent_t = entity_scores.T  # [E, B]
        if query_on is not None:
            ent_t = jnp.where(query_on[None, :], ent_t, 0.0)
        zero = jnp.float32(0.0)

    n_pad = ((n + block - 1) // block) * block
    ce = chunk_entities
    va = valid
    if n_pad != n:
        ce = jnp.pad(ce, ((0, n_pad - n), (0, 0)), constant_values=-1)
        if va is not None:
            va = jnp.pad(va, ((0, 0), (0, n_pad - n)))
    assert block % bucket == 0
    n_blocks = n_pad // block

    def block_maxima(args):
        ce_blk, va_blk = args  # i32[block, M], bool[B, block] | dummy
        ok = ce_blk >= 0
        safe = jnp.clip(ce_blk, 0, e_pad - 1)
        s = jnp.where(ok[:, :, None], ent_t[safe], zero)  # [block, M, B]
        s = jnp.max(s, axis=1)  # [block, B]
        if not use_ranks:
            s = jnp.where(s > 0.0, s, NEG_INF)  # graph floor: 0-score rows invalid
        if valid is not None:
            s = jnp.where(va_blk.T, s, zero if use_ranks else NEG_INF)
        return jnp.max(s.reshape(block // bucket, bucket, b), axis=1).T  # [B, blk/bu]

    ce_blocks = ce.reshape(n_blocks, block, m)
    va_blocks = (
        va.reshape(b, n_blocks, block).transpose(1, 0, 2)
        if valid is not None
        else jnp.zeros((n_blocks, 1, 1), bool)  # unused dummy
    )
    bmax = jax.lax.map(block_maxima, (ce_blocks, va_blocks))  # [nblk, B, blk/bu]
    bmax = bmax.transpose(1, 0, 2).reshape(b, n_pad // bucket)
    if use_ranks:
        bmax = bmax.astype(jnp.int32)  # rank 0 = empty bucket (sorts last)

    kk = min(k, n_pad // bucket)
    _, bucket_ids = jax.lax.top_k(bmax, kk)  # ties -> lowest bucket id
    member = (
        bucket_ids[:, :, None] * bucket
        + jnp.arange(bucket, dtype=bucket_ids.dtype)[None, None, :]
    ).reshape(b, kk * bucket)  # [B, C] global rows

    # rescore members per query (tiny: B x k*bucket x M gathers)
    mem_ce = ce[jnp.clip(member, 0, n_pad - 1)]  # [B, C, M]
    ok = mem_ce >= 0
    safe = jnp.clip(mem_ce, 0, e_pad - 1)

    def one(ent_q, safe_q, ok_q):
        return jnp.max(jnp.where(ok_q, ent_q[safe_q], 0.0), axis=-1)  # [C]

    cand = jax.vmap(one)(
        jnp.where(query_on[:, None], entity_scores, 0.0)
        if query_on is not None
        else entity_scores,
        safe, ok,
    )
    cand = jnp.where(cand > 0.0, cand, NEG_INF)
    cand = jnp.where(member < n, cand, NEG_INF)  # padding rows
    if valid is not None:
        cand = jnp.where(
            jnp.take_along_axis(va, jnp.clip(member, 0, n - 1), axis=1), cand, NEG_INF
        )
    from .topk import sort_topk_desc

    return sort_topk_desc(cand, member, k)


def graph_sparse_topk(
    ent_offsets: jax.Array,  # i32[E + 1] CSR offsets into the mention postings
    ent_lengths: jax.Array,  # i32[E] mention count per entity (post-cap)
    mention_docs: jax.Array,  # i32[nnz_pad] chunk rows, doc-ascending per entity
    act_ents: jax.Array,  # i32[A] activated entity rows (-1 = empty slot)
    act_scores: jax.Array,  # f32[A] their k-hop scores (1/(1+dist))
    row_mask: jax.Array | None = None,  # bool[n_pad] row filter (collection scoping)
    *,
    l_max_g: int,  # static: max mention-postings window width
    n_pad: int,  # static: padded corpus capacity (local rows)
    top_k: int,
    run_bound: int,  # static: max mention slots per chunk (chunk_entities width)
) -> tuple[jax.Array, jax.Array]:
    """Sparse graph top-k: score only chunks that MENTION an activated entity.

    The inverted-index dual of :func:`graph_topk_batch`: instead of scanning
    ``chunk_entities[N, M]`` (O(N) per query — measured ~half of full-pipeline
    device time at 1M chunks), gather each activated entity's mention postings
    (contiguous dynamic-slice windows), sort (chunk, slot) pairs, and take the
    per-chunk MAX entity score via the same segmented doubling reduction the
    lexical channel uses for sums (ops/bm25._sparse_topk_from_windows). Work is
    O(activated mentions), independent of corpus size.

    Exact vs the dense path (bit-identical ids, ties included: both tie-break
    (score desc, id asc)) whenever ``act_ents`` holds EVERY entity with a
    nonzero score and no mention list was truncated at build — the engine's
    "auto" policy only selects this path under those conditions. Mirrors the
    reference's graph walk, which also goes entity->mentions->chunks
    (rag2/graph_search.py:249-405), not chunk-by-chunk.
    """
    from .bm25 import _sparse_topk_from_windows

    a_slots = act_ents.shape[0]
    e_pad = ent_lengths.shape[0]
    positions = jnp.arange(l_max_g, dtype=jnp.int32)

    def gather_ent(a: jax.Array):
        e_raw = act_ents[a]
        ok = (e_raw >= 0) & (act_scores[a] > 0.0)
        e = jnp.clip(e_raw, 0, e_pad - 1)
        start = ent_offsets[e]
        ln = ent_lengths[e]
        docs = jax.lax.dynamic_slice(mention_docs, (start,), (l_max_g,))
        valid = (positions < ln) & ok
        contrib = jnp.where(valid, act_scores[a], 0.0)
        docs = jnp.where(valid, docs, jnp.int32(n_pad))  # invalid -> sentinel
        slots = jnp.full((l_max_g,), a, jnp.int32)
        return docs, slots, contrib

    docs, slots, contribs = jax.vmap(gather_ent)(jnp.arange(a_slots))
    return _sparse_topk_from_windows(
        docs, slots, contribs, a_slots, n_pad, top_k, row_mask,
        combine="max", run_bound=run_bound,
    )


@functools.partial(jax.jit, static_argnames=("hops",))
def khop_chunk_scores(
    nbr: jax.Array,
    chunk_entities: jax.Array,
    seeds: jax.Array,
    *,
    hops: int,
) -> jax.Array:
    """Fused seed-entities -> chunk-scores pipeline (one dispatch)."""
    return chunk_scores_from_entities(chunk_entities, khop_entity_scores(nbr, seeds, hops=hops))
