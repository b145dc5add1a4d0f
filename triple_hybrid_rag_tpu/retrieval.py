"""The retriever: the 6-stage recall->precision query funnel, device-resident.

Reimplements ``RAG2Retriever.retrieve()``
(``/root/reference/src/voice_agent/rag2/retrieval.py:66-505``):

    1. plan            (host: rule-based / pluggable LLM)
    2. multi-channel   (device: BM25 + dense matmul + graph k-hop, replacing
                        Postgres RPC / pgvector HNSW / PuppyGraph round-trips)
    3. weighted RRF    (device: fused op, k=60)
    4. parent expand   (device: gather through the child->parent row table,
                        replacing the rag2_expand_to_parents SQL RPC)
    5. rerank          (device: MaxSim / dot / noop ladder)
    6. safety+denoise  (device: refuse < threshold, keep >= alpha * max, top_k)

Per-stage wall-clock timings are recorded in ``RetrievalResult.timings`` exactly like the
reference (retrieval.py:139-191 -> ``timings_ms`` in tool responses). The reference's stages
each cross a process boundary (OpenAI / Postgres / vLLM); here stages 2-6 are device
dispatches, and :class:`~triple_hybrid_rag_tpu.parallel.engine.ShardedEngine` fuses them
into a SINGLE jitted program so a production query pays one host->device round trip.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .analyzer import Analyzer
from .config import RAGConfig, get_settings
from .corpus import CorpusStore
from .index.bm25_index import BM25Index, build_bm25_index
from .index.dense_index import DenseIndex, build_dense_index, truncate_matryoshka
from .models.embedder import BowHashEmbedder, Embedder, get_default_embedder
from .models.planner import QueryPlanner, get_planner
from .models.reranker import Reranker, get_reranker
from .ops.fusion import (
    FusedCandidates,
    GRAPH_BIT,
    LEXICAL_BIT,
    SEMANTIC_BIT,
    apply_safety_denoise,
    conformal_denoise_mask,
    fuse_rrf,
    minmax_normalize,
)
from .ops.topk import masked_top_k
from .types import QueryPlan, RetrievalResult, SearchResult

_EMPTY_CHANNEL_K = 1  # width of the placeholder arrays for disabled channels


def _parent_of_table(corpus: CorpusStore, config: RAGConfig) -> jax.Array:
    """child row -> parent row gather table, capacity-padded (shared by __init__
    and the checkpoint-restore path so the two can never diverge)."""
    n_pad = config.round_capacity(max(len(corpus), 1))
    parent_of = np.zeros((n_pad,), np.int32)
    rows = corpus.parent_rows()
    if rows:
        parent_of[: len(rows)] = rows
    return jnp.asarray(parent_of)


# Soft query-token weights for the MaxSim gate. The analyzer already removes hard
# stopwords; what remains are content-light "function" verbs/fillers ("get",
# "tell", "explain") that rarely match any document token and drag the MaxSim
# MEAN below the 0.6 safety threshold on natural questions ("when do invoices
# get settled" = one unmatched token out of three). The reference never faces
# this because its gate score is an LLM yes/no probability
# (``/root/reference/src/voice_agent/retrieval/reranker.py:154-285``), which is
# robust to filler words by construction; downweighting fillers restores the
# same robustness for the late-interaction gate. Static list (EN+PT) — no
# per-query device reads, identical in the staged retriever, the batched
# engine, and the /rerank endpoint.
_FUNCTION_WORDS = frozenset(
    """get got make made take took tell told know knew want need find found
    explain say said see saw look give gave show list use used work help
    obter fazer feito dizer dito saber quis querer preciso precisa mostrar
    ajudar usar achar encontrar funciona funcionar""".split()
)
FUNCTION_WORD_WEIGHT = 0.25

_FW_PROCESSED: dict = {}


def _function_words(analyzer: Analyzer) -> frozenset:
    """The function-word list in the ANALYZER'S token space (cached per config).

    Query tokens arrive stemmed/folded by ``analyzer.tokenize`` (e.g. light
    S-stemming turns "quis" into "qui"), so matching raw surface forms silently
    dead-lists every entry the stemmer rewrites — re-exposing the false-refusal
    failure this weighting exists to fix. Processing the list through the same
    analyzer keeps both spaces covered."""
    key = (
        analyzer.config.analyzer_stemming,
        analyzer.config.analyzer_strip_accents,
        analyzer.config.analyzer_min_token_len,
    )
    fw = _FW_PROCESSED.get(key)
    if fw is None:
        out = set(_FUNCTION_WORDS)
        for word in _FUNCTION_WORDS:
            out.update(analyzer.tokenize(word))
        fw = frozenset(out)
        _FW_PROCESSED[key] = fw
    return fw


def maxsim_query_weights(text: str, analyzer: Analyzer, max_tokens: int) -> np.ndarray:
    """f32[max_tokens] per-query-token MaxSim weights (0 = padding slot).

    Positions align with ``token_embeddings(...)`` output: both sides run the
    same ``analyzer.tokenize`` truncated to the same width."""
    fw = _function_words(analyzer)
    w = np.zeros((max_tokens,), np.float32)
    for j, t in enumerate(analyzer.tokenize(text)[:max_tokens]):
        w[j] = FUNCTION_WORD_WEIGHT if t in fw else 1.0
    return w


class Retriever:
    """Query-side orchestrator over device-resident indexes."""

    def __init__(
        self,
        corpus: CorpusStore,
        config: Optional[RAGConfig] = None,
        embedder: Optional[Embedder] = None,
        planner: Optional[QueryPlanner] = None,
        bm25_index: Optional[BM25Index] = None,
        dense_index: Optional[DenseIndex] = None,
        graph_index=None,
        reranker: Optional[Reranker] = None,
        child_embeddings: Optional[np.ndarray] = None,
        rerank_llm_fn=None,
        maxsim_index=None,
    ) -> None:
        self.config = config or get_settings()
        self.corpus = corpus
        self.analyzer = Analyzer(self.config)
        self.embedder = embedder or get_default_embedder(self.config)
        self.planner = planner or get_planner(self.config)
        self.graph_index = graph_index

        texts = corpus.child_texts()
        if self.config.lexical_enabled:
            self.bm25_index = bm25_index or build_bm25_index(texts, self.config, self.analyzer)
        else:
            self.bm25_index = bm25_index
        if self.config.semantic_enabled:
            if dense_index is None:
                vecs = (
                    child_embeddings
                    if child_embeddings is not None
                    else self.embedder.embed_texts(texts)
                )
                dense_index = build_dense_index(vecs, self.config)
            self.dense_index = dense_index
        else:
            self.dense_index = dense_index

        # child row -> parent row gather table (device); -1-safe via clip+mask
        self.parent_of = _parent_of_table(corpus, self.config)
        self._init_collections(self.parent_of.shape[0])

        # MaxSim token store over parent texts (primary rerank backend);
        # a prebuilt index (Ingestor's incremental cache / checkpoint restore)
        # short-circuits the full-corpus token-embedding pass
        self.maxsim_index = None
        if (
            self.config.rerank_enabled
            and self.config.rerank_backend == "maxsim"
            and corpus.n_parents > 0
        ):
            if maxsim_index is not None:
                self.maxsim_index = maxsim_index
            elif hasattr(self.embedder, "token_embeddings"):
                from .index.maxsim_index import build_maxsim_index

                self.maxsim_index = build_maxsim_index(
                    corpus.parent_texts(), self.embedder, self.config
                )

        # parent embeddings for the dot-rerank rung (mean of child embeddings) —
        # only when that rung can actually be selected (MaxSim absent): building
        # it under the default maxsim config was pure startup compute + an f32
        # full-matrix transient that get_reranker immediately dropped
        parent_emb = None
        if (
            self.config.rerank_enabled
            and self.dense_index is not None
            and self.maxsim_index is None
        ):
            parent_emb = self._build_parent_embeddings()
        self.reranker = reranker or get_reranker(
            self.config,
            parent_embeddings=parent_emb,
            maxsim_index=self.maxsim_index,
            llm_fn=rerank_llm_fn,
            texts_of=self._parent_text_by_row if rerank_llm_fn is not None else None,
            maxsim_calibration=getattr(self.embedder, "maxsim_calibration", 1.0),
        )
        self.corpus.mark_clean()

    def _parent_text_by_row(self, row: int) -> str:
        """Parent row -> text (host lookup for the LLM reranker boundary)."""
        if 0 <= row < self.corpus.n_parents:
            return self.corpus.parent_by_row(row).text
        return ""

    @classmethod
    def from_indexes(
        cls,
        corpus: CorpusStore,
        config: RAGConfig,
        bm25_index: Optional[BM25Index] = None,
        dense_index: Optional[DenseIndex] = None,
        graph_index=None,
        maxsim_index=None,
        parent_of: Optional[np.ndarray] = None,
        embedder: Optional[Embedder] = None,
        planner: Optional[QueryPlanner] = None,
        reranker: Optional[Reranker] = None,
    ) -> "Retriever":
        """Assemble a retriever from prebuilt index artifacts without re-deriving them
        (checkpoint-restore path; also the synthetic-benchmark entry point)."""
        self = cls.__new__(cls)
        self.config = config
        self.corpus = corpus
        self.analyzer = Analyzer(config)
        self.embedder = embedder or get_default_embedder(config)
        self.planner = planner or get_planner(config)
        self.bm25_index = bm25_index
        self.dense_index = dense_index
        self.graph_index = graph_index
        self.maxsim_index = maxsim_index
        if parent_of is not None:
            self.parent_of = jnp.asarray(parent_of)
        else:
            self.parent_of = _parent_of_table(corpus, config)
        self._init_collections(self.parent_of.shape[0])
        parent_emb = None
        if (
            config.rerank_enabled
            and dense_index is not None
            and maxsim_index is None
            and len(corpus)
        ):
            parent_emb = self._build_parent_embeddings()
        self.reranker = reranker or get_reranker(
            config, parent_embeddings=parent_emb, maxsim_index=maxsim_index,
            maxsim_calibration=getattr(self.embedder, "maxsim_calibration", 1.0),
        )
        return self

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def retrieve(
        self,
        query: str,
        top_k: Optional[int] = None,
        collection: Optional[str] = None,
    ) -> RetrievalResult:
        """Full staged query with per-stage timings and host-decoded results."""
        cfg = self.config
        final_k = top_k or cfg.final_top_k
        timings: Dict[str, float] = {}
        t_total = time.perf_counter()

        # 1. plan
        t0 = time.perf_counter()
        plan = self.planner.plan(query, collection)
        timings["planning_ms"] = (time.perf_counter() - t0) * 1e3

        # 2. channels (optionally collection-scoped, the reference's org_id filter)
        t0 = time.perf_counter()
        row_mask = self._collection_mask(collection)
        lex_ids, lex_scores = self._lexical_search(plan, row_mask)
        sem_ids, sem_scores, query_vec = self._semantic_search(plan, row_mask)
        gr_ids, gr_scores = self._graph_search(plan, row_mask)
        channel_counts = {
            "lexical": int(np.sum(np.asarray(lex_ids) >= 0)),
            "semantic": int(np.sum(np.asarray(sem_ids) >= 0)),
            "graph": int(np.sum(np.asarray(gr_ids) >= 0)),
        }
        timings["retrieval_ms"] = (time.perf_counter() - t0) * 1e3

        # 3. fusion
        t0 = time.perf_counter()
        weights = jnp.asarray(
            [
                plan.weights.get("lexical", cfg.lexical_weight),
                plan.weights.get("semantic", cfg.semantic_weight),
                plan.weights.get("graph", cfg.graph_weight),
            ],
            jnp.float32,
        )
        fused = fuse_rrf(
            lex_ids, lex_scores, sem_ids, sem_scores, gr_ids, gr_scores,
            weights, rrf_k=cfg.rrf_k, top_k=cfg.rerank_top_k,
            score_blend=cfg.fusion_score_blend,
            lex_conf_gate=cfg.fusion_lex_conf_gate,
        )
        if cfg.conformal_denoise_enabled:
            keep = conformal_denoise_mask(fused.ids, fused.rrf, jnp.float32(cfg.conformal_alpha))
            fused = fused._replace(ids=jnp.where(keep, fused.ids, -1))
        timings["fusion_ms"] = (time.perf_counter() - t0) * 1e3

        # 4. parent expansion
        t0 = time.perf_counter()
        parent_ids = self._expand_to_parents(fused.ids)
        timings["expansion_ms"] = (time.perf_counter() - t0) * 1e3

        # 5. rerank
        t0 = time.perf_counter()
        if cfg.rerank_enabled:
            qctx: Dict[str, object] = {"query_text": query}
            if query_vec is not None:
                qctx["query_vec"] = query_vec
            if self.maxsim_index is not None:
                qctx.update(self._query_token_ctx(plan))
            rerank_scores = self.reranker.score(qctx, parent_ids, fused.rrf)
        else:
            rerank_scores = fused.rrf
        # ordering score: optionally fold fused-RRF evidence back in (reference
        # LightweightReranker blend, retrieval/reranker.py:590-660). The GATE
        # below still sees the pure rerank score (see apply_safety_denoise).
        b = cfg.rerank_blend_rrf
        if plan.requires_graph and plan.intent in ("relational", "entity_lookup"):
            # relation-mediated answers: the MaxSim/text reranker's similarity
            # signal is wrong by construction, trust the fused ranks more
            # (config.rerank_blend_rrf_relational; reference counterpart is the
            # LLM reranker that scores relational relevance directly)
            b = cfg.rerank_blend_rrf_relational
        if cfg.rerank_enabled and b > 0:
            order_scores = (1.0 - b) * rerank_scores + b * minmax_normalize(
                fused.ids, fused.rrf
            )
        else:
            order_scores = rerank_scores
        timings["rerank_ms"] = (time.perf_counter() - t0) * 1e3

        # 6. safety + denoise
        t0 = time.perf_counter()
        if cfg.safety_enabled or cfg.denoise_enabled:
            threshold = cfg.safety_threshold if cfg.safety_enabled else -np.inf
            alpha = cfg.denoise_alpha if cfg.denoise_enabled else 0.0
            gate = apply_safety_denoise(
                fused.ids, order_scores,
                jnp.float32(threshold), jnp.float32(alpha), top_k=final_k,
                gate_scores=rerank_scores,
            )
            final_slot_ids, final_scores = gate.ids, gate.scores
            refused, max_score = bool(gate.refused), float(gate.max_score)
        else:
            final_slot_ids, final_scores = masked_top_k(
                jnp.where(fused.ids >= 0, order_scores, -jnp.inf), final_k,
                invalid_score_floor=-np.inf,
            )
            # masked_top_k returns positions into the candidate list; map to rows
            final_scores = jnp.where(final_slot_ids >= 0, final_scores, 0.0)
            final_slot_ids = jnp.where(
                final_slot_ids >= 0, fused.ids[jnp.clip(final_slot_ids, 0, None)], -1
            )
            refused, max_score = False, float(jnp.max(rerank_scores))
        timings["safety_ms"] = (time.perf_counter() - t0) * 1e3

        # decode on host
        t0 = time.perf_counter()
        results = self._decode(fused, rerank_scores, final_slot_ids, final_scores)
        timings["decode_ms"] = (time.perf_counter() - t0) * 1e3
        timings["total_ms"] = (time.perf_counter() - t_total) * 1e3

        if cfg.metrics_enabled:
            from .observability import rag_metrics
            from .observability.trace import tracer

            rag_metrics.counter("retrieval_queries_total").inc()
            rag_metrics.histogram("retrieval_latency_ms").observe(timings["total_ms"])
            for ch, n in channel_counts.items():
                rag_metrics.counter("retrieval_channel_hits_total", "").inc(
                    n, labels={"channel": ch}
                )
            if refused:
                rag_metrics.counter("retrieval_refusals_total").inc()
            for stage, ms in timings.items():
                if stage != "total_ms":
                    tracer.stage(query[:64], stage, ms)

        return RetrievalResult(
            query=query,
            results=results,
            plan=plan,
            refused=refused,
            refusal_reason=(
                None
                if not refused
                else f"Max score {max_score:.2f} below threshold {cfg.safety_threshold}"
                if channel_counts["lexical"] + channel_counts["semantic"] + channel_counts["graph"]
                else "No candidates retrieved"
            ),
            max_score=max_score,
            timings=timings,
            channel_counts=channel_counts,
        )

    # ------------------------------------------------------------------
    # channel stages
    # ------------------------------------------------------------------

    def _empty_channel(self) -> Tuple[jax.Array, jax.Array]:
        return (
            jnp.full((_EMPTY_CHANNEL_K,), -1, jnp.int32),
            jnp.zeros((_EMPTY_CHANNEL_K,), jnp.float32),
        )

    def _lexical_search(
        self, plan: QueryPlan, row_mask: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        if not self.config.lexical_enabled or self.bm25_index is None or not plan.keywords:
            return self._empty_channel()
        return self.bm25_index.search(plan.keywords, plan.lexical_top_k, row_mask)

    def _semantic_search(self, plan: QueryPlan, row_mask: Optional[jax.Array] = None):
        if not self.config.semantic_enabled or self.dense_index is None:
            ids, scores = self._empty_channel()
            return ids, scores, None
        try:
            raw = self.embedder.embed_query(plan.semantic_query_text or plan.original_query)
        except Exception:
            # degradation ladder: a dead/unreachable embedding server drops the
            # semantic channel for this query; lexical+graph still answer
            # (reference boundary behavior, rag2/retrieval.py channel isolation)
            from .observability import rag_metrics

            rag_metrics.counter("semantic_channel_failures_total").inc()
            ids, scores = self._empty_channel()
            return ids, scores, None
        qv = truncate_matryoshka(raw[None], self.config.embedding_dim)[0]
        qv = jnp.asarray(qv)
        ids, scores = self.dense_index.search(qv, plan.semantic_top_k, row_mask)
        return ids, scores, qv

    def _graph_search(
        self, plan: QueryPlan, row_mask: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        if (
            not self.config.graph_enabled
            or self.graph_index is None
            or not plan.requires_graph
        ):
            return self._empty_channel()
        return self.graph_index.search_plan(plan, row_mask)

    def _expand_to_parents(self, child_rows: jax.Array) -> jax.Array:
        safe = jnp.clip(child_rows, 0, self.parent_of.shape[0] - 1)
        return jnp.where(child_rows >= 0, self.parent_of[safe], -1)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    def _init_collections(self, n_pad: int) -> None:
        """Device collection-id table (the RLS/org-scoping analogue: row filters)."""
        self.collection_ids = self.corpus.collection_ids()
        coll = np.full((n_pad,), -1, np.int32)
        rows = self.corpus.child_collection_rows()
        if rows:
            coll[: len(rows)] = rows
        self.collection_of = jnp.asarray(coll)

    def _collection_mask(self, collection: Optional[str]) -> Optional[jax.Array]:
        """bool[n_pad] row filter for a collection; None = unscoped. Unknown collection
        -> all-False (the reference returns zero rows for a foreign org)."""
        if collection is None:
            return None
        cid = self.collection_ids.get(collection, -2)
        return self.collection_of == cid

    def _query_token_ctx(self, plan: QueryPlan) -> Dict[str, jax.Array]:
        """Token-level query embeddings for MaxSim (same embedder as the index build)."""
        text = plan.semantic_query_text or plan.original_query
        toks = self.embedder.token_embeddings(
            [text], max_tokens=self.config.maxsim_query_tokens,
            dim=self.config.maxsim_dim,
        )[0]
        mask = np.any(toks != 0, axis=-1)
        weights = maxsim_query_weights(
            text, self.analyzer, self.config.maxsim_query_tokens
        ) * mask.astype(np.float32)
        return {"q_tokens": jnp.asarray(toks), "q_mask": jnp.asarray(weights)}

    def _build_parent_embeddings(self) -> jax.Array:
        """Parent embedding = L2-normalized mean of its children's embeddings
        (device-side segment mean; parents inherit their retrieval units' geometry).

        Dequantizes int8/int4 rows first (raw quantized ints averaged and cast
        back to the storage dtype produced all-zero int8 / wrong-width packed
        parents — every dot-rerank score collapsed to the 0.5 neutral point and
        the 0.6 gate refused everything); output stays f32 (tiny: one row per
        parent)."""
        from .index.ivf import _dequant_f32

        n_parents = max(self.corpus.n_parents, 1)
        p_pad = self.config.round_capacity(n_parents)
        emb = _dequant_f32(self.dense_index.embeddings, self.dense_index.scales)
        rows = self.corpus.parent_rows()
        seg = np.full((emb.shape[0],), p_pad - 1, np.int32)
        if rows:
            seg[: len(rows)] = rows
        seg_j = jnp.asarray(seg)
        sums = jax.ops.segment_sum(emb, seg_j, num_segments=p_pad)
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        return sums / jnp.maximum(norms, 1e-12)

    def _decode(
        self,
        fused: FusedCandidates,
        rerank_scores: jax.Array,
        final_ids: jax.Array,
        final_scores: jax.Array,
    ) -> List[SearchResult]:
        return decode_results(self.corpus, fused, rerank_scores, final_ids, final_scores)


def decode_results(
    corpus: CorpusStore,
    fused: FusedCandidates,
    rerank_scores: jax.Array,
    final_ids: jax.Array,
    final_scores: jax.Array,
) -> List[SearchResult]:
    """Host decode: device rows -> SearchResult records (shared by the staged Retriever
    and the one-dispatch ShardedEngine)."""
    f_ids = np.asarray(fused.ids)
    slot_of = {int(cid): i for i, cid in enumerate(f_ids) if cid >= 0}
    rrf = np.asarray(fused.rrf)
    lex = np.asarray(fused.lexical)
    sem = np.asarray(fused.semantic)
    gr = np.asarray(fused.graph)
    chan = np.asarray(fused.channels)
    rk = np.asarray(rerank_scores)

    out: List[SearchResult] = []
    for cid, score in zip(np.asarray(final_ids), np.asarray(final_scores)):
        cid = int(cid)
        if cid < 0:
            continue
        child = corpus.child_by_row(cid)
        parent = corpus.parent(child.parent_id)
        slot = slot_of.get(cid)
        channels = []
        if slot is not None:
            bits = int(chan[slot])
            if bits & LEXICAL_BIT:
                channels.append("lexical")
            if bits & SEMANTIC_BIT:
                channels.append("semantic")
            if bits & GRAPH_BIT:
                channels.append("graph")
        out.append(
            SearchResult(
                chunk_id=child.chunk_id,
                parent_id=child.parent_id,
                doc_id=child.doc_id,
                text=child.text,
                parent_text=parent.text if parent else None,
                section_heading=child.section_heading,
                page_start=child.page_start,
                page_end=child.page_end,
                modality=child.modality,
                lexical_score=float(lex[slot]) if slot is not None else 0.0,
                semantic_score=float(sem[slot]) if slot is not None else 0.0,
                graph_score=float(gr[slot]) if slot is not None else 0.0,
                rrf_score=float(rrf[slot]) if slot is not None else 0.0,
                rerank_score=float(rk[slot]) if slot is not None else None,
                final_score=float(score),
                source_channels=tuple(channels),
            )
        )
    return out


def retrieve(
    corpus: CorpusStore,
    query: str,
    top_k: Optional[int] = None,
    collection: Optional[str] = None,
    **kwargs,
) -> RetrievalResult:
    """Convenience one-shot (reference rag2/retrieval.py:497-505).

    ``top_k``/``collection`` go to the query; remaining kwargs construct the
    Retriever (previously ``collection=`` was forwarded into ``__init__`` and
    raised TypeError)."""
    return Retriever(corpus, **kwargs).retrieve(query, top_k=top_k, collection=collection)
