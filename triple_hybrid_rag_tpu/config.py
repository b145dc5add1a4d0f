"""Static configuration for the TPU-native triple-hybrid retrieval engine.

Design
------
The reference framework (``/root/reference/triple-hybrid-rag/src/triple_hybrid_rag/config.py:15``
and ``/root/reference/src/voice_agent/config.py:282-340``) exposes every capability as an
independently toggleable pydantic setting read from ``RAG_*`` environment variables.

On TPU the analogue is a *frozen, hashable dataclass*: the config is static w.r.t. tracing, so
each distinct configuration specializes its own jit-compiled pipeline (channel enables become
compile-time branches, top-k values become static shapes). ``RAGConfig`` is therefore:

- immutable (``frozen=True``) and hashable → usable as a static jit argument,
- constructed from the environment via :meth:`RAGConfig.from_env` for drop-in env-var parity,
- tweaked per-call with :func:`dataclasses.replace`.

Defaults mirror the reference: channel weights lexical 0.7 / semantic 0.8 / graph 1.0, RRF k=60,
safety threshold 0.6, denoise alpha 0.6, channel top-k 50/100/50, rerank 20, final 5
(``/root/reference/src/voice_agent/config.py:305-314``), parent/child chunk sizing
(``:298-300``), Matryoshka 2048->1024 truncation semantics
(``/root/reference/triple-hybrid-rag/src/triple_hybrid_rag/core/embedder.py:58-77``).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Optional, Tuple


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    return int(raw) if raw is not None else default


def _env_float(name: str, default: float) -> float:
    raw = os.environ.get(name)
    return float(raw) if raw is not None else default


def _env_str(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class RAGConfig:
    """Frozen, hashable configuration. Static fields specialize compiled pipelines."""

    # ---- channel enables (reference: per-channel feature flags) ----
    lexical_enabled: bool = True
    semantic_enabled: bool = True
    graph_enabled: bool = True
    rerank_enabled: bool = True
    denoise_enabled: bool = True
    safety_enabled: bool = True
    conformal_denoise_enabled: bool = False  # standalone-lib percentile variant (fusion.py:218)
    ner_enabled: bool = True
    # NER retry backoff sleep cap (exp backoff 2s->10s, reference tenacity ladder
    # rag2/ingest.py:466-472); test configs shrink it so retry tests stay fast
    ner_retry_sleep_cap_s: float = 10.0

    # ---- RRF fusion (reference fusion.py:22, retrieval.py:358-376) ----
    rrf_k: int = 60
    lexical_weight: float = 0.7
    semantic_weight: float = 0.8
    graph_weight: float = 1.0
    # Ordering-key interpolation between rank-RRF (0.0, exact reference behavior)
    # and CombSUM over per-channel min-max scores (1.0). Rank fusion discards
    # score magnitude; CombSUM measured better or equal on every corpus
    # (scripts/fusion_lab.py + real-funnel runs in eval_results/): 1500-doc
    # docstrings full pipeline 0.540 -> 0.560 (0.572 with the fine-tuned
    # encoder), hermetic fused NDCG 0.947-0.962 -> 1.000, stdlib-500 unchanged.
    # Set 0.0 for reference rank-RRF parity.
    fusion_score_blend: float = 1.0
    # Per-query semantic down-weighting by lexical confidence (ops/fusion.py
    # fuse_rrf lex_conf_gate): g = 1 - min(1, gate * top-2 BM25 relative margin).
    # Default 12.0 measured through the real funnel (gate 6 / 12): 1500-doc full
    # pipeline 0.572 -> 0.589 / 0.594, stdlib-500 full 0.815 -> 0.839 / 0.848;
    # at both strengths the hermetic ladder stays 1.000/1.000 and the
    # zero-overlap paraphrase funnel stays 16/16 rank-1 (flat or empty lexical
    # lists leave dense at full voice, so paraphrase queries are unaffected by
    # construction). Stronger gates keep helping on lexical-favoring corpora but
    # approach "dense only as tiebreak" — 12 silences dense at >=8.3% relative
    # BM25 margin. 0.0 = off (reference-parity fusion).
    fusion_lex_conf_gate: float = 12.0

    # ---- safety / denoising (reference retrieval.py:461-495) ----
    # NOTE: the threshold applies to rerank scores and is calibrated to the reranker.
    # With the PACKAGED TRAINED ENCODER (the "auto" default, identity-anchored),
    # raw MaxSim is renormalized by the embedder-declared divisor
    # (ops.maxsim.calibrate_maxsim = anchor_token_w2) so a full lexical match ~ 1.0;
    # on the zero-overlap paraphrase holdout the calibrated scores separate as
    # relevant p5=0.68 vs irrelevant p95=0.46 — the reference's 0.6 holds (measured,
    # models/pretrain.py recipe, 16/16 rank-1).
    # With the bowhash fallback MaxSim ~ query-token recall, where ~0.35 separates
    # paraphrases from garbage (see examples/basic_usage.py).
    safety_threshold: float = 0.6
    denoise_alpha: float = 0.6
    conformal_alpha: float = 0.6  # percentile variant: keep score >= pct(scores, (1-a)*100)

    # ---- channel top-k (reference config.py:310-314) ----
    lexical_top_k: int = 50
    semantic_top_k: int = 100
    graph_top_k: int = 50
    # rerank pool = the reference's 50-candidate cap (retrieval/reranker.py:383).
    # Depth sweep (stage_ablation_depth*.json, bigcorpus_depth.json): d50 beats
    # d20 on 5/6 small-corpus seed cells and by +1.9pp recall@10 on the 33k-doc
    # corpus (0.4487 = lexical +5.9pp), at negligible single-query latency cost
    # below ~100k children (MaxSim pool gather scales with this).
    rerank_top_k: int = 50
    final_top_k: int = 5

    # ---- chunking (reference rag2/chunker.py:30-51) ----
    parent_chunk_tokens: int = 1000
    parent_chunk_min_tokens: int = 800
    child_chunk_tokens: int = 200
    child_chunk_overlap_tokens: int = 50
    child_token_buffer_pct: float = 0.2  # children may run 20% over (lib core/chunker.py:34)
    use_tiktoken: bool = False  # reference prod uses len//4 heuristic; lib uses tiktoken

    # ---- embeddings (reference embedder.py:31-120) ----
    embedder_backend: str = "auto"  # "auto" | "encoder" | "bowhash" | "hash"
    # auto = the packaged TRAINED encoder (models/data/encoder.npz) when present —
    # paraphrase-capable dense/token embeddings, the reference's Qwen3-VL-Embedding
    # analogue running on-mesh — falling back to bowhash; an HTTP embed_api_base or an
    # explicit embedder argument always takes precedence over this field.
    embedding_dim_full: int = 2048  # model-native dim before Matryoshka truncation
    embedding_dim: int = 1024  # Matryoshka prefix-truncated + re-L2-normalized
    embedding_dtype: str = "bfloat16"  # HBM matrix dtype: float32|bfloat16|int8|int4
    # Inference-time override of the packaged encoder's pooled-anchor blend weight
    # (squared). The checkpoint trains at 0.5; 0.65 measured strictly better on
    # off-distribution text (+5.2pp dense-only recall@10 on the 1500-doc
    # docstring corpus) with ZERO paraphrase-holdout loss at 400 docs
    # (eval_results/round2_measurements.json). None = use the checkpoint value.
    encoder_anchor_pool_w2: Optional[float] = 0.65
    # Path to encoder weights (npz from `thr train-encoder --out ...`). None = the
    # packaged default (models/data/encoder.npz). Lets a user ship corpus-fitted
    # weights without overwriting the package file.
    encoder_params_path: Optional[str] = None
    embedding_batch_size: int = 20
    # Dense-channel search backend. "exact" = full MXU scan (default: lossless,
    # and faster than the reference's HNSW-over-Postgres at every measured
    # scale). "ivf" = blocked-IVF ANN (index/ivf.py): spherical-k-means
    # cluster-major reorder + fixed-width block probing — the TPU-native
    # answer to pgvector's HNSW (which is also approximate). Wins when
    # compute/latency matters more than the last recall points: probing
    # ivf_probes of n_loc/ivf_block_rows blocks cuts dense compute and HBM
    # reads by that ratio. All row dtypes supported (int4 windows unpack on
    # the fly); full probing reproduces the exact backend's results bit-for-bit
    # for f32 rows — quantized dtypes score in dequantized f32 here vs int8
    # MXU dots there, so scores (not ranks, in practice) can differ slightly.
    semantic_backend: str = "exact"  # "exact" | "ivf"
    ivf_block_rows: int = 512  # rows per probe block (fixed width: no imbalance)
    ivf_probes: int = 32  # blocks scanned per query (>= n_blocks -> exact, tested)
    ivf_kmeans_iters: int = 8  # build-time Lloyd iterations (spherical k-means)
    ivf_clusters: int = 0  # 0 = auto (n_loc / ivf_block_rows) ordering clusters

    # ---- lexical / BM25 engine (TPU-native replacement for Postgres FTS) ----
    bm25_k1: float = 1.5
    bm25_b: float = 0.75
    max_query_terms: int = 16  # static query-term slots (padded/masked); the sorted
    # lexical path's work is Q x l_max, so this directly scales lexical cost — the
    # reference planner emits ~5-10 keywords (query_planner.py few-shot examples)
    doc_term_capacity: int = 128  # doc-major term-table width (per-child unique-term cap)
    lexical_backend: str = "auto"  # "postings" | "termtable" | "sorted" | "auto"
    bm25_df_cap: int = 0  # 0 = uncapped; else truncate a term's postings to top-tf cap
    # (impact pruning: ultra-common terms carry near-zero idf; capping bounds the
    #  sorted-path postings window and device memory at 1M+ scale)
    lexical_tiering: bool = True  # engine: rare terms use small gather windows
    bm25_small_window: int = 128  # window for terms with stored df <= this
    bm25_large_slots: int = 4  # query slots for high-df terms (overflow drops the
    # most common ones — the least informative; typical queries have <= 2)
    topk_backend: str = "exact"  # "exact" | "approx" (jax.lax.approx_max_k on TPU)

    # ---- graph channel (TPU-native replacement for PuppyGraph) ----
    graph_hops: int = 2  # k-hop expansion depth (puppygraph.py:130-167)
    graph_max_degree: int = 64  # padded adjacency width
    graph_max_entities_per_chunk: int = 16
    graph_fuzzy_threshold: float = 0.35  # trigram-jaccard entity name matching
    graph_max_seeds: int = 8  # seed-entity slots per query on the wire (the engine
    # ships sparse seed ROW IDS, i32[B, 8] = 2 KB/batch, instead of a dense
    # bool[B, E_pad] mask — host->device payload stays O(1) in entity count)
    # Seed stoplist: entities mentioned in more than this fraction of child
    # chunks are dropped at SEED time only (never from the adjacency or the
    # explicit entity_lookup/PuppyGraph-parity APIs). Ubiquitous names
    # ("Python", "Example") carry no routing signal and activate huge
    # k-hop neighborhoods at weight 1.0 — measured ~-11pp cloze recall at
    # 33k-corpus scale before this filter. The idf analogue the lexical
    # channel already has. 0 disables.
    graph_seed_stop_df: float = 0.05
    graph_seed_stop_min: int = 64  # absolute mention floor below which the df
    # test never fires (tiny corpora: df fractions are all noise)
    # Graph chunk-scoring backend. "dense" scans chunk_entities[N, M] per query
    # (blocked bucket-maxima, O(N)); "sparse" inverts it into entity->chunk
    # mention postings and scores only chunks that mention an activated entity
    # (O(matched mentions), the same sort-based machinery as the lexical
    # channel). "auto" picks sparse exactly when it is provably EXACT: the
    # worst-case activated-entity count seeds * sum(deg^i, i<=hops) fits
    # graph_active_slots and no entity's mention list was truncated; ids then
    # match the dense path bit-for-bit, ties included (measured: the dense scan
    # was ~half of full-pipeline device time at 1M chunks).
    graph_backend: str = "auto"  # "auto" | "dense" | "sparse"
    graph_mention_cap: int = 4096  # per-entity mention-postings cap at placement
    # (entities mentioned in more chunks keep the lowest chunk rows; the
    # reference's Cypher keyword search LIMITs chunk lists the same way —
    # puppygraph.py:340-399). auto only picks sparse when nothing was capped.
    graph_active_slots: int = 1024  # activated-entity slots per query (sparse)
    # Small-batch sparse override: compiled programs whose per-replica batch
    # width is <= this use the sparse mention-CSR path even when the engine's
    # large-batch mode is the dense scan. The dense chunk_entities scan is
    # batch-INDEPENDENT (~57 ms of a 70 ms batch-1 program at 1M chunks,
    # eval_results/channels_b1_1m.json) so it dominates single-query latency,
    # while the sparse path's work is per-query (activated mentions) and tiny
    # at batch 1. When the worst-case activation bound exceeds
    # graph_active_slots the small-batch path keeps the top-slots activated
    # entities by k-hop score (documented approximation: chunks whose best
    # entity falls below the cut can miss; hop-0/1 seeds always fit — the
    # reference's Cypher walk LIMITs its entity/chunk lists far harder,
    # puppygraph.py:340-399). Set 0 to disable (exact dense at every width).
    graph_sparse_max_batch: int = 4

    # ---- rerank / late interaction (SURVEY §5.7) ----
    rerank_backend: str = "maxsim"  # "maxsim" | "dot" | "none"
    maxsim_doc_tokens: int = 64  # stored token-level embeddings per parent chunk
    maxsim_query_tokens: int = 32
    maxsim_dim: int = 128  # reduced dim for token-level embeddings
    rerank_max_candidates: int = 50  # reference reranker.py:383 caps at 50
    # Blend weight of the min-max-normalized fused RRF score into the rerank
    # ORDERING score: order = (1-b)*rerank + b*minmax(rrf). The reference's
    # LightweightReranker blends term-overlap with rrf/similarity the same way
    # (retrieval/reranker.py:590-660); 0 = pure late-interaction reorder. The
    # safety/denoise gate always sees the pure calibrated rerank score
    # (ops/fusion.py apply_safety_denoise gate_scores). Default 0.5 at the d50
    # pool: tuned on seed 0, validated on seed 7 + the 33k-doc corpus
    # (stage_ablation_depth*.json, bigcorpus_depth.json — 0.4487 vs lexical
    # 0.3894 at 33k; b=0.3 remains better at the d20 pool, stage_ablation*.json).
    rerank_blend_rrf: float = 0.5

    # ---- plan-aware relational overrides ----
    # For relation-mediated intents (relational / entity_lookup) the answer doc
    # is connected to the query through a graph edge, not through shared text:
    # the lexical/semantic channels can only match the question's function words
    # and the MaxSim reranker's text-similarity signal is actively wrong. The
    # reference handles this with planner-suggested per-intent channel weights
    # (rag2/query_planner.py:54-94 — its LLM even zeroes graph for procedural
    # queries) and an LLM reranker that understands relational relevance. The
    # rule-based analogues: scale the text channels' RRF weight down, and shift
    # the ordering blend toward fused ranks. Measured on the AST code-graph
    # corpus (eval_results/code_graph_240.json): graph-query recall@10
    # 0.451 -> 0.564 from the blend alone; scale recovers fusion dilution.
    # 1.0 disables either.
    planner_relational_text_scale: float = 0.5
    rerank_blend_rrf_relational: float = 0.8

    # ---- sharding / parallelism ----
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axis_names: Tuple[str, ...] = ("shard",)
    shard_axis: str = "shard"  # corpus-sharding mesh axis
    data_axis: Optional[str] = None  # query-batch data-parallel axis (None = unsharded)

    # ---- capacity (XLA static shapes: capacity-padded arrays + occupancy masks) ----
    chunk_capacity: int = 0  # 0 = size to corpus at build time (rounded up)
    capacity_round: int = 1024  # round capacities to multiples of this

    # ---- planner ----
    planner_backend: str = "rules"  # "rules" | "llm" (llm is a pluggable host callable)

    # ---- external model servers (optional OpenAI-compatible HTTP boundary) ----
    # Setting a base URL activates the matching HTTP client (models/http_clients.py):
    # the reference's vLLM/LM Studio/OpenAI serving boundary (rag2/embedder.py:31,
    # retrieval/reranker.py:287, rag2/query_planner.py:97, ingestion/ocr.py:223).
    # Empty string = disabled; the on-mesh / rule-based defaults apply.
    embed_api_base: str = ""  # e.g. "http://127.0.0.1:1234/v1" -> HTTPEmbedder
    embed_api_model: str = ""
    rerank_api_base: str = ""  # -> HTTPRerankerFn (native /rerank + chat fallback)
    rerank_api_model: str = ""
    llm_api_base: str = ""  # -> planner + NER JSON-chat callables
    llm_api_model: str = ""
    ocr_api_base: str = ""  # -> HTTPVisionOCR recognition rung
    ocr_api_model: str = ""
    api_key: str = ""  # bearer token for all of the above ("" = none)
    api_timeout_s: float = 30.0
    api_retries: int = 2

    # ---- analyzer ----
    analyzer_languages: Tuple[str, ...] = ("en", "pt")
    analyzer_strip_accents: bool = True
    analyzer_min_token_len: int = 2
    analyzer_stemming: str = "light"  # "light" (S-stemmer) | "none"
    vocab_hash_buckets: int = 32768  # encoder-model token hashing

    # ---- observability ----
    metrics_enabled: bool = True
    timings_enabled: bool = True

    # ---- native fast path (C++ ingestion loops; graceful fallback to Python) ----
    use_native: bool = True
    # Pallas kernels for hot ops (off-CPU only; XLA reference ops otherwise). Through
    # this dev chip's tunnel the kernels time identically to XLA's fusions; the flag
    # exists for locally-attached hardware where the explicit schedules can win.
    use_pallas: bool = False
    # Fused matmul+top-k dense channel (ops/pallas/fused_topk.py): never
    # materializes the f32[B, N] score matrix. Exact vs the XLA path (int8:
    # bit-identical; bf16: up to f32 accumulation order). Measured on v5e
    # (scripts/bench_fused_topk.py, 2026-08): the pure-XLA *bucketed* top-k
    # (ops/topk.bucketed_masked_top_k_batch) is 5-7% FASTER than the kernel at
    # every serving shape (5.4 vs 6.0 ms at 0.8M int8, 38.1 vs 40.0 at 8M), so
    # the kernel's remaining value is CAPACITY: it skips the f32[B, N] HBM
    # transient (2 GB at 8M x batch 64). None = auto: fused only on real
    # accelerators AND when that transient would exceed
    # fused_topk_auto_bytes of headroom; explicitly True/False overrides.
    use_fused_topk: Optional[bool] = None
    # auto threshold for the dense score-matrix transient (bytes): above this,
    # the fused kernel replaces the bucketed-XLA path to protect HBM headroom
    fused_topk_auto_bytes: int = 1_500_000_000

    @classmethod
    def from_env(cls, **overrides: object) -> "RAGConfig":
        """Build a config from ``RAG_*`` environment variables (reference env parity)."""
        base = cls()
        env_map: dict[str, object] = {}
        for f in dataclasses.fields(cls):
            env_name = "RAG_" + f.name.upper()
            if os.environ.get(env_name) is None:
                continue
            default = getattr(base, f.name)
            if isinstance(default, bool):
                env_map[f.name] = _env_bool(env_name, default)
            elif isinstance(default, int):
                env_map[f.name] = _env_int(env_name, default)
            elif isinstance(default, float):
                env_map[f.name] = _env_float(env_name, default)
            elif isinstance(default, str):
                env_map[f.name] = _env_str(env_name, default)
            elif default is None and f.name == "use_fused_topk":
                # tri-state: "auto"/"" keeps None, else parsed as bool
                raw = os.environ[env_name].strip().lower()
                if raw not in ("", "auto"):
                    env_map[f.name] = _env_bool(env_name, False)
            elif default is None and f.type in ("Optional[str]", "typing.Optional[str]"):
                raw = os.environ[env_name]
                if raw.strip():
                    env_map[f.name] = raw
            # tuple-typed / other None-default fields are not env-configurable
        env_map.update(overrides)
        return dataclasses.replace(base, **env_map)  # type: ignore[arg-type]

    def replace(self, **kw: object) -> "RAGConfig":
        return dataclasses.replace(self, **kw)  # type: ignore[arg-type]

    def round_capacity(self, n: int) -> int:
        """Round a corpus size up to the capacity granularity (static-shape padding)."""
        r = self.capacity_round
        return max(r, ((n + r - 1) // r) * r)


_SETTINGS: Optional[RAGConfig] = None


def get_settings() -> RAGConfig:
    """Singleton config (reference ``get_settings()`` lru_cache parity, config.py:282)."""
    global _SETTINGS
    if _SETTINGS is None:
        _SETTINGS = RAGConfig.from_env()
    return _SETTINGS


def reset_settings() -> None:
    """Clear the singleton (reference ``reset_settings()`` test hook, config.py:299)."""
    global _SETTINGS
    _SETTINGS = None
