"""triple-hybrid-rag-tpu: TPU-native triple-hybrid retrieval framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``matheusfalcaopinto/triple-hybrid-rag`` (RAG 2.0): lexical BM25, dense Matryoshka-embedding
search, and knowledge-graph entity expansion — fused with weighted Reciprocal Rank Fusion,
expanded child->parent, reranked with late-interaction MaxSim, and gated by safety threshold +
conformal denoising. The three "databases" of the reference (Postgres FTS, pgvector HNSW,
PuppyGraph) become three device-resident index structures in HBM, sharded over a
``jax.sharding.Mesh``; a query touches the host only at tokenization and result decode.

Public API mirrors the reference's standalone library surface
(``/root/reference/triple-hybrid-rag/src/triple_hybrid_rag/__init__.py:28-57``) plus the
production pipeline surface (``/root/reference/src/voice_agent/rag2/__init__.py:13-59``),
including the ``RAG`` facade the reference advertises but never implemented
(``__init__.py:14-21`` there).
"""

from .analyzer import Analyzer, Vocabulary, trigram_similarity
from .chunker import HierarchicalChunker, RecursiveSplitter
from .config import RAGConfig, get_settings, reset_settings
from .types import (
    ChildChunk,
    Document,
    Entity,
    EntityMention,
    EntityType,
    ExtractionResult,
    FileType,
    IngestionResult,
    IngestionStatus,
    LoadedDocument,
    Modality,
    OCRResult,
    PageContent,
    ParentChunk,
    QueryPlan,
    Relation,
    RelationType,
    RetrievalResult,
    SearchChannel,
    SearchResult,
    content_hash,
    file_hash_bytes,
)

__version__ = "0.1.0"

__all__ = [
    "RAGConfig",
    "get_settings",
    "reset_settings",
    "Analyzer",
    "Vocabulary",
    "trigram_similarity",
    "HierarchicalChunker",
    "RecursiveSplitter",
    "Document",
    "PageContent",
    "LoadedDocument",
    "ParentChunk",
    "ChildChunk",
    "Entity",
    "EntityMention",
    "Relation",
    "ExtractionResult",
    "SearchResult",
    "QueryPlan",
    "RetrievalResult",
    "OCRResult",
    "IngestionResult",
    "FileType",
    "Modality",
    "EntityType",
    "RelationType",
    "IngestionStatus",
    "SearchChannel",
    "content_hash",
    "file_hash_bytes",
    "__version__",
    # lazily imported via __getattr__ (PEP 562) — listed here so star-imports,
    # dir() and IDE completion see the advertised facade
    "RAG",
    "Retriever",
    "Ingestor",
]


def __dir__():
    return sorted(set(list(globals()) + __all__))


def __getattr__(name: str):
    """Lazy access to heavier subsystems (keeps base import light; JAX loads on demand)."""
    if name == "RAG":
        from .facade import RAG

        return RAG
    if name == "Retriever":
        from .retrieval import Retriever

        return Retriever
    if name == "Ingestor":
        from .ingest import Ingestor

        return Ingestor
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
