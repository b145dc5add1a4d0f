"""The RAG facade: one object for ingest + query + persistence.

The reference *advertises* this class in its package docstring but never implemented it
(``/root/reference/triple-hybrid-rag/src/triple_hybrid_rag/__init__.py:14-21`` promises
``rag = RAG(); rag.ingest("document.pdf"); results = rag.query("...")``). Here it exists:

    from triple_hybrid_rag_tpu import RAG
    rag = RAG()
    rag.ingest("document.md")
    result = rag.query("What are the payment terms?")
    rag.save("./index")            # checkpoint
    rag2 = RAG.load("./index")     # restore

The facade owns an Ingestor (host corpus + entity store) and lazily (re)builds the
Retriever/ShardedEngine whenever the corpus changed since the last query.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

from .config import RAGConfig, get_settings
from .ingest import Ingestor
from .retrieval import Retriever
from .types import IngestionResult, RetrievalResult


class RAG:
    def __init__(
        self,
        config: Optional[RAGConfig] = None,
        embedder=None,
        planner=None,
        extractor=None,
        rerank_fn=None,
        ocr_fn=None,
        use_sharded_engine: bool = False,
    ) -> None:
        self.config = config or get_settings()

        # external model servers: any *_api_base config field activates the matching
        # OpenAI-compatible HTTP client (the reference's vLLM/LM Studio/OpenAI serving
        # boundary — models/http_clients.py); explicit arguments always win
        from .models.http_clients import wire_http_models

        wired = wire_http_models(self.config)
        embedder = embedder or wired.get("embedder")
        if extractor is None and "extractor_fn" in wired and self.config.ner_enabled:
            from .models.entity_extractor import CallableExtractor

            extractor = CallableExtractor(wired["extractor_fn"], self.config)
        if planner is None and "planner_fn" in wired:
            from .models.planner import CallablePlanner

            planner = CallablePlanner(wired["planner_fn"], self.config)
        self._planner = planner
        self._rerank_fn = rerank_fn or wired.get("rerank_fn")

        loader = None
        ocr_fn = ocr_fn or wired.get("ocr_fn")
        if ocr_fn is not None:
            from .loader import DocumentLoader
            from .ocr import OCRProcessor

            loader = DocumentLoader(ocr_processor=OCRProcessor(ocr_fn))

        self.ingestor = Ingestor(
            config=self.config, embedder=embedder, extractor=extractor, loader=loader
        )
        self.use_sharded_engine = use_sharded_engine
        self._retriever: Optional[Retriever] = None
        self._engine = None

    # ------------------------------------------------------------------
    # ingestion
    # ------------------------------------------------------------------

    def ingest(self, path: str | Path, **kwargs) -> IngestionResult:
        return self.ingestor.ingest_file(path, **kwargs)

    def ingest_directory(self, directory: str | Path, **kwargs) -> List[IngestionResult]:
        return self.ingestor.ingest_directory(directory, **kwargs)

    def ingest_text(self, text: str, name: str = "inline.txt", **kwargs) -> IngestionResult:
        return self.ingestor.ingest_text(text, name=name, **kwargs)

    # ------------------------------------------------------------------
    # query
    # ------------------------------------------------------------------

    @property
    def retriever(self) -> Retriever:
        if self._retriever is None or self.ingestor.corpus.dirty:
            kwargs = {}
            if self._planner is not None:
                kwargs["planner"] = self._planner
            if self._rerank_fn is not None:
                kwargs["rerank_llm_fn"] = self._rerank_fn
            self._retriever = self.ingestor.make_retriever(**kwargs)
            # live update: re-place arrays into the existing engine when its compiled
            # programs are still shape-valid (zero recompiles); else rebuild lazily
            if self._engine is not None and not self._engine.refresh(self._retriever):
                self._engine = None
        return self._retriever

    def query(self, query: str, top_k: Optional[int] = None, **kwargs) -> RetrievalResult:
        retriever = self.retriever
        if self.use_sharded_engine:
            return self._get_engine().retrieve(
                query, top_k=top_k, collection=kwargs.get("collection")
            )
        return retriever.retrieve(query, top_k=top_k, **kwargs)

    def query_batch(
        self,
        queries: List[str],
        top_k: Optional[int] = None,
        collection: Optional[str] = None,
        collections: Optional[List[Optional[str]]] = None,
    ) -> List[RetrievalResult]:
        """Batched retrieval through the one-dispatch engine (the serving path —
        batching amortizes the host->device round trip; see parallel/engine.py).
        Collection scoping works batch-wide or per query."""
        if not queries:
            return []
        return self._get_engine().retrieve_batch(
            queries, top_k=top_k, collection=collection, collections=collections
        )

    def _get_engine(self):
        retriever = self.retriever  # may invalidate self._engine via rebuild
        if self._engine is None:
            from .parallel import ShardedEngine, corpus_mesh

            self._engine = ShardedEngine(retriever, corpus_mesh())
        return self._engine

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def save(self, directory: str | Path) -> Path:
        from .index.checkpoint import save_ingestor

        return save_ingestor(self.ingestor, directory)

    @classmethod
    def load(
        cls, directory: str | Path, config: Optional[RAGConfig] = None,
        allow_pickle: bool = False, trust_config: bool = False, **kwargs
    ) -> "RAG":
        """Restore from a checkpoint. ``allow_pickle`` opts into loading legacy v1
        (pickle) checkpoints; ``trust_config`` keeps the checkpoint's network
        fields (*_api_base / api_key) instead of stripping them — both only for
        checkpoints YOU wrote."""
        from .index.checkpoint import load_ingestor

        ing = load_ingestor(
            directory, config=config,
            allow_pickle=allow_pickle, trust_config=trust_config,
        )
        rag = cls(config=ing.config, **kwargs)
        rag.ingestor = ing
        return rag

    # ------------------------------------------------------------------

    def stats(self) -> dict:
        out = {
            **self.ingestor.corpus.stats(),
            **{f"graph_{k}": v for k, v in self.ingestor.entity_store.stats().items()},
        }
        if self._engine is not None:  # compiled serving-engine backend choices
            out["engine_lexical_mode"] = self._engine.lexical_mode
            out["engine_graph_mode"] = self._engine.graph_mode
            out["engine_semantic_backend"] = (
                "ivf" if self._engine.ivf_mode else "exact"
            )
            out["engine_n_shards"] = self._engine.n_shards
            out["engine_n_pad"] = self._engine.n_pad
        return out
