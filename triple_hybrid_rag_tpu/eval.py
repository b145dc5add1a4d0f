"""Retrieval-quality evaluation: recall@k / NDCG@k over the five BASELINE configs.

The reference publishes no retrieval-quality numbers (SURVEY.md §6: "No recall@k / NDCG
numbers are published anywhere in the repo"); BASELINE.json requires this framework to
establish them itself. This module provides:

- :func:`recall_at_k` / :func:`ndcg_at_k` — standard metrics over ranked chunk-id lists,
- :func:`make_eval_corpus` — a synthetic labeled corpus: topical documents with known
  relevant chunks per query (paraphrase queries exercise the semantic channel, keyword
  queries the lexical channel, entity queries the graph channel),
- :func:`evaluate` — run a retriever/engine over the query set and aggregate metrics,
- :func:`evaluate_baseline_configs` — the five BASELINE.json configurations:
  lexical-only, dense-only, dual-hybrid RRF, triple-hybrid, full pipeline with rerank.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Set

import numpy as np

from .chunker import HierarchicalChunker
from .config import RAGConfig
from .corpus import CorpusStore
from .index.graph_index import build_graph_index
from .models.entity_extractor import EntityStore, RuleBasedExtractor
from .retrieval import Retriever
from .types import RetrievalResult


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def recall_at_k(ranked_ids: Sequence[str], relevant: Set[str], k: int = 10) -> float:
    """|top-k ∩ relevant| / |relevant|."""
    if not relevant:
        return 0.0
    hits = sum(1 for cid in list(ranked_ids)[:k] if cid in relevant)
    return hits / len(relevant)


def ndcg_at_k(ranked_ids: Sequence[str], relevant: Set[str], k: int = 10) -> float:
    """Binary-relevance NDCG@k."""
    if not relevant:
        return 0.0
    dcg = sum(
        1.0 / math.log2(i + 2)
        for i, cid in enumerate(list(ranked_ids)[:k])
        if cid in relevant
    )
    ideal = sum(1.0 / math.log2(i + 2) for i in range(min(len(relevant), k)))
    return dcg / ideal if ideal > 0 else 0.0


def mrr(ranked_ids: Sequence[str], relevant: Set[str]) -> float:
    for i, cid in enumerate(ranked_ids):
        if cid in relevant:
            return 1.0 / (i + 1)
    return 0.0


# ---------------------------------------------------------------------------
# labeled synthetic corpus
# ---------------------------------------------------------------------------

_TOPICS = [
    ("payments", "invoice settlement billing penalty quarterly",
     "Invoices must be settled within thirty days. The billing cycle is quarterly and "
     "late settlement incurs a penalty fee."),
    ("contracts", "termination clause renewal notice breach",
     "The termination clause requires ninety days notice. Renewal is automatic unless "
     "either party objects; breach voids the renewal provision."),
    ("security", "password rotation authentication portal access",
     "Passwords rotate every ninety days through the self-service portal. Two-factor "
     "authentication is mandatory for all remote access."),
    ("logistics", "freight shipment customs warehouse delivery",
     "Freight shipments clear customs before warehouse intake. Delivery windows are "
     "confirmed forty-eight hours ahead."),
    ("wildlife", "foxes bears forest habitat hibernation",
     "Red foxes share the northern forest habitat with brown bears. Bears hibernate "
     "through the winter months."),
    ("compute", "quantum processor qubit coherence hardware",
     "Quantum processors maintain qubit coherence through cryogenic hardware. Error "
     "correction consumes most physical qubits."),
]

_COMPANIES = ["Acme Corp", "Beta Logistics", "CloudStack Systems", "Delta Insurance"]
_PEOPLE = ["John Smith", "Maria Silva", "Wei Chen", "Ana Costa"]


@dataclass
class EvalQuery:
    text: str
    relevant_chunk_ids: Set[str]
    kind: str  # "keyword" | "paraphrase" | "entity"


@dataclass
class EvalCorpus:
    corpus: CorpusStore
    entity_store: EntityStore
    queries: List[EvalQuery] = field(default_factory=list)


def make_eval_corpus(
    cfg: RAGConfig,
    docs_per_topic: int = 4,
    distractors: int = 30,
    hard_negatives: int = 0,
) -> EvalCorpus:
    """Labeled corpus: per topic, documents whose chunks are relevant to that topic's
    queries, plus distractor documents relevant to nothing.

    ``hard_negatives`` adds per-topic confusable documents that REUSE topic vocabulary
    in off-topic statements (e.g. payment words inside a memo about something else) —
    they stress ranking rather than matching, the regime where fusion and reranking
    must earn their keep."""
    store = CorpusStore()
    estore = EntityStore()
    chunker = HierarchicalChunker(cfg)
    extractor = RuleBasedExtractor(cfg)
    topic_chunks: Dict[str, Set[str]] = {name: set() for name, _, _ in _TOPICS}
    entity_chunks: Dict[str, Set[str]] = {}

    def ingest(name: str, text: str) -> List[str]:
        doc_id = hashlib.sha256(name.encode()).hexdigest()
        parents, children = chunker.chunk_document(text, doc_id)
        store.add_chunks(parents, children)
        for p in parents:
            kids = [c for c in children if c.parent_id == p.parent_id]
            estore.store_extraction(extractor.extract(p, kids))
        return [c.chunk_id for c in children if c.row >= 0]

    for t_idx, (name, keywords, body) in enumerate(_TOPICS):
        company = _COMPANIES[t_idx % len(_COMPANIES)]
        person = _PEOPLE[t_idx % len(_PEOPLE)]
        for d in range(docs_per_topic):
            text = (
                f"# {name.title()} Document {d}\n\n{body} "
                f"{person} works for {company}. {company} oversees the {name} program. "
                f"Additional {name} detail {d}: " + " ".join(
                    f"{kw} consideration {d}-{i}." for i, kw in enumerate(keywords.split())
                )
            )
            ids = ingest(f"{name}-{d}.md", text)
            topic_chunks[name].update(ids)
            entity_chunks.setdefault(company, set()).update(ids)
            entity_chunks.setdefault(person, set()).update(ids)

    for d in range(distractors):
        ingest(
            f"distractor-{d}.md",
            f"# Miscellany {d}\n\nGeneric filler text item {d} about unrelated daily "
            f"matters, routine errands, and schedule notes numbered {d}. "
            + " ".join(f"filler{d}w{i} note." for i in range(30)),
        )

    # hard negatives: topic vocabulary sprinkled into off-topic documents (NOT labeled
    # relevant) — lexical overlap without topical relevance
    for t_idx, (name, keywords, _) in enumerate(_TOPICS):
        kws = keywords.split()
        for h in range(hard_negatives):
            sprinkle = " ".join(
                f"A passing mention of {kws[(h + i) % len(kws)]} in an unrelated memo."
                for i in range(2)
            )
            ingest(
                f"hardneg-{name}-{h}.md",
                f"# Office Memo {name}-{h}\n\nStationery reorder minutes item {h}. "
                f"{sprinkle} Remaining agenda covers parking assignments {h}.",
            )

    queries: List[EvalQuery] = []
    paraphrases = {
        "payments": "how long do we have to pay an invoice and what happens if late",
        "contracts": "what notice period is needed to end the agreement",
        "security": "how often must credentials be changed and how to log in remotely",
        "logistics": "when are shipping deliveries confirmed and cleared",
        "wildlife": "which animals live in the woods and sleep all winter",
        "compute": "how do quantum machines keep their qubits stable",
    }
    for name, keywords, _ in _TOPICS:
        rel = topic_chunks[name]
        queries.append(EvalQuery(keywords, rel, "keyword"))
        queries.append(EvalQuery(paraphrases[name], rel, "paraphrase"))
    for t_idx, (name, _, _) in enumerate(_TOPICS[: len(_PEOPLE)]):
        person = _PEOPLE[t_idx % len(_PEOPLE)]
        company = _COMPANIES[t_idx % len(_COMPANIES)]
        queries.append(
            EvalQuery(f"Who works for {company}?", entity_chunks[company], "entity")
        )
    return EvalCorpus(corpus=store, entity_store=estore, queries=queries)


# ---------------------------------------------------------------------------
# evaluation
# ---------------------------------------------------------------------------


def evaluate(
    retrieve_fn: Callable[[str], RetrievalResult],
    queries: Sequence[EvalQuery],
    k: int = 10,
) -> Dict[str, float]:
    """Aggregate recall@k / NDCG@k / MRR over a query set (plus per-kind recall)."""
    recalls, ndcgs, mrrs = [], [], []
    by_kind: Dict[str, List[float]] = {}
    for q in queries:
        result = retrieve_fn(q.text)
        ranked = [r.chunk_id for r in result.results]
        r = recall_at_k(ranked, q.relevant_chunk_ids, k)
        recalls.append(r)
        ndcgs.append(ndcg_at_k(ranked, q.relevant_chunk_ids, k))
        mrrs.append(mrr(ranked, q.relevant_chunk_ids))
        by_kind.setdefault(q.kind, []).append(r)
    out = {
        f"recall@{k}": float(np.mean(recalls)),
        f"ndcg@{k}": float(np.mean(ndcgs)),
        "mrr": float(np.mean(mrrs)),
        "n_queries": float(len(queries)),
    }
    for kind, vals in by_kind.items():
        out[f"recall@{k}_{kind}"] = float(np.mean(vals))
    return out


def evaluate_baseline_configs(
    base_cfg: Optional[RAGConfig] = None,
    k: int = 10,
    distractors: int = 30,
    hard_negatives: int = 0,
) -> Dict[str, Dict[str, float]]:
    """Run the five BASELINE.json configurations over the labeled corpus."""
    base = base_cfg or RAGConfig(
        capacity_round=64,
        embedding_dim=256,
        embedding_dim_full=512,
        embedding_dtype="float32",
        safety_threshold=0.0,
        final_top_k=max(k, 10),
        rerank_top_k=max(2 * k, 20),
        denoise_alpha=0.0,
    )
    data = make_eval_corpus(base, distractors=distractors, hard_negatives=hard_negatives)
    gidx_cfg = base
    results: Dict[str, Dict[str, float]] = {}

    configs = {
        "1_lexical_only": base.replace(semantic_enabled=False, graph_enabled=False,
                                       rerank_enabled=False),
        "2_dense_only": base.replace(lexical_enabled=False, graph_enabled=False,
                                     rerank_enabled=False),
        "3_dual_hybrid_rrf": base.replace(graph_enabled=False, rerank_enabled=False),
        "4_triple_hybrid": base.replace(rerank_enabled=False),
        "5_full_pipeline": base,
    }
    for name, cfg in configs.items():
        gidx = (
            build_graph_index(data.entity_store, data.corpus, cfg)
            if cfg.graph_enabled
            else None
        )
        retriever = Retriever(data.corpus, cfg, graph_index=gidx)
        results[name] = evaluate(
            lambda q: retriever.retrieve(q, top_k=k), data.queries, k=k
        )
    return results
