"""Basic usage of triple-hybrid-rag-tpu (reference examples/basic_usage.py parity).

Run:  python examples/basic_usage.py
(Offline by default: deterministic hash embedders, rule-based planner/NER.)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from triple_hybrid_rag_tpu import RAG, RAGConfig


def main() -> None:
    # every capability is a config switch (reference RAG_* env parity: RAGConfig.from_env())
    # NOTE on safety_threshold calibration: rerank scores come from MaxSim over token
    # embeddings. With the default *hash* token embedders (exact-match-only similarity)
    # a MaxSim score is roughly "fraction of query tokens present in the doc", so
    # paraphrase queries land near 0.3-0.5 and garbage near 0-0.2 -> 0.35 separates
    # them. With a trained encoder (models/encoder.py) paraphrase tokens score high and
    # the reference's 0.6 default applies.
    config = RAGConfig(
        graph_enabled=True,       # knowledge-graph channel (entity k-hop expansion)
        rerank_backend="maxsim",  # true late-interaction reranking
        safety_threshold=0.35,    # refuse when nothing clears this (see NOTE)
    )
    rag = RAG(config=config)

    # --- ingest: load -> chunk -> embed -> index -> NER -> graph -------------
    rag.ingest_text(
        """# Service Agreement

        Acme Corp and Beta Logistics sign this agreement. Invoices must be settled
        within thirty days; late settlement incurs a two percent penalty.
        Maria Silva works for Acme Corp and approves all invoices.

        ## Termination
        The termination clause requires ninety days written notice.""",
        name="agreement.md",
    )
    rag.ingest_text(
        "# Wildlife Notes\n\nRed foxes share the northern forest with brown bears.",
        name="wildlife.md",
    )
    print("corpus:", rag.stats())

    # --- query: plan -> 3 channels -> RRF -> expand -> rerank -> safety ------
    for query in (
        "How long do we have to pay an invoice?",
        "Who works for Acme Corp?",          # lights up the graph channel
        "what animals live in the forest",
        "completely unrelated gibberish zzz",  # refused by the safety gate
    ):
        result = rag.query(query, top_k=2)
        print(f"\nQ: {query}")
        if result.refused:
            print(f"  REFUSED: {result.refusal_reason}")
            continue
        for r in result.results:
            print(f"  [{r.final_score:.3f}] {'+'.join(r.source_channels)}: {r.text[:70]!r}")
        print(f"  ({result.timings['total_ms']:.1f} ms)")

    # --- graph API (PuppyGraph-parity surface) -------------------------------
    gx = rag.retriever.graph_index
    if gx is not None:
        print("\nentities related to Acme Corp:",
              [e.canonical_name for e in gx.related_entities("Acme Corp")])
        print("graph query:", gx.execute_query({"op": "lookup", "entity": "Maria Silva"}))

    # --- persistence ----------------------------------------------------------
    rag.save("/tmp/thr_example_index")
    restored = RAG.load("/tmp/thr_example_index")
    print("\nrestored corpus:", restored.stats())


if __name__ == "__main__":
    main()
