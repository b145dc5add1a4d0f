"""Refusal-gate calibration at scale: gate-score ROC over 300+ zero-overlap queries.

Round-2 verdict (weak #3): the 0.6 safety threshold rested on a 16-query holdout
and no refusal-rate measurement existed on independent corpora. This script scales
the calibration and measures both operating characteristics the reference's gate
has (refuse when nothing relevant exists — NO_SUITABLE_CONTEXT semantics,
/root/reference/src/voice_agent/rag2/retrieval.py:461-495):

- RELEVANT population: a zero-token-overlap paraphrase holdout built from one half
  of the concept lexicon (default 320 docs / 320 queries; every query's answer IS
  in the corpus, so any refusal is a false refusal).
- IRRELEVANT population: queries rendered from the OTHER half of the lexicon
  (default 160; nothing relevant exists, so any answer is a false answer).

Populations share templates but not concept groups, and doc/query glue
vocabularies are disjoint (asserted zero token overlap), so the gate score is the
only separator. Outputs a threshold sweep + ROC AUC + the shipped-0.6 operating
point to eval_results/safety_roc.json.

With --independent SOURCES the script instead measures the FALSE-REFUSAL rate of
the shipped gate on an inverse-cloze docstring corpus (all queries have relevant
docs): what fraction of real queries would the 0.6 gate refuse?
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def build_holdout(n_rel: int, n_irr: int, seed: int):
    """(docs, rel_queries, irr_queries): A-half docs+queries, B-half queries."""
    from triple_hybrid_rag_tpu.analyzer import Analyzer
    from triple_hybrid_rag_tpu.config import get_settings
    from triple_hybrid_rag_tpu.models.pretrain import (
        _GROUPS,
        DOC_TEMPLATES,
        QUERY_TEMPLATES,
        render,
    )

    an = Analyzer(get_settings())
    rng = np.random.default_rng(seed)
    groups_a = _GROUPS[::2]
    groups_b = _GROUPS[1::2]

    def sample(groups, want_doc: bool, n: int, start: int = 0):
        out, seen, i = [], set(), start
        while len(out) < n:
            combo = tuple(str(g) for g in rng.choice(groups, size=3, replace=False))
            if combo in seen:
                continue
            alt = [int(1 + rng.integers(0, 3)) for _ in combo]
            query = render(combo, alt, QUERY_TEMPLATES[i % len(QUERY_TEMPLATES)])
            if want_doc:
                doc = render(combo, [0, 0, 0], DOC_TEMPLATES[i % len(DOC_TEMPLATES)])
                i += 1
                if set(an.tokenize(doc)) & set(an.tokenize(query)):
                    continue  # enforce true zero overlap (multi-word surface forms)
                out.append((doc, query))
            else:
                i += 1
                out.append(query)
            seen.add(combo)
        return out

    pairs = sample(groups_a, True, n_rel)
    irr = sample(groups_b, False, n_irr, start=7)
    return [d for d, _ in pairs], [q for _, q in pairs], irr


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rel", type=int, default=320)
    ap.add_argument("--irr", type=int, default=160)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default="eval_results/safety_roc.json")
    ap.add_argument("--independent", default=None,
                    help="comma source list (e.g. stdlib or numpy,scipy): measure "
                         "the shipped gate's false-refusal rate on an inverse-cloze "
                         "corpus instead of the paraphrase ROC")
    ap.add_argument("--docs", type=int, default=1000, help="--independent corpus size")
    ap.add_argument("--queries", type=int, default=300)
    args = ap.parse_args()

    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.corpus import CorpusStore
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = RAGConfig(
        capacity_round=64, embedding_dtype="float32",
        safety_threshold=0.0,   # collect raw gate scores; thresholds swept offline
        denoise_alpha=0.0, graph_enabled=False,
    )

    t0 = time.time()
    payload: dict
    if args.independent:
        from triple_hybrid_rag_tpu.eval import make_stdlib_eval

        sources = tuple(s.strip() for s in args.independent.split(","))
        data = make_stdlib_eval(
            cfg, n_docs=args.docs, n_queries=args.queries, sources=sources
        )
        retriever = Retriever(data.corpus, cfg)
        scores, ranked_hit = [], []
        for q in data.queries:
            r = retriever.retrieve(q.text, top_k=10)
            scores.append(float(r.max_score))
            ranked_hit.append(
                bool(set(x.chunk_id for x in r.results[:10]) & q.relevant_chunk_ids)
            )
        scores = np.asarray(scores)
        sweep = {
            f"{t:.2f}": {
                "refusal_rate": float(np.mean(scores < t)),
                # refusals among queries the funnel would have answered correctly
                "refused_but_hit": float(np.mean(
                    (scores < t) & np.asarray(ranked_hit)
                )),
            }
            for t in (0.3, 0.4, 0.5, 0.6, 0.7)
        }
        payload = {
            "mode": "independent_false_refusal",
            "sources": sources,
            "n_docs": args.docs,
            "n_queries": len(data.queries),
            "gate_score_percentiles": {
                p: float(np.percentile(scores, p)) for p in (5, 25, 50, 75, 95)
            },
            "recall_at_10": float(np.mean(ranked_hit)),
            "threshold_sweep": sweep,
        }
    else:
        docs, rel_q, irr_q = build_holdout(args.rel, args.irr, args.seed)
        store = CorpusStore()
        chunker = HierarchicalChunker(cfg)
        doc_chunks = []
        for i, d in enumerate(docs):
            parents, children = chunker.chunk_document(
                d, hashlib.sha256(f"roc-{i}".encode()).hexdigest()
            )
            store.add_chunks(parents, children)
            doc_chunks.append({c.chunk_id for c in children if c.row >= 0})
        retriever = Retriever(store, cfg)

        rel_scores, rank1 = [], []
        for i, q in enumerate(rel_q):
            r = retriever.retrieve(q, top_k=10)
            rel_scores.append(float(r.max_score))
            rank1.append(
                bool(r.results) and r.results[0].chunk_id in doc_chunks[i]
            )
        irr_scores = []
        for q in irr_q:
            r = retriever.retrieve(q, top_k=10)
            irr_scores.append(float(r.max_score))
        rel_scores = np.asarray(rel_scores)
        irr_scores = np.asarray(irr_scores)

        # ROC: positive class = "should refuse" (irrelevant). TPR at threshold t =
        # P(irr refused) = P(irr_score < t); FPR = P(rel refused).
        ts = np.linspace(0.0, 1.0, 201)
        tpr = np.array([np.mean(irr_scores < t) for t in ts])
        fpr = np.array([np.mean(rel_scores < t) for t in ts])
        # close the curve at (1,1): gate scores saturate at exactly 1.0 (rank-1
        # self-consistent hits), so P(score < t) never reaches 1.0 for t <= 1.0
        # and the raw trapezoid would integrate a TRUNCATED curve (reported
        # 0.44 on a visibly near-perfect separation before this fix)
        tpr = np.append(tpr, 1.0)
        fpr = np.append(fpr, 1.0)
        auc = float(np.trapezoid(tpr, fpr))
        youden = ts[int(np.argmax(tpr[:-1] - fpr[:-1]))]
        sweep = {
            f"{t:.2f}": {
                "irrelevant_refused": float(np.mean(irr_scores < t)),
                "relevant_refused": float(np.mean(rel_scores < t)),
            }
            for t in (0.4, 0.5, 0.55, 0.6, 0.65, 0.7, 0.8)
        }
        payload = {
            "mode": "paraphrase_roc",
            "n_relevant": len(rel_q),
            "n_irrelevant": len(irr_q),
            "rank1_rate_relevant": float(np.mean(rank1)),
            "relevant_score_percentiles": {
                p: float(np.percentile(rel_scores, p)) for p in (1, 5, 25, 50, 95)
            },
            "irrelevant_score_percentiles": {
                p: float(np.percentile(irr_scores, p)) for p in (5, 50, 75, 95, 99)
            },
            "roc_auc": auc,
            "youden_optimal_threshold": float(youden),
            "threshold_sweep": sweep,
            "shipped_threshold": 0.6,
        }

    payload["wall_s"] = round(time.time() - t0, 1)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2))
    print(json.dumps(payload, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
