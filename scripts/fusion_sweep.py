"""Offline fusion-strategy sweep on the independent docstring corpus.

Computes each channel's top-k ONCE per query (lexical BM25 + dense), then
evaluates weighted-RRF variants in NumPy — including per-query adaptive
semantic weighting by dense-confidence — without re-running retrieval.
Motivated by the 1500-doc multi-source eval where lexical-only (0.594)
beat hybrid RRF (0.495): a weak off-distribution dense channel should
degrade toward lexical-only, not drag fusion below it.

Usage: JAX_PLATFORMS=cpu python scripts/fusion_sweep.py [--docs 1500]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1500)
    ap.add_argument("--queries", type=int, default=400)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--channel-k", type=int, default=50)
    ap.add_argument("--sources", default="all")
    ap.add_argument("--out", default="eval_results/fusion_sweep.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import _PACKAGE_SOURCES, make_stdlib_eval, recall_at_k
    from triple_hybrid_rag_tpu.retrieval import Retriever

    sources = (
        ("stdlib",) + _PACKAGE_SOURCES
        if args.sources == "all"
        else tuple(args.sources.split(","))
    )
    cfg = RAGConfig(
        capacity_round=64, embedding_dtype="float32", safety_threshold=0.0,
        denoise_alpha=0.0, graph_enabled=False,
    )
    data = make_stdlib_eval(cfg, n_docs=args.docs, n_queries=args.queries,
                            sources=sources)
    ret = Retriever(data.corpus, cfg)
    kk = args.channel_k

    # ---- channel rankings, once per query ----
    per_q = []
    for q in data.queries:
        plan = ret.planner.plan(q.text)
        lex_ids, lex_sc = ret.bm25_index.search(plan.keywords, top_k=kk)
        qv = ret.embedder.embed_texts([plan.semantic_query_text or q.text])[0]
        from triple_hybrid_rag_tpu.index.dense_index import truncate_matryoshka

        qv = truncate_matryoshka(qv[None, :], cfg.embedding_dim)[0]
        sem_ids, sem_sc = ret.dense_index.search(jnp.asarray(qv), top_k=kk)
        per_q.append({
            "lex": (np.asarray(lex_ids), np.asarray(lex_sc)),
            "sem": (np.asarray(sem_ids), np.asarray(sem_sc)),
            "rel": q.relevant_chunk_ids,
        })
    row_to_chunk = {c.row: c.chunk_id for c in data.corpus.children if c.row >= 0}

    def eval_fusion(weight_fn, rrf_k=60):
        recs = []
        for d in per_q:
            w_lex, w_sem = weight_fn(d)
            scores = {}
            for (ids, _), w in ((d["lex"], w_lex), (d["sem"], w_sem)):
                for rank, i in enumerate(ids):
                    if i < 0:
                        continue
                    scores[i] = scores.get(i, 0.0) + w / (rrf_k + rank + 1.0)
            ranked = sorted(scores, key=lambda i: -scores[i])[: args.k]
            recs.append(
                recall_at_k([row_to_chunk.get(int(i), "") for i in ranked],
                            d["rel"], args.k)
            )
        return float(np.mean(recs))

    def channel_only(which):
        recs = []
        for d in per_q:
            ids = d[which][0][: args.k]
            recs.append(
                recall_at_k([row_to_chunk.get(int(i), "") for i in ids],
                            d["rel"], args.k)
            )
        return float(np.mean(recs))

    results = {
        "lexical_only": channel_only("lex"),
        "dense_only": channel_only("sem"),
    }
    for w in (0.8, 0.5, 0.3, 0.2, 0.1):
        results[f"rrf_0.7_{w}"] = eval_fusion(lambda d, w=w: (0.7, w))
    # adaptive: semantic weight ramps with dense top-1 confidence
    for lo, hi in ((0.3, 0.7), (0.4, 0.8), (0.5, 0.9)):
        def wfn(d, lo=lo, hi=hi):
            conf = float(d["sem"][1][0]) if d["sem"][0][0] >= 0 else 0.0
            ramp = min(max((conf - lo) / (hi - lo), 0.0), 1.0)
            return 0.7, 0.8 * ramp
        results[f"adaptive_{lo}_{hi}"] = eval_fusion(wfn)
    # adaptive with floor (never fully drop the channel)
    def wfn_floor(d):
        conf = float(d["sem"][1][0]) if d["sem"][0][0] >= 0 else 0.0
        ramp = min(max((conf - 0.4) / 0.4, 0.0), 1.0)
        return 0.7, 0.8 * (0.15 + 0.85 * ramp)
    results["adaptive_floor"] = eval_fusion(wfn_floor)

    payload = {"docs": args.docs, "n_queries": len(per_q), "k": args.k,
               "results": {k: round(v, 4) for k, v in results.items()}}
    pathlib.Path(args.out).parent.mkdir(exist_ok=True)
    pathlib.Path(args.out).write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
