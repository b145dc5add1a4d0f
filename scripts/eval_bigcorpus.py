"""Corpus-scale real-text eval: quality AND latency on the same corpus (r3 task #7).

Round 3's gap: retrieval quality was only measured at <=4k real docs while the
1M/8M scale points used synthetic self-retrieval. This closes it — the AST
docstring harvest (~46k eval-disjoint documents from every in-image package,
``eval.py:_ast_documents``, ~33k at min_len 220) is evaluated for lexical/dense/hybrid/full recall@10
and, on the SAME built indexes, per-query retrieval latency.

Indexes are built once and shared across config variants (only channel toggles
change). Run on the real chip:

    python scripts/eval_bigcorpus.py [--docs 46000] [--queries 500]
        [--encoder-path ...] [--out eval_results/bigcorpus.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=33000)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--min-len", type=int, default=220)
    ap.add_argument("--encoder-path", default=None)
    ap.add_argument("--embed-batch", type=int, default=512)
    ap.add_argument("--latency-queries", type=int, default=60)
    ap.add_argument("--variants", default=None,
                    help="comma list of variant names to run (default: all)")
    ap.add_argument("--out", default="eval_results/bigcorpus.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.analyzer import Analyzer
    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import (
        evaluate_batched,
        make_bigcorpus_eval,
    )
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.index.bm25_index import build_bm25_index
    from triple_hybrid_rag_tpu.index.dense_index import build_dense_index
    from triple_hybrid_rag_tpu.index.maxsim_index import build_maxsim_index
    from triple_hybrid_rag_tpu.models.embedder import get_default_embedder
    from triple_hybrid_rag_tpu.retrieval import Retriever

    base = RAGConfig(
        capacity_round=1024,
        embedding_dtype="bfloat16",  # the shipped default at scale
        safety_threshold=0.0,
        final_top_k=max(args.k, 10),
        rerank_top_k=max(2 * args.k, 20),
        denoise_alpha=0.0,
        graph_enabled=False,
    )
    if args.encoder_path is not None:
        base = base.replace(encoder_params_path=args.encoder_path)

    t0 = time.time()
    data = make_bigcorpus_eval(
        base, n_docs=args.docs, n_queries=args.queries, min_len=args.min_len
    )
    texts = data.corpus.child_texts()
    n_parents = len(data.corpus.parents)
    t_corpus = time.time() - t0
    print(f"corpus: {args.docs} docs -> {len(texts)} children / {n_parents} parents "
          f"/ {len(data.queries)} queries ({t_corpus:.0f}s)", flush=True)

    t0 = time.time()
    embedder = get_default_embedder(base)
    vec_chunks = []
    for i in range(0, len(texts), args.embed_batch):
        vec_chunks.append(np.asarray(embedder.embed_texts(texts[i:i + args.embed_batch])))
    vecs = np.concatenate(vec_chunks, axis=0)
    t_embed = time.time() - t0
    print(f"embedded {len(texts)} children in {t_embed:.0f}s "
          f"({len(texts)/max(t_embed,1e-9):.0f} texts/s)", flush=True)

    t0 = time.time()
    bm25 = build_bm25_index(texts, base, Analyzer(base))
    dense = build_dense_index(vecs, base)
    maxsim = build_maxsim_index(data.corpus.parent_texts(), embedder, base)
    t_index = time.time() - t0
    print(f"indexes built in {t_index:.0f}s", flush=True)

    variants = {
        "lexical_only": base.replace(semantic_enabled=False, rerank_enabled=False),
        "dense_only": base.replace(lexical_enabled=False, rerank_enabled=False),
        "hybrid_rrf": base.replace(rerank_enabled=False),
        "full_pipeline": base,
        # deeper rerank pool at the reference's 50-candidate cap (the depth
        # sweep on the small corpora showed depth buys recall on document
        # corpora at both seeds — stage_ablation_depth*.json)
        "full_b05_d50": base.replace(rerank_blend_rrf=0.5, rerank_top_k=50),
        # beat-the-reference depth: rerank the top-100 fused candidates (the
        # reference's own pool caps at 50); the small-corpus sweep showed d100
        # strictly helps the document corpora on the holdout seed
        "full_b05_d100": base.replace(
            rerank_blend_rrf=0.5, rerank_top_k=100, rerank_max_candidates=100
        ),
    }
    if args.variants:
        keep = {v.strip() for v in args.variants.split(",")}
        variants = {k: v for k, v in variants.items() if k in keep}
    results = {}
    latency = {}
    for name, cfg in variants.items():
        t0 = time.time()
        r = Retriever.from_indexes(
            data.corpus, cfg,
            bm25_index=bm25 if cfg.lexical_enabled else None,
            dense_index=dense if cfg.semantic_enabled else None,
            maxsim_index=maxsim if (cfg.rerank_enabled and cfg.rerank_backend == "maxsim") else None,
            embedder=embedder,
        )
        eng = ShardedEngine(r, corpus_mesh())
        res = evaluate_batched(eng, data.queries, k=args.k)
        res["elapsed_s"] = round(time.time() - t0, 1)
        results[name] = res
        print(f"{name}: recall@{args.k}={res[f'recall@{args.k}']:.4f} "
              f"ndcg={res[f'ndcg@{args.k}']:.4f} ({res['elapsed_s']}s)", flush=True)

        # per-query latency on the same corpus+indexes (quality and latency in
        # one regime for the first time — r3 weak #9). Uses the engine's
        # one-dispatch B=1 path — what server.py actually serves — not the
        # staged retriever, whose ~10 blocking RPCs each pay the dev tunnel's
        # ~25 ms floor and would report tunnel overhead, not engine latency.
        qs = [q.text for q in data.queries[: args.latency_queries]]
        eng.retrieve(qs[0], top_k=args.k)  # warm the compile cache
        times = []
        for q in qs:
            t1 = time.perf_counter()
            eng.retrieve(q, top_k=args.k)
            times.append((time.perf_counter() - t1) * 1e3)
        latency[name] = {
            "p50_ms": float(np.percentile(times, 50)),
            "p95_ms": float(np.percentile(times, 95)),
            "n": len(times),
        }
        print(f"  latency p50={latency[name]['p50_ms']:.1f}ms "
              f"p95={latency[name]['p95_ms']:.1f}ms", flush=True)

    payload = {
        "corpus": "ast-docstrings (all in-image packages, training sources excluded "
                  "by directory and content hash)",
        "n_docs": args.docs,
        "n_children": len(texts),
        "n_parents": n_parents,
        "n_queries": len(data.queries),
        "encoder_path": args.encoder_path,
        "build": {"corpus_s": round(t_corpus, 1), "embed_s": round(t_embed, 1),
                  "index_s": round(t_index, 1)},
        "results": results,
        "latency_single_query": latency,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"-> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
