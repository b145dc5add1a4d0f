"""Quantization quality bill: embedding dtype x independent corpus (verdict weak #7).

The 8M one-chip scale point stores dense embeddings int4 and the default config
bf16; the reference stores halfvec (f16, 20260113_halfvec_4000.sql:30-72). Nobody
had measured what int8/int4 cost in retrieval quality OUTSIDE the synthetic
self-retrieval sanity (0.955 at 8M). This runs the independent docstring corpus
once and evaluates dense_only + full_pipeline at each storage dtype.

    python scripts/quant_quality.py [--docs 1500] [--queries 450] [--sources all]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1500)
    ap.add_argument("--queries", type=int, default=450)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sources", default="all")
    ap.add_argument("--dtypes", default="float32,bfloat16,int8,int4,int4_8m")
    ap.add_argument("--engine", action="store_true",
                    help="evaluate via the batched ShardedEngine (bit-exact vs "
                         "the staged path; ~10x less tunnel wall time)")
    ap.add_argument("--out", default="eval_results/quant_quality.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import (
        _PACKAGE_SOURCES,
        evaluate,
        evaluate_batched,
        make_stdlib_eval,
    )
    from triple_hybrid_rag_tpu.retrieval import Retriever

    sources = (
        ("stdlib",) + _PACKAGE_SOURCES
        if args.sources == "all"
        else tuple(s.strip() for s in args.sources.split(",") if s.strip())
    )
    base = RAGConfig(
        capacity_round=64,
        embedding_dtype="float32",
        safety_threshold=0.0,
        final_top_k=max(args.k, 10),
        rerank_top_k=max(2 * args.k, 20),
        denoise_alpha=0.0,
        graph_enabled=False,
    )
    t0 = time.time()
    # ONE corpus; only the index storage dtype varies between table rows
    data = make_stdlib_eval(
        base, n_docs=args.docs, n_queries=args.queries, sources=sources
    )
    results: dict = {}
    # "int4_8m" prices the ACTUAL 8M one-chip configuration (int4 dense rows +
    # int8 MaxSim tokens + maxsim_dim 32 — bench.py's BENCH_MAXSIM_DIM=32), not
    # just the dtype in isolation (round-3 verdict weak #5).
    for dtype in (d.strip() for d in args.dtypes.split(",")):
        if dtype == "int4_8m":
            cfg_d = base.replace(embedding_dtype="int4", maxsim_dim=32)
        else:
            cfg_d = base.replace(embedding_dtype=dtype)
        row: dict = {}
        for name, cfg in {
            "dense_only": cfg_d.replace(lexical_enabled=False, rerank_enabled=False),
            "full_pipeline": cfg_d,
        }.items():
            retriever = Retriever(data.corpus, cfg)
            if args.engine:
                from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh

                eng = ShardedEngine(retriever, corpus_mesh())
                row[name] = evaluate_batched(eng, data.queries, k=args.k)
            else:
                row[name] = evaluate(
                    lambda q: retriever.retrieve(q, top_k=args.k), data.queries,
                    k=args.k,
                )
        results[dtype] = row
        print(dtype, json.dumps({
            n: round(v[f"recall@{args.k}"], 4) for n, v in row.items()
        }), flush=True)

    payload = {
        "corpus": "docstrings:" + "+".join(sources),
        "n_docs": args.docs,
        "n_queries_requested": args.queries,
        "k": args.k,
        "elapsed_s": round(time.time() - t0, 1),
        "results": results,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload["results"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
