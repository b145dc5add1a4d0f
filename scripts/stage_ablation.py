"""Per-stage funnel ablation on independent text (round-3 verdict task #2).

The MaxSim rerank stage measured neutral-to-harmful on real text (r3:
hybrid 0.721 -> full 0.665 on the HTTP-roundtrip corpus; stdlib-500 0.829 -> 0.815)
while the reference's rerank stage exists to RAISE precision
(/root/reference/src/voice_agent/retrieval/reranker.py:34-50). This script produces
the missing evidence: hybrid vs +rerank(MaxSim, at several blends) vs +rerank(dot)
on each corpus, with the indexes built ONCE per corpus and reused across variants
(only rerank knobs change, so bm25/dense/maxsim artifacts stay valid).

Usage (real chip):

    python scripts/stage_ablation.py [--corpora stdlib500,docs1500,docs4000]
        [--encoder-path ...] [--anchor-w2 ...] [--out eval_results/stage_ablation.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


CORPORA = {
    # name -> (n_docs, n_queries, sources)
    "smoke": (80, 25, ("stdlib",)),
    "stdlib500": (500, 150, ("stdlib",)),
    "docs1500": (1500, 450, "all"),
    "docs4000": (4000, 600, "all"),
}


def run_corpus(name, base, n_docs, n_queries, sources, k, variants, seed=0,
               use_engine=False):
    from triple_hybrid_rag_tpu.eval import (
        evaluate, evaluate_batched, make_stdlib_eval,
    )
    from triple_hybrid_rag_tpu.index.bm25_index import build_bm25_index
    from triple_hybrid_rag_tpu.index.dense_index import build_dense_index
    from triple_hybrid_rag_tpu.index.maxsim_index import build_maxsim_index
    from triple_hybrid_rag_tpu.models.embedder import get_default_embedder
    from triple_hybrid_rag_tpu.retrieval import Retriever
    from triple_hybrid_rag_tpu.analyzer import Analyzer

    t0 = time.time()
    data = make_stdlib_eval(
        base, n_docs=n_docs, n_queries=n_queries, seed=seed, sources=sources
    )
    embedder = get_default_embedder(base)
    texts = data.corpus.child_texts()
    bm25 = build_bm25_index(texts, base, Analyzer(base))
    dense = build_dense_index(embedder.embed_texts(texts), base)
    maxsim = build_maxsim_index(data.corpus.parent_texts(), embedder, base)
    build_s = time.time() - t0
    print(f"[{name}] corpus+indexes built in {build_s:.0f}s "
          f"({len(texts)} children, {len(data.queries)} queries)", flush=True)

    out = {"n_children": len(texts), "n_queries": len(data.queries),
           "build_s": round(build_s, 1), "variants": {}}
    for vname, cfg in variants(base).items():
        t0 = time.time()
        r = Retriever.from_indexes(
            data.corpus, cfg,
            bm25_index=bm25 if cfg.lexical_enabled else None,
            dense_index=dense if cfg.semantic_enabled else None,
            maxsim_index=maxsim if (cfg.rerank_enabled and cfg.rerank_backend == "maxsim") else None,
            embedder=embedder,
        )
        if use_engine:
            from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh

            eng = ShardedEngine(r, corpus_mesh())
            res = evaluate_batched(eng, data.queries, k=k)
        else:
            res = evaluate(lambda q: r.retrieve(q, top_k=k), data.queries, k=k)
        res["elapsed_s"] = round(time.time() - t0, 1)
        out["variants"][vname] = res
        print(f"[{name}] {vname}: recall@{k}={res[f'recall@{k}']:.3f} "
              f"ndcg={res[f'ndcg@{k}']:.3f} ({res['elapsed_s']}s)", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora", default="stdlib500,docs1500,docs4000")
    ap.add_argument("--seed", type=int, default=0,
                    help="query-sample seed: 0 = tune half, 7 = validate half")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--encoder-path", default=None)
    ap.add_argument("--anchor-w2", type=float, default=None)
    ap.add_argument("--engine", action="store_true",
                    help="evaluate via the batched ShardedEngine (bit-exact vs "
                         "the staged path; ~10x less tunnel wall time)")
    ap.add_argument("--variants", default=None,
                    help="comma list of variant names to run (default: the "
                         "original 8-variant set)")
    ap.add_argument("--out", default="eval_results/stage_ablation.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import _PACKAGE_SOURCES

    base = RAGConfig(
        capacity_round=64,
        embedding_dtype="float32",
        safety_threshold=0.0,
        final_top_k=max(args.k, 10),
        rerank_top_k=max(2 * args.k, 20),
        denoise_alpha=0.0,
        graph_enabled=False,
    )
    if args.encoder_path is not None:
        base = base.replace(encoder_params_path=args.encoder_path)
    if args.anchor_w2 is not None:
        base = base.replace(encoder_anchor_pool_w2=args.anchor_w2)

    def variants(b: RAGConfig):
        all_v = {
            "lexical_only": b.replace(semantic_enabled=False, rerank_enabled=False),
            "dense_only": b.replace(lexical_enabled=False, rerank_enabled=False),
            "hybrid": b.replace(rerank_enabled=False),
            "rerank_maxsim_b00": b.replace(rerank_backend="maxsim", rerank_blend_rrf=0.0),
            "rerank_maxsim_b03": b.replace(rerank_backend="maxsim", rerank_blend_rrf=0.3),
            "rerank_maxsim_b05": b.replace(rerank_backend="maxsim", rerank_blend_rrf=0.5),
            "rerank_maxsim_b07": b.replace(rerank_backend="maxsim", rerank_blend_rrf=0.7),
            "rerank_dot_b03": b.replace(rerank_backend="dot", rerank_blend_rrf=0.3),
            # rerank candidate-depth sweep: the base run reranks only top-20 of
            # the fused list; MaxSim measured positive there, so a deeper pool
            # lets it promote docs hybrid ranked 21..depth (reference caps the
            # pool at 50, retrieval/reranker.py:383 — depth 50 is parity, 100
            # is the beat-the-reference point since lexical+semantic surface
            # up to 150 fused candidates).
            "rerank_maxsim_b03_d50": b.replace(
                rerank_backend="maxsim", rerank_blend_rrf=0.3, rerank_top_k=50),
            "rerank_maxsim_b05_d50": b.replace(
                rerank_backend="maxsim", rerank_blend_rrf=0.5, rerank_top_k=50),
            "rerank_maxsim_b03_d100": b.replace(
                rerank_backend="maxsim", rerank_blend_rrf=0.3, rerank_top_k=100,
                rerank_max_candidates=100),
            "rerank_maxsim_b05_d100": b.replace(
                rerank_backend="maxsim", rerank_blend_rrf=0.5, rerank_top_k=100,
                rerank_max_candidates=100),
        }
        if args.variants:
            keep = {v.strip() for v in args.variants.split(",")}
            return {k: v for k, v in all_v.items() if k in keep}
        # default set = the original 8 (keeps old artifacts comparable)
        depth = {k for k in all_v if k.endswith(("_d50", "_d100"))}
        return {k: v for k, v in all_v.items() if k not in depth}

    payload = {"k": args.k, "seed": args.seed, "encoder_path": args.encoder_path,
               "anchor_w2": args.anchor_w2, "corpora": {}}
    for name in (c.strip() for c in args.corpora.split(",")):
        n_docs, n_queries, sources = CORPORA[name]
        if sources == "all":
            sources = ("stdlib",) + _PACKAGE_SOURCES
        payload["corpora"][name] = run_corpus(
            name, base, n_docs, n_queries, sources, args.k, variants,
            seed=args.seed, use_engine=args.engine,
        )

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"-> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
