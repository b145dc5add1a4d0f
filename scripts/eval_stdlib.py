"""Independent-corpus quality run: inverse-cloze over Python stdlib docstrings.

Usage (real chip; ~8 min at 500 docs):

    python scripts/eval_stdlib.py [--docs 500] [--queries 150] [--blend 0.0]
        [--out eval_results/stdlib.json]

Writes the per-config metric table as JSON. This is the round-1 verdict's
"corpus the builder couldn't have overfit by construction": the documents are
CPython contributors' prose, the queries are held-out sentences REMOVED from
their documents (see ``triple_hybrid_rag_tpu/eval.py:make_stdlib_eval``).
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
    ap.add_argument("--docs", type=int, default=500)
    ap.add_argument("--queries", type=int, default=150)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--blend", type=float, default=None,
                    help="rerank_blend_rrf override for the full_pipeline config")
    ap.add_argument("--out", default="eval_results/stdlib.json")
    ap.add_argument("--sources", default="stdlib",
                    help="comma list: stdlib and/or installed packages "
                         "(numpy,scipy,pandas,jax,torch,...) or 'all'")
    ap.add_argument("--queries-only-recall", action="store_true",
                    help="skip ablations, run full_pipeline only (fast)")
    ap.add_argument("--embedder", default=None,
                    choices=["encoder", "bowhash", "hash"],
                    help="embedder_backend override (default: config auto)")
    ap.add_argument("--encoder-path", default=None,
                    help="encoder weights npz (config.encoder_params_path override; "
                         "A/B candidate weights against the packaged default)")
    ap.add_argument("--anchor-w2", type=float, default=None,
                    help="encoder_anchor_pool_w2 override")
    ap.add_argument("--score-blend", type=float, default=None,
                    help="fusion_score_blend override (0=rank-RRF, 1=CombSUM)")
    ap.add_argument("--lex-gate", type=float, default=None,
                    help="fusion_lex_conf_gate override (0=off)")
    ap.add_argument("--weights", default=None,
                    help="lexical,semantic,graph RRF weight override, e.g. 1.0,0.5,0.6")
    ap.add_argument("--dtype", default=None,
                    choices=["float32", "bfloat16", "int8", "int4"],
                    help="embedding_dtype override (quantization quality bill: "
                         "reference stores halfvec, rebuild defaults bf16 and "
                         "offers int8/int4 for HBM scale — measure the recall "
                         "cost on this corpus, round-2 verdict weak #7)")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import evaluate_stdlib

    base = RAGConfig(
        capacity_round=64,
        embedding_dtype="float32",
        safety_threshold=0.0,
        final_top_k=max(args.k, 10),
        rerank_top_k=max(2 * args.k, 20),
        denoise_alpha=0.0,
        graph_enabled=False,
    )
    if args.dtype is not None:
        base = base.replace(embedding_dtype=args.dtype)
    if args.blend is not None:
        base = base.replace(rerank_blend_rrf=args.blend)
    if args.embedder is not None:
        base = base.replace(embedder_backend=args.embedder)
    if args.encoder_path is not None:
        base = base.replace(encoder_params_path=args.encoder_path)
    if args.anchor_w2 is not None:
        base = base.replace(encoder_anchor_pool_w2=args.anchor_w2)
    if args.score_blend is not None:
        base = base.replace(fusion_score_blend=args.score_blend)
    if args.lex_gate is not None:
        base = base.replace(fusion_lex_conf_gate=args.lex_gate)
    if args.weights is not None:
        lw, sw, gw = (float(x) for x in args.weights.split(","))
        base = base.replace(lexical_weight=lw, semantic_weight=sw, graph_weight=gw)
    from triple_hybrid_rag_tpu.eval import _PACKAGE_SOURCES

    sources = (
        ("stdlib",) + _PACKAGE_SOURCES
        if args.sources == "all"
        else tuple(s.strip() for s in args.sources.split(",") if s.strip())
    )
    t0 = time.time()
    res = evaluate_stdlib(
        base_cfg=base, k=args.k, n_docs=args.docs, n_queries=args.queries,
        sources=sources,
        configs=["full_pipeline"] if args.queries_only_recall else None,
    )
    payload = {
        "corpus": "docstrings:" + "+".join(sources),
        "n_docs": args.docs,
        "k": args.k,
        "rerank_blend_rrf": base.rerank_blend_rrf,
        "elapsed_s": round(time.time() - t0, 1),
        "results": res,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
