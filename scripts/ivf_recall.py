"""Blocked-IVF recall on the independent docstring corpus.

Builds the inverse-cloze eval corpus (triple_hybrid_rag_tpu.eval.make_stdlib_eval),
then runs the DENSE channel only — exact scan vs blocked-IVF at several probe
counts — reporting labeled recall@10 and overlap@10 vs the exact scan. This is
the ANN quality/compute trade table for `config.semantic_backend="ivf"` (the
reference's pgvector HNSW analogue; HNSW publishes no recall numbers either, so
these are measured here).

Usage: python scripts/ivf_recall.py [--docs 1500] [--block 64] [--probes 1,2,4,8,16]
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
    ap.add_argument("--queries", type=int, default=400)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--probes", default="1,2,4,8,16,0")  # 0 = all blocks (exact check)
    ap.add_argument("--clusters", type=int, default=0,
                    help="k-means ordering clusters (0 = auto n_loc/block; larger = "
                         "finer cluster-major order, purer blocks)")
    ap.add_argument("--sources", default="all")
    ap.add_argument("--bigcorpus", action="store_true",
                    help="use the full AST docstring harvest (make_bigcorpus_eval;"
                         " --docs counts documents there) — the 43M encoder's real"
                         " clustered geometry at the largest in-image scale, the"
                         " regime the r3 verdict (weak #8) asked to measure")
    ap.add_argument("--out", default="eval_results/ivf_recall.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import (
        _PACKAGE_SOURCES,
        evaluate,
        make_bigcorpus_eval,
        make_stdlib_eval,
    )
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
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
        denoise_alpha=0.0,
        graph_enabled=False,
        lexical_enabled=False,  # isolate the dense channel
        rerank_enabled=False,
        final_top_k=10,
    )
    if args.bigcorpus:
        data = make_bigcorpus_eval(base, n_docs=args.docs, n_queries=args.queries)
    else:
        data = make_stdlib_eval(
            base, n_docs=args.docs, n_queries=args.queries, sources=sources
        )
    q_texts = [q.text for q in data.queries]
    print(f"corpus: {args.docs} docs, {len(q_texts)} queries", file=sys.stderr)

    # embed ONCE; each probe setting only re-derives its IVF ordering from the
    # same vectors (build_dense_index is host-side cheap; the encoder forward
    # over 50k+ children is the expensive part and must not repeat per row)
    import numpy as np

    from triple_hybrid_rag_tpu.index.dense_index import build_dense_index
    from triple_hybrid_rag_tpu.models.embedder import get_default_embedder

    embedder = get_default_embedder(base)
    texts = data.corpus.child_texts()
    vec_chunks = []
    for i in range(0, len(texts), 512):
        vec_chunks.append(np.asarray(embedder.embed_texts(texts[i : i + 512])))
    vecs = np.concatenate(vec_chunks, axis=0)
    print(f"embedded {len(texts)} children once", file=sys.stderr)

    def run(cfg):
        r = Retriever.from_indexes(
            data.corpus, cfg, dense_index=build_dense_index(vecs, cfg),
            embedder=embedder,
        )
        eng = ShardedEngine(r, corpus_mesh())
        t0 = time.time()
        outs = []
        for i in range(0, len(q_texts), 64):
            outs.extend(eng.retrieve_batch(q_texts[i : i + 64]))
        elapsed = time.time() - t0
        metrics = evaluate(
            lambda q, _c=iter(outs): next(_c), data.queries, k=10
        )
        ids = [[x.chunk_id for x in r.results] for r in outs]
        return metrics, ids, elapsed, eng

    exact_metrics, exact_ids, exact_s, eng0 = run(base)
    # the IVF engine rounds capacity UP to a whole number of blocks per shard;
    # mirror that so probes=0 genuinely covers every block
    unit = eng0.n_shards * args.block
    n_pad_ivf = ((eng0.n_pad + unit - 1) // unit) * unit
    n_blocks_per_shard = n_pad_ivf // eng0.n_shards // args.block
    rows = {"exact": {**exact_metrics, "elapsed_s": round(exact_s, 1)}}
    print(f"exact: recall@10={exact_metrics['recall@10']:.3f} "
          f"({n_blocks_per_shard} blocks/shard at w={args.block})", file=sys.stderr)

    for p_str in args.probes.split(","):
        p = int(p_str)
        if p == 0:
            p = n_blocks_per_shard
        cfg = base.replace(
            semantic_backend="ivf", ivf_block_rows=args.block, ivf_probes=p,
            ivf_clusters=args.clusters,
        )
        m, ids, el, _ = run(cfg)
        overlap = sum(
            len(set(a) & set(b)) / max(len(b), 1) for a, b in zip(ids, exact_ids)
        ) / max(len(ids), 1)
        frac = min(p / max(n_blocks_per_shard, 1), 1.0)
        rows[f"ivf_p{p}"] = {
            **m, "overlap_vs_exact@10": round(overlap, 4),
            "rows_scanned_frac": round(frac, 4), "elapsed_s": round(el, 1),
        }
        print(f"ivf p={p:3d} ({frac:5.1%} rows): recall@10={m['recall@10']:.3f} "
              f"overlap={overlap:.3f}", file=sys.stderr)

    payload = {
        "corpus": "docstrings:" + "+".join(sources),
        "n_docs": args.docs,
        "block_rows": args.block,
        "blocks_per_shard": n_blocks_per_shard,
        "dense_only": True,
        "results": rows,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
