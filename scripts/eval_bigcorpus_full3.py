"""Three-channel + safety-gated quality at corpus scale (round-5 tasks #1 and #7).

Round 4's 33k headline ran with ``graph_enabled=False`` and ``safety_threshold=0.0``
— a two-channel+rerank number labeled "full". This harness measures the ACTUAL
shipped configuration at scale for the first time:

- the self-extracted knowledge graph (shipped ``RuleBasedExtractor`` over every
  parent + the ``link_mentions`` sweep) wired into the funnel as the third
  channel, with API-reference carrier docs stating the AST facts as prose and a
  relational query slice that is lexically invisible in the answer documents
  (``make_bigcorpus_graph_eval``; reference bar: the production funnel wires the
  graph channel into every query, rag2/retrieval.py:251);
- the 0.6 safety gate + 0.6 denoise exactly as shipped, with refusal rates
  reported on the held-out relevant queries (any refusal is a false refusal)
  and on irrelevant queries whose answer documents were held OUT of the corpus
  (reference bar: NO_SUITABLE_CONTEXT refusals, rag2/retrieval.py:479-493);
- a gate-score ROC over both populations -> eval_results/safety_roc_bigcorpus.json.

Run on the real chip:

    python scripts/eval_bigcorpus_full3.py [--docs 33000] [--queries 500]
        [--graph-queries 200] [--irrelevant 150] [--out ...] [--roc-out ...]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def evaluate_with_refusals(engine, queries, k=10, batch_size=64):
    """evaluate_batched + per-query refusal/max_score capture.

    Refused queries count as recall/ndcg 0 (the user got nothing), and are also
    reported separately: refusal_rate, refused_but_hit (the refusal suppressed
    a ranked list that DID contain a relevant chunk — the reference's silent
    false-refusal mode)."""
    from triple_hybrid_rag_tpu.eval import ndcg_at_k, recall_at_k

    recalls, ndcgs, by_kind = [], [], {}
    refused, refused_hit, max_scores, kinds = [], [], [], []
    for lo in range(0, len(queries), batch_size):
        chunk = queries[lo : lo + batch_size]
        outs = engine.retrieve_batch([q.text for q in chunk], top_k=k)
        for q, result in zip(chunk, outs):
            ranked = [r.chunk_id for r in result.results]
            r = recall_at_k(ranked, q.relevant_chunk_ids, k)
            recalls.append(0.0 if result.refused else r)
            ndcgs.append(0.0 if result.refused else ndcg_at_k(ranked, q.relevant_chunk_ids, k))
            by_kind.setdefault(q.kind, []).append(recalls[-1])
            refused.append(bool(result.refused))
            refused_hit.append(bool(result.refused) and r > 0)
            max_scores.append(float(result.max_score))
            kinds.append(q.kind)
    out = {
        f"recall@{k}": float(np.mean(recalls)),
        f"ndcg@{k}": float(np.mean(ndcgs)),
        "n_queries": float(len(queries)),
        "refusal_rate": float(np.mean(refused)),
        "refused_but_hit_rate": float(np.mean(refused_hit)),
    }
    for kind, vals in by_kind.items():
        out[f"recall@{k}_{kind}"] = float(np.mean(vals))
    return out, max_scores, kinds


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=33000)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--graph-queries", type=int, default=200)
    ap.add_argument("--irrelevant", type=int, default=150)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--min-len", type=int, default=220)
    ap.add_argument("--encoder-path", default=None)
    ap.add_argument("--embed-batch", type=int, default=512)
    ap.add_argument("--latency-queries", type=int, default=60)
    ap.add_argument("--variants", default=None)
    ap.add_argument("--out", default="eval_results/bigcorpus_full3.json")
    ap.add_argument("--roc-out", default="eval_results/safety_roc_bigcorpus.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.analyzer import Analyzer
    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import (
        EvalQuery,
        _ast_documents,
        make_bigcorpus_graph_eval,
    )
    from triple_hybrid_rag_tpu.index.bm25_index import build_bm25_index
    from triple_hybrid_rag_tpu.index.dense_index import build_dense_index
    from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
    from triple_hybrid_rag_tpu.index.maxsim_index import build_maxsim_index
    from triple_hybrid_rag_tpu.models.embedder import get_default_embedder
    from triple_hybrid_rag_tpu.models.pretrain import TRAIN_TEXT_SOURCES_DEEP
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    base = RAGConfig(
        capacity_round=1024,
        embedding_dtype="bfloat16",
        safety_threshold=0.0,
        denoise_alpha=0.0,
        final_top_k=max(args.k, 10),
        graph_enabled=True,  # rerank_top_k/blend stay at the shipped defaults
    )
    if args.encoder_path is not None:
        base = base.replace(encoder_params_path=args.encoder_path)

    t0 = time.time()
    data = make_bigcorpus_graph_eval(
        base, n_docs=args.docs, n_queries=args.queries,
        n_graph_queries=args.graph_queries, min_len=args.min_len,
    )
    texts = data.corpus.child_texts()
    t_corpus = time.time() - t0
    kinds = {}
    for q in data.queries:
        kinds[q.kind] = kinds.get(q.kind, 0) + 1
    print(f"corpus: {args.docs} docs -> {len(texts)} children / "
          f"{data.corpus.n_parents} parents; queries {kinds}; "
          f"extraction {data.extraction_metrics} ({t_corpus:.0f}s)", flush=True)

    # irrelevant population: cloze-style sentences from docs held OUT of the
    # corpus (deterministic harvest: entries [docs, docs+irr) never entered it)
    irr_queries = []
    if args.irrelevant > 0:
        extra = _ast_documents(
            min_len=args.min_len, max_docs=args.docs + args.irrelevant,
            exclude_top=TRAIN_TEXT_SOURCES_DEEP,
        )[args.docs:]
        rng = np.random.default_rng(99)
        for name, text in extra:
            sents = [s.strip() for s in text.replace("\n", " ").split(". ")]
            sents = [s for s in sents if len(s.split()) >= 8]
            if sents:
                irr_queries.append(EvalQuery(
                    str(sents[rng.integers(0, len(sents))]), set(), "irrelevant"))
        print(f"irrelevant queries: {len(irr_queries)} (answer docs not in corpus)",
              flush=True)

    t0 = time.time()
    embedder = get_default_embedder(base)
    vec_chunks = []
    for i in range(0, len(texts), args.embed_batch):
        vec_chunks.append(np.asarray(embedder.embed_texts(texts[i:i + args.embed_batch])))
    vecs = np.concatenate(vec_chunks, axis=0)
    t_embed = time.time() - t0
    print(f"embedded {len(texts)} children in {t_embed:.0f}s", flush=True)

    t0 = time.time()
    bm25 = build_bm25_index(texts, base, Analyzer(base))
    dense = build_dense_index(vecs, base)
    maxsim = build_maxsim_index(data.corpus.parent_texts(), embedder, base)
    gidx = build_graph_index(data.entity_store, data.corpus, base)
    t_index = time.time() - t0
    print(f"indexes built in {t_index:.0f}s "
          f"(graph: {gidx.n_entities} entities)", flush=True)

    variants = {
        "lexical_only": base.replace(semantic_enabled=False, graph_enabled=False,
                                     rerank_enabled=False),
        "dense_only": base.replace(lexical_enabled=False, graph_enabled=False,
                                   rerank_enabled=False),
        "hybrid_rrf": base.replace(graph_enabled=False, rerank_enabled=False),
        "full_nograph": base.replace(graph_enabled=False),
        "full3": base,
        # decomposition: refusal gate alone vs gate+denoise — the denoiser
        # (keep >= alpha*max of the gate score) is what cuts graph-routed
        # answers whose carrier docs set the max, not the refusal itself
        "full3_gate_only": base.replace(safety_threshold=0.6),
        "full3_gated": base.replace(safety_threshold=0.6, denoise_alpha=0.6),
    }
    if args.variants:
        keep = {v.strip() for v in args.variants.split(",")}
        variants = {k: v for k, v in variants.items() if k in keep}

    results, latency = {}, {}
    roc = None
    for name, cfg in variants.items():
        t0 = time.time()
        r = Retriever.from_indexes(
            data.corpus, cfg,
            bm25_index=bm25 if cfg.lexical_enabled else None,
            dense_index=dense if cfg.semantic_enabled else None,
            maxsim_index=maxsim if (cfg.rerank_enabled and cfg.rerank_backend == "maxsim") else None,
            graph_index=gidx if cfg.graph_enabled else None,
            embedder=embedder,
        )
        eng = ShardedEngine(r, corpus_mesh())
        res, max_scores, qkinds = evaluate_with_refusals(eng, data.queries, k=args.k)
        res["elapsed_s"] = round(time.time() - t0, 1)
        results[name] = res
        print(f"{name}: recall@{args.k}={res[f'recall@{args.k}']:.4f} "
              f"cloze={res.get(f'recall@{args.k}_cloze', float('nan')):.4f} "
              f"graph={res.get(f'recall@{args.k}_graph', float('nan')):.4f} "
              f"refusals={res['refusal_rate']:.3f} ({res['elapsed_s']}s)", flush=True)

        if name == "full3":
            # ROC: gate scores on relevant (the full3 ungated pass we just ran)
            # vs irrelevant queries (answers not in corpus). max_score is the
            # gate input and is threshold-independent, so one pass suffices.
            irr_scores = []
            if irr_queries:
                _, irr_scores, _ = evaluate_with_refusals(eng, irr_queries, k=args.k)
            rel = np.asarray(max_scores, np.float64)
            irr = np.asarray(irr_scores, np.float64)
            sweep = {}
            for thr in (0.3, 0.4, 0.5, 0.6, 0.7, 0.8):
                sweep[f"{thr:.2f}"] = {
                    "false_refusal_rate_relevant": float(np.mean(rel < thr)),
                    "refusal_rate_irrelevant": (
                        float(np.mean(irr < thr)) if irr.size else None),
                }
            auc = None
            if irr.size:
                # ROC over thresholds: TPR = irrelevant refused, FPR = relevant refused
                thrs = np.unique(np.concatenate([rel, irr, [0.0, 2.0]]))
                tpr = [float(np.mean(irr < t)) for t in thrs]
                fpr = [float(np.mean(rel < t)) for t in thrs]
                o = np.argsort(fpr)
                auc = float(np.trapezoid(np.asarray(tpr)[o], np.asarray(fpr)[o]))
            roc = {
                "n_relevant": int(rel.size), "n_irrelevant": int(irr.size),
                "relevant_score_percentiles": {
                    str(p): float(np.percentile(rel, p)) for p in (5, 25, 50, 75, 95)},
                "irrelevant_score_percentiles": (
                    {str(p): float(np.percentile(irr, p)) for p in (5, 25, 50, 75, 95)}
                    if irr.size else None),
                "threshold_sweep": sweep,
                "roc_auc": auc,
                "per_kind_false_refusal_at_0.6": {
                    kind: float(np.mean(
                        [s < 0.6 for s, kk in zip(max_scores, qkinds) if kk == kind]))
                    for kind in set(qkinds)
                },
            }
            print(f"  ROC: AUC={auc} rel-p5={roc['relevant_score_percentiles']['5']:.3f} "
                  f"irr-p95={(roc['irrelevant_score_percentiles'] or {}).get('95')}",
                  flush=True)

        qs = [q.text for q in data.queries[: args.latency_queries]]
        eng.retrieve(qs[0], top_k=args.k)
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
        "corpus": "ast-docstrings + API carrier docs (training sources excluded); "
                  "self-extracted graph (RuleBasedExtractor + link_mentions)",
        "n_docs": args.docs,
        "n_children": len(texts),
        "n_parents": data.corpus.n_parents,
        "queries": kinds,
        "extraction": data.extraction_metrics,
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
    if roc is not None:
        roc_out = pathlib.Path(args.roc_out)
        roc_out.write_text(json.dumps({
            "mode": "bigcorpus_gate_roc", "n_docs": args.docs, **roc}, indent=1))
        print(f"-> {roc_out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
