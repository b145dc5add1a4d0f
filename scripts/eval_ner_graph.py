"""Close the NER->graph loop on real text (round-3 verdict task #4).

Round 3 proved the graph channel's value with ORACLE AST triples injected past the
extractor; this run replaces them with the shipped RuleBasedExtractor's output over
the corpus text (API-reference docs carry the facts as prose) and measures

- triple precision/recall vs the AST oracle, and
- how much of the oracle-mode relational win survives self-extraction,

under the same held-out-seed methodology as r3 (tune nothing here; seed 0 and 7
both reported). Oracle-mode rows are re-run WITH the api docs so both modes see
the identical corpus — the deltas isolate extraction quality alone.

Usage (real chip): python scripts/eval_ner_graph.py [--modules 240] [--out ...]
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
    ap.add_argument("--modules", type=int, default=240)
    ap.add_argument("--graph-queries", type=int, default=120)
    ap.add_argument("--cloze-queries", type=int, default=120)
    ap.add_argument("--seeds", default="0,7")
    ap.add_argument("--encoder-path", default=None)
    ap.add_argument("--out", default="eval_results/ner_graph_loop.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import evaluate_code_graph

    base = RAGConfig(
        capacity_round=64,
        embedding_dtype="float32",
        safety_threshold=0.0,
        final_top_k=10,
        rerank_top_k=20,
        denoise_alpha=0.0,
        graph_enabled=True,
    )
    if args.encoder_path is not None:
        base = base.replace(encoder_params_path=args.encoder_path)

    payload = {"modules": args.modules, "seeds": {}}
    for seed_s in args.seeds.split(","):
        seed = int(seed_s)
        per = {}
        for mode in ("oracle", "extracted"):
            t0 = time.time()
            res = evaluate_code_graph(
                base_cfg=base, n_modules=args.modules,
                n_graph_queries=args.graph_queries,
                n_cloze_queries=args.cloze_queries, seed=seed,
                graph_source=mode, include_api_docs=True,
            )
            res["elapsed_s"] = round(time.time() - t0, 1)
            per[mode] = res
            g_on = res["graph_on"].get("recall@10_graph")
            g_off = res["graph_off"].get("recall@10_graph")
            print(f"[seed {seed}] {mode}: graph-q recall@10 on={g_on:.3f} "
                  f"off={g_off:.3f} cloze on={res['graph_on'].get('recall@10_cloze', 0):.3f} "
                  f"off={res['graph_off'].get('recall@10_cloze', 0):.3f}", flush=True)
            if "extraction" in res:
                ex = res["extraction"]
                print(f"          triples: recall={ex['triple_recall']:.3f} "
                      f"precision={ex['triple_precision']:.3f} "
                      f"({ex['extracted_typed_triples']:.0f} typed / "
                      f"{ex['related_to_edges']:.0f} related_to)", flush=True)
        payload["seeds"][seed_s] = per

    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"-> {out}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
