"""Offline fusion lab: dump per-channel candidates once, sweep fusion variants fast.

Motivation (round-2 finding, eval_results/docstrings_all_1500_w065.json): on the hard
1500-doc docstring corpus the fused hybrid (recall@10 0.523) trails lexical-only
(0.594) because rank-based RRF gives the weaker dense channel equal voice regardless
of score magnitude — and RRF *weight* sweeps (scripts/fusion_sweep.py) cannot fix
that, because rank fusion discards the per-query confidence signal carried by the
scores themselves. The reference only ships rank-RRF (weighted w/(k+rank), its
fusion.py:52-165) and min-max normalization (fusion.py:249+), so score-aware fusion
is an *extension* candidate, not a parity requirement: this lab measures whether any
score-aware variant (CombSUM over min-max scores, absolute-cosine gating, RRF+score
blends) beats both rank-RRF and the best single channel before we commit a jit
implementation.

Protocol: phase "dump" runs the real planner + lexical/semantic channels of the
production Retriever once per query and saves ids/scores/relevant-rows to an npz;
phase "sweep" re-ranks the dumped pools under each fusion variant in numpy (instant,
no re-embedding) and reports recall@10 / NDCG@10. The numpy rank-RRF variant must
reproduce the recorded pipeline number — that is the lab's self-check.

Usage:
    python scripts/fusion_lab.py dump --docs 1500 --queries 400 --sources all \
        --out /tmp/fusion_dump.npz
    python scripts/fusion_lab.py sweep --dump /tmp/fusion_dump.npz \
        --out eval_results/fusion_lab.json
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def build_sources(arg: str):
    from triple_hybrid_rag_tpu.eval import _PACKAGE_SOURCES

    if arg == "all":
        return ("stdlib",) + tuple(_PACKAGE_SOURCES)
    return tuple(s.strip() for s in arg.split(",") if s.strip())


def cmd_dump(args) -> int:
    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import make_stdlib_eval
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = RAGConfig(
        capacity_round=64,
        embedding_dtype="float32",
        safety_threshold=0.0,
        final_top_k=10,
        rerank_top_k=20,
        denoise_alpha=0.0,
        graph_enabled=False,
        rerank_enabled=False,
    )
    t0 = time.time()
    data = make_stdlib_eval(
        cfg, n_docs=args.docs, n_queries=args.queries, seed=args.seed,
        sources=build_sources(args.sources),
    )
    print(f"corpus: {len(data.corpus)} chunks, {len(data.queries)} queries "
          f"({time.time()-t0:.0f}s)", flush=True)
    retriever = Retriever(data.corpus, cfg)

    lex_ids, lex_sc, sem_ids, sem_sc, w_lex, w_sem = [], [], [], [], [], []
    rel_rows, rel_off = [], [0]
    for i, q in enumerate(data.queries):
        plan = retriever.planner.plan(q.text, None)
        li, ls = retriever._lexical_search(plan, None)
        si, ss, _ = retriever._semantic_search(plan, None)
        lex_ids.append(np.asarray(li)); lex_sc.append(np.asarray(ls))
        sem_ids.append(np.asarray(si)); sem_sc.append(np.asarray(ss))
        w_lex.append(plan.weights.get("lexical", cfg.lexical_weight))
        w_sem.append(plan.weights.get("semantic", cfg.semantic_weight))
        rows = sorted(
            data.corpus._child_row[cid]
            for cid in q.relevant_chunk_ids if cid in data.corpus._child_row
        )
        rel_rows.extend(rows)
        rel_off.append(len(rel_rows))
        if i % 50 == 0:
            print(f"  query {i}/{len(data.queries)}", flush=True)
    def pad_stack(arrs, fill):
        m = max(a.shape[0] for a in arrs)
        return np.stack([
            np.concatenate([a, np.full(m - a.shape[0], fill, a.dtype)]) for a in arrs
        ])

    np.savez_compressed(
        args.out,
        lex_ids=pad_stack(lex_ids, -1), lex_scores=pad_stack(lex_sc, 0),
        sem_ids=pad_stack(sem_ids, -1), sem_scores=pad_stack(sem_sc, 0),
        w_lex=np.asarray(w_lex, np.float32), w_sem=np.asarray(w_sem, np.float32),
        rel_rows=np.asarray(rel_rows, np.int64),
        rel_off=np.asarray(rel_off, np.int64),
    )
    print(f"dumped -> {args.out} ({time.time()-t0:.0f}s total)", flush=True)
    return 0


# ---------------------------------------------------------------------------
# fusion variants (numpy, one query at a time; pools are small)
# ---------------------------------------------------------------------------


def _minmax(scores: np.ndarray, valid: np.ndarray) -> np.ndarray:
    if not valid.any():
        return np.zeros_like(scores)
    v = scores[valid]
    lo, hi = float(v.min()), float(v.max())
    out = np.where(valid, (scores - lo) / (hi - lo) if hi > lo else 1.0, 0.0)
    return out.astype(np.float32)


def fuse_query(
    li, ls, si, ss, wl, ws, *, mode: str, rrf_k: int = 60, blend: float = 0.0,
    mnz: bool = False,
):
    """Return (ids, fused_score) over the merged candidate pool (dedup, desc)."""
    pool: dict[int, dict] = {}
    for ids, scores, w, ch in ((li, ls, wl, "lex"), (si, ss, ws, "sem")):
        valid = ids >= 0
        norm = _minmax(scores, valid)
        for rank, (ok, doc) in enumerate(zip(valid, ids)):
            if not ok:
                continue
            e = pool.setdefault(int(doc), {"rrf": 0.0, "score": 0.0, "n": 0,
                                           "lex": 0.0, "sem": 0.0, "sem_raw": 0.0})
            e["rrf"] += w / (rrf_k + rank + 1.0)
            e["score"] += w * float(norm[rank])
            e["n"] += 1
            e[ch] = float(norm[rank])
            if ch == "sem":
                e["sem_raw"] = float(scores[rank])
    if not pool:
        return np.empty(0, np.int64), np.empty(0, np.float32)
    docs = np.fromiter(pool.keys(), np.int64)
    rrf = np.asarray([pool[d]["rrf"] for d in docs], np.float32)
    sc = np.asarray([pool[d]["score"] for d in docs], np.float32)
    n = np.asarray([pool[d]["n"] for d in docs], np.float32)
    if mode == "rrf":
        key = rrf
    elif mode == "combsum":
        key = sc
    elif mode == "combmax":
        lexn = np.asarray([pool[d]["lex"] for d in docs], np.float32)
        semn = np.asarray([pool[d]["sem"] for d in docs], np.float32)
        key = np.maximum(wl * lexn, ws * semn)
    elif mode == "lex-margin-gate":
        # down-weight the semantic channel when lexical is confident: margin =
        # relative BM25 gap between its top-2 raw scores
        lv = ls[li >= 0]
        margin = float((lv[0] - lv[1]) / max(lv[0], 1e-9)) if len(lv) >= 2 else 0.0
        g = 1.0 - min(1.0, blend * margin)
        lexn = np.asarray([pool[d]["lex"] for d in docs], np.float32)
        semn = np.asarray([pool[d]["sem"] for d in docs], np.float32)
        key = wl * lexn + g * ws * semn
    elif mode == "blend":  # normalized-rrf + score interpolation
        r = rrf / rrf.max() if rrf.max() > 0 else rrf
        s = sc / sc.max() if sc.max() > 0 else sc
        key = (1.0 - blend) * r + blend * s
    elif mode == "abs-sem":
        # lexical by rank-RRF; semantic contributes its *absolute* cosine —
        # a low-confidence dense hit adds little even at rank 1
        sem_raw = np.asarray([max(pool[d]["sem_raw"], 0.0) for d in docs], np.float32)
        # lexical-only base = total RRF minus the semantic channel's RRF mass
        # (a stray '* 0.0' previously made the base FULL RRF, double-counting
        # semantic evidence — every abs-sem row in older fusion_lab.json
        # measured a different strategy than documented)
        lex_rrf = np.asarray(
            [pool[d]["rrf"] - ws * pool[d]["sem"] for d in docs], np.float32
        )
        key = lex_rrf * (1.0 + blend * sem_raw)
    else:
        raise ValueError(mode)
    if mnz:
        key = key * n
    order = np.argsort(-key, kind="stable")
    return docs[order], key[order]


def _metrics(ranked: np.ndarray, relevant: set, k: int = 10):
    # SAME metric definitions as the pipeline eval (recall denominator is
    # |relevant|, not min(|relevant|, k)) — the lab's self-check against
    # recorded pipeline numbers silently compared different metrics before
    top = ranked[:k]
    hits = [1.0 if int(d) in relevant else 0.0 for d in top]
    recall = sum(hits) / len(relevant) if relevant else 0.0
    dcg = sum(h / np.log2(i + 2.0) for i, h in enumerate(hits))
    ideal = sum(1.0 / np.log2(i + 2.0) for i in range(min(len(relevant), k)))
    return recall, (dcg / ideal if ideal > 0 else 0.0)


def cmd_sweep(args) -> int:
    d = np.load(args.dump)
    nq = d["lex_ids"].shape[0]
    rel = [set(d["rel_rows"][d["rel_off"][i]:d["rel_off"][i + 1]].tolist())
           for i in range(nq)]

    variants = {"rrf[ref]": dict(mode="rrf")}
    variants["rrf+mnz"] = dict(mode="rrf", mnz=True)
    variants["combsum"] = dict(mode="combsum")
    variants["combsum+mnz"] = dict(mode="combsum", mnz=True)
    for b in (0.2, 0.35, 0.5, 0.65, 0.8):
        variants[f"blend{b}"] = dict(mode="blend", blend=b)
    for b in (0.5, 1.0, 2.0):
        variants[f"abs-sem{b}"] = dict(mode="abs-sem", blend=b)
    variants["combmax"] = dict(mode="combmax")
    for b in (1.0, 2.0, 4.0, 6.0, 8.0, 12.0, 100.0):
        variants[f"lexgate{b}"] = dict(mode="lex-margin-gate", blend=b)

    table = {}
    for name, kw in variants.items():
        recalls, ndcgs = [], []
        for i in range(nq):
            ids, _ = fuse_query(
                d["lex_ids"][i], d["lex_scores"][i],
                d["sem_ids"][i], d["sem_scores"][i],
                float(d["w_lex"][i]), float(d["w_sem"][i]), **kw,
            )
            r, g = _metrics(ids, rel[i], k=args.k)
            recalls.append(r); ndcgs.append(g)
        table[name] = {
            f"recall@{args.k}": round(float(np.mean(recalls)), 4),
            f"ndcg@{args.k}": round(float(np.mean(ndcgs)), 4),
        }
        print(f"{name:14s} recall@{args.k}={table[name][f'recall@{args.k}']:.4f} "
              f"ndcg={table[name][f'ndcg@{args.k}']:.4f}", flush=True)
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(
            {"dump": str(args.dump), "n_queries": int(nq), "variants": table},
            indent=1))
        print(f"-> {args.out}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    pd = sub.add_parser("dump")
    pd.add_argument("--docs", type=int, default=1500)
    pd.add_argument("--queries", type=int, default=400)
    pd.add_argument("--sources", default="all")
    pd.add_argument("--seed", type=int, default=0)
    pd.add_argument("--out", default="/tmp/fusion_dump.npz")
    ps = sub.add_parser("sweep")
    ps.add_argument("--dump", default="/tmp/fusion_dump.npz")
    ps.add_argument("--k", type=int, default=10)
    ps.add_argument("--out", default=None)
    args = ap.parse_args()
    return cmd_dump(args) if args.cmd == "dump" else cmd_sweep(args)


if __name__ == "__main__":
    raise SystemExit(main())
