"""``thr`` command-line interface: ingest / query / bench / stats / metrics.

The reference declares a ``thr`` entry point that does not exist
(``/root/reference/triple-hybrid-rag/pyproject.toml:95`` points at a missing
``cli.py``) and ships operator scripts instead (``scripts/ingest_rag2.py`` file/dir
ingestion, ``scripts/test_rag2.py`` interactive query CLI — SURVEY.md §2.5). This CLI
provides both, for real:

    thr ingest path/ --index ./index          # ingest files, checkpoint the index
    thr query "payment terms" --index ./index # one-shot query
    thr query --interactive --index ./index   # REPL (test_rag2.py parity)
    thr stats --index ./index
    thr bench --n 100000                      # run the benchmark
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--index", default="./thr_index", help="checkpoint directory")
    p.add_argument("--json", action="store_true", help="machine-readable output")


def cmd_ingest(args: argparse.Namespace) -> int:
    from .facade import RAG

    index_dir = Path(args.index).resolve()
    rag = RAG.load(index_dir) if (index_dir / "manifest.json").exists() else RAG()
    results = []
    for target in args.paths:
        t = Path(target)
        if t.is_dir():
            # never re-ingest the index's own checkpoint artifacts
            files = [
                p for p in sorted(t.rglob("*"))
                if p.is_file() and index_dir not in p.resolve().parents
            ]
        else:
            files = [t]
        for p in files:
            # per-file guard: one missing/broken path must not discard the
            # whole run's already-ingested work before rag.save() below
            try:
                results.append(rag.ingest(p, force=args.force))
            except Exception as e:
                from .types import IngestionResult, IngestionStatus

                results.append(IngestionResult(
                    doc_id="", filename=str(p),
                    status=IngestionStatus.FAILED, error=f"{type(e).__name__}: {e}",
                ))
    rag.save(index_dir)
    for r in results:
        if args.json:
            print(json.dumps({
                "file": r.filename, "status": r.status.value, "skipped": r.skipped,
                "parents": r.n_parents, "children": r.n_children,
                "entities": r.n_entities, "error": r.error,
            }))
        else:
            flag = "SKIP" if r.skipped else r.status.value.upper()
            print(f"[{flag}] {r.filename}: {r.n_parents} parents, "
                  f"{r.n_children} children, {r.n_entities} entities"
                  + (f" ({r.error})" if r.error else ""))
    failed = sum(1 for r in results if r.status.value == "failed")
    import sys as _sys

    # the human summary goes to stderr under --json: stdout stays pure JSONL
    print(
        f"ingested {len(results)} file(s), {failed} failed -> {index_dir}",
        file=_sys.stderr if args.json else _sys.stdout,
    )
    return 1 if failed else 0


def _print_result(result, as_json: bool, verbose: bool = False) -> None:
    if as_json:
        print(json.dumps({
            "query": result.query,
            "refused": result.refused,
            "refusal_reason": result.refusal_reason,
            "max_score": result.max_score,
            "timings_ms": result.timings,
            "results": [
                {
                    "chunk_id": r.chunk_id, "score": r.final_score,
                    "channels": list(r.source_channels),
                    "heading": r.section_heading, "text": r.text,
                }
                for r in result.results
            ],
        }))
        return
    if result.refused:
        print(f"REFUSED: {result.refusal_reason}")
        return
    if verbose:
        from .observability.latency_viz import render_waterfall

        print(render_waterfall(result.timings))
    for i, r in enumerate(result.results, 1):
        chans = "+".join(r.source_channels) or "-"
        head = f" [{r.section_heading}]" if r.section_heading else ""
        print(f"{i}. ({r.final_score:.3f}) [{chans}]{head}")
        print("   " + r.text[:300].replace("\n", " "))
    t = result.timings.get("total_ms")
    if t is not None:
        print(f"-- {len(result.results)} results in {t:.1f} ms")


def cmd_query(args: argparse.Namespace) -> int:
    from .facade import RAG

    rag = RAG.load(Path(args.index))
    if args.interactive or not args.query:
        print("thr interactive query (empty line to exit)")
        while True:
            try:
                q = input("query> ").strip()
            except (EOFError, KeyboardInterrupt):
                break
            if not q:
                break
            _print_result(rag.query(q, top_k=args.top_k), args.json, args.verbose)
        return 0
    _print_result(
        rag.query(" ".join(args.query), top_k=args.top_k), args.json, args.verbose
    )
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    from .facade import RAG

    rag = RAG.load(Path(args.index))
    stats = rag.stats()
    if args.json:
        print(json.dumps(stats))
    else:
        for k, v in stats.items():
            print(f"{k}: {v}")
    return 0


def cmd_metrics(args: argparse.Namespace) -> int:
    from .observability import rag_metrics

    print(rag_metrics.prometheus_text())
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import os
    import runpy

    if args.n:
        os.environ["BENCH_N"] = str(args.n)
    bench = Path(__file__).resolve().parent.parent / "bench.py"
    if not bench.exists():
        print(
            "thr bench: bench.py ships with the source repository (it is not part "
            "of the installed package) — run it from a checkout of the repo",
            file=__import__("sys").stderr,
        )
        return 2
    runpy.run_path(str(bench), run_name="__main__")
    return 0


def cmd_eval(args: argparse.Namespace) -> int:
    """Quality ladder over the five BASELINE configs (run_harness.py analogue).

    ``--stdlib`` switches to the independent inverse-cloze corpus harvested from
    Python stdlib docstrings (text the builder did not author)."""
    if getattr(args, "stdlib", False):
        from .eval import evaluate_stdlib

        sources = tuple(s.strip() for s in args.sources.split(",") if s.strip())
        results = evaluate_stdlib(k=args.k, n_docs=args.stdlib_docs, sources=sources)
    else:
        from .eval import evaluate_baseline_configs

        results = evaluate_baseline_configs(
            k=args.k, distractors=args.distractors, hard_negatives=args.hard_negatives
        )
    if args.json:
        print(json.dumps(results))
        return 0
    for name, m in results.items():
        print(f"{name}: recall@{args.k}={m[f'recall@{args.k}']:.3f} "
              f"ndcg@{args.k}={m[f'ndcg@{args.k}']:.3f} mrr={m['mrr']:.3f}")
    return 0


def cmd_migrate(args: argparse.Namespace) -> int:
    """Backfill/migration: checkpoint -> (new config, optional re-embed) -> checkpoint.

    Parity with the reference's ``scripts/backfill_rag2.py`` (1.0 -> 2.0 migration with
    re-embedding, backfill_rag2.py:1-20): loads a saved index, optionally re-derives the
    device indexes under new dims/dtype from the stored full-dim embeddings (cheap), or
    re-embeds every stored chunk text with the new config's embedder (``--reembed``,
    the full backfill), then writes a fresh verified checkpoint."""
    from .index.checkpoint import load_ingestor, save_ingestor

    overrides = {}
    if args.dim is not None:
        overrides["embedding_dim"] = args.dim
    if args.dim_full is not None:
        overrides["embedding_dim_full"] = args.dim_full
    if args.dtype is not None:
        overrides["embedding_dtype"] = args.dtype
    cfg = None
    if overrides:
        # peek the saved config from the manifest (cheap) instead of loading the
        # full checkpoint twice just to call .replace() on its config
        import json as _json

        from .config import RAGConfig
        from .index.checkpoint import MANIFEST

        manifest = _json.loads((Path(args.src) / MANIFEST).read_text())
        raw = dict(manifest.get("config") or {})
        for key in ("mesh_shape", "mesh_axis_names", "analyzer_languages"):
            if key in raw and isinstance(raw[key], list):
                raw[key] = tuple(raw[key])
        base_cfg = RAGConfig(**raw) if raw else RAGConfig()
        cfg = base_cfg.replace(**overrides)
    ing = load_ingestor(args.src, config=cfg, allow_pickle=args.allow_pickle)
    n = len(ing.corpus)
    if args.reembed and n:
        texts = [c.text for c in ing.corpus.children]
        vectors = ing.embedder.embed_texts(texts)
        ing.embeddings = {
            c.chunk_id: vectors[c.row] for c in ing.corpus.children
        }
    out = save_ingestor(ing, args.dst)
    summary = {
        "src": str(args.src), "dst": str(out), "children": n,
        "parents": len(ing.corpus.parents),
        "embedding_dim": ing.config.embedding_dim,
        "embedding_dtype": ing.config.embedding_dtype,
        "reembedded": bool(args.reembed and n),
    }
    print(json.dumps(summary) if args.json else
          f"migrated {n} chunks {args.src} -> {args.dst} "
          f"(dim={ing.config.embedding_dim}, dtype={ing.config.embedding_dtype}"
          f"{', re-embedded' if summary['reembedded'] else ''})")
    return 0


def cmd_train_encoder(args: argparse.Namespace) -> int:
    from .models.pretrain import (
        DEFAULT_PARAMS,
        load_default_encoder,
        paraphrase_recall_at_k,
        train_default_encoder,
    )

    out = args.out or DEFAULT_PARAMS
    path, metrics = train_default_encoder(
        out_path=out, steps=args.steps, batch_size=args.batch_size, seed=args.seed,
        overlap_frac=args.overlap_frac, realtext_frac=args.realtext_frac,
    )
    print(f"saved {path} (final loss {metrics['loss']:.4f}, acc {metrics['accuracy']:.3f})")
    emb = load_default_encoder(path=path)
    if emb is not None:
        r = paraphrase_recall_at_k(emb, k=10)
        print(f"held-out paraphrase recall@10 (dense-only): {r:.3f}")
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    from .facade import RAG
    from .server import serve

    rag = None
    if args.engine:
        index_dir = Path(args.index)
        rag = (
            RAG.load(index_dir, use_sharded_engine=True)
            if (index_dir / "manifest.json").exists()
            else RAG(use_sharded_engine=True)
        )
    import os

    httpd = serve(
        host=args.host, port=args.port, rag=rag, index_dir=args.index,
        ingest_root=args.ingest_root,
        auth_token=args.auth_token or os.environ.get("RAG_SERVER_TOKEN") or None,
    )
    print(f"thr serving on http://{args.host}:{args.port} (index: {args.index})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="thr", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("ingest", help="ingest files or directories into the index")
    p.add_argument("paths", nargs="+")
    p.add_argument("--force", action="store_true", help="re-ingest even if unchanged")
    _add_common(p)
    p.set_defaults(fn=cmd_ingest)

    p = sub.add_parser("query", help="query the index")
    p.add_argument("query", nargs="*", help="query text (omit for --interactive)")
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--interactive", "-i", action="store_true")
    p.add_argument("--verbose", "-v", action="store_true",
                   help="print the per-stage latency waterfall")
    _add_common(p)
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("stats", help="index statistics")
    _add_common(p)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("metrics", help="Prometheus metrics exposition")
    p.set_defaults(fn=cmd_metrics)

    p = sub.add_parser("bench", help="run the benchmark")
    p.add_argument("--n", type=int, default=None, help="corpus size")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("eval", help="retrieval-quality ladder (recall@k / NDCG@k)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--distractors", type=int, default=30)
    p.add_argument("--hard-negatives", type=int, default=0,
                   help="per-topic confusables reusing topic vocabulary (ranking stress)")
    p.add_argument("--stdlib", action="store_true",
                   help="independent corpus: inverse-cloze over stdlib docstrings")
    p.add_argument("--stdlib-docs", type=int, default=500)
    p.add_argument("--sources", default="stdlib",
                   help="comma list of docstring corpora for --stdlib: stdlib "
                        "and/or installed package names (numpy,jax,torch,...)")
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser(
        "migrate", help="backfill/migrate a checkpoint (new dims/dtype, --reembed)"
    )
    p.add_argument("src", help="source checkpoint directory")
    p.add_argument("dst", help="destination checkpoint directory")
    p.add_argument("--dim", type=int, default=None, help="new embedding_dim (Matryoshka)")
    p.add_argument("--dim-full", type=int, default=None, help="new embedding_dim_full")
    p.add_argument("--dtype", default=None,
                   choices=["bfloat16", "float32", "int8", "int4"])
    p.add_argument("--allow-pickle", action="store_true",
                   help="permit loading a legacy v1 (pickle) checkpoint — executes "
                        "code from the file; only for checkpoints you wrote")
    p.add_argument("--reembed", action="store_true",
                   help="re-embed every chunk text (full backfill, not re-truncation)")
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=cmd_migrate)

    p = sub.add_parser(
        "train-encoder",
        help="train the packaged default encoder on generated paraphrase pairs",
    )
    p.add_argument("--out", default=None, help="output npz (default: packaged path)")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--overlap-frac", type=float, default=0.3,
                   help="fraction of random-token overlap pairs (identity prior)")
    p.add_argument("--realtext-frac", type=float, default=0.35,
                   help="fraction of real-prose inverse-cloze pairs (harvested from "
                        "TRAIN_TEXT_SOURCES packages, disjoint from eval corpora)")
    p.set_defaults(fn=cmd_train_encoder)

    p = sub.add_parser("serve", help="HTTP serving host (/query /ingest /metrics)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--index", default="./thr_index")
    p.add_argument("--engine", action="store_true",
                   help="serve through the batched sharded engine (one-dispatch path)")
    p.add_argument("--ingest-root", default=None,
                   help="allow POST /ingest {'path': ...} for files under this directory "
                        "(disabled when omitted)")
    p.add_argument("--auth-token", default=None,
                   help="require 'Authorization: Bearer <token>' on every request "
                        "(default: $RAG_SERVER_TOKEN, or no auth when unset)")
    p.set_defaults(fn=cmd_serve)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except Exception as e:  # checkpoint/IO errors surface as one line, not a traceback
        from .index.checkpoint import CheckpointError

        if isinstance(e, (CheckpointError, FileNotFoundError)):
            print(f"thr {args.command}: error: {e}", file=sys.stderr)
            return 2
        raise


if __name__ == "__main__":
    sys.exit(main())
