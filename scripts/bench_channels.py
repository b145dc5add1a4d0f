"""Per-channel device-time breakdown of the batched engine program (real chip).

Builds bench.py's synthetic 1M corpus ONCE, then compiles + times the batched
program under config variants that disable one stage at a time. Device time is
measured as (time for R repeat dispatches, results fetched once at the end) / R,
so the tunnel round-trip is amortized out and the number is the device-queue
throughput cost per batch — the quantity that determines serving QPS.

Usage:  python scripts/bench_channels.py   (env knobs same as bench.py)
Writes eval_results/channels_<N>.json and prints the table.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("BENCH_N", "1000000")

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402  (reads env at import)
from triple_hybrid_rag_tpu.corpus import CorpusStore  # noqa: E402
from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder  # noqa: E402
from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh  # noqa: E402
from triple_hybrid_rag_tpu.retrieval import Retriever  # noqa: E402

REPEATS = int(os.environ.get("BENCH_REPEATS", 8))


def time_variant(name, retr, arg_batches, batch):
    t0 = time.time()
    engine = ShardedEngine(retr, corpus_mesh())
    prog = engine._program(batch)
    idx_args = engine._index_args()
    out = prog(*idx_args, *arg_batches[0])
    np.asarray(out[0])  # compile + warm
    bench.log(f"  [{name}] engine+compile {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(REPEATS):
        out = prog(*idx_args, *arg_batches[i % len(arg_batches)])
    np.asarray(out[0])  # one sync at the end: amortizes the tunnel RTT
    per_batch_ms = (time.perf_counter() - t0) / REPEATS * 1e3
    bench.log(f"  [{name}] {per_batch_ms:.2f} ms/batch "
              f"({per_batch_ms / batch:.3f} ms/query)")
    del engine, prog, idx_args
    return per_batch_ms


def main():
    cfg = bench.RAGConfig(
        capacity_round=1024, embedding_dim=bench.DIM, embedding_dim_full=bench.DIM,
        embedding_dtype=bench.DTYPE, use_fused_topk=None,
        maxsim_doc_tokens=int(os.environ.get("BENCH_MAXSIM_TOKENS", 32)),
        maxsim_dim=64, maxsim_query_tokens=16,
        safety_threshold=0.0, graph_enabled=True,
        graph_max_entities_per_chunk=4,
        lexical_backend="sorted", bm25_df_cap=bench.DF_CAP,
    )
    embedder = BowHashEmbedder(dim=bench.DIM, config=cfg)
    bench.log(f"building synthetic N={bench.N} dtype={bench.DTYPE} ...")
    bm25, dense, mx, gx, parent_of, term_ids_doc = bench.build_synthetic(cfg, embedder)
    jax.block_until_ready(dense.embeddings)

    rng = np.random.default_rng(42)
    rows = (rng.integers(0, bench.N // 5, size=bench.BATCH * 4) * 5).astype(np.int64)
    texts, _ = bench.make_query_texts(rows, term_ids_doc, rng)

    def retr_for(c):
        return Retriever.from_indexes(
            CorpusStore(), c, bm25_index=bm25, dense_index=dense,
            maxsim_index=mx, graph_index=gx, parent_of=parent_of, embedder=embedder,
        )

    # shared query prep (plans differ per config only via graph seeds, which the
    # full-config prep includes; disabled-channel programs ignore unused args)
    base_engine = ShardedEngine(retr_for(cfg), corpus_mesh())
    arg_batches = [
        base_engine.prepare_queries(texts[i * bench.BATCH : (i + 1) * bench.BATCH])[1]
        for i in range(4)
    ]
    for a in arg_batches:
        jax.block_until_ready(a[0])
    del base_engine

    variants = {
        "full_fused": cfg.replace(use_fused_topk=True),
        "full_xla": cfg.replace(use_fused_topk=False),
        "no_rerank": cfg.replace(use_fused_topk=True, rerank_enabled=False),
        "no_graph": cfg.replace(use_fused_topk=True, graph_enabled=False),
        "no_lexical": cfg.replace(use_fused_topk=True, lexical_enabled=False),
        "dense_only": cfg.replace(
            use_fused_topk=True, lexical_enabled=False, graph_enabled=False,
            rerank_enabled=False,
        ),
        "no_dense": cfg.replace(semantic_enabled=False),
    }
    results = {}
    for name, c in variants.items():
        results[name] = time_variant(name, retr_for(c), arg_batches, bench.BATCH)

    payload = {
        "n_chunks": bench.N, "dtype": bench.DTYPE, "batch": bench.BATCH,
        "repeats": REPEATS, "device": str(jax.devices()[0]),
        "ms_per_batch": {k: round(v, 2) for k, v in results.items()},
        "ms_per_query": {k: round(v / bench.BATCH, 3) for k, v in results.items()},
    }
    out = pathlib.Path("eval_results") / f"channels_{bench.N}.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
