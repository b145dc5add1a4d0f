"""Decompose single-query latency on the real chip: where do the RPC floors go?

Run on a TPU-attached session (the tunneled dev chip adds ~25 ms per blocking RPC;
host-attached production chips are microseconds). Written when the round-2 dev
tunnel died before this could run there — the device-encode + single-device_get
fixes it motivated are parity-tested on CPU and land in the next bench.

Builds the bench corpus at BENCH_N (default 100k), then times each stage of one
engine.search_arrays([text]) call: plan, host prep, device_put, dispatch, fetch.
"""
import os, sys, time

os.environ.setdefault("BENCH_N", "100000")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from bench import (
    build_synthetic, make_query_texts, term_str, log,
    N, DIM, DTYPE, N_ENTITIES, GRAPH_FRAC,
)
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder
from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
from triple_hybrid_rag_tpu.retrieval import Retriever

cfg = RAGConfig(
    capacity_round=1024, embedding_dim=DIM, embedding_dim_full=DIM,
    embedding_dtype=DTYPE, use_fused_topk=None,
    maxsim_doc_tokens=32, maxsim_dim=64, maxsim_query_tokens=16,
    safety_threshold=0.0, graph_enabled=True, graph_max_entities_per_chunk=4,
    lexical_backend="sorted", bm25_df_cap=2048,
)
embedder = BowHashEmbedder(dim=DIM, config=cfg)
log(f"building corpus N={N} ...")
bm25, dense, mx, gx, parent_of, term_ids_doc = build_synthetic(cfg, embedder)
retr = Retriever.from_indexes(
    CorpusStore(), cfg, bm25_index=bm25, dense_index=dense,
    maxsim_index=mx, graph_index=gx, parent_of=parent_of, embedder=embedder,
)
engine = ShardedEngine(retr, corpus_mesh())

rng = np.random.default_rng(42)
rows = (rng.integers(0, N // 5, size=40) * 5).astype(np.int64)
texts, is_graph = make_query_texts(rows, term_ids_doc, rng)

# compile BOTH width-1 variants (search_arrays dispatches the graph-free
# program for non-relational plans — the typical serving path)
plain_texts = [t for t, g in zip(texts, is_graph) if not g]
graph_texts = [t for t, g in zip(texts, is_graph) if g]
if not plain_texts:
    sys.exit("query sample contains no plain (non-graph) queries — reseed the sample")
engine.search_arrays([plain_texts[0]])
if graph_texts:
    engine.search_arrays([graph_texts[0]])
idx_args = engine._index_args()

# dispatch floor
trivial = jax.jit(lambda x: x + 1.0)
x = jnp.float32(1.0)
np.asarray(trivial(x))
fl = []
for _ in range(10):
    t0 = time.perf_counter(); np.asarray(trivial(x)); fl.append((time.perf_counter()-t0)*1e3)
log(f"dispatch floor p50 = {np.percentile(fl, 50):.2f} ms")

WHICH = os.environ.get("BENCH_SQ_CLASS", "plain")  # plain | graph
pool = plain_texts if WHICH == "plain" else graph_texts
if not pool:
    sys.exit(f"no {WHICH!r}-class queries in the sample — re-run with a different "
             f"BENCH_SQ_CLASS or a larger/reseeded query sample")
prog = engine._program(1, False, WHICH == "graph")
log(f"decomposing the {WHICH}-query path ({len(pool)} distinct queries)")

stages = {k: [] for k in ("plan+prep", "device_put", "dispatch", "fetch", "total")}
for i in range(20):
    q = pool[i % len(pool)]
    t0 = time.perf_counter()
    # --- host prep without the device_put: replicate prepare_queries split ---
    import triple_hybrid_rag_tpu.parallel.engine as eng_mod
    real_put = jax.device_put
    put_times = []
    def timed_put(a, *aa, **kk):
        t = time.perf_counter()
        r = real_put(a, *aa, **kk)
        put_times.append((time.perf_counter() - t) * 1e3)
        return r
    eng_mod.jax.device_put = timed_put
    try:
        plans, args = engine.prepare_queries([q])
    finally:
        eng_mod.jax.device_put = real_put
    t1 = time.perf_counter()
    out = prog(*idx_args, *args)
    t2 = time.perf_counter()
    ids = np.asarray(out[0])
    t3 = time.perf_counter()
    stages["plan+prep"].append((t1 - t0) * 1e3 - sum(put_times))
    stages["device_put"].append(sum(put_times))  # ALL puts in the window (the
    # device-encode path issues more than one; attributing only the first
    # booked the rest under plan+prep)
    stages["dispatch"].append((t2 - t1) * 1e3)
    stages["fetch"].append((t3 - t2) * 1e3)
    stages["total"].append((t3 - t0) * 1e3)

payload = {
    "n_chunks": N, "dtype": DTYPE, "query_class": WHICH,
    "dispatch_floor_p50_ms": round(float(np.percentile(fl, 50)), 2),
    "device": str(jax.devices()[0]),
    "stages_ms": {},
}
for k, v in stages.items():
    v = np.array(v)
    log(f"{k:>11}: p50={np.percentile(v,50):7.2f} ms  p95={np.percentile(v,95):7.2f} ms")
    payload["stages_ms"][k] = {
        "p50": round(float(np.percentile(v, 50)), 2),
        "p95": round(float(np.percentile(v, 95)), 2),
    }
import json, pathlib
out_path = pathlib.Path(f"/root/repo/eval_results/single_query_decomp_{N}_{WHICH}.json")
out_path.write_text(json.dumps(payload, indent=1))
log(f"-> {out_path}")
