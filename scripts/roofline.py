"""Roofline accounting for the batched serving program (round-5 verdict task #2).

Round 4 reported device ms/query vs the reference's Postgres stack (523x) but
never vs the silicon: nobody knew whether the chip was 5% or 60% utilized.
This harness produces the per-stage breakdown at the SERVING batch (default
128) together with an analytic bytes-touched / FLOPs model per stage, and
prices each stage against the chip's peak HBM bandwidth and MXU throughput
(TPU v5e: 819 GB/s HBM, 197 bf16 TFLOP/s, 394 int8 TOPS).

Two measurements per stage:

- **marginal** ms/batch = full - leave-one-out (what removing the stage saves
  inside the fused program; can be < isolated because XLA overlaps stages);
- **isolated** ms/batch = the stage alone in its own program (its standalone
  device cost, the number the floor is compared against).

The analytic floor per stage is max(bytes / peak_bw, flops / peak_ops) over
the bytes the ALGORITHM must touch (not what the current implementation
happens to touch — gather amplification shows up as a ratio > 1, which is the
point). Reference bar: none — the reference never measures against hardware
(its hot loops live inside Postgres/vLLM, SURVEY.md §3.1).

Usage:
    python scripts/roofline.py                      # 1M bf16 B=128
    BENCH_N=8000000 BENCH_DTYPE=int4 python scripts/roofline.py   # 8M int4
Writes eval_results/roofline_<N>_<dtype>.json.
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

import bench  # noqa: E402
from triple_hybrid_rag_tpu.corpus import CorpusStore  # noqa: E402
from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder  # noqa: E402
from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh  # noqa: E402
from triple_hybrid_rag_tpu.retrieval import Retriever  # noqa: E402

REPEATS = int(os.environ.get("BENCH_REPEATS", 8))

# TPU v5e (v5 lite) single-chip peaks — public spec numbers
PEAK_HBM_GBPS = float(os.environ.get("ROOFLINE_HBM_GBPS", 819.0))
PEAK_BF16_TFLOPS = float(os.environ.get("ROOFLINE_BF16_TFLOPS", 197.0))
PEAK_INT8_TOPS = float(os.environ.get("ROOFLINE_INT8_TOPS", 394.0))


def time_variant(name, retr, arg_batches, batch):
    t0 = time.time()
    engine = ShardedEngine(retr, corpus_mesh())
    prog = engine._program(batch)
    idx_args = engine._index_args()
    out = prog(*idx_args, *arg_batches[0])
    np.asarray(out[0])  # compile + warm
    bench.log(f"  [{name}] engine+compile {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(2):  # two timed passes, keep the better (dispatch jitter)
        t0 = time.perf_counter()
        for i in range(REPEATS):
            out = prog(*idx_args, *arg_batches[i % len(arg_batches)])
        np.asarray(out[0])  # one sync: amortizes tunnel RTT out of the number
        best = min(best, (time.perf_counter() - t0) / REPEATS * 1e3)
    bench.log(f"  [{name}] {best:.2f} ms/batch ({best / batch:.3f} ms/query)")
    del engine, prog, idx_args
    return best


def main():
    cfg = bench.RAGConfig(
        capacity_round=1024, embedding_dim=bench.DIM, embedding_dim_full=bench.DIM,
        embedding_dtype=bench.DTYPE, use_fused_topk=None,
        maxsim_doc_tokens=int(os.environ.get("BENCH_MAXSIM_TOKENS", 32)),
        maxsim_dim=int(os.environ.get("BENCH_MAXSIM_DIM", 64)),
        maxsim_query_tokens=16,
        safety_threshold=0.0, graph_enabled=True,
        graph_max_entities_per_chunk=4,
        lexical_backend="sorted", bm25_df_cap=bench.DF_CAP,
    )
    embedder = BowHashEmbedder(dim=bench.DIM, config=cfg)
    bench.log(f"building synthetic N={bench.N} dtype={bench.DTYPE} B={bench.BATCH} ...")
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

    base_engine = ShardedEngine(retr_for(cfg), corpus_mesh())
    arg_batches = [
        base_engine.prepare_queries(texts[i * bench.BATCH : (i + 1) * bench.BATCH])[1]
        for i in range(4)
    ]
    for a in arg_batches:
        jax.block_until_ready(a[0])
    del base_engine

    full = cfg.replace(use_fused_topk=True)
    variants = {
        "full": full,
        "no_rerank": full.replace(rerank_enabled=False),
        "no_graph": full.replace(graph_enabled=False),
        "no_lexical": full.replace(lexical_enabled=False),
        "no_dense": full.replace(semantic_enabled=False),
        "dense_only": full.replace(lexical_enabled=False, graph_enabled=False,
                                   rerank_enabled=False),
        "lexical_only": full.replace(semantic_enabled=False, graph_enabled=False,
                                     rerank_enabled=False),
        "graph_only": full.replace(semantic_enabled=False, lexical_enabled=False,
                                   rerank_enabled=False),
        "fuse_tail_only": full.replace(semantic_enabled=False, lexical_enabled=False,
                                       graph_enabled=False),
    }
    ms = {}
    for name, c in variants.items():
        ms[name] = time_variant(name, retr_for(c), arg_batches, bench.BATCH)

    # ---- analytic floors (bytes the ALGORITHM must touch per batch) ----
    B, N, D = bench.BATCH, bench.N, bench.DIM
    n_pad = cfg.round_capacity(N)
    dtype_bytes = {"bfloat16": 2.0, "int8": 1.0, "int4": 0.5}[bench.DTYPE]
    emb_bytes = n_pad * D * dtype_bytes
    if dense.scales is not None:
        emb_bytes += dense.scales.nbytes
    dense_flops = 2.0 * B * n_pad * D
    dense_peak = PEAK_BF16_TFLOPS if bench.DTYPE == "bfloat16" else PEAK_INT8_TOPS

    # lexical (sorted CSR, df-capped): per query ~n_terms posting lists of
    # <= df_cap (doc i32 + pre-score f32); plus the tiered scatter buffers
    n_terms = int(np.mean([len(t.split()) for t in texts[: bench.BATCH]]))
    lex_bytes = B * n_terms * bench.DF_CAP * 8.0

    # graph dense mode: must read chunk_entities (i32 N x M) once per batch
    # plus 1 byte of rank per (chunk, slot, query) if gathered per query —
    # the ALGORITHMIC floor is the incidence table once (scores derivable
    # on-chip), so floor = N*M*4 bytes; the current implementation's gather
    # traffic N*M*B bytes is reported alongside as "impl bytes"
    m_slots = cfg.graph_max_entities_per_chunk
    graph_floor_bytes = n_pad * m_slots * 4.0
    graph_impl_bytes = n_pad * m_slots * (4.0 + B * 1.0)  # index read + u8 gather

    # maxsim rerank: gather rerank_top_k parents' token stores per query
    td, md = cfg.maxsim_doc_tokens, cfg.maxsim_dim
    tok_bytes = 1.0 if bench.DTYPE in ("int8", "int4") else 2.0
    mx_bytes = B * cfg.rerank_top_k * td * md * tok_bytes
    mx_flops = 2.0 * B * cfg.rerank_top_k * cfg.maxsim_query_tokens * td * md

    def floor_ms(byts, flops=0.0, peak_tflops=PEAK_BF16_TFLOPS):
        t_bw = byts / (PEAK_HBM_GBPS * 1e9) * 1e3
        t_fl = flops / (peak_tflops * 1e12) * 1e3
        return max(t_bw, t_fl), t_bw, t_fl

    stages = {}
    for stage, iso, marg, byts, flops, peak, extra in (
        ("dense", ms["dense_only"], ms["full"] - ms["no_dense"],
         emb_bytes, dense_flops, dense_peak, {}),
        ("lexical", ms["lexical_only"], ms["full"] - ms["no_lexical"],
         lex_bytes, 0.0, PEAK_BF16_TFLOPS, {}),
        ("graph", ms["graph_only"], ms["full"] - ms["no_graph"],
         graph_floor_bytes, 0.0, PEAK_BF16_TFLOPS,
         {"impl_gather_bytes": graph_impl_bytes,
          "impl_gather_floor_ms": graph_impl_bytes / (PEAK_HBM_GBPS * 1e9) * 1e3}),
        ("rerank_maxsim", ms["fuse_tail_only"], ms["full"] - ms["no_rerank"],
         mx_bytes, mx_flops, PEAK_BF16_TFLOPS, {}),
    ):
        fl, t_bw, t_fl = floor_ms(byts, flops, peak)
        stages[stage] = {
            "isolated_ms_per_batch": round(iso, 3),
            "marginal_ms_per_batch": round(marg, 3),
            "floor_ms_per_batch": round(fl, 4),
            "floor_bw_ms": round(t_bw, 4), "floor_compute_ms": round(t_fl, 4),
            "bytes_per_batch_gb": round(byts / 1e9, 4),
            "gflops_per_batch": round(flops / 1e9, 2),
            "x_above_floor_isolated": round(iso / fl, 1) if fl > 0 else None,
            **{k: round(v, 4) if isinstance(v, float) else v
               for k, v in extra.items()},
        }

    total_floor = sum(s["floor_ms_per_batch"] for s in stages.values())
    resident_gb = (emb_bytes + mx.tokens.nbytes
                   + bm25.postings_doc.nbytes + bm25.postings_tf.nbytes) / 1e9
    payload = {
        "n_chunks": N, "dtype": bench.DTYPE, "batch": B, "repeats": REPEATS,
        "device": str(jax.devices()[0]),
        "peaks": {"hbm_gbps": PEAK_HBM_GBPS, "bf16_tflops": PEAK_BF16_TFLOPS,
                  "int8_tops": PEAK_INT8_TOPS},
        "ms_per_batch": {k: round(v, 2) for k, v in ms.items()},
        "ms_per_query_full": round(ms["full"] / B, 4),
        "stages": stages,
        "sum_stage_floors_ms": round(total_floor, 3),
        "full_x_above_sum_floors": round(ms["full"] / total_floor, 1),
        "resident_index_gb": round(resident_gb, 3),
        "one_hbm_sweep_ms": round(resident_gb / PEAK_HBM_GBPS * 1e3, 3),
        "achieved_dense_bw_gbps": round(
            emb_bytes / 1e9 / (ms["dense_only"] / 1e3), 1),
        "achieved_dense_tflops": round(
            dense_flops / 1e12 / (ms["dense_only"] / 1e3), 2),
    }
    out = pathlib.Path("eval_results") / f"roofline_{N}_{bench.DTYPE}.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
