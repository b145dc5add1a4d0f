"""ShardedEngine: the full query funnel as ONE jitted SPMD program over a mesh.

This is the production query path (BASELINE.json config 5). Index arrays are placed with
``NamedSharding`` over the corpus ``"shard"`` axis; a query executes as a single
``shard_map`` program:

    per-shard BM25 termtable scores ->\
    per-shard dense matvec scores    -> local top-k -> all_gather(ICI) -> global merge
    per-shard graph chunk scores    ->/
    -> weighted RRF fuse (replicated) -> parent expand -> rerank -> safety gate

compared with the reference where each channel is a network round-trip to Postgres /
PuppyGraph / vLLM (``/root/reference/src/voice_agent/rag2/retrieval.py:203-459``). Per-shard
top-k truncation before the collective keeps the ICI payload at ``S * k`` ids+scores
regardless of corpus size; the merge is exact because per-shard top-k over a disjoint row
partition upper-bounds the global top-k.

The engine degenerates cleanly to a 1x1 mesh (single chip): same program, no collectives
inserted. ``Retriever.retrieve`` remains the staged/debuggable path; the engine is the
one-dispatch serving path.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RAGConfig
from ..ops.bm25 import score_termtable
from ..ops.fusion import FusedCandidates, apply_safety_denoise, fuse_rrf
from ..ops.graph import khop_entity_scores, chunk_scores_from_entities
from ..ops.topk import masked_top_k, merge_topk
from ..types import QueryPlan, RetrievalResult
from .mesh import corpus_mesh


def _pad_rows(arr: jax.Array, n_rows: int) -> jax.Array:
    """Pad axis 0 to n_rows (with zeros / -1 for int id tables)."""
    if arr.shape[0] == n_rows:
        return arr
    pad = n_rows - arr.shape[0]
    fill = -1 if jnp.issubdtype(arr.dtype, jnp.integer) else 0
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=fill)


class ShardedEngine:
    """Device placement + compiled SPMD query program for one corpus snapshot."""

    def __init__(self, retriever, mesh: Optional[Mesh] = None) -> None:
        self.retriever = retriever
        self.config: RAGConfig = retriever.config
        self.corpus = retriever.corpus
        self.mesh = mesh or corpus_mesh()
        s = self.mesh.shape["shard"]

        cfg = self.config
        bm = retriever.bm25_index
        dx = retriever.dense_index
        gx = retriever.graph_index

        # unify row capacity to a multiple of the shard count
        n_pads = [retriever.parent_of.shape[0]]
        if bm is not None:
            n_pads.append(bm.term_ids.shape[0])
        if dx is not None:
            n_pads.append(dx.embeddings.shape[0])
        n_pad = max(n_pads)
        n_pad = ((n_pad + s - 1) // s) * s
        self.n_pad = n_pad

        def shard_rows(arr, extra_dims=1):
            spec = P("shard", *([None] * (extra_dims - 1))) if extra_dims > 1 else P("shard")
            return jax.device_put(_pad_rows(arr, n_pad), NamedSharding(self.mesh, spec))

        def repl(arr):
            return jax.device_put(arr, NamedSharding(self.mesh, P()))

        # lexical (doc-major termtable layout; the shardable lexical representation)
        if bm is not None:
            self.term_ids = shard_rows(bm.term_ids, 2)
            self.term_weights = shard_rows(bm.term_weights.astype(jnp.float32), 2)
        else:
            self.term_ids = shard_rows(jnp.full((n_pad, 1), -2, jnp.int32), 2)
            self.term_weights = shard_rows(jnp.zeros((n_pad, 1), jnp.float32), 2)
        # dense
        if dx is not None:
            self.embeddings = shard_rows(dx.embeddings, 2)
            self.valid = shard_rows(dx.valid)
            self.dim = dx.dim
        else:
            self.embeddings = shard_rows(jnp.zeros((n_pad, 8), jnp.bfloat16), 2)
            self.valid = shard_rows(jnp.zeros((n_pad,), bool))
            self.dim = 8
        # graph
        if gx is not None:
            self.nbr = repl(gx.nbr)
            self.chunk_entities = shard_rows(gx.chunk_entities, 2)
            self.e_pad = gx.e_pad
        else:
            self.nbr = repl(jnp.full((8, 1), -1, jnp.int32))
            self.chunk_entities = shard_rows(jnp.full((n_pad, 1), -1, jnp.int32), 2)
            self.e_pad = 8
        # replicated small tables
        self.parent_of = repl(_pad_rows(retriever.parent_of, n_pad))
        pe = getattr(retriever.reranker, "parent_embeddings", None)
        self.parent_emb = repl(pe) if pe is not None else None
        mx = getattr(retriever, "maxsim_index", None)
        if mx is not None:
            self.maxsim_tokens = repl(mx.tokens)
            self.maxsim_mask = repl(mx.mask)
        else:
            self.maxsim_tokens = None
            self.maxsim_mask = None

        self._compiled = self._build_program()

    # ------------------------------------------------------------------

    def _build_program(self):
        cfg = self.config
        mesh = self.mesh
        k_lex = cfg.lexical_top_k
        k_sem = cfg.semantic_top_k
        k_graph = cfg.graph_top_k
        use_graph = self.retriever.graph_index is not None and cfg.graph_enabled
        use_lex = self.retriever.bm25_index is not None and cfg.lexical_enabled
        use_sem = self.retriever.dense_index is not None and cfg.semantic_enabled
        use_maxsim = cfg.rerank_enabled and self.maxsim_tokens is not None
        use_dot_rerank = (
            cfg.rerank_enabled and not use_maxsim and self.parent_emb is not None
        )
        hops = cfg.graph_hops

        def channel_merge(local_scores, valid, k, floor):
            ids, vals = masked_top_k(local_scores, k, valid=valid, invalid_score_floor=floor)
            offset = jax.lax.axis_index("shard") * local_scores.shape[0]
            ids = jnp.where(ids >= 0, ids + offset, -1)
            return merge_topk(
                jax.lax.all_gather(ids, "shard"),
                jax.lax.all_gather(vals, "shard"),
                k,
            )

        def program(
            term_ids, term_weights, embeddings, valid, nbr, chunk_entities,
            parent_of, parent_emb, mx_tokens, mx_mask,
            q_terms, q_vec, q_tokens, q_tok_mask, seeds, weights, threshold, alpha,
            graph_on,
        ):
            # ---- channels (sharded rows) ----
            if use_lex:
                lex_local = score_termtable(term_ids, term_weights, q_terms)
                lex_ids, lex_scores = channel_merge(lex_local, None, k_lex, 0.0)
            else:
                lex_ids = jnp.full((1,), -1, jnp.int32)
                lex_scores = jnp.zeros((1,), jnp.float32)
            if use_sem:
                sem_local = jnp.dot(
                    embeddings, q_vec.astype(embeddings.dtype),
                    preferred_element_type=jnp.float32,
                )
                sem_ids, sem_scores = channel_merge(sem_local, valid, k_sem, -2.0)
            else:
                sem_ids = jnp.full((1,), -1, jnp.int32)
                sem_scores = jnp.zeros((1,), jnp.float32)
            if use_graph:
                ent_scores = khop_entity_scores(nbr, seeds, hops=hops)
                g_local = chunk_scores_from_entities(chunk_entities, ent_scores)
                g_local = jnp.where(graph_on, g_local, 0.0)
                graph_ids, graph_scores = channel_merge(g_local, None, k_graph, 0.0)
            else:
                graph_ids = jnp.full((1,), -1, jnp.int32)
                graph_scores = jnp.zeros((1,), jnp.float32)

            # ---- fuse (replicated) ----
            fused = fuse_rrf(
                lex_ids, lex_scores, sem_ids, sem_scores, graph_ids, graph_scores,
                weights, rrf_k=cfg.rrf_k, top_k=cfg.rerank_top_k,
            )

            # ---- parent expansion ----
            safe = jnp.clip(fused.ids, 0, parent_of.shape[0] - 1)
            parent_ids = jnp.where(fused.ids >= 0, parent_of[safe], -1)

            # ---- rerank ----
            if use_maxsim:
                from ..ops.maxsim import maxsim_scores

                safe_p = jnp.clip(parent_ids, 0, mx_tokens.shape[0] - 1)
                rerank = maxsim_scores(
                    mx_tokens[safe_p], mx_mask[safe_p], q_tokens, q_tok_mask,
                    parent_ids >= 0,
                )
            elif use_dot_rerank:
                pe = parent_emb[jnp.clip(parent_ids, 0, parent_emb.shape[0] - 1)]
                cos = jnp.dot(pe, q_vec.astype(pe.dtype), preferred_element_type=jnp.float32)
                rerank = jnp.where(parent_ids >= 0, (cos + 1.0) * 0.5, 0.0)
            else:
                from ..ops.fusion import minmax_normalize

                rerank = minmax_normalize(fused.ids, fused.rrf)

            # ---- safety ----
            gate = apply_safety_denoise(
                fused.ids, rerank, threshold, alpha, top_k=cfg.final_top_k
            )
            return gate.ids, gate.scores, gate.refused, gate.max_score, fused, rerank

        n_shards = mesh.shape["shard"]
        shard2 = P("shard", None)
        shard1 = P("shard")
        rep = P()
        smapped = jax.shard_map(
            program,
            mesh=mesh,
            in_specs=(
                shard2, shard2, shard2, shard1, rep, shard2, rep, rep, rep, rep,
                rep, rep, rep, rep, rep, rep, rep, rep, rep,
            ),
            out_specs=(rep, rep, rep, rep,
                       FusedCandidates(rep, rep, rep, rep, rep, rep), rep),
            check_vma=False,
        )
        return jax.jit(smapped)

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------

    def prepare_query(self, query: str) -> Tuple[QueryPlan, tuple]:
        """Host prep: plan, analyze, embed, seed — everything before the one dispatch."""
        r = self.retriever
        cfg = self.config
        plan = r.planner.plan(query)

        if r.bm25_index is not None:
            q_terms = jnp.asarray(r.bm25_index.encode_query(plan.keywords))
        else:
            q_terms = jnp.full((cfg.max_query_terms,), -1, jnp.int32)

        if r.dense_index is not None:
            from ..index.dense_index import truncate_matryoshka

            raw = r.embedder.embed_query(plan.semantic_query_text or query)
            q_vec = jnp.asarray(truncate_matryoshka(raw[None], cfg.embedding_dim)[0])
        else:
            q_vec = jnp.zeros((self.dim,), jnp.float32)

        if self.maxsim_tokens is not None:
            toks = r.embedder.token_embeddings(
                [plan.semantic_query_text or query], max_tokens=cfg.maxsim_query_tokens
            )[0]
            q_tokens = jnp.asarray(toks)
            q_tok_mask = jnp.asarray(np.any(toks != 0, axis=-1))
        else:
            q_tokens = jnp.zeros((1, 1), jnp.float32)
            q_tok_mask = jnp.zeros((1,), bool)

        seeds = np.zeros((self.e_pad,), bool)
        graph_on = False
        if self.retriever.graph_index is not None and plan.requires_graph:
            gx = self.retriever.graph_index
            names = plan.graph_entities or plan.keywords
            for name in names:
                for e in gx.entity_lookup(name)[:3]:
                    row = gx.row_of.get(e.entity_id)
                    if row is not None:
                        seeds[row] = True
                        graph_on = True

        weights = jnp.asarray(
            [
                plan.weights.get("lexical", cfg.lexical_weight),
                plan.weights.get("semantic", cfg.semantic_weight),
                plan.weights.get("graph", cfg.graph_weight),
            ],
            jnp.float32,
        )
        args = (
            q_terms, q_vec, q_tokens, q_tok_mask, jnp.asarray(seeds), weights,
            jnp.float32(cfg.safety_threshold if cfg.safety_enabled else -1e9),
            jnp.float32(cfg.denoise_alpha if cfg.denoise_enabled else 0.0),
            jnp.asarray(graph_on),
        )
        return plan, args

    def search_arrays(self, query: str):
        """One-dispatch search returning raw device results (bench hot path)."""
        plan, args = self.prepare_query(query)
        out = self._compiled(*self._index_args(), *args)
        return plan, out

    def _index_args(self):
        zero2 = jnp.zeros((1, 1), jnp.float32)
        zero_mask = jnp.zeros((1, 1), bool)
        return (
            self.term_ids, self.term_weights, self.embeddings, self.valid,
            self.nbr, self.chunk_entities, self.parent_of,
            self.parent_emb if self.parent_emb is not None else zero2,
            self.maxsim_tokens if self.maxsim_tokens is not None else zero2[:, :, None],
            self.maxsim_mask if self.maxsim_mask is not None else zero_mask,
        )

    def retrieve(self, query: str, top_k: Optional[int] = None) -> RetrievalResult:
        """Full result decode (host) around the one-dispatch path."""
        from ..retrieval import decode_results

        t0 = time.perf_counter()
        plan, (ids, scores, refused, max_score, fused, rerank) = self.search_arrays(query)
        jax.block_until_ready(ids)
        dispatch_ms = (time.perf_counter() - t0) * 1e3

        t1 = time.perf_counter()
        results = decode_results(self.corpus, fused, rerank, ids, scores)
        if top_k is not None:
            results = results[:top_k]
        decode_ms = (time.perf_counter() - t1) * 1e3
        refused_b = bool(refused)
        return RetrievalResult(
            query=query,
            results=[] if refused_b else results,
            plan=plan,
            refused=refused_b,
            refusal_reason=(
                f"Max score {float(max_score):.2f} below threshold "
                f"{self.config.safety_threshold}" if refused_b else None
            ),
            max_score=float(max_score),
            timings={"dispatch_ms": dispatch_ms, "decode_ms": decode_ms,
                     "total_ms": dispatch_ms + decode_ms},
        )
