"""ShardedEngine: the full query funnel as ONE jitted SPMD program over a mesh.

This is the production query path (BASELINE.json config 5). Index arrays are placed with
``NamedSharding`` over the corpus ``"shard"`` axis; a *batch* of queries executes as a
single ``shard_map`` program:

    per-shard lexical top-k (sort-based sparse BM25 over the shard's CSR slice) ->\
    per-shard dense matmul scores -> local top-k                                 -> all_gather(ICI) -> exact merge
    per-shard graph chunk scores                                                ->/
    -> weighted RRF fuse (vmapped, replicated) -> parent expand -> MaxSim rerank -> safety gate

compared with the reference where each channel is a network round-trip to Postgres /
PuppyGraph / vLLM per query (``/root/reference/src/voice_agent/rag2/retrieval.py:203-459``).

Performance notes (measured on TPU v5e):

- per-shard top-k truncation before the collective keeps the ICI payload at ``S * k``
  ids+scores regardless of corpus size; the merge is exact because shards partition rows;
- the lexical channel uses the scatter-free sort-based sparse path
  (``ops.bm25.score_postings_topk``) over a per-shard CSR slice: work is O(matched
  postings), ~0.5 ms/query at 1M chunks vs ~4 ms for a dense table scan;
- the dense channel batches queries into one (B, D) x (D, N_loc) MXU matmul:
  ~0.05 ms/query at 1M x 1024 bf16;
- query batching amortizes the per-dispatch host->device round trip: the engine compiles
  one program per batch width and pads partial batches.

The engine degenerates cleanly to a 1x1 mesh (single chip): same program, no collectives.
``Retriever.retrieve`` remains the staged/debuggable path; the engine is the serving path.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import RAGConfig
from ..ops.bm25 import score_postings_topk_pre, score_postings_topk_tiered, score_termtable
from ..ops.fusion import FusedCandidates, apply_safety_denoise, fuse_rrf, minmax_normalize
from ..ops.graph import graph_sparse_topk, graph_topk_batch, khop_distances
from ..ops.maxsim import maxsim_scores
from ..ops.topk import bucketed_masked_top_k_batch, masked_top_k, merge_topk
from ..types import QueryPlan, RetrievalResult
from .mesh import corpus_mesh


def _pad_rows(arr: jax.Array, n_rows: int) -> jax.Array:
    if arr.shape[0] == n_rows:
        return arr
    pad = n_rows - arr.shape[0]
    fill = -1 if jnp.issubdtype(arr.dtype, jnp.integer) else 0
    widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
    return jnp.pad(arr, widths, constant_values=fill)


def _shard_csr(bm25, n_loc: int, s: int):
    """Split the global doc-ordered CSR into S per-shard CSR slices (host NumPy).

    Within a term, postings are doc-ascending, so each (term, shard) block is a
    contiguous slice of the global postings — resharding is pure index arithmetic.
    Returns stacked arrays with a leading shard axis:
    offsets [S, V+1], lengths [S, V], postings_doc/tf [S, nnz_max + l_max] (local rows).
    """
    if bm25.host_csr is not None:
        offs, lens, pd_full, pt_full = bm25.host_csr
    else:  # device readback fallback (slow on tunneled dev chips)
        offs = np.asarray(bm25.offsets)
        lens = np.asarray(bm25.lengths)
        pd_full = np.asarray(bm25.postings_doc)
        pt_full = np.asarray(bm25.postings_tf)
    offs = np.asarray(offs)
    lens = np.asarray(lens)
    v = lens.shape[0]
    nnz = int(offs[-1])
    pd = np.asarray(pd_full)[:nnz]
    term_of = np.repeat(np.arange(v, dtype=np.int64), lens)  # O(nnz): compute once
    if bm25.host_weights is not None:
        pw_src = np.asarray(bm25.host_weights)[:nnz]
    else:  # fold weights on host (restored/legacy index without precomputed impacts)
        idf_h = np.asarray(bm25.idf)
        denom_h = np.asarray(bm25.contrib_denom_k1)
        tfs = np.asarray(pt_full)[:nnz]
        k1p1 = bm25.config.bm25_k1 + 1.0
        pw_src = idf_h[term_of] * tfs * k1p1 / (
            tfs + denom_h[np.clip(pd, 0, denom_h.shape[0] - 1)]
        )
    pt = pw_src.astype(np.float32)  # engine postings carry PRECOMPUTED weights

    shard_of = np.minimum(pd // max(n_loc, 1), s - 1).astype(np.int64)
    counts = np.bincount(term_of * s + shard_of, minlength=v * s).reshape(v, s)

    l_max = max(int(counts.max()) if nnz else 1, 1)
    out_offsets = np.zeros((s, v + 1), np.int32)
    np.cumsum(counts.T, axis=1, out=out_offsets[:, 1:])
    nnz_max = int(out_offsets[:, -1].max()) if nnz else 0
    width = nnz_max + l_max
    out_pd = np.full((s, width), -1, np.int32)
    out_pt = np.zeros((s, width), np.float32)

    # global start of each (term, shard) block
    within = np.cumsum(counts, axis=1) - counts  # prefix inside the term's postings
    g_start = offs[:-1, None] + within  # [V, S]
    for si in range(s):
        c = counts[:, si]
        total = int(c.sum())
        if total == 0:
            continue
        # gather indices: for each term, the run [g_start, g_start+c);
        # local offset within run = arange - repeat(run starts in output)
        reps = np.repeat(g_start[:, si], c)
        local_off = np.arange(total) - np.repeat(out_offsets[si, :-1], c)
        idx = reps + local_off
        out_pd[si, :total] = pd[idx] - si * n_loc  # local row ids
        out_pt[si, :total] = pt[idx]
    return (
        jnp.asarray(out_offsets),
        jnp.asarray(counts.T.astype(np.int32)),  # [S, V]
        jnp.asarray(out_pd),
        jnp.asarray(out_pt),
        l_max,
    )


def _shard_mentions(ce_host: np.ndarray, n_loc: int, s: int, e_pad: int, cap: int):
    """Invert chunk_entities[N, M] into per-shard entity->chunk mention CSR.

    The sparse graph backend's index build (host NumPy, same contiguous-slice
    resharding trick as :func:`_shard_csr`: mention lists are chunk-ascending,
    so each (entity, shard) block is one contiguous run). Entities mentioned in
    more than ``cap`` chunks keep the ``cap`` lowest chunk rows (deterministic;
    the reference's Cypher keyword search LIMITs chunk lists the same way).

    Returns (offsets [S, E+1] i32, lengths [S, E] i32, docs [S, width] i32
    local rows, l_max_g, truncated: bool).
    """
    n, m = ce_host.shape
    flat_ent = ce_host.reshape(-1).astype(np.int64)
    flat_doc = np.repeat(np.arange(n, dtype=np.int64), m)
    keep = (flat_ent >= 0) & (flat_ent < e_pad)
    fe, fd = flat_ent[keep], flat_doc[keep]
    order = np.lexsort((fd, fe))  # entity-major, chunk-ascending
    fe, fd = fe[order], fd[order]
    cnt = np.bincount(fe, minlength=e_pad)
    offs_full = np.zeros(e_pad + 1, np.int64)
    np.cumsum(cnt, out=offs_full[1:])
    pos_in_ent = np.arange(fe.shape[0]) - np.repeat(offs_full[:-1], cnt)
    k2 = pos_in_ent < cap
    truncated = bool((cnt > cap).any())
    fe, fd = fe[k2], fd[k2]
    lens_g = np.minimum(cnt, cap)
    offs_g = np.zeros(e_pad + 1, np.int64)
    np.cumsum(lens_g, out=offs_g[1:])

    shard_of = np.minimum(fd // max(n_loc, 1), s - 1)
    counts = np.bincount(fe * s + shard_of, minlength=e_pad * s).reshape(e_pad, s)
    l_max_g = max(int(counts.max()) if fe.size else 1, 1)
    out_offsets = np.zeros((s, e_pad + 1), np.int32)
    np.cumsum(counts.T, axis=1, out=out_offsets[:, 1:])
    nnz_max = int(out_offsets[:, -1].max()) if fe.size else 0
    width = nnz_max + l_max_g
    out_docs = np.full((s, width), -1, np.int32)

    within = np.cumsum(counts, axis=1) - counts  # prefix inside the entity's run
    g_start = offs_g[:-1, None] + within  # [E, S]
    for si in range(s):
        c = counts[:, si]
        total = int(c.sum())
        if total == 0:
            continue
        reps = np.repeat(g_start[:, si], c)
        local_off = np.arange(total) - np.repeat(out_offsets[si, :-1], c)
        idx = reps + local_off
        out_docs[si, :total] = (fd[idx] - si * n_loc).astype(np.int32)
    return (
        jnp.asarray(out_offsets),
        jnp.asarray(counts.T.astype(np.int32)),  # [S, E]
        jnp.asarray(out_docs),
        l_max_g,
        truncated,
    )


class ShardedEngine:
    """Device placement + compiled SPMD batched query program for one corpus snapshot."""

    def __init__(self, retriever, mesh: Optional[Mesh] = None) -> None:
        self.retriever = retriever
        self.config: RAGConfig = retriever.config
        self.corpus = retriever.corpus
        # Encode query batches ON DEVICE in one async dispatch when the embedder
        # supports it (EncoderEmbedder.encode_queries_device): the host never
        # fetches the embeddings, it chains encoder -> search dispatches and
        # blocks only on the final ids. False forces the numpy prep path
        # (embed_texts + token_embeddings), which fetches the forward twice.
        self.device_query_encode = True
        self.mesh = mesh or corpus_mesh()
        s = self.mesh.shape["shard"]
        self.n_shards = s

        cfg = self.config
        bm = retriever.bm25_index
        dx = retriever.dense_index
        gx = retriever.graph_index

        n_pads = [retriever.parent_of.shape[0]]
        if bm is not None:
            n_pads.append(bm.term_ids.shape[0])
        if dx is not None:
            n_pads.append(dx.embeddings.shape[0])
        n_pad = max(n_pads)
        n_pad = ((n_pad + s - 1) // s) * s
        # blocked-IVF dense backend (index/ivf.py): per-shard row count must be a
        # multiple of the probe-block width so the cluster-major layout chops into
        # whole blocks; round capacity up before any placement
        self.ivf_mode = (
            cfg.semantic_backend == "ivf"
            and dx is not None
            and cfg.semantic_enabled
        )
        if self.ivf_mode:
            self.ivf_w = max(1, cfg.ivf_block_rows)
            unit = s * self.ivf_w
            n_pad = ((n_pad + unit - 1) // unit) * unit
        else:
            self.ivf_w = 1
        self.n_pad = n_pad
        self.n_loc = n_pad // s

        # On a 1-device mesh an index array that already lives on that device is
        # used AS-IS: every 1-device sharding is equivalent, jit compiles for
        # the actual input shardings, and re-placement on this backend round-
        # trips through the host (measured 91 s for 8.4 GB at 12M) while
        # transiently holding TWO copies of the index — the allocation that
        # capped the one-chip corpus. Multi-device meshes always re-place (the
        # rows genuinely move), with may_alias for the same-layout shards.
        single_dev = (
            self.mesh.size == 1 and jax.devices()[0] == self.mesh.devices.flat[0]
        )

        def _maybe_reuse(arr, place):
            if (
                single_dev
                and isinstance(arr, jax.Array)
                and arr.devices() == {self.mesh.devices.flat[0]}
            ):
                return arr
            return place(arr)

        def shard_rows(arr, ndim=1):
            spec = P("shard", *([None] * (ndim - 1)))
            arr = _pad_rows(arr, n_pad)
            return _maybe_reuse(arr, lambda a: jax.device_put(
                a, NamedSharding(self.mesh, spec), may_alias=True))

        def shard_stacked(arr, ndim):
            spec = P("shard", *([None] * (ndim - 1)))
            return _maybe_reuse(arr, lambda a: jax.device_put(
                a, NamedSharding(self.mesh, spec), may_alias=True))

        def repl(arr):
            return _maybe_reuse(arr, lambda a: jax.device_put(
                a, NamedSharding(self.mesh, P()), may_alias=True))

        # ---- lexical: per-shard CSR (sorted path) or sharded termtable ----
        self.lexical_mode = "none"
        if bm is not None and cfg.lexical_enabled:
            if cfg.lexical_backend in ("sorted", "auto"):
                offs_s, lens_s, pd_s, pt_s, l_max = _shard_csr(bm, self.n_loc, s)
                self.lex_offsets = shard_stacked(offs_s, 2)
                self.lex_lengths = shard_stacked(lens_s, 2)
                self.lex_pd = shard_stacked(pd_s, 2)
                self.lex_pt = shard_stacked(pt_s, 2)
                self.lex_l_max = l_max
                self.lexical_mode = "sorted"
            else:
                self.term_ids = shard_rows(bm.term_ids, 2)
                self.term_weights = shard_rows(bm.term_weights.astype(jnp.float32), 2)
                self.lexical_mode = "termtable"
        if self.lexical_mode != "sorted":
            self.lex_offsets = shard_stacked(jnp.zeros((s, 2), jnp.int32), 2)
            self.lex_lengths = shard_stacked(jnp.zeros((s, 1), jnp.int32), 2)
            self.lex_pd = shard_stacked(jnp.full((s, 2), -1, jnp.int32), 2)
            self.lex_pt = shard_stacked(jnp.zeros((s, 2), jnp.float32), 2)
            self.lex_l_max = 1
        if self.lexical_mode != "termtable":
            self.term_ids = shard_rows(jnp.full((n_pad, 1), -2, jnp.int32), 2)
            self.term_weights = shard_rows(jnp.zeros((n_pad, 1), jnp.float32), 2)

        # ---- dense ----
        if dx is not None:
            self.embeddings = shard_rows(dx.embeddings, 2)
            self.valid = shard_rows(dx.valid)
            self.dim = dx.dim
            self._use_int4 = dx.is_int4  # packed uint8[n, D/2] rows
            self._use_int8 = dx.scales is not None and not dx.is_int4
            self.dense_scales = (
                shard_rows(dx.scales)
                if dx.scales is not None
                else shard_rows(jnp.ones((n_pad,), jnp.float32))
            )
        else:
            self.embeddings = shard_rows(jnp.zeros((n_pad, 8), jnp.bfloat16), 2)
            self.valid = shard_rows(jnp.zeros((n_pad,), bool))
            self.dim = 8
            self._use_int4 = False
            self._use_int8 = False
            self.dense_scales = shard_rows(jnp.ones((n_pad,), jnp.float32))
        if self.ivf_mode:
            # per-shard blocked-IVF build ON DEVICE (shard_map: each shard
            # clusters and reorders its own rows — embarrassingly parallel,
            # nothing crosses ICI at build). Replaces the placed row matrix
            # with its cluster-major reorder + perm + block centroids.
            from ..index.ivf import ivf_build_local

            w = self.ivf_w
            use_scales = self._use_int8 or self._use_int4

            def build(rows, scales, valid):
                r, sc, perm, cent = ivf_build_local(
                    rows, scales if use_scales else None, valid,
                    block_rows=w, n_clusters=cfg.ivf_clusters,
                    iters=cfg.ivf_kmeans_iters,
                )
                return r, (sc if sc is not None else scales), perm, cent

            rows_r, scales_r, perm, cent = jax.jit(
                jax.shard_map(
                    build, mesh=self.mesh,
                    in_specs=(P("shard", None), P("shard"), P("shard")),
                    out_specs=(P("shard", None), P("shard"), P("shard"), P("shard", None)),
                    check_vma=False,
                )
            )(self.embeddings, self.dense_scales, self.valid)
            self.embeddings = rows_r
            self.dense_scales = scales_r
            self.ivf_perm = perm
            self.ivf_centroids = cent
        else:
            self.ivf_perm = shard_rows(jnp.zeros((n_pad,), jnp.int32))
            # 1 dummy centroid row per shard ([n_blocks_total, D] layout)
            self.ivf_centroids = shard_stacked(jnp.zeros((s, 2), jnp.float32), 2)
        # ---- graph ----
        # Backend choice (config.graph_backend): "sparse" scores only chunks
        # that mention an activated entity via per-shard entity->chunk mention
        # CSR (O(matched mentions)); "dense" scans chunk_entities[N, M] per
        # query (O(N) — measured ~half of full-pipeline device time at 1M).
        # "auto" picks sparse exactly when provably EXACT: every possibly-
        # activated entity fits the A slots (worst-case k-hop reach) and no
        # mention list was truncated by graph_mention_cap.
        self.graph_mode = "none"
        self.graph_active = 1
        self.g_l_max = 1
        # small-batch sparse override: True when the large-batch mode is the
        # dense scan but the mention CSR is ALSO placed so programs with batch
        # <= cfg.graph_sparse_max_batch take the sparse path (the dense scan is
        # batch-independent and dominates single-query latency; see config)
        self.graph_small_sparse = False
        # run bound for the sparse path's segmented max: a chunk matches at most
        # M mention slots regardless of how many entities are activated
        self._graph_m = int(gx.chunk_entities.shape[1]) if gx is not None else 1
        if gx is not None:
            self.nbr = repl(gx.nbr)
            self.e_pad = gx.e_pad
            backend = cfg.graph_backend
            ce_host = getattr(gx, "host_chunk_entities", None)
            if backend in ("sparse", "auto") and ce_host is not None:
                deg = int(gx.nbr.shape[1])
                reach = 1
                bound = 1
                for _ in range(cfg.graph_hops):
                    reach *= deg
                    bound += reach
                bound = min(cfg.graph_max_seeds * bound, gx.e_pad)
                a_slots = min(bound, cfg.graph_active_slots)
                want_small = cfg.graph_sparse_max_batch > 0
                # cheap slot-budget check FIRST: under "auto", a high-degree
                # graph only pays the mention-CSR build (host lexsort over N*M
                # pairs) when the small-batch override will actually use it
                if (
                    backend == "sparse"
                    or bound <= cfg.graph_active_slots
                    or want_small
                ):
                    g_off, g_len, g_docs, l_max_g, truncated = _shard_mentions(
                        ce_host, self.n_loc, s, gx.e_pad, cfg.graph_mention_cap
                    )
                    exact = (not truncated) and bound <= cfg.graph_active_slots
                    if backend == "sparse" or exact or want_small:
                        self.graph_active = a_slots
                        self.g_l_max = l_max_g
                        self.g_offsets = shard_stacked(g_off, 2)
                        self.g_lengths = shard_stacked(g_len, 2)
                        self.g_docs = shard_stacked(g_docs, 2)
                        if backend == "sparse" or exact:
                            self.graph_mode = "sparse"
                        else:
                            self.graph_small_sparse = True
            if self.graph_mode != "sparse":
                self.graph_mode = "dense"
                self.chunk_entities = shard_rows(gx.chunk_entities, 2)
        else:
            self.nbr = repl(jnp.full((8, 1), -1, jnp.int32))
            self.e_pad = 8
        if self.graph_mode != "dense":
            # tiny row-sharded placeholder (1 row/shard): the compiled program's
            # graph_mode static never reads it in sparse/none mode, and a
            # full-height dummy would waste n_pad*4 bytes of HBM (64 MB at 16M)
            self.chunk_entities = jax.device_put(
                jnp.full((s, 1), -1, jnp.int32),
                NamedSharding(self.mesh, P("shard", None)),
            )
        if self.graph_mode != "sparse" and not self.graph_small_sparse:
            self.g_offsets = shard_stacked(jnp.zeros((s, 2), jnp.int32), 2)
            self.g_lengths = shard_stacked(jnp.zeros((s, 1), jnp.int32), 2)
            self.g_docs = shard_stacked(jnp.full((s, 2), -1, jnp.int32), 2)
        # ---- collection scoping (sharded row -> collection-id filter table) ----
        self.collection_ids = dict(getattr(retriever, "collection_ids", {}) or {})
        coll = getattr(retriever, "collection_of", None)
        if coll is not None:
            self.collection_of = shard_rows(coll)
        else:
            self.collection_of = shard_rows(jnp.full((n_pad,), -1, jnp.int32))

        # ---- replicated small tables ----
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

        self._programs: Dict[int, object] = {}  # batch width -> compiled program

    # ------------------------------------------------------------------

    def refresh(self, retriever=None) -> bool:
        """Re-place index arrays from an updated retriever WITHOUT recompiling.

        Corpus mutations normally force a new engine (new compiled programs, ~15-40s
        each on remote-compile links). When the padded capacity and static config are
        unchanged — the common case thanks to capacity rounding — the compiled
        programs remain shape-valid, so a refresh is placement-only (seconds at 1M).
        Returns True when the fast path applied; False means shapes/config changed and
        the caller must build a fresh engine."""
        retriever = retriever or self.retriever
        new = ShardedEngine.__new__(ShardedEngine)
        try:
            ShardedEngine.__init__(new, retriever, self.mesh)
            self.last_refresh_error = None
        except Exception as e:
            # a genuine failure (device OOM mid-placement, a build bug) is NOT
            # "shapes changed" — stash it so the caller's fresh-build retry can
            # report the original cause when it hits the same wall
            self.last_refresh_error = e
            rag_metrics.counter("engine_refresh_errors_total").inc()
            return False
        if (
            new.n_pad != self.n_pad
            or new.lex_l_max != self.lex_l_max
            or new.lexical_mode != self.lexical_mode
            or new.e_pad != self.e_pad
            or new.graph_mode != self.graph_mode
            or new.graph_small_sparse != self.graph_small_sparse
            or new.graph_active != self.graph_active
            or new.g_l_max != self.g_l_max
            or new._graph_m != self._graph_m
            or new.ivf_mode != self.ivf_mode
            or new.ivf_w != self.ivf_w
            or new.dim != self.dim
            or new._use_int8 != self._use_int8
            or new._use_int4 != self._use_int4
            or new.config != self.config
            # channel/rerank presence is baked into the compiled programs as statics
            or (new.retriever.graph_index is None) != (self.retriever.graph_index is None)
            or (new.retriever.dense_index is None) != (self.retriever.dense_index is None)
            or (new.maxsim_tokens is None) != (self.maxsim_tokens is None)
            or (new.parent_emb is None) != (self.parent_emb is None)
            or (new.maxsim_tokens is not None and new.maxsim_tokens.shape != self.maxsim_tokens.shape)
        ):
            return False
        for attr in (
            "retriever", "corpus", "lex_offsets", "lex_lengths", "lex_pd", "lex_pt",
            "term_ids", "term_weights", "embeddings", "dense_scales", "valid",
            "ivf_perm", "ivf_centroids",
            "nbr", "chunk_entities", "g_offsets", "g_lengths", "g_docs",
            "collection_of", "parent_of", "parent_emb",
            "maxsim_tokens", "maxsim_mask", "collection_ids",
        ):
            setattr(self, attr, getattr(new, attr))
        return True  # self._programs preserved: zero recompiles

    def _program(self, batch: int, scoped: bool = False, graph: bool = True):
        key = (batch, scoped, graph)
        fn = self._programs.get(key)
        if fn is None:
            fn = self._build_program(batch, scoped, graph)
            self._programs[key] = fn
        return fn

    def _build_program(self, batch: int, scoped: bool = False, graph: bool = True):
        cfg = self.config
        mesh = self.mesh
        dp = int(mesh.shape.get("data", 1))
        if batch % dp:
            raise ValueError(f"batch {batch} must divide the data axis ({dp})")
        batch = batch // dp  # per-replica batch inside the shard_map body
        k_lex, k_sem, k_graph = cfg.lexical_top_k, cfg.semantic_top_k, cfg.graph_top_k
        use_graph = self.retriever.graph_index is not None and cfg.graph_enabled and graph
        use_sem = self.retriever.dense_index is not None and cfg.semantic_enabled
        use_int8 = use_sem and self._use_int8
        use_int4 = use_sem and self._use_int4
        use_ivf = use_sem and self.ivf_mode
        # use_fused_topk None = auto: the bucketed-XLA path is faster at every
        # measured shape (config.py:use_fused_topk), so the fused kernel only
        # auto-enables when the f32[B, n_loc] score transient would cost real
        # HBM headroom (large corpora), and never on CPU hosts. int4 never
        # auto-picks the kernel: int4_topk_blocked bounds the unpack transient
        # in pure XLA and measured 3x faster than the kernel on v5e.
        if cfg.use_fused_topk is not None:
            fused_flag = cfg.use_fused_topk
        else:
            score_bytes = 4 * batch * self.n_loc
            fused_flag = (
                not use_int4
                and jax.devices()[0].platform != "cpu"
                and score_bytes > cfg.fused_topk_auto_bytes
            )
        use_fused = use_sem and fused_flag and not use_ivf
        # int4's scalable XLA path (blocked unpack + bucket top-k): the default
        # whenever the full unpack would materialize (score matrix era sizes)
        use_int4_blocked = use_int4 and not use_fused
        # Pallas compiles natively on TPU; on CPU hosts (tests, virtual meshes)
        # the kernel runs in interpret mode so the fused path stays exercisable.
        fused_interpret = jax.devices()[0].platform == "cpu"
        use_tiering = cfg.lexical_tiering and self.lexical_mode == "sorted"
        l_small = min(cfg.bm25_small_window, self.lex_l_max)
        use_maxsim = cfg.rerank_enabled and self.maxsim_tokens is not None
        use_dot = cfg.rerank_enabled and not use_maxsim and self.parent_emb is not None
        # anchored-encoder score renormalization, baked into the compiled program
        # (constant; see ops.maxsim.calibrate_maxsim)
        maxsim_cal = float(getattr(self.retriever.embedder, "maxsim_calibration", 1.0))
        lex_mode = self.lexical_mode
        hops = cfg.graph_hops
        n_loc = self.n_loc
        l_max = self.lex_l_max
        graph_mode = self.graph_mode
        if (
            graph_mode == "dense"
            and self.graph_small_sparse
            and batch <= cfg.graph_sparse_max_batch
        ):
            # small-batch override: the dense chunk_entities scan is batch-
            # independent (it dominates a batch-1 program), the sparse mention
            # walk is per-query — so narrow programs compile the sparse path.
            # Beyond graph_active_slots activated entities this keeps the
            # top-slots by k-hop score (documented approximation; see config).
            graph_mode = "sparse"
        graph_a = self.graph_active
        g_l_max = self.g_l_max
        graph_m = self._graph_m

        def merge(ids_b, vals_b, k):
            """[B, k_local] local -> [B, k] global exact merge via all_gather."""
            offset = jax.lax.axis_index("shard") * n_loc
            ids_b = jnp.where(ids_b >= 0, ids_b + offset, -1)
            all_ids = jax.lax.all_gather(ids_b, "shard", axis=0)  # [S, B, k]
            all_vals = jax.lax.all_gather(vals_b, "shard", axis=0)
            return jax.vmap(lambda i, v: merge_topk(i, v, k), in_axes=(1, 1))(
                all_ids, all_vals
            )

        def program(
            lex_offsets, lex_lengths, lex_pd, lex_pt,
            term_ids, term_weights, embeddings, dense_scales, valid,
            ivf_perm, ivf_centroids,
            nbr, chunk_entities,
            g_offsets, g_lengths, g_docs,
            collection_of,
            parent_of, parent_emb, mx_tokens, mx_mask,
            q_terms, qs_terms, qs_slots, ql_terms, ql_slots,
            q_vec, q_tokens, q_tok_mask, seed_rows, weights, threshold, alpha,
            graph_on, coll_cid,
        ):
            # stacked shard arrays arrive as [1, ...]: drop the shard axis
            lex_offsets, lex_lengths = lex_offsets[0], lex_lengths[0]
            lex_pd, lex_pt = lex_pd[0], lex_pt[0]
            g_offsets, g_lengths, g_docs = g_offsets[0], g_lengths[0], g_docs[0]
            # query payloads ship as float16 / sparse ids to minimize the host->device
            # transfer (PCIe/tunnel bound at high QPS); compute dtypes restore here
            q_vec = q_vec.astype(jnp.float32)
            q_tokens = q_tokens.astype(jnp.float32)

            def row_mask_for(b):
                # per-query collection filter over this shard's rows
                # (cid -1 = unscoped; -2 = unknown collection -> match nothing).
                # The unscoped program variant skips the mask read entirely.
                if not scoped:
                    return None
                cid = coll_cid[b]
                return (cid == -1) | (collection_of == cid)

            def batch_row_mask():
                # bool[B, n_loc] variant of row_mask_for, for batched top-k ops
                if not scoped:
                    return None
                return (coll_cid[:, None] == -1) | (
                    collection_of[None, :] == coll_cid[:, None]
                )

            # ---- lexical ----
            if lex_mode == "sorted" and use_tiering:
                def lex_one(st, ss, lt, ls, b):
                    return score_postings_topk_tiered(
                        lex_offsets, lex_lengths, lex_pd, lex_pt,
                        st, ss, lt, ls, row_mask_for(b),
                        l_small=l_small, l_max=l_max, n_pad=n_loc, top_k=k_lex,
                    )
                l_ids, l_vals = jax.vmap(lex_one)(
                    qs_terms, qs_slots, ql_terms, ql_slots, jnp.arange(batch)
                )
                lex_ids, lex_scores = merge(l_ids, l_vals, k_lex)
            elif lex_mode == "sorted":
                def lex_one(qt, b):
                    # lex_pt carries PRECOMPUTED per-posting BM25 contributions
                    return score_postings_topk_pre(
                        lex_offsets, lex_lengths, lex_pd, lex_pt,
                        qt, row_mask_for(b), l_max=l_max, n_pad=n_loc, top_k=k_lex,
                    )
                l_ids, l_vals = jax.vmap(lex_one)(q_terms, jnp.arange(batch))
                lex_ids, lex_scores = merge(l_ids, l_vals, k_lex)
            elif lex_mode == "termtable":
                if scoped:
                    def lex_one_scoped(qt, b):
                        return masked_top_k(
                            score_termtable(term_ids, term_weights, qt), k_lex,
                            valid=row_mask_for(b),
                        )
                    l_ids, l_vals = jax.vmap(lex_one_scoped)(q_terms, jnp.arange(batch))
                else:
                    def lex_one(qt):
                        return masked_top_k(score_termtable(term_ids, term_weights, qt), k_lex)
                    l_ids, l_vals = jax.lax.map(lex_one, q_terms)  # one table pass/query
                lex_ids, lex_scores = merge(l_ids, l_vals, k_lex)
            else:
                lex_ids = jnp.full((batch, 1), -1, jnp.int32)
                lex_scores = jnp.zeros((batch, 1), jnp.float32)

            # ---- dense (one batched MXU matmul) ----
            if use_ivf:
                # blocked-IVF ANN: probe top-P block centroids, score only their
                # rows (index/ivf.py). ids come back as ORIGINAL local rows, so
                # the standard all-gather merge applies unchanged.
                from ..index.ivf import ivf_topk_local

                d_ids, d_vals = ivf_topk_local(
                    embeddings,
                    dense_scales if (use_int8 or use_int4) else None,
                    ivf_perm, ivf_centroids, q_vec,
                    probes=cfg.ivf_probes, top_k=k_sem,
                    row_mask=batch_row_mask(),
                )
                sem_ids, sem_scores = merge(d_ids, d_vals, k_sem)
            elif use_fused:
                # Pallas fused matmul + bucket-max: the f32[B, n_loc] score
                # matrix never reaches HBM (ops/pallas/fused_topk.py). Exact:
                # ids bit-identical to the XLA path below, ties included.
                from ..ops.pallas.fused_topk import fused_dense_topk

                d_ids, d_vals = fused_dense_topk(
                    embeddings, valid, q_vec, k_sem,
                    scales=dense_scales if (use_int8 or use_int4) else None,
                    collection_of=collection_of if scoped else None,
                    coll_cid=coll_cid if scoped else None,
                    interpret=fused_interpret,
                )
                sem_ids, sem_scores = merge(d_ids, d_vals, k_sem)
            elif use_int4_blocked:
                # production int4 path: blocked unpack (bounded transient) +
                # bucket top-k, pure XLA (index/dense_index.int4_topk_blocked)
                from ..index.dense_index import int4_topk_blocked

                d_ids, d_vals = int4_topk_blocked(
                    embeddings, dense_scales, valid, q_vec, k_sem,
                    collection_of=collection_of if scoped else None,
                    coll_cid=coll_cid if scoped else None,
                )
                sem_ids, sem_scores = merge(d_ids, d_vals, k_sem)
            elif use_int8:
                from ..index.dense_index import dense_scores_int8_batch

                scores = dense_scores_int8_batch(embeddings, dense_scales, q_vec)
            elif use_sem:
                scores = jnp.dot(
                    q_vec.astype(embeddings.dtype), embeddings.T,
                    preferred_element_type=jnp.float32,
                )  # [B, n_loc]
            if use_sem and not use_fused and not use_int4_blocked and not use_ivf:
                m = batch_row_mask()
                d_ids, d_vals = bucketed_masked_top_k_batch(
                    scores, k_sem,
                    valid=valid[None, :] if m is None else valid[None, :] & m,
                    invalid_score_floor=-2.0,
                )
                sem_ids, sem_scores = merge(d_ids, d_vals, k_sem)
            elif not use_sem:
                sem_ids = jnp.full((batch, 1), -1, jnp.int32)
                sem_scores = jnp.zeros((batch, 1), jnp.float32)
            if use_sem:
                # zero-vector fail-soft guard: a failed embed ships a zero query
                # vector, which scores EVERY row exactly 0.0 — above the int8
                # noise floor — so the channel returned rows 0..k-1 (id
                # tie-break) as "results" during embedder outages instead of
                # nothing. An all-zero q_vec silences the channel; fusion then
                # genuinely degrades to lexical+graph as documented.
                q_ok = jnp.any(q_vec != 0.0, axis=-1, keepdims=True)  # [B, 1]
                sem_ids = jnp.where(q_ok, sem_ids, -1)
                sem_scores = jnp.where(q_ok, sem_scores, 0.0)

            # ---- graph ----
            if use_graph:
                e_pad = nbr.shape[0]

                def entity_frontier(sr):
                    # sparse seed rows -> dense seed vector (scatter-max: -1 pads,
                    # clipped to row 0, can never clear a real row-0 seed)
                    seed_vec = (
                        jnp.zeros((e_pad,), bool)
                        .at[jnp.clip(sr, 0, e_pad - 1)]
                        .max(sr >= 0)
                    )
                    return khop_distances(nbr, seed_vec, hops=hops)

                # per-query k-hop over the (small) entity graph
                dist = jax.vmap(entity_frontier)(seed_rows)  # [B, e_pad] f32
                reach = dist <= float(hops)
                ent_all = jnp.where(reach, 1.0 / (1.0 + dist), 0.0)
                if graph_mode == "sparse":
                    # entity->chunk mention postings: score only chunks that
                    # mention an activated entity (O(matched mentions); exact —
                    # the auto policy guarantees every activated entity fits
                    # the A slots and no mention list was truncated)
                    act_s, act_e = jax.lax.top_k(
                        jnp.where(graph_on[:, None], ent_all, 0.0), graph_a
                    )
                    act_e = jnp.where(act_s > 0.0, act_e, -1)

                    def g_one(ae, asc, b):
                        return graph_sparse_topk(
                            g_offsets, g_lengths, g_docs, ae, asc,
                            row_mask_for(b),
                            l_max_g=g_l_max, n_pad=n_loc, top_k=k_graph,
                            run_bound=graph_m,
                        )

                    g_ids, g_vals = jax.vmap(g_one)(
                        act_e, act_s, jnp.arange(batch)
                    )
                else:
                    # dense scan: blocked bucket-maxima over u8 hop-ranks (4x
                    # less gather traffic than f32 scores; selection order
                    # identical) + exact f32 member rescore. Neither per-chunk
                    # scores nor the [N, M, B] gather intermediate materialize
                    # (that intermediate is 8 GB at 8M chunks x batch 64 — the
                    # 8M OOM), and the per-query length-N top-k sort is avoided
                    ranks = jnp.where(
                        reach & graph_on[:, None],
                        (float(hops) + 1.0) - dist,
                        0.0,
                    ).astype(jnp.uint8)
                    g_ids, g_vals = graph_topk_batch(
                        chunk_entities, ent_all, k_graph,
                        valid=batch_row_mask(), query_on=graph_on,
                        entity_ranks=ranks,
                    )
                graph_ids, graph_scores = merge(g_ids, g_vals, k_graph)
            else:
                graph_ids = jnp.full((batch, 1), -1, jnp.int32)
                graph_scores = jnp.zeros((batch, 1), jnp.float32)

            # ---- fuse + expand + rerank + gate (vmapped over the batch) ----
            def tail(lex_i, lex_s, sem_i, sem_s, gr_i, gr_s, w, qtok, qtokm, qv):
                # w[:3] = channel RRF weights; w[3] = per-query ordering blend
                # (rerank_blend_rrf, or its _relational override for
                # relation-mediated plans — must match the staged path)
                fused = fuse_rrf(
                    lex_i, lex_s, sem_i, sem_s, gr_i, gr_s, w[:3],
                    rrf_k=cfg.rrf_k, top_k=cfg.rerank_top_k,
                    score_blend=cfg.fusion_score_blend,
                    lex_conf_gate=cfg.fusion_lex_conf_gate,
                )
                if cfg.conformal_denoise_enabled:
                    from ..ops.fusion import conformal_denoise_mask

                    keep = conformal_denoise_mask(
                        fused.ids, fused.rrf, jnp.float32(cfg.conformal_alpha)
                    )
                    fused = fused._replace(ids=jnp.where(keep, fused.ids, -1))
                safe = jnp.clip(fused.ids, 0, parent_of.shape[0] - 1)
                parent_ids = jnp.where(fused.ids >= 0, parent_of[safe], -1)
                if use_maxsim:
                    safe_p = jnp.clip(parent_ids, 0, mx_tokens.shape[0] - 1)
                    from ..ops.maxsim import calibrate_maxsim

                    rerank = calibrate_maxsim(
                        maxsim_scores(
                            mx_tokens[safe_p], mx_mask[safe_p], qtok, qtokm,
                            parent_ids >= 0,
                        ),
                        maxsim_cal,
                    )
                elif use_dot:
                    pe = parent_emb[jnp.clip(parent_ids, 0, parent_emb.shape[0] - 1)]
                    cos = jnp.dot(pe, qv.astype(pe.dtype), preferred_element_type=jnp.float32)
                    rerank = jnp.where(parent_ids >= 0, (cos + 1.0) * 0.5, 0.0)
                else:
                    rerank = minmax_normalize(fused.ids, fused.rrf)
                # ordering = optional RRF blend; gate = pure rerank (see fusion.py).
                # blend is per-query data (w[3]): bw=0 reduces to order=rerank
                if cfg.rerank_enabled:
                    bw = w[3]
                    order = (1.0 - bw) * rerank + bw * minmax_normalize(
                        fused.ids, fused.rrf
                    )
                else:
                    order = rerank
                gate = apply_safety_denoise(
                    fused.ids, order, threshold, alpha, top_k=cfg.final_top_k,
                    gate_scores=rerank,
                )
                return gate.ids, gate.scores, gate.refused, gate.max_score, fused, rerank

            return jax.vmap(tail)(
                lex_ids, lex_scores, sem_ids, sem_scores, graph_ids, graph_scores,
                weights, q_tokens, q_tok_mask, q_vec,
            )

        shard2, rep = P("shard", None), P()
        # query-batch data parallelism: when the mesh has a data axis, the batch dim of
        # every query arg/output splits over it — each replica group serves its slice
        # of the batch against a full corpus replica (near-linear QPS scaling)
        if dp > 1:
            qd1, qd2, qd3 = P("data"), P("data", None), P("data", None, None)
        else:
            qd1 = qd2 = qd3 = rep
        smapped = jax.shard_map(
            program,
            mesh=mesh,
            in_specs=(
                shard2, shard2, shard2, shard2,
                shard2, shard2, shard2, P("shard"), P("shard"),
                P("shard"), shard2,  # blocked-IVF perm + block centroids
                rep, shard2,
                shard2, shard2, shard2,  # graph mention CSR (g_offsets/lengths/docs)
                P("shard"),
                rep, rep, rep, rep,
                qd2, qd2, qd2, qd2, qd2, qd2, qd3, qd2, qd2, qd2, rep, rep, qd1, qd1,
            ),
            out_specs=(qd2, qd2, qd1, qd1,
                       FusedCandidates(qd2, qd2, qd2, qd2, qd2, qd2), qd2),
            check_vma=False,
        )
        return jax.jit(smapped)

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------

    def _index_args(self):
        zero2 = jnp.zeros((1, 1), jnp.float32)
        zero_mask = jnp.zeros((1, 1), bool)
        return (
            self.lex_offsets, self.lex_lengths, self.lex_pd, self.lex_pt,
            self.term_ids, self.term_weights, self.embeddings,
            self.dense_scales,
            self.valid,
            self.ivf_perm, self.ivf_centroids,
            self.nbr, self.chunk_entities,
            self.g_offsets, self.g_lengths, self.g_docs,
            self.collection_of, self.parent_of,
            self.parent_emb if self.parent_emb is not None else zero2,
            self.maxsim_tokens if self.maxsim_tokens is not None else zero2[:, :, None],
            self.maxsim_mask if self.maxsim_mask is not None else zero_mask,
        )

    def prepare_queries(
        self, queries: Sequence[str], collections: Optional[Sequence[Optional[str]]] = None
    ) -> Tuple[List[QueryPlan], tuple]:
        """Host prep for a batch: plan, analyze, embed, seed, collection scope."""
        r = self.retriever
        cfg = self.config
        b = len(queries)
        plans = [r.planner.plan(q) for q in queries]

        coll_cid = np.full((b,), -1, np.int32)  # -1 = unscoped
        if collections is not None:
            for i, name in enumerate(collections):
                if name is not None:
                    coll_cid[i] = self.collection_ids.get(name, -2)  # -2 = match nothing

        q_terms = np.full((b, cfg.max_query_terms), -1, np.int32)
        qs_terms = np.full((b, cfg.max_query_terms), -1, np.int32)
        qs_slots = np.zeros((b, cfg.max_query_terms), np.int32)
        ql_terms = np.full((b, cfg.bm25_large_slots), -1, np.int32)
        ql_slots = np.zeros((b, cfg.bm25_large_slots), np.int32)
        if r.bm25_index is not None:
            for i, plan in enumerate(plans):
                q_terms[i] = r.bm25_index.encode_query(plan.keywords)
                if cfg.lexical_tiering:
                    st, ss, lt, ls = r.bm25_index.encode_query_tiered(plan.keywords)
                    qs_terms[i], qs_slots[i] = st, ss
                    ql_terms[i], ql_slots[i] = lt, ls

        sem_texts = [p.semantic_query_text or p.original_query for p in plans]
        q_vec = None  # f16 — numpy (wire) or jax device array (already resident)
        q_tokens = None
        q_tok_mask = None
        if (
            self.device_query_encode
            and r.dense_index is not None
            and hasattr(r.embedder, "encode_queries_device")
        ):
            # Single-dispatch on-device query encoding: pooled/token embeddings
            # stay on device and feed the search program directly — the host
            # blocks only on the final results, not on the encoder forward.
            try:
                from ..retrieval import maxsim_query_weights

                t_q = cfg.maxsim_query_tokens if self.maxsim_tokens is not None else 1
                pooled, tok, tmask = r.embedder.encode_queries_device(
                    sem_texts,
                    out_dim=cfg.embedding_dim,
                    max_tokens=t_q,
                    token_dim=cfg.maxsim_dim,
                )
                q_vec = pooled
                if self.maxsim_tokens is not None:
                    q_tokens = tok
                    q_tok_mask = tmask.astype(np.float16)
                    t_real = q_tok_mask.shape[1]
                    for i, t in enumerate(sem_texts):
                        q_tok_mask[i] *= maxsim_query_weights(
                            t, r.analyzer, t_real
                        ).astype(np.float16)
            except Exception:
                q_vec = None
                q_tokens = None
                q_tok_mask = None

        if q_vec is None:
            q_vec_f32 = np.zeros((b, self.dim), np.float32)
            if r.dense_index is not None:
                from ..index.dense_index import truncate_matryoshka

                # ONE batched embed call for the whole batch: with an HTTP embedder this
                # is ceil(b/20) requests instead of b (reference batch-of-20,
                # embedder.py:103); with host embedders it amortizes per-call overhead.
                # Fail-soft: a failed batch yields zero vectors -> those queries answer
                # via lexical+graph.
                try:
                    raw = np.asarray(r.embedder.embed_texts(sem_texts), np.float32)
                except Exception:
                    raw = np.zeros((b, r.embedder.dim), np.float32)
                q_vec_f32 = truncate_matryoshka(raw, cfg.embedding_dim)
            q_vec = q_vec_f32.astype(np.float16)

        if q_tokens is None and self.maxsim_tokens is not None:
            from ..retrieval import maxsim_query_weights

            q_tokens_f32 = r.embedder.token_embeddings(
                sem_texts, max_tokens=cfg.maxsim_query_tokens, dim=cfg.maxsim_dim
            )
            q_tok_mask = np.any(q_tokens_f32 != 0, axis=-1).astype(np.float16)
            t_real = q_tok_mask.shape[1]  # encoder max_tokens may be < config width
            for i, t in enumerate(sem_texts):
                # soft function-word downweighting — same helper as the staged path
                q_tok_mask[i] *= maxsim_query_weights(
                    t, r.analyzer, t_real
                ).astype(np.float16)
            q_tokens = q_tokens_f32.astype(np.float16)
        elif q_tokens is None:
            q_tokens = np.zeros((b, 1, 1), np.float16)
            q_tok_mask = np.zeros((b, 1), np.float16)

        seed_rows = np.full((b, cfg.graph_max_seeds), -1, np.int32)
        graph_on = np.zeros((b,), bool)
        gx = self.retriever.graph_index
        if gx is not None:
            for i, plan in enumerate(plans):
                if not plan.requires_graph:
                    continue
                n_seeds = 0
                for name in plan.graph_entities or plan.keywords:
                    for e in gx.seed_lookup(name, 3):
                        row = gx.row_of.get(e.entity_id)
                        if row is not None and n_seeds < cfg.graph_max_seeds:
                            seed_rows[i, n_seeds] = row
                            n_seeds += 1
                            graph_on[i] = True
                    if n_seeds >= cfg.graph_max_seeds:
                        break

        weights = np.stack(
            [
                [
                    p.weights.get("lexical", cfg.lexical_weight),
                    p.weights.get("semantic", cfg.semantic_weight),
                    p.weights.get("graph", cfg.graph_weight),
                    # col 3: per-query ordering blend — relational plans trust
                    # fused ranks over the text reranker (retrieval.py parity)
                    (
                        cfg.rerank_blend_rrf_relational
                        if p.requires_graph
                        and p.intent in ("relational", "entity_lookup")
                        else cfg.rerank_blend_rrf
                    ),
                ]
                for p in plans
            ]
        ).astype(np.float32)

        # ONE device_put of the whole arg tuple (single transfer RPC, not 14) with the
        # f16 wire format: halves the dominant host->device query payload
        # (q_vec [B, D] + q_tokens [B, T, d]); the program restores f32 on device.
        # q_vec/q_tokens may already be device arrays (device_query_encode) — for
        # those device_put is a no-op passthrough, nothing re-crosses the wire.
        args = jax.device_put(
            (
                q_terms,
                qs_terms, qs_slots,
                ql_terms, ql_slots,
                q_vec,
                q_tokens, q_tok_mask,
                seed_rows, weights,
                np.float32(cfg.safety_threshold if cfg.safety_enabled else -1e9),
                np.float32(cfg.denoise_alpha if cfg.denoise_enabled else 0.0),
                graph_on,
                coll_cid,
            )
        )
        return plans, args

    def search_arrays(
        self, queries: Sequence[str], collections: Optional[Sequence[Optional[str]]] = None
    ):
        """One-dispatch batched search returning raw device results."""
        plans, args = self.prepare_queries(queries, collections)
        scoped = collections is not None and any(c is not None for c in collections)
        # Small-batch graph skip: a query whose plan doesn't require the graph
        # channel gets no seeds (prepare_queries), so the channel returns an
        # empty candidate list and fusion ignores it — dispatching the
        # graph-free program is EXACT (differential-tested) and removes the
        # dominant per-dispatch cost at serving batch sizes (the sparse mention
        # walk is ~2/3 of full-pipeline device time at 1M chunks, B=1). Bounded
        # to graph_sparse_max_batch widths so at most that many extra programs
        # compile; typical traffic (reference: most queries are non-relational,
        # rag2/query_planner.py intent rules) then pays only lexical+dense.
        graph = True
        if (
            self.retriever.graph_index is not None
            and self.config.graph_enabled
            and len(queries) <= self.config.graph_sparse_max_batch
            and not any(p.requires_graph for p in plans)
        ):
            graph = False
        out = self._program(len(queries), scoped, graph)(*self._index_args(), *args)
        return plans, out

    def retrieve(
        self, query: str, top_k: Optional[int] = None, collection: Optional[str] = None
    ) -> RetrievalResult:
        return self.retrieve_batch([query], top_k=top_k, collection=collection)[0]

    def retrieve_batch(
        self,
        queries: Sequence[str],
        top_k: Optional[int] = None,
        collection: Optional[str] = None,
        collections: Optional[Sequence[Optional[str]]] = None,
    ) -> List[RetrievalResult]:
        """Batched one-dispatch retrieval with host decode. The batch pads up to a
        multiple of the mesh's data axis (each replica group serves an equal slice).
        ``collection`` scopes the whole batch; ``collections`` scopes per query."""
        from ..retrieval import decode_results

        n_real = len(queries)
        dp = int(self.mesh.shape.get("data", 1))
        padded = list(queries)
        colls = list(collections) if collections is not None else [collection] * n_real
        while len(padded) % dp:
            padded.append(queries[0])
            colls.append(colls[0] if colls else None)
        t0 = time.perf_counter()
        try:
            plans, out = self.search_arrays(padded, colls)
            # ONE device_get of every output array (a single device->host
            # transfer RPC instead of ~10 per query: over the tunneled dev chip
            # each np.asarray(x[i]) fetch pays the ~25 ms round-trip floor)
            ids, scores, refused, max_score, fused, rerank = jax.device_get(out)
        except Exception:
            # Device-encode failures are ASYNC (the encoder dispatch returns
            # before executing), so they surface here, not inside
            # prepare_queries' fail-soft try. Retry once through the numpy prep
            # path, whose synchronous embed failure degrades to zero vectors —
            # preserving the documented lexical+graph fail-soft ladder.
            if not self.device_query_encode:
                raise
            prev = self.device_query_encode
            self.device_query_encode = False
            try:
                plans, out = self.search_arrays(padded, colls)
                ids, scores, refused, max_score, fused, rerank = jax.device_get(out)
            finally:
                self.device_query_encode = prev
        queries, plans = queries[:n_real], plans[:n_real]
        dispatch_ms = (time.perf_counter() - t0) * 1e3

        out: List[RetrievalResult] = []
        ids_np = np.asarray(ids)
        for i, (query, plan) in enumerate(zip(queries, plans)):
            t1 = time.perf_counter()
            fused_i = FusedCandidates(*(x[i] for x in fused))
            results = decode_results(
                self.corpus, fused_i, rerank[i], ids_np[i], scores[i]
            )
            if top_k is not None:
                results = results[:top_k]
            refused_b = bool(np.asarray(refused[i]))
            out.append(
                RetrievalResult(
                    query=query,
                    results=[] if refused_b else results,
                    plan=plan,
                    refused=refused_b,
                    refusal_reason=(
                        f"Max score {float(max_score[i]):.2f} below threshold "
                        f"{self.config.safety_threshold}" if refused_b else None
                    ),
                    max_score=float(max_score[i]),
                    timings={
                        "dispatch_ms": dispatch_ms / len(queries),
                        "decode_ms": (time.perf_counter() - t1) * 1e3,
                        "total_ms": dispatch_ms / len(queries)
                        + (time.perf_counter() - t1) * 1e3,
                    },
                )
            )
        return out
