"""Graph index: device-resident entity adjacency replacing PuppyGraph.

The reference runs a JVM graph database over Postgres tables (zero-ETL property-graph
mapping of ``rag_entities``/``rag_relations``/``rag_entity_mentions`` —
``/root/reference/infrastructure/puppygraph/docker-compose.yml:12-40``) and round-trips
Cypher over Bolt/HTTP per query (``triple_hybrid_rag/graph/puppygraph.py:25-474``), with a
SQL ILIKE fallback (``rag2/graph_search.py:249-405``).

Here the graph lives in HBM as two padded tables (see ``ops/graph.py``) built once from the
:class:`~triple_hybrid_rag_tpu.models.entity_extractor.EntityStore`. The query API keeps
functional parity with ``PuppyGraphClient``:

- :meth:`entity_lookup`     — name -> entities (exact/substring/trigram; puppygraph.py:182)
- :meth:`entity_neighborhood` — k-hop chunks with 1/(1+distance) scores (puppygraph.py:130)
- :meth:`related_entities`  — 1-hop neighbor listing (puppygraph.py:289)
- :meth:`relation_path`     — shortest path between two entities (puppygraph.py:238)
- :meth:`search_by_keywords_graph` — keywords -> entities -> chunks (puppygraph.py:340)
- :meth:`search_plan`       — the retrieval channel entry point (GraphSearcher.search
  parity, rag2/graph_search.py:290)

Entity-name resolution is host-side (tiny); everything after seeds is device compute.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RAGConfig
from ..corpus import CorpusStore
from ..models.entity_extractor import EntityStore
from ..ops.graph import khop_chunk_scores, khop_distances, INF_DIST
from ..ops.topk import masked_top_k
from ..types import Entity, QueryPlan


@dataclass
class GraphIndex:
    nbr: jax.Array  # i32[E_pad, D] padded neighbor table (-1 pad)
    chunk_entities: jax.Array  # i32[N_pad, M] entity rows per child chunk (-1 pad)
    store: EntityStore  # host-side triple store (names, types, relations)
    row_of: Dict[str, int]  # entity_id -> device row
    entity_rows: List[Entity]  # row -> entity
    n_entities: int
    e_pad: int
    config: RAGConfig
    # host adjacency for path reconstruction (tiny)
    host_adj: Dict[int, List[int]] = None  # type: ignore[assignment]
    # host copy of chunk_entities: lets the sharded engine invert it into
    # entity->chunk mention postings (the sparse graph backend) without a
    # device readback — same role as BM25Index.host_csr
    host_chunk_entities: Optional[np.ndarray] = None
    # entities whose degree exceeded graph_max_degree at build (edges truncated)
    # — observable recall degradation, mirrored from BM25Index.overflow_docs
    overflow_entities: int = 0
    # per-row seed stoplist (config.graph_seed_stop_df): True = too ubiquitous
    # to route by; filtered by seed_lookup only, never by entity_lookup
    seed_stop: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    # lookup / traversal API (PuppyGraphClient parity)
    # ------------------------------------------------------------------

    def entity_lookup(self, name: str) -> List[Entity]:
        return self.store.lookup(name, self.config.graph_fuzzy_threshold)

    def seed_lookup(self, name: str, limit: int = 3) -> List[Entity]:
        """entity_lookup minus the seed stoplist — the retrieval-channel rung.

        Stop-entities (mentioned in > graph_seed_stop_df of chunks) still exist
        in the graph and the explicit lookup APIs; they just never SEED a
        query-time expansion, exactly as a BM25 stopword still exists in
        documents but never scores. Filtering happens before the limit, so a
        stopped top match backfills with the next non-stop candidate."""
        out: List[Entity] = []
        for e in self.entity_lookup(name):
            row = self.row_of.get(e.entity_id)
            if (
                row is not None
                and self.seed_stop is not None
                and bool(self.seed_stop[row])
            ):
                continue
            out.append(e)
            if len(out) >= limit:
                break
        return out

    def _seed_vector(self, entities: Sequence[Entity]) -> jax.Array:
        seeds = np.zeros((self.e_pad,), bool)
        for e in entities:
            row = self.row_of.get(e.entity_id)
            if row is not None:
                seeds[row] = True
        return jnp.asarray(seeds)

    def entity_neighborhood(
        self, entity_name: str, hops: Optional[int] = None, limit: Optional[int] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """Chunks reachable from an entity: (chunk rows, graph scores)."""
        hops = self.config.graph_hops if hops is None else hops
        limit = self.config.graph_top_k if limit is None else limit
        ents = self.entity_lookup(entity_name)
        if not ents:
            return (
                jnp.full((limit,), -1, jnp.int32),
                jnp.full((limit,), -jnp.inf, jnp.float32),
            )
        scores = khop_chunk_scores(
            self.nbr, self.chunk_entities, self._seed_vector(ents[:1]), hops=hops
        )
        return masked_top_k(scores, limit)

    def related_entities(self, entity_name: str, limit: int = 20) -> List[Entity]:
        ents = self.entity_lookup(entity_name)
        if not ents:
            return []
        row = self.row_of.get(ents[0].entity_id)
        if row is None:
            return []
        out = []
        for n in self.host_adj.get(row, [])[:limit]:
            out.append(self.entity_rows[n])
        return out

    def relation_path(
        self, name_a: str, name_b: str, max_hops: int = 4
    ) -> Optional[List[Entity]]:
        """Shortest entity path a..b (host BFS over the tiny adjacency;
        replaces Cypher shortestPath, puppygraph.py:238)."""
        ea, eb = self.entity_lookup(name_a), self.entity_lookup(name_b)
        if not ea or not eb:
            return None
        a = self.row_of.get(ea[0].entity_id)
        b = self.row_of.get(eb[0].entity_id)
        if a is None or b is None:
            return None
        if a == b:
            return [self.entity_rows[a]]
        prev: Dict[int, int] = {a: a}
        frontier = [a]
        for _ in range(max_hops):
            nxt = []
            for u in frontier:
                for v in self.host_adj.get(u, []):
                    if v not in prev:
                        prev[v] = u
                        nxt.append(v)
                        if v == b:
                            path = [v]
                            while path[-1] != a:
                                path.append(prev[path[-1]])
                            return [self.entity_rows[r] for r in reversed(path)]
            frontier = nxt
            if not frontier:
                break
        return None

    def search_by_keywords_graph(
        self, keywords: Sequence[str], top_k: Optional[int] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """keywords -> fuzzy entity seeds -> k-hop -> chunks (puppygraph.py:340)."""
        seeds: List[Entity] = []
        for kw in keywords:
            seeds.extend(self.seed_lookup(kw, 3))
        return self._search_seeds(seeds, top_k)

    def search_plan(
        self, plan: QueryPlan, row_mask: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """Channel entry point: seeds from plan entities, else keywords."""
        seeds: List[Entity] = []
        for name in plan.graph_entities:
            seeds.extend(self.seed_lookup(name, 3))
        if not seeds:
            for kw in plan.keywords:
                seeds.extend(self.seed_lookup(kw, 2))
        return self._search_seeds(seeds, plan.graph_top_k, row_mask)

    def _search_seeds(
        self,
        seeds: Sequence[Entity],
        top_k: Optional[int],
        row_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        k = top_k or self.config.graph_top_k
        if not seeds:
            return (
                jnp.full((k,), -1, jnp.int32),
                jnp.full((k,), -jnp.inf, jnp.float32),
            )
        scores = khop_chunk_scores(
            self.nbr, self.chunk_entities, self._seed_vector(seeds), hops=self.config.graph_hops
        )
        return masked_top_k(scores, k, valid=row_mask)

    def execute_query(self, query: dict) -> dict:
        """Structured graph-query executor: the planner-generated-Cypher analogue.

        The reference's LLM planner emits Cypher executed by PuppyGraph
        (``execute_query_plan_cypher``, puppygraph.py:400; ``query_cypher``,
        puppygraph.py:108). Here the query language is a structured JSON op — an LLM
        planner can emit it just as easily, and it executes on the device graph:

            {"op": "neighborhood", "entity": str, "hops"?: int, "limit"?: int}
            {"op": "lookup",       "entity": str}
            {"op": "related",     "entity": str, "limit"?: int}
            {"op": "path",        "from": str, "to": str, "max_hops"?: int}
            {"op": "keywords",    "keywords": [str], "limit"?: int}

        Returns {"op", "nodes", "edges"?, "chunk_rows", "chunk_scores"} mirroring the
        reference GraphSearcher result shape (nodes/edges/paths/chunk_ids,
        rag2/graph_search.py:290)."""
        op = str(query.get("op", ""))
        if op == "lookup":
            ents = self.entity_lookup(str(query.get("entity", "")))
            return {
                "op": op,
                "nodes": [
                    {"name": e.canonical_name, "type": e.entity_type.value} for e in ents
                ],
                "chunk_rows": [], "chunk_scores": [],
            }
        if op == "related":
            ents = self.related_entities(
                str(query.get("entity", "")), int(query.get("limit", 20))
            )
            return {
                "op": op,
                "nodes": [
                    {"name": e.canonical_name, "type": e.entity_type.value} for e in ents
                ],
                "chunk_rows": [], "chunk_scores": [],
            }
        if op == "path":
            path = self.relation_path(
                str(query.get("from", "")), str(query.get("to", "")),
                int(query.get("max_hops", 4)),
            )
            return {
                "op": op,
                "nodes": [
                    {"name": e.canonical_name, "type": e.entity_type.value}
                    for e in (path or [])
                ],
                "found": path is not None,
                "chunk_rows": [], "chunk_scores": [],
            }
        if op in ("neighborhood", "keywords"):
            if op == "neighborhood":
                ids, scores = self.entity_neighborhood(
                    str(query.get("entity", "")),
                    hops=int(query.get("hops", self.config.graph_hops)),
                    limit=int(query.get("limit", self.config.graph_top_k)),
                )
            else:
                ids, scores = self.search_by_keywords_graph(
                    [str(k) for k in query.get("keywords", [])],
                    top_k=int(query.get("limit", self.config.graph_top_k)),
                )
            ids_np, scores_np = np.asarray(ids), np.asarray(scores)
            keep = ids_np >= 0
            return {
                "op": op,
                "nodes": [],
                "chunk_rows": ids_np[keep].tolist(),
                "chunk_scores": scores_np[keep].tolist(),
            }
        raise ValueError(f"unknown graph op {op!r}")

    def execute_cypher(
        self, cypher: str, parameters: Optional[dict] = None
    ) -> dict:
        """Execute raw Cypher text (the reference planner's output format).

        Drop-in analogue of ``execute_query_plan_cypher`` (reference
        puppygraph.py:400): translates the practical Cypher subset the
        reference's planner and graph layer emit (index/cypher.py) onto the
        structured op and executes it on the device graph. Raises
        ``CypherTranslationError`` outside the subset — fail loud, not wrong."""
        from .cypher import translate_cypher

        return self.execute_query(translate_cypher(cypher, parameters))

    def entity_distances(self, entity_name: str, hops: int = 2) -> Dict[str, float]:
        """Debug/observability helper: entity name -> hop distance map."""
        ents = self.entity_lookup(entity_name)
        if not ents:
            return {}
        dist = np.asarray(
            khop_distances(self.nbr, self._seed_vector(ents[:1]), hops=hops)
        )
        return {
            self.entity_rows[i].canonical_name: float(dist[i])
            for i in range(self.n_entities)
            if dist[i] < float(INF_DIST)
        }


def build_graph_index(
    store: EntityStore, corpus: CorpusStore, config: RAGConfig
) -> GraphIndex:
    """Assemble padded device tables from the triple store (one host pass)."""
    entities = list(store.entities.values())
    n_e = len(entities)
    e_pad = config.round_capacity(max(n_e, 1))
    row_of = {e.entity_id: i for i, e in enumerate(entities)}
    for e in entities:
        e.row = row_of[e.entity_id]

    # undirected adjacency (BFS semantics of `-[*1..h]-`), capped at graph_max_degree
    D = config.graph_max_degree
    host_adj: Dict[int, List[int]] = {}
    for rel in store.relations:
        a, b = row_of.get(rel.subject_id), row_of.get(rel.object_id)
        if a is None or b is None:
            continue
        host_adj.setdefault(a, [])
        host_adj.setdefault(b, [])
        if b not in host_adj[a]:
            host_adj[a].append(b)
        if a not in host_adj[b]:
            host_adj[b].append(a)
    nbr = np.full((e_pad, D), -1, np.int32)
    overflow = 0
    for row, ns in host_adj.items():
        if len(ns) > D:
            overflow += 1
        nbr[row, : min(len(ns), D)] = ns[:D]

    # chunk -> entities table over the child capacity
    M = config.graph_max_entities_per_chunk
    n_pad = config.round_capacity(max(len(corpus), 1))
    chunk_entities = np.full((n_pad, M), -1, np.int32)
    counts = np.zeros((n_pad,), np.int32)
    # distinct-chunk mention df per entity (mentions are deduped per
    # (entity, chunk) at store time) — feeds the seed stoplist
    ent_df = np.zeros((e_pad,), np.int64)
    for men in store.mentions:
        child = corpus.child(men.chunk_id)
        row = row_of.get(men.entity_id)
        if child is None or row is None or child.row < 0:
            continue
        ent_df[row] += 1
        c = counts[child.row]
        if c < M:
            chunk_entities[child.row, c] = row
            counts[child.row] = c + 1

    seed_stop = None
    if config.graph_seed_stop_df > 0:
        cut = max(
            float(config.graph_seed_stop_min),
            config.graph_seed_stop_df * max(len(corpus), 1),
        )
        seed_stop = ent_df > cut

    return GraphIndex(
        nbr=jnp.asarray(nbr),
        chunk_entities=jnp.asarray(chunk_entities),
        store=store,
        row_of=row_of,
        entity_rows=entities,
        n_entities=n_e,
        e_pad=e_pad,
        config=config,
        host_adj=host_adj,
        host_chunk_entities=chunk_entities,
        overflow_entities=overflow,
        seed_stop=seed_stop,
    )
