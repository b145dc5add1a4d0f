"""Graph channel tests: k-hop ops vs hand-BFS oracle, extractor, store, index API
(coverage model of reference tests/test_rag2_graph_e2e.py + entity E2E)."""

import numpy as np
import jax.numpy as jnp
import pytest

from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
from triple_hybrid_rag_tpu.models.entity_extractor import (
    CallableExtractor,
    EntityStore,
    RuleBasedExtractor,
    canonical_key,
)
from triple_hybrid_rag_tpu.ops.graph import (
    INF_DIST,
    chunk_scores_from_entities,
    khop_distances,
    khop_entity_scores,
)
from triple_hybrid_rag_tpu.types import EntityType, RelationType


# ---------------------------------------------------------------------------
# device ops vs BFS oracle
# ---------------------------------------------------------------------------


def make_nbr(adj, e_pad, deg):
    nbr = np.full((e_pad, deg), -1, np.int32)
    for u, vs in adj.items():
        nbr[u, : len(vs)] = vs
    return jnp.asarray(nbr)


def bfs_oracle(adj, seeds, n, hops):
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for h in range(1, hops + 1):
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return [dist.get(i, np.inf) for i in range(n)]


def test_khop_distances_match_bfs():
    # chain 0-1-2-3-4 plus branch 1-5
    adj = {0: [1], 1: [0, 2, 5], 2: [1, 3], 3: [2, 4], 4: [3], 5: [1]}
    nbr = make_nbr(adj, 8, 4)
    seeds = jnp.asarray(np.array([True] + [False] * 7))
    for hops in (1, 2, 3):
        got = np.asarray(khop_distances(nbr, seeds, hops=hops))
        want = bfs_oracle(adj, [0], 8, hops)
        for i in range(6):
            if np.isinf(want[i]) or want[i] > hops:
                assert got[i] >= float(INF_DIST) or got[i] > hops
            else:
                assert got[i] == want[i], (hops, i)


def test_khop_scores_decay():
    adj = {0: [1], 1: [0, 2], 2: [1]}
    nbr = make_nbr(adj, 4, 2)
    seeds = jnp.asarray(np.array([True, False, False, False]))
    s = np.asarray(khop_entity_scores(nbr, seeds, hops=2))
    assert s[0] == pytest.approx(1.0)  # seed: 1/(1+0)
    assert s[1] == pytest.approx(0.5)  # 1 hop: 1/(1+1)
    assert s[2] == pytest.approx(1 / 3)  # 2 hops
    assert s[3] == 0.0  # disconnected


def test_chunk_scores_max_over_entities():
    ce = jnp.asarray(np.array([[0, 1, -1], [2, -1, -1], [-1, -1, -1]], np.int32))
    es = jnp.asarray(np.array([0.5, 1.0, 0.25], np.float32))
    got = np.asarray(chunk_scores_from_entities(ce, es))
    np.testing.assert_allclose(got, [1.0, 0.25, 0.0])


def test_multiple_seeds_min_distance():
    adj = {0: [1], 1: [0, 2], 2: [1, 3], 3: [2]}
    nbr = make_nbr(adj, 4, 2)
    seeds = jnp.asarray(np.array([True, False, False, True]))
    d = np.asarray(khop_distances(nbr, seeds, hops=2))
    np.testing.assert_allclose(d, [0, 1, 1, 0])


# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------

CONTRACT_TEXT = (
    "Acme Corp signed a service agreement with Beta Logistics on 2026-01-15. "
    "John Smith works for Acme Corp as head of procurement. "
    "Beta Logistics is located in Lisbon. The contract costs $50,000 per year. "
    "Acme Corp uses CloudStack Systems for hosting."
)


def _extract(cfg=None):
    from triple_hybrid_rag_tpu.types import ChildChunk, ParentChunk

    parent = ParentChunk(parent_id="d" * 16 + ":0", doc_id="d" * 64, parent_idx=0, text=CONTRACT_TEXT)
    child = ChildChunk(
        chunk_id="d" * 16 + ":0:0", parent_id=parent.parent_id, doc_id="d" * 64,
        parent_idx=0, child_idx=0, text=CONTRACT_TEXT,
    )
    return RuleBasedExtractor(cfg or RAGConfig()).extract(parent, [child]), child


def test_rule_extractor_entities():
    result, _ = _extract()
    names = {e.canonical_name for e in result.entities}
    assert "Acme Corp" in names
    assert "Beta Logistics" in names
    assert "John Smith" in names
    types = {e.canonical_name: e.entity_type for e in result.entities}
    assert types["Acme Corp"] == EntityType.ORGANIZATION
    assert types["John Smith"] == EntityType.PERSON
    assert any(e.entity_type == EntityType.DATE for e in result.entities)
    assert any(e.entity_type == EntityType.MONEY for e in result.entities)


def test_rule_extractor_relations():
    result, _ = _extract()
    by_name = {e.entity_id: e.canonical_name for e in result.entities}
    rels = {
        (by_name[r.subject_id], r.relation_type, by_name[r.object_id])
        for r in result.relations
    }
    assert ("John Smith", RelationType.WORKS_FOR, "Acme Corp") in rels
    assert ("Beta Logistics", RelationType.LOCATED_IN, "Lisbon") in rels
    assert ("Acme Corp", RelationType.USES, "CloudStack Systems") in rels
    # co-occurrence fallback exists
    assert any(r.relation_type == RelationType.RELATED_TO for r in result.relations)


def test_rule_extractor_mentions():
    result, child = _extract()
    ment_chunks = {m.chunk_id for m in result.mentions}
    assert child.chunk_id in ment_chunks
    assert len(result.mentions) >= 3


def test_rule_extractor_code_identifiers():
    """Round-4 NER surface: dotted code paths + classifier-noun-cued identifiers
    become TECHNOLOGY entities, and the relation pair pattern tolerates the
    'the module X' appositive gap (verdict task #4: real-text graph loop)."""
    from triple_hybrid_rag_tpu.types import ChildChunk, ParentChunk

    text = (
        "The class TaskGroup belongs to the module asyncio. "
        "The class TaskGroup depends on the class BaseTask. "
        "See xml.dom.minidom for the DOM parser."
    )
    parent = ParentChunk(parent_id="e" * 16 + ":0", doc_id="e" * 64, parent_idx=0, text=text)
    child = ChildChunk(
        chunk_id="e" * 16 + ":0:0", parent_id=parent.parent_id, doc_id="e" * 64,
        parent_idx=0, child_idx=0, text=text,
    )
    result = RuleBasedExtractor(RAGConfig()).extract(parent, [child])
    names = {e.canonical_name for e in result.entities}
    assert "TaskGroup" in names
    assert "asyncio" in names          # cued by "the module"
    assert "xml.dom.minidom" in names  # dotted path
    types = {e.canonical_name: e.entity_type for e in result.entities}
    assert types["asyncio"] == EntityType.TECHNOLOGY
    assert types["xml.dom.minidom"] == EntityType.TECHNOLOGY
    by_name = {e.entity_id: e.canonical_name for e in result.entities}
    rels = {
        (by_name[r.subject_id], r.relation_type, by_name[r.object_id])
        for r in result.relations
    }
    assert ("TaskGroup", RelationType.PART_OF, "asyncio") in rels
    assert ("TaskGroup", RelationType.DEPENDS_ON, "BaseTask") in rels


def test_entity_store_link_mentions():
    """The dictionary-linking sweep binds stored entities to OTHER documents'
    chunks at word boundaries (short keys must not match inside words)."""
    from triple_hybrid_rag_tpu.models.entity_extractor import EntityStore
    from triple_hybrid_rag_tpu.types import ChildChunk, ParentChunk

    result, _ = _extract()
    store = EntityStore()
    store.store_extraction(result)
    n0 = len(store.mentions)
    other = ChildChunk(
        chunk_id="f" * 16 + ":0:0", parent_id="f" * 16 + ":0", doc_id="f" * 64,
        parent_idx=0, child_idx=0,
        text="Quarterly report: Acme Corp expanded. Most teams were unaffected.",
    )
    # "Acme Corp" must link; "os"-like short-key-inside-word must not: store an
    # entity 'corp' scenario is covered by boundary matching on the real keys
    added = store.link_mentions([other])
    assert added >= 1
    linked = {
        (store.entity_by_id(m.entity_id).canonical_name, m.chunk_id)
        for m in store.mentions[n0:]
    }
    assert ("Acme Corp", other.chunk_id) in linked
    # no entity named inside "Most"/"teams" got bound
    assert all(name in other.text or name.lower() in other.text.lower()
               for name, _ in linked)


def test_link_mentions_overlapping_keys_both_bind():
    """A shorter key starting inside a longer key's matched span must still
    link (the old chunked-alternation finditer resumed AFTER the long match
    and silently skipped it)."""
    import uuid
    from triple_hybrid_rag_tpu.models.entity_extractor import EntityStore
    from triple_hybrid_rag_tpu.types import (
        ChildChunk, Entity, EntityType, ExtractionResult,
    )

    ents = [
        Entity(entity_id=str(uuid.uuid4()), canonical_name="Acme Bank",
               entity_type=EntityType.ORGANIZATION),
        Entity(entity_id=str(uuid.uuid4()), canonical_name="Bank",
               entity_type=EntityType.CONCEPT),
    ]
    store = EntityStore()
    store.store_extraction(ExtractionResult(entities=ents, mentions=[], relations=[]))
    child = ChildChunk(
        chunk_id="e" * 16 + ":0:0", parent_id="e" * 16 + ":0", doc_id="e" * 64,
        parent_idx=0, child_idx=0,
        text="The Acme Bank branch opened early.",
    )
    added = store.link_mentions([child])
    linked = {store.entity_by_id(m.entity_id).canonical_name for m in store.mentions}
    assert added == 2 and linked == {"Acme Bank", "Bank"}


def test_code_graph_eval_extracted_mode_smoke():
    """graph_source='extracted' builds a usable self-extracted graph: triple
    recall vs the AST oracle is high and the relational eval still favors
    graph-on (tiny corpus; the full-scale measurement lives in eval_results/)."""
    from triple_hybrid_rag_tpu.eval import make_code_graph_eval

    cfg = RAGConfig(capacity_round=64, embedder_backend="bowhash",
                    graph_enabled=True, safety_threshold=0.0, denoise_alpha=0.0)
    data = make_code_graph_eval(cfg, n_modules=12, n_graph_queries=8,
                                n_cloze_queries=4, seed=0,
                                graph_source="extracted", include_api_docs=True)
    m = data.extraction_metrics
    assert m is not None and m["oracle_triples"] > 0
    assert m["triple_recall"] >= 0.8, m
    assert m["triple_precision"] >= 0.8, m
    assert data.entity_store.stats()["mentions"] > 0
    import pytest
    with pytest.raises(ValueError):
        make_code_graph_eval(cfg, n_modules=4, graph_source="extracted",
                             include_api_docs=False)


def test_callable_extractor_and_fallback():
    def llm(text):
        return {
            "entities": [
                {"name": "Acme Corp", "type": "organization"},
                {"name": "Zeta Inc", "type": "organization"},
            ],
            "relations": [
                {"subject": "Acme Corp", "object": "Zeta Inc", "type": "part_of"}
            ],
        }

    from triple_hybrid_rag_tpu.types import ChildChunk, ParentChunk

    parent = ParentChunk(parent_id="e" * 16 + ":0", doc_id="e" * 64, parent_idx=0, text="Acme Corp and Zeta Inc.")
    child = ChildChunk(chunk_id="e" * 16 + ":0:0", parent_id=parent.parent_id, doc_id="e" * 64,
                       parent_idx=0, child_idx=0, text="Acme Corp and Zeta Inc.")
    res = CallableExtractor(llm).extract(parent, [child])
    assert {e.canonical_name for e in res.entities} == {"Acme Corp", "Zeta Inc"}
    assert res.relations[0].relation_type == RelationType.PART_OF

    def broken(text):
        raise RuntimeError("down")

    res2 = CallableExtractor(broken).extract(parent, [child])
    assert any("acme" in canonical_key(e.canonical_name) for e in res2.entities)


# ---------------------------------------------------------------------------
# entity store
# ---------------------------------------------------------------------------


def test_store_upsert_dedup():
    store = EntityStore()
    r1, _ = _extract()
    stats1 = store.store_extraction(r1)
    r2, _ = _extract()
    stats2 = store.store_extraction(r2)
    assert stats1["entities"] > 0
    assert stats2["entities"] == 0  # same entities upsert to existing
    assert stats2["relations"] == 0  # dedup by (s, o, type)
    assert store.stats()["entities"] == stats1["entities"]


def test_store_fuzzy_lookup():
    store = EntityStore()
    r, _ = _extract()
    store.store_extraction(r)
    assert store.lookup("acme corp")[0].canonical_name == "Acme Corp"
    assert store.lookup("Acme")[0].canonical_name == "Acme Corp"  # substring
    fuzz = store.lookup("Acmee Corpp")
    assert fuzz and fuzz[0].canonical_name == "Acme Corp"  # trigram
    assert store.lookup("completely unrelated zebra") == []


# ---------------------------------------------------------------------------
# graph index + triple-hybrid retrieval
# ---------------------------------------------------------------------------

GRAPH_DOCS = {
    "acme.md": (
        "# Acme Corp Overview\n\nAcme Corp is located in Lisbon. John Smith works for "
        "Acme Corp. Acme Corp uses CloudStack Systems for hosting infrastructure."
    ),
    "beta.md": (
        "# Beta Logistics\n\nBeta Logistics partners with Acme Corp on freight. "
        "Maria Silva works for Beta Logistics."
    ),
    "cloud.md": (
        "# CloudStack Systems\n\nCloudStack Systems provides hosting services. "
        "CloudStack Systems is located in Porto."
    ),
    "other.md": "# Unrelated\n\nGardening tips for spring flowers and vegetables.",
}


def build_graph_fixture(cfg):
    import hashlib

    corpus = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    store = EntityStore()
    extractor = RuleBasedExtractor(cfg)
    for name, text in GRAPH_DOCS.items():
        doc_id = hashlib.sha256(name.encode()).hexdigest()
        parents, children = chunker.chunk_document(text, doc_id)
        corpus.add_chunks(parents, children)
        for p in parents:
            kids = [c for c in children if c.parent_id == p.parent_id]
            store.store_extraction(extractor.extract(p, kids))
    return corpus, store


@pytest.fixture
def gcfg(small_config):
    return small_config.replace(embedding_dtype="float32", safety_threshold=0.3)


def test_graph_index_neighborhood(gcfg):
    corpus, store = build_graph_fixture(gcfg)
    gidx = build_graph_index(store, corpus, gcfg)
    ids, scores = gidx.entity_neighborhood("John Smith", hops=2)
    ids = np.asarray(ids)
    assert (ids >= 0).sum() >= 1
    texts = [corpus.child_by_row(int(i)).text for i in ids if i >= 0]
    assert any("John Smith" in t or "Acme Corp" in t for t in texts)


def test_graph_index_relation_path(gcfg):
    corpus, store = build_graph_fixture(gcfg)
    gidx = build_graph_index(store, corpus, gcfg)
    path = gidx.relation_path("John Smith", "CloudStack Systems")
    assert path is not None
    names = [e.canonical_name for e in path]
    assert names[0] == "John Smith" and names[-1] == "CloudStack Systems"
    assert "Acme Corp" in names  # the connecting hop


def test_graph_index_related_entities(gcfg):
    corpus, store = build_graph_fixture(gcfg)
    gidx = build_graph_index(store, corpus, gcfg)
    rel = {e.canonical_name for e in gidx.related_entities("Acme Corp")}
    assert "John Smith" in rel


def test_triple_hybrid_retrieval_with_graph(gcfg):
    from triple_hybrid_rag_tpu.retrieval import Retriever

    corpus, store = build_graph_fixture(gcfg)
    gidx = build_graph_index(store, corpus, gcfg)
    ret = Retriever(corpus, gcfg, graph_index=gidx)
    r = ret.retrieve("Who works for Acme Corp?")
    assert not r.refused
    assert r.channel_counts["graph"] > 0
    assert any("graph" in res.source_channels for res in r.results)
    top_texts = " ".join(res.text for res in r.results)
    assert "Acme" in top_texts


def test_graph_channel_skipped_when_not_required(gcfg):
    from triple_hybrid_rag_tpu.retrieval import Retriever

    corpus, store = build_graph_fixture(gcfg)
    gidx = build_graph_index(store, corpus, gcfg)
    ret = Retriever(corpus, gcfg, graph_index=gidx)
    r = ret.retrieve("gardening tips for spring")
    assert r.channel_counts["graph"] == 0  # plan did not require graph


def test_chunk_scores_batch_matches_per_query(rng):
    """chunk_scores_from_entities_batch == vmapped per-query op (the engine's
    41ms/batch -> shared-gather optimization must be a pure re-layout)."""
    import jax
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.ops.graph import (
        chunk_scores_from_entities,
        chunk_scores_from_entities_batch,
    )

    N, M, E, B = 300, 4, 50, 6
    ce = rng.integers(-1, E, size=(N, M)).astype(np.int32)
    ent = rng.random((B, E), dtype=np.float32)
    ref = jax.vmap(lambda e: chunk_scores_from_entities(jnp.asarray(ce), e))(
        jnp.asarray(ent)
    )
    got = chunk_scores_from_entities_batch(jnp.asarray(ce), jnp.asarray(ent))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_graph_topk_batch_parity(rng):
    """graph_topk_batch (blocked bucket-maxima + member rescore) must equal the
    reference composition: per-query chunk scores -> masked_top_k, including
    the 0-score floor, per-query row masks, query_on gating, and tie-breaks."""
    import jax
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.ops.graph import (
        chunk_scores_from_entities,
        graph_topk_batch,
    )
    from triple_hybrid_rag_tpu.ops.topk import masked_top_k

    N, M, E, B, K = 3000, 4, 40, 6, 12
    ce = rng.integers(-1, E, size=(N, M)).astype(np.int32)
    # quantized scores force exact ties across chunks
    ent = np.round(rng.random((B, E)) * 4) / 4.0
    ent = ent.astype(np.float32)
    ent[3] = 0.0  # one query with an empty frontier -> all refused
    valid = rng.random((B, N)) > 0.2
    q_on = np.array([True, True, False, True, True, True])

    def ref_one(e, v, on):
        sc = chunk_scores_from_entities(jnp.asarray(ce), e)
        return masked_top_k(jnp.where(on, sc, 0.0), K, valid=v)

    ref_ids, ref_vals = jax.vmap(ref_one)(
        jnp.asarray(ent), jnp.asarray(valid), jnp.asarray(q_on)
    )
    got_ids, got_vals = graph_topk_batch(
        jnp.asarray(ce), jnp.asarray(ent), K,
        valid=jnp.asarray(valid), query_on=jnp.asarray(q_on),
        bucket=16, block=512,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    np.testing.assert_array_equal(np.asarray(ref_vals), np.asarray(got_vals))
    assert np.all(np.asarray(got_ids)[2] == -1)  # query_on False
    assert np.all(np.asarray(got_ids)[3] == -1)  # empty frontier


def test_graph_topk_batch_no_masks(rng):
    import jax
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.ops.graph import (
        chunk_scores_from_entities,
        graph_topk_batch,
    )
    from triple_hybrid_rag_tpu.ops.topk import masked_top_k

    N, M, E, B, K = 700, 3, 25, 4, 40  # K*bucket > N exercises the pad path
    ce = rng.integers(-1, E, size=(N, M)).astype(np.int32)
    ent = rng.random((B, E), dtype=np.float32)
    ref_ids, ref_vals = jax.vmap(
        lambda e: masked_top_k(chunk_scores_from_entities(jnp.asarray(ce), e), K)
    )(jnp.asarray(ent))
    got_ids, got_vals = graph_topk_batch(jnp.asarray(ce), jnp.asarray(ent), K,
                                         bucket=8, block=256)
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    np.testing.assert_array_equal(np.asarray(ref_vals), np.asarray(got_vals))


def test_graph_sparse_topk_matches_dense(rng):
    """Sparse mention-postings top-k == dense chunk_entities scan (ids, scores,
    ties) when every nonzero-score entity is in the active slots — the
    exactness contract the engine's auto policy relies on. Scores quantized to
    1/(1+d) levels force heavy ties, exercising the (score desc, id asc)
    tie-break parity."""
    import jax

    from triple_hybrid_rag_tpu.ops.graph import graph_sparse_topk, graph_topk_batch

    N, M, E, B, K = 600, 3, 30, 5, 12
    ce = rng.integers(-1, E, size=(N, M)).astype(np.int32)
    # quantized khop-style scores: 0 / 1/3 / 1/2 / 1 per (query, entity)
    levels = np.array([0.0, 1 / 3, 0.5, 1.0], np.float32)
    ent = levels[rng.integers(0, 4, size=(B, E))]
    ent[3] = 0.0  # empty frontier query

    ref_ids, ref_vals = graph_topk_batch(
        jnp.asarray(ce), jnp.asarray(ent), K, bucket=8, block=256
    )

    # host inversion: entity -> chunk mention CSR (doc-ascending)
    lists = [[] for _ in range(E)]
    for row in range(N):
        for s in range(M):
            e = ce[row, s]
            if e >= 0:
                lists[e].append(row)
    l_max_g = max(max((len(x) for x in lists), default=1), 1)
    lens = np.array([len(x) for x in lists], np.int32)
    offs = np.zeros(E + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    docs = np.full(int(offs[-1]) + l_max_g, -1, np.int32)
    for e, x in enumerate(lists):
        docs[offs[e] : offs[e] + len(x)] = x

    A = E  # every entity fits -> exact
    def one(scores_q):
        order = np.argsort(-scores_q, kind="stable")
        act_e = order[:A].astype(np.int32)
        act_s = scores_q[act_e].astype(np.float32)
        act_e = np.where(act_s > 0, act_e, -1)
        return graph_sparse_topk(
            jnp.asarray(offs.astype(np.int32)), jnp.asarray(lens),
            jnp.asarray(docs), jnp.asarray(act_e), jnp.asarray(act_s),
            l_max_g=l_max_g, n_pad=N, top_k=K, run_bound=M,
        )

    for b in range(B):
        got_ids, got_vals = one(ent[b])
        np.testing.assert_array_equal(np.asarray(got_ids), np.asarray(ref_ids)[b])
        np.testing.assert_allclose(
            np.asarray(got_vals), np.asarray(ref_vals)[b], rtol=1e-6
        )


def test_graph_topk_batch_ranks_parity(rng):
    """u8 rank-table bucket scan == f32 score scan (exact member rescore both)."""
    from triple_hybrid_rag_tpu.ops.graph import graph_topk_batch

    N, M, E, B, K = 500, 3, 25, 4, 10
    ce = rng.integers(-1, E, size=(N, M)).astype(np.int32)
    dist = rng.integers(0, 4, size=(B, E)).astype(np.float32)  # 3 = unreachable
    reach = dist <= 2
    ent = np.where(reach, 1.0 / (1.0 + dist), 0.0).astype(np.float32)
    ranks = np.where(reach, 3.0 - dist, 0.0).astype(np.uint8)
    query_on = np.array([True, True, False, True])

    ref = graph_topk_batch(
        jnp.asarray(ce), jnp.asarray(ent), K,
        query_on=jnp.asarray(query_on), bucket=8, block=256,
    )
    got = graph_topk_batch(
        jnp.asarray(ce), jnp.asarray(ent), K,
        query_on=jnp.asarray(query_on), bucket=8, block=256,
        entity_ranks=jnp.asarray(ranks),
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))


def _extract_text(text, cfg=None):
    from triple_hybrid_rag_tpu.types import ChildChunk, ParentChunk

    parent = ParentChunk(parent_id="e" * 16 + ":0", doc_id="e" * 64, parent_idx=0, text=text)
    child = ChildChunk(
        chunk_id="e" * 16 + ":0:0", parent_id=parent.parent_id, doc_id="e" * 64,
        parent_idx=0, child_idx=0, text=text,
    )
    return RuleBasedExtractor(cfg or RAGConfig()).extract(parent, [child])


def test_rule_extractor_pt_prose_round5():
    """Round-5 prose fixes (eval_results/ner_prose.json failure catalog):
    PT 'de' dates, location preposition cue, given-name gazetteer, leading
    article stripped from org spans, S.A. dotted acronym not TECHNOLOGY."""
    res = _extract_text(
        "Maria Silva trabalha para a empresa Vertex Holdings S.A. desde "
        "maio de 2019. A Cascata Analytics esta sediada em Recife."
    )
    types = {e.canonical_name: e.entity_type for e in res.entities}
    assert types.get("Maria Silva") == EntityType.PERSON
    assert types.get("Recife") == EntityType.LOCATION
    assert "maio de 2019" in types and types["maio de 2019"] == EntityType.DATE
    # article never glues into the span
    assert "A Cascata Analytics" not in types and "Cascata Analytics" in types
    # "S.A" must not leak as a dotted code identifier
    assert "S.A" not in types


def test_rule_extractor_date_money_masked_from_capspans():
    res = _extract_text(
        "The agreement was signed by Dr. Laura Mitchell on July 14, 2021 "
        "for R$ 45.000,00 in total."
    )
    names = {e.canonical_name for e in res.entities}
    assert "July 14, 2021" in names
    assert not any(n == "July" for n in names)  # month not a spurious CONCEPT
    types = {e.canonical_name: e.entity_type for e in res.entities}
    assert types["Laura Mitchell"] == EntityType.PERSON


def test_rule_extractor_relation_attachment_round5():
    """Nearest-entity attachment: copula gap, conjunction-reduced subject
    (oblique 'em Recife' is skipped), interposed object noun."""
    res = _extract_text(
        "A Cascata Analytics esta sediada em Recife e faz parte de Quantum "
        "Capital. A Ironwood Consultoria S.A. oferece consultoria para "
        "Pinnacle Analytics."
    )
    by_name = {e.entity_id: e.canonical_name for e in res.entities}
    rels = {
        (by_name[r.subject_id], r.relation_type, by_name[r.object_id])
        for r in res.relations
    }
    assert ("Cascata Analytics", RelationType.LOCATED_IN, "Recife") in rels
    assert ("Cascata Analytics", RelationType.PART_OF, "Quantum Capital") in rels
    assert (
        "Ironwood Consultoria S.A",
        RelationType.PROVIDES,
        "Pinnacle Analytics",
    ) in rels


def test_rule_extractor_two_capwords_not_person_by_default():
    res = _extract_text(
        "The division deployed the Falcon Engine across Orion Suite nodes."
    )
    types = {e.canonical_name: e.entity_type for e in res.entities}
    assert types.get("Falcon Engine") == EntityType.PRODUCT
    assert types.get("Orion Suite") == EntityType.PRODUCT
    assert EntityType.PERSON not in set(types.values())


def test_link_mentions_find_path_matches_regex_semantics():
    """Round-5 sweep rewrite (token-subset prefilter + str.find boundary
    verify) must reproduce the boundary-regex semantics exactly, including
    separator-sensitive multi-run keys and unicode folding."""
    import re
    import uuid
    from triple_hybrid_rag_tpu.models.entity_extractor import (
        EntityStore, _fold_ws,
    )
    from triple_hybrid_rag_tpu.types import (
        ChildChunk, Entity, EntityType, ExtractionResult,
    )

    names = [
        "Acme Bank", "Bank", "jax.numpy", "jax.numpy.linalg", "os", "os.path",
        "np", "São Paulo", "e-mail gateway", "C3-PO", "alpha_beta",
        "alpha beta", "x.y", "x y",
    ]
    texts = [
        "Deposits at the Acme Bank clear via jax.numpy.linalg routines.",
        "The jax.numpy module wraps os.path; alpha_beta stays one token.",
        "alpha beta appears spaced; x.y differs from x y here.",
        "sao paulo hosts the e-mail gateway for C3-PO units.",
        "numpy without jax prefix; path without os; bankrupt is not Bank.",
        "x.y. ends a sentence. os appears alone.",
    ]
    ents = [Entity(entity_id=str(uuid.uuid4()), canonical_name=n,
                   entity_type=EntityType.CONCEPT) for n in names]
    store = EntityStore()
    store.store_extraction(ExtractionResult(entities=ents, mentions=[], relations=[]))
    children = [
        ChildChunk(chunk_id=f"f{i:015d}:0:0", parent_id="f" * 16 + ":0",
                   doc_id="f" * 64, parent_idx=0, child_idx=i, text=t)
        for i, t in enumerate(texts)
    ]
    store.link_mentions(children)
    got = {(store.entity_by_id(m.entity_id).canonical_name, m.chunk_id)
           for m in store.mentions}

    # reference implementation: one boundary regex per key over folded text
    from triple_hybrid_rag_tpu.models.entity_extractor import canonical_key
    want = set()
    for e in ents:
        k = canonical_key(e.canonical_name)
        pat = re.compile(r"(?<!\w)" + re.escape(k) + r"(?!\w)")
        for c in children:
            if pat.search(_fold_ws(c.text)):
                want.add((e.canonical_name, c.chunk_id))
    assert got == want
