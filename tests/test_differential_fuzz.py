"""Randomized differential testing: the staged retriever and the sharded engine must
agree on random corpora, configs, and queries (the two paths share ops but differ in
orchestration, sharding, batching, and tiering — divergence means a bug)."""

import hashlib
import random

import numpy as np
import pytest

from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
from triple_hybrid_rag_tpu.retrieval import Retriever

WORDS = (
    "invoice payment billing settlement contract termination clause notice fox forest "
    "bear habitat password security portal access freight customs warehouse delivery "
    "quantum qubit processor coherence renewal penalty quarterly schedule approval"
).split()


def random_corpus(rng: random.Random, cfg: RAGConfig, n_docs: int) -> CorpusStore:
    store = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    for i in range(n_docs):
        n_sent = rng.randint(2, 8)
        text = f"# Doc {i}\n\n" + " ".join(
            " ".join(rng.choices(WORDS, k=rng.randint(4, 10))).capitalize() + "."
            for _ in range(n_sent)
        )
        doc_id = hashlib.sha256(f"{i}-{text[:20]}".encode()).hexdigest()
        p, c = chunker.chunk_document(text, doc_id)
        store.add_chunks(p, c)
    return store


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_staged_vs_engine_agree(seed, small_config):
    rng = random.Random(seed)
    cfg = small_config.replace(
        graph_enabled=False,
        embedding_dtype=rng.choice(["float32", "int8"]),
        safety_threshold=rng.choice([0.0, 0.2]),
        denoise_alpha=rng.choice([0.0, 0.6]),
        rerank_backend=rng.choice(["maxsim", "dot"]),
        lexical_top_k=rng.choice([4, 8]),
        semantic_top_k=rng.choice([4, 8]),
        capacity_round=8,
        bm25_df_cap=rng.choice([0, 4]),
    )
    store = random_corpus(rng, cfg, n_docs=rng.randint(5, 20))
    ret = Retriever(store, cfg)
    eng = ShardedEngine(ret, corpus_mesh())

    queries = [
        " ".join(rng.choices(WORDS, k=rng.randint(1, 5))) for _ in range(6)
    ] + ["zzz qqq unknown tokens"]
    batch = eng.retrieve_batch(queries)
    for q, r_eng in zip(queries, batch):
        r_staged = ret.retrieve(q)
        assert r_staged.refused == r_eng.refused, (seed, q)
        assert [x.chunk_id for x in r_staged.results] == [
            x.chunk_id for x in r_eng.results
        ], (seed, q)
        # engine query vectors/tokens ship as float16 on the wire (payload halving,
        # parallel/engine.py prepare_queries); scores may differ from the staged f32
        # path by ~1e-3 relative while RANKS stay identical (asserted above)
        np.testing.assert_allclose(
            [x.final_score for x in r_staged.results],
            [x.final_score for x in r_eng.results],
            rtol=2e-3, atol=1e-5, err_msg=f"{seed} {q}",
        )


@pytest.mark.parametrize("seed", [10, 11])
def test_staged_vs_engine_agree_with_graph(seed, small_config):
    """Graph-enabled differential fuzz: entity extraction + k-hop channel included."""
    from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
    from triple_hybrid_rag_tpu.models.entity_extractor import (
        EntityStore,
        RuleBasedExtractor,
    )

    rng = random.Random(seed)
    cfg = small_config.replace(
        graph_enabled=True, embedding_dtype="float32",
        safety_threshold=0.1, capacity_round=8,
    )
    store = random_corpus(rng, cfg, n_docs=rng.randint(6, 12))
    # seed entities into some chunks
    estore = EntityStore()
    ex = RuleBasedExtractor(cfg)
    for p in store.parents:
        kids = [c for c in store.children if c.parent_id == p.parent_id]
        p.text = p.text + " Acme Corp oversees this. Maria Silva works for Acme Corp."
        estore.store_extraction(ex.extract(p, kids))
    gidx = build_graph_index(estore, store, cfg)
    ret = Retriever(store, cfg, graph_index=gidx)
    eng = ShardedEngine(ret, corpus_mesh())
    for q in ["Who works for Acme Corp?", "invoice payment", "relationship between Acme Corp and Maria Silva"]:
        r_staged = ret.retrieve(q)
        r_eng = eng.retrieve(q)
        assert r_staged.refused == r_eng.refused, (seed, q)
        assert [x.chunk_id for x in r_staged.results] == [
            x.chunk_id for x in r_eng.results
        ], (seed, q)


@pytest.mark.parametrize("seed", [20, 21, 22])
def test_graph_backends_agree_fuzz(seed, small_config):
    """Randomized sparse-vs-dense graph backend parity: random corpora, shared
    entities across many chunks (tie-heavy k-hop scores), random graph queries.
    The auto policy's exactness contract, fuzzed."""
    from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
    from triple_hybrid_rag_tpu.models.entity_extractor import (
        EntityStore,
        RuleBasedExtractor,
    )

    rng = random.Random(seed)
    cfg = small_config.replace(
        graph_enabled=True, embedding_dtype="float32",
        safety_threshold=0.0, capacity_round=8,
    )
    people = ["Maria Silva", "John Smith", "Ana Costa", "Bob Jones"]
    orgs = ["Acme Corp", "Beta LLC", "Gamma Inc"]
    store = random_corpus(rng, cfg, n_docs=rng.randint(8, 14))
    estore = EntityStore()
    ex = RuleBasedExtractor(cfg)
    for p in store.parents:
        kids = [c for c in store.children if c.parent_id == p.parent_id]
        who, org = rng.choice(people), rng.choice(orgs)
        p.text += f" {who} works for {org}. {rng.choice(orgs)} pays {who}."
        estore.store_extraction(ex.extract(p, kids))
    gidx = build_graph_index(estore, store, cfg)

    queries = [
        f"How is {rng.choice(people)} related to {rng.choice(orgs)}?",
        f"Who works for {rng.choice(orgs)}?",
        "invoice payment settlement",
    ]
    results = {}
    for backend in ("sparse", "dense"):
        c = cfg.replace(graph_backend=backend)
        eng = ShardedEngine(Retriever(store, c, graph_index=gidx), corpus_mesh())
        assert eng.graph_mode == backend, (seed, backend)
        results[backend] = eng.retrieve_batch(queries)
    for q, rs, rd in zip(queries, results["sparse"], results["dense"]):
        assert rs.refused == rd.refused, (seed, q)
        assert [x.chunk_id for x in rs.results] == [
            x.chunk_id for x in rd.results
        ], (seed, q)
        np.testing.assert_allclose(
            [x.final_score for x in rs.results],
            [x.final_score for x in rd.results],
            rtol=1e-5, err_msg=f"{seed} {q}",
        )
