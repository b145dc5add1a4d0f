"""Sharded engine tests on the virtual 8-device CPU mesh: the multi-chip analogue of
the reference's real-DB E2E tier (SURVEY.md §4.2 tier 3)."""

import hashlib

import numpy as np
import pytest
import jax

from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
from triple_hybrid_rag_tpu.models.entity_extractor import EntityStore, RuleBasedExtractor
from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh, single_device_mesh
from triple_hybrid_rag_tpu.retrieval import Retriever

TOPICS = [
    "payment invoice billing settlement",
    "contract termination clause notice",
    "fox wildlife forest habitat",
    "password reset security portal",
]


def build_fixture(cfg, n_docs=12, with_graph=True):
    corpus = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    store = EntityStore()
    extractor = RuleBasedExtractor(cfg)
    for i in range(n_docs):
        topic = TOPICS[i % len(TOPICS)]
        text = (
            f"# Document {i}\n\nAcme Corp publishes document {i} about {topic}. "
            + " ".join(f"Detail sentence {j} covering {topic} item {j}." for j in range(10))
        )
        doc_id = hashlib.sha256(f"doc{i}".encode()).hexdigest()
        parents, children = chunker.chunk_document(text, doc_id)
        corpus.add_chunks(parents, children)
        if with_graph:
            for p in parents:
                kids = [c for c in children if c.parent_id == p.parent_id]
                store.store_extraction(extractor.extract(p, kids))
    gidx = build_graph_index(store, corpus, cfg) if with_graph else None
    return corpus, gidx


@pytest.fixture
def cfg(small_config):
    return small_config.replace(
        embedding_dtype="float32", safety_threshold=0.2, capacity_round=8
    )


def test_mesh_helpers():
    m = corpus_mesh()
    assert m.shape["shard"] == 8 and m.shape["data"] == 1
    m2 = corpus_mesh(n_shards=4, data_parallel=2)
    assert m2.shape == {"data": 2, "shard": 4}
    m1 = single_device_mesh()
    assert m1.shape["shard"] == 1


def test_sharded_matches_single_device(cfg):
    """The 8-shard program must produce the same results as the staged single-device
    retriever (exact merge property of disjoint-partition top-k)."""
    corpus, gidx = build_fixture(cfg)
    ret = Retriever(corpus, cfg, graph_index=gidx)

    eng8 = ShardedEngine(ret, corpus_mesh())
    eng1 = ShardedEngine(ret, single_device_mesh())

    for q in ["invoice payment settlement", "How do I reset my password?",
              "Who works for Acme Corp?"]:
        r8 = eng8.retrieve(q)
        r1 = eng1.retrieve(q)
        assert [x.chunk_id for x in r8.results] == [x.chunk_id for x in r1.results], q
        np.testing.assert_allclose(
            [x.final_score for x in r8.results],
            [x.final_score for x in r1.results],
            rtol=1e-5,
        )


def test_sharded_matches_staged_retriever(cfg):
    corpus, gidx = build_fixture(cfg, with_graph=False)
    c = cfg.replace(graph_enabled=False)
    ret = Retriever(corpus, c)
    eng = ShardedEngine(ret, corpus_mesh())
    q = "contract termination notice"
    staged = ret.retrieve(q)
    fused_eng = eng.retrieve(q)
    assert [x.chunk_id for x in staged.results] == [x.chunk_id for x in fused_eng.results]
    np.testing.assert_allclose(
        [x.final_score for x in staged.results],
        [x.final_score for x in fused_eng.results],
        rtol=1e-4,
    )


def test_sharded_refusal(cfg):
    corpus, _ = build_fixture(cfg, n_docs=4, with_graph=False)
    c = cfg.replace(graph_enabled=False, safety_threshold=0.99, rerank_backend="dot")
    ret = Retriever(corpus, c)
    eng = ShardedEngine(ret, corpus_mesh())
    r = eng.retrieve("zzz qqq xyzzy nonsense")
    assert r.refused
    assert r.results == []


def test_sharded_arrays_actually_sharded(cfg):
    corpus, _ = build_fixture(cfg, with_graph=False)
    c = cfg.replace(graph_enabled=False)
    ret = Retriever(corpus, c)
    eng = ShardedEngine(ret, corpus_mesh())
    # row axis must be split over 8 devices
    shardings = eng.embeddings.sharding
    assert len(eng.embeddings.devices()) == 8
    assert eng.n_pad % 8 == 0
    # each device holds 1/8 of the rows
    shard_shapes = {s.data.shape for s in eng.embeddings.addressable_shards}
    assert shard_shapes == {(eng.n_pad // 8, eng.embeddings.shape[1])}


def test_alias_placement_preserves_values_and_source(cfg):
    """device_put(may_alias=True) placement (SURVEY 5.2's prescribed aliasing
    check): engine arrays must carry the same values as the index arrays they
    alias, and the engine's query program must leave the index arrays intact
    (no donation/in-place hazard through the aliased buffers)."""
    import numpy as np

    corpus, _ = build_fixture(cfg, with_graph=False)
    c = cfg.replace(graph_enabled=False)
    ret = Retriever(corpus, c)
    src = np.asarray(ret.dense_index.embeddings).copy()
    eng = ShardedEngine(ret, corpus_mesh())
    placed = np.asarray(eng.embeddings)[: src.shape[0]]
    np.testing.assert_array_equal(placed, src)
    eng.retrieve("alpha beta")  # run the program through the aliased arrays
    np.testing.assert_array_equal(np.asarray(ret.dense_index.embeddings), src)
    np.testing.assert_array_equal(np.asarray(eng.embeddings)[: src.shape[0]], src)


def test_data_parallel_batch_matches_shard_only(cfg):
    """data=2 x shard=4 mesh: batch splits over replicas, results identical to 1x8."""
    corpus, _ = build_fixture(cfg, with_graph=False)
    c = cfg.replace(graph_enabled=False)
    ret = Retriever(corpus, c)
    eng_dp = ShardedEngine(ret, corpus_mesh(n_shards=4, data_parallel=2))
    eng_1 = ShardedEngine(ret, corpus_mesh(n_shards=8))
    queries = ["invoice payment settlement", "contract termination notice",
               "password reset security", "fox forest habitat"]
    r_dp = eng_dp.retrieve_batch(queries)
    r_1 = eng_1.retrieve_batch(queries)
    for a, b in zip(r_dp, r_1):
        assert [x.chunk_id for x in a.results] == [x.chunk_id for x in b.results]
        np.testing.assert_allclose(
            [x.final_score for x in a.results], [x.final_score for x in b.results],
            rtol=1e-5,
        )
    # odd batch pads to the data axis and still returns exactly n results
    r_odd = eng_dp.retrieve_batch(queries[:3])
    assert len(r_odd) == 3


def test_sharded_timing_fields(cfg):
    corpus, _ = build_fixture(cfg, n_docs=4, with_graph=False)
    c = cfg.replace(graph_enabled=False)
    eng = ShardedEngine(Retriever(corpus, c), corpus_mesh())
    r = eng.retrieve("invoice payment")
    assert "dispatch_ms" in r.timings and "total_ms" in r.timings


def test_engine_refresh_without_recompile(cfg):
    """Placement-only refresh after corpus growth: same compiled programs, new data."""
    corpus, _ = build_fixture(cfg, n_docs=4, with_graph=False)
    c = cfg.replace(graph_enabled=False)
    ret = Retriever(corpus, c)
    eng = ShardedEngine(ret, corpus_mesh())
    eng.retrieve("invoice payment")  # compile batch-1 program
    progs_before = dict(eng._programs)

    # grow the corpus within the padded capacity and rebuild the retriever
    import hashlib
    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker

    p, ch = HierarchicalChunker(c).chunk_document(
        "Fresh quantum qubit document content.", hashlib.sha256(b"new").hexdigest()
    )
    corpus.add_chunks(p, ch)
    ret2 = Retriever(corpus, c)
    assert eng.refresh(ret2) is True
    assert eng._programs is not None and dict(eng._programs) == progs_before
    r = eng.retrieve("quantum qubit")
    assert any("quantum" in x.text.lower() for x in r.results)

    # config change -> refresh declines
    ret3 = Retriever(corpus, c.replace(final_top_k=4))
    assert eng.refresh(ret3) is False


def test_multislice_mesh_layout(cfg):
    """2 'slices' x 4 shards on the virtual mesh: slices fold into the data axis
    (replica serving over DCN, shard merge stays intra-slice) and results match."""
    from triple_hybrid_rag_tpu.parallel import multislice_mesh

    corpus, _ = build_fixture(cfg, with_graph=False)
    c = cfg.replace(graph_enabled=False)
    ret = Retriever(corpus, c)
    m = multislice_mesh(n_slices=2, shards_per_slice=4)
    assert m.shape == {"data": 2, "shard": 4}
    eng = ShardedEngine(ret, m)
    r = eng.retrieve_batch(["invoice payment settlement", "fox forest habitat"])
    base = ShardedEngine(ret, corpus_mesh(n_shards=8)).retrieve_batch(
        ["invoice payment settlement", "fox forest habitat"]
    )
    for a, b in zip(r, base):
        assert [x.chunk_id for x in a.results] == [x.chunk_id for x in b.results]
    # data_per_slice: 2 slices x (2 data x 2 shards) -> data=4, shard=2; the
    # deterministic merge keeps results identical across every mesh fold
    m2 = multislice_mesh(n_slices=2, shards_per_slice=2, data_per_slice=2)
    assert m2.shape == {"data": 4, "shard": 2}
    r2 = ShardedEngine(ret, m2).retrieve_batch(
        ["invoice payment settlement", "fox forest habitat"]
    )
    for a, b in zip(r2, base):
        assert [x.chunk_id for x in a.results] == [x.chunk_id for x in b.results]


def test_fused_topk_engine_parity(cfg):
    """use_fused_topk=True (Pallas fused matmul+top-k, interpret on CPU) must
    produce identical results to the XLA dense channel — through the whole
    engine funnel, on the 8-shard mesh, float32 and int8."""
    for dtype in ("float32", "int8"):
        corpus, _ = build_fixture(cfg.replace(embedding_dtype=dtype), with_graph=False)
        c = cfg.replace(graph_enabled=False, embedding_dtype=dtype)
        ret = Retriever(corpus, c)
        eng_xla = ShardedEngine(ret, corpus_mesh())
        ret_f = Retriever(corpus, c.replace(use_fused_topk=True))
        eng_fused = ShardedEngine(ret_f, corpus_mesh())
        queries = ["invoice payment settlement", "contract termination notice",
                   "password reset security", "fox forest habitat"]
        r_x = eng_xla.retrieve_batch(queries)
        r_f = eng_fused.retrieve_batch(queries)
        for a, b in zip(r_x, r_f):
            assert [x.chunk_id for x in a.results] == [x.chunk_id for x in b.results], dtype
            np.testing.assert_allclose(
                [x.final_score for x in a.results],
                [x.final_score for x in b.results], rtol=1e-5,
            )


def test_fused_topk_engine_scoped_parity(cfg):
    """Collection-scoped queries through the fused kernel's in-kernel cid mask."""
    from triple_hybrid_rag_tpu.facade import RAG

    c = cfg.replace(
        graph_enabled=False, safety_threshold=0.0, denoise_enabled=False
    )
    rags = {}
    for fused in (False, True):
        r = RAG(config=c.replace(use_fused_topk=fused))
        r.ingest_text("Payment invoices settle within thirty days at Tenant A.",
                      name="a1.md", collection="tenant_a")
        r.ingest_text("Payment invoices settle within ninety days at Tenant B.",
                      name="b1.md", collection="tenant_b")
        rags[fused] = r
    for coll in (None, "tenant_a", "tenant_b", "nope"):
        a = rags[False].query_batch(["payment invoices settle"], collections=[coll])[0]
        b = rags[True].query_batch(["payment invoices settle"], collections=[coll])[0]
        assert [x.chunk_id for x in a.results] == [x.chunk_id for x in b.results], coll


def test_device_query_encode_matches_numpy_prep(cfg):
    """ShardedEngine with the on-mesh encoder: the device single-dispatch query
    encoding path (device_query_encode=True, the default) must return the same
    results as the numpy prep path (embed_texts + token_embeddings fetched to
    host). Guards the serving-latency fast path against drift."""
    from triple_hybrid_rag_tpu.models.encoder import EncoderConfig, EncoderEmbedder

    tiny = EncoderConfig(
        vocab_buckets=2048, d_model=32, n_layers=1, n_heads=4, d_mlp=64,
        max_tokens=16, out_dim=64, token_dim=16, dtype="float32",
    )
    c = cfg.replace(embedder_backend="encoder")
    corpus, _ = build_fixture(c, with_graph=False)
    emb = EncoderEmbedder(tiny, c)
    ret = Retriever(corpus, c, embedder=emb)
    eng = ShardedEngine(ret, corpus_mesh())
    assert eng.device_query_encode is True
    queries = [
        "payment invoice billing settlement",
        "fox wildlife forest habitat",
        "completely unrelated query text",
        "contract termination clause",
    ]
    dev = eng.retrieve_batch(queries)

    eng.device_query_encode = False
    host = eng.retrieve_batch(queries)

    for rd, rh in zip(dev, host):
        assert rd.refused == rh.refused
        assert [x.chunk_id for x in rd.results] == [x.chunk_id for x in rh.results]
        for a, b in zip(rd.results, rh.results):
            assert abs(a.final_score - b.final_score) < 2e-3


def test_graph_backend_sparse_matches_dense(cfg):
    """Sparse (entity->chunk mention postings) and dense (chunk_entities scan)
    graph backends must return identical results through the whole funnel —
    the auto policy only selects sparse when it is provably exact."""
    corpus, gidx = build_fixture(cfg)
    queries = [
        "How is Acme Corp related to document 3? payment invoice",
        "fox wildlife forest habitat",
        "contract termination clause notice",
        "password reset security portal",
    ]
    engines = {}
    for backend in ("sparse", "dense"):
        c = cfg.replace(graph_backend=backend)
        ret = Retriever(corpus, c, graph_index=gidx)
        eng = ShardedEngine(ret, corpus_mesh())
        assert eng.graph_mode == backend
        engines[backend] = eng.retrieve_batch(queries)
    for rs, rd in zip(engines["sparse"], engines["dense"]):
        assert rs.refused == rd.refused
        assert [x.chunk_id for x in rs.results] == [x.chunk_id for x in rd.results]
        for a, b in zip(rs.results, rd.results):
            assert abs(a.final_score - b.final_score) < 1e-5


def test_graph_backend_auto_policy(cfg):
    """auto = sparse exactly when worst-case activation fits the slot budget
    and no mention list was truncated; otherwise dense."""
    corpus, gidx = build_fixture(cfg)
    # tiny fixture: bound = min(seeds * sum(deg^i), e_pad) = e_pad -> sparse
    eng = ShardedEngine(Retriever(corpus, cfg, graph_index=gidx), corpus_mesh())
    assert eng.graph_mode == "sparse"
    # shrink the activation budget below the bound -> dense fallback
    c2 = cfg.replace(graph_active_slots=1)
    eng2 = ShardedEngine(Retriever(corpus, c2, graph_index=gidx), corpus_mesh())
    assert eng2.graph_mode == "dense"
    # mention cap that truncates -> dense fallback under auto
    c3 = cfg.replace(graph_mention_cap=1)
    eng3 = ShardedEngine(Retriever(corpus, c3, graph_index=gidx), corpus_mesh())
    assert eng3.graph_mode == "dense"


def test_graph_small_batch_sparse_override(cfg):
    """When auto falls back to the dense scan (activation bound exceeds the
    slot budget), narrow programs (batch <= graph_sparse_max_batch) still take
    the sparse mention-CSR path — the dense chunk_entities scan is batch-
    independent and dominates single-query device time. The override compiles
    the SAME kernel + slot budget as an explicit graph_backend="sparse" engine,
    so their results must match bit-exactly (including the documented top-slots
    approximation both apply when the budget truncates activation)."""
    corpus, gidx = build_fixture(cfg)
    # slots far below the pessimistic width-based bound -> auto picks dense
    c = cfg.replace(graph_active_slots=2)
    eng = ShardedEngine(Retriever(corpus, c, graph_index=gidx), corpus_mesh())
    assert eng.graph_mode == "dense" and eng.graph_small_sparse
    ref = ShardedEngine(
        Retriever(corpus, c.replace(graph_backend="sparse"), graph_index=gidx),
        corpus_mesh(),
    )
    assert ref.graph_mode == "sparse"
    assert eng.graph_active == ref.graph_active == 2
    queries = [
        "How is Acme Corp related to document 3? payment invoice",
        "fox wildlife forest habitat",
        "password reset security portal",
        "contract termination clause notice",
        "invoice settlement detail",
        "Acme Corp document wildlife",
    ]
    for q in queries:  # batch 1 <= graph_sparse_max_batch -> sparse path
        rn = eng.retrieve(q)
        rs = ref.retrieve(q)
        assert rn.refused == rs.refused, q
        assert [x.chunk_id for x in rn.results] == [x.chunk_id for x in rs.results], q
        for a, b in zip(rn.results, rs.results):
            assert abs(a.final_score - b.final_score) < 1e-6
    # wide batches keep the dense (exact) program: identical to a pure-dense
    # engine at the same width
    dense_only = ShardedEngine(
        Retriever(corpus, c.replace(graph_sparse_max_batch=0), graph_index=gidx),
        corpus_mesh(),
    )
    assert dense_only.graph_mode == "dense" and not dense_only.graph_small_sparse
    rw = eng.retrieve_batch(queries)
    rd = dense_only.retrieve_batch(queries)
    for a, b in zip(rw, rd):
        assert [x.chunk_id for x in a.results] == [x.chunk_id for x in b.results]


def test_small_batch_graph_skip_exact(cfg):
    """Small batches with no graph-requiring plan dispatch the graph-free
    program variant. A no-seed query's graph channel returns an empty
    candidate list, so skipping the channel entirely must be EXACT — ids and
    scores bit-identical to the graph program's output on the same batch."""
    corpus, gidx = build_fixture(cfg)
    ret = Retriever(corpus, cfg, graph_index=gidx)
    eng = ShardedEngine(ret, corpus_mesh())

    plain = ["invoice payment settlement", "password reset security portal"]
    graphy = "How is Acme Corp related to document 3?"
    # sanity on the planner split this test depends on
    assert not any(ret.planner.plan(q).requires_graph for q in plain)
    assert ret.planner.plan(graphy).requires_graph

    for q in plain:
        eng.retrieve(q)
        assert (1, False, False) in eng._programs  # graph-free program dispatched
        # both program variants on the identical prepared args
        plans, args = eng.prepare_queries([q])
        out_g = jax.device_get(eng._program(1, False, True)(*eng._index_args(), *args))
        out_s = jax.device_get(eng._program(1, False, False)(*eng._index_args(), *args))
        ids_g, scores_g, refused_g = out_g[0], out_g[1], out_g[2]
        ids_s, scores_s, refused_s = out_s[0], out_s[1], out_s[2]
        np.testing.assert_array_equal(ids_s, ids_g, err_msg=q)
        np.testing.assert_allclose(scores_s, scores_g, rtol=1e-6, err_msg=q)
        np.testing.assert_array_equal(refused_s, refused_g, err_msg=q)

    # a graph-requiring query in the batch keeps the graph program
    eng2 = ShardedEngine(Retriever(corpus, cfg, graph_index=gidx), corpus_mesh())
    eng2.retrieve_batch([plain[0], graphy])
    assert (2, False, True) in eng2._programs
    assert (2, False, False) not in eng2._programs
    # wide batches (> graph_sparse_max_batch) never fork a graph-free variant
    wide = [plain[0]] * (cfg.graph_sparse_max_batch + 1)
    eng2.retrieve_batch(wide)
    assert (len(wide), False, False) not in eng2._programs


def test_retrieve_batch_retries_numpy_prep_on_device_failure(cfg):
    """An async device failure surfacing at device_get must trigger ONE retry
    through the numpy prep path (fail-soft ladder), then restore the fast path."""
    from triple_hybrid_rag_tpu.models.encoder import EncoderConfig, EncoderEmbedder

    tiny = EncoderConfig(
        vocab_buckets=512, d_model=32, n_layers=1, n_heads=4, d_mlp=64,
        max_tokens=16, out_dim=64, token_dim=16, dtype="float32",
    )
    corpus, _ = build_fixture(cfg, n_docs=4, with_graph=False)
    eng = ShardedEngine(
        Retriever(corpus, cfg, embedder=EncoderEmbedder(tiny, cfg)), corpus_mesh()
    )
    calls = {"n": 0}
    orig = eng.search_arrays

    def flaky(queries, collections=None):
        calls["n"] += 1
        if calls["n"] == 1 and eng.device_query_encode:
            raise RuntimeError("simulated async device failure")
        return orig(queries, collections)

    eng.search_arrays = flaky
    out = eng.retrieve_batch(["payment invoice settlement"])
    assert calls["n"] == 2
    assert out[0].results
    assert eng.device_query_encode is True  # fast path restored after the retry


def test_embedder_outage_degrades_to_lexical_not_garbage(cfg):
    """A dead embedder ships zero query vectors; the dense channel must return
    NOTHING (regression: every row scored exactly 0.0, beating the -2.0 noise
    floor, so rows 0..k-1 surfaced as 'results' during outages and outvoted
    genuine lexical hits in fusion)."""

    class DeadEmbedder:
        dim = 64

        def embed_texts(self, texts):
            raise RuntimeError("embedder down")

        def embed_query(self, text):
            raise RuntimeError("embedder down")

    corpus, _ = build_fixture(cfg, with_graph=False)
    c = cfg.replace(graph_enabled=False, rerank_enabled=False, safety_threshold=0.0)
    healthy = Retriever(corpus, c)  # builds the index with the working embedder
    ret = Retriever(
        corpus, c, embedder=DeadEmbedder(),
        bm25_index=healthy.bm25_index, dense_index=healthy.dense_index,
    )
    eng = ShardedEngine(ret, corpus_mesh())
    r = eng.retrieve("password reset security portal")
    assert r.results, "lexical channel must still answer"
    assert all("password" in x.text.lower() for x in r.results[:1])
    # dense contributed nothing: no result is semantic-only, none carry a
    # semantic channel tag
    assert all("semantic" not in x.source_channels for x in r.results)
