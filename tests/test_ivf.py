"""Blocked-IVF ANN backend (index/ivf.py): build + probe ops vs NumPy oracles.

The reference's pgvector HNSW is approximate; this is the TPU-native ANN
analogue. Exactness contract: probes >= n_blocks reproduces the exact scan
bit-for-bit (same (score desc, id asc) tie-break)."""

import numpy as np
import jax.numpy as jnp
import pytest

from triple_hybrid_rag_tpu.index.ivf import (
    ivf_build_local,
    ivf_topk_local,
    kmeans_assign,
)


def _unit_rows(rng, n, d):
    r = rng.standard_normal((n, d)).astype(np.float32)
    return r / np.linalg.norm(r, axis=1, keepdims=True)


def _clustered_rows(rng, n, d, n_groups=8, spread=0.15):
    centers = _unit_rows(rng, n_groups, d)
    g = rng.integers(0, n_groups, size=n)
    r = centers[g] + spread * rng.standard_normal((n, d)).astype(np.float32)
    return (r / np.linalg.norm(r, axis=1, keepdims=True)).astype(np.float32), g


def test_kmeans_separates_obvious_groups(rng):
    rows, g = _clustered_rows(rng, 256, 32, n_groups=4, spread=0.05)
    valid = np.ones(256, bool)
    assign = np.asarray(
        kmeans_assign(jnp.asarray(rows), None, jnp.asarray(valid), n_clusters=4, iters=10)
    )
    # same-group rows land in the same cluster (allowing label permutation)
    for grp in range(4):
        labels = assign[g == grp]
        assert (labels == np.bincount(labels, minlength=5).argmax()).mean() > 0.9


def test_kmeans_invalid_rows_get_sentinel(rng):
    rows = _unit_rows(rng, 64, 16)
    valid = np.arange(64) < 40
    assign = np.asarray(
        kmeans_assign(jnp.asarray(rows), None, jnp.asarray(valid), n_clusters=4)
    )
    assert np.all(assign[40:] == 4)
    assert np.all(assign[:40] < 4)


def test_build_reorders_consistently(rng):
    rows = _unit_rows(rng, 128, 16)
    valid = np.arange(128) < 100
    rows_r, scales_r, perm, cent = ivf_build_local(
        jnp.asarray(rows), None, jnp.asarray(valid), block_rows=16
    )
    rows_r, perm, cent = np.asarray(rows_r), np.asarray(perm), np.asarray(cent)
    assert cent.shape == (8, 16)
    alive = perm < 128
    assert alive.sum() == 100
    # each live slot holds the original row it claims
    np.testing.assert_allclose(rows_r[alive], rows[perm[alive]], rtol=1e-6)
    assert sorted(perm[alive].tolist()) == sorted(np.arange(100).tolist())


def _brute_topk(rows, valid, q, k):
    s = rows @ q
    s = np.where(valid, s, -np.inf)
    order = np.lexsort((np.arange(len(s)), -s))[:k]
    ids = order.astype(np.int32)
    vals = s[order]
    ids = np.where(np.isfinite(vals), ids, -1)
    return ids, vals


def test_full_probes_reproduce_exact_scan(rng):
    """probes >= n_blocks == exact top-k, ties included (duplicate rows)."""
    rows = _unit_rows(rng, 96, 16)
    rows[10] = rows[50]  # exact duplicates force score ties
    rows[11] = rows[50]
    valid = np.arange(96) < 90
    rows_r, _, perm, cent = ivf_build_local(
        jnp.asarray(rows), None, jnp.asarray(valid), block_rows=8
    )
    q = _unit_rows(rng, 3, 16)
    ids, vals = ivf_topk_local(
        rows_r, None, perm, cent, jnp.asarray(q), probes=12, top_k=10
    )
    for b in range(3):
        ref_ids, ref_vals = _brute_topk(rows, valid, q[b], 10)
        np.testing.assert_array_equal(np.asarray(ids)[b], ref_ids)
        np.testing.assert_allclose(np.asarray(vals)[b], ref_vals, rtol=1e-5)


def test_partial_probe_recall_on_clustered_data(rng):
    """On cluster-structured data, probing 1/4 of the blocks keeps recall@10 high."""
    rows, _ = _clustered_rows(rng, 1024, 32, n_groups=16, spread=0.1)
    valid = np.ones(1024, bool)
    rows_r, _, perm, cent = ivf_build_local(
        jnp.asarray(rows), None, jnp.asarray(valid), block_rows=64, iters=10
    )
    q = rows[rng.integers(0, 1024, size=20)] + 0.05 * rng.standard_normal((20, 32)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    ids, _ = ivf_topk_local(
        rows_r, None, perm, cent, jnp.asarray(q), probes=4, top_k=10
    )  # 4 of 16 blocks
    hits = total = 0
    for b in range(20):
        ref_ids, _ = _brute_topk(rows, valid, q[b], 10)
        hits += len(set(np.asarray(ids)[b].tolist()) & set(ref_ids.tolist()))
        total += 10
    assert hits / total >= 0.8, hits / total


def test_int8_rows_roundtrip(rng):
    from triple_hybrid_rag_tpu.index.dense_index import quantize_rows_int8

    rows = _unit_rows(rng, 64, 32)
    vals8, scales = quantize_rows_int8(rows)
    valid = np.ones(64, bool)
    rows_r, scales_r, perm, cent = ivf_build_local(
        jnp.asarray(vals8), jnp.asarray(scales), jnp.asarray(valid), block_rows=8
    )
    assert rows_r.dtype == jnp.int8 and scales_r is not None
    q = _unit_rows(rng, 2, 32)
    ids, vals = ivf_topk_local(
        rows_r, scales_r, perm, cent, jnp.asarray(q), probes=8, top_k=5
    )
    deq = np.asarray(vals8, np.float32) * np.asarray(scales)[:, None]
    for b in range(2):
        ref_ids, ref_vals = _brute_topk(deq, valid, q[b], 5)
        np.testing.assert_array_equal(np.asarray(ids)[b], ref_ids)
        np.testing.assert_allclose(np.asarray(vals)[b], ref_vals, rtol=1e-4)


def test_row_mask_scoping(rng):
    rows = _unit_rows(rng, 64, 16)
    valid = np.ones(64, bool)
    rows_r, _, perm, cent = ivf_build_local(
        jnp.asarray(rows), None, jnp.asarray(valid), block_rows=8
    )
    q = _unit_rows(rng, 2, 16)
    mask = np.zeros((2, 64), bool)
    mask[0, :16] = True  # query 0 only sees rows < 16
    mask[1, :] = True
    ids, vals = ivf_topk_local(
        rows_r, None, perm, cent, jnp.asarray(q), probes=8, top_k=5,
        row_mask=jnp.asarray(mask),
    )
    got0 = [i for i in np.asarray(ids)[0].tolist() if i >= 0]
    assert got0 and all(i < 16 for i in got0)
    ref_ids, _ = _brute_topk(rows, mask[1], q[1], 5)
    np.testing.assert_array_equal(np.asarray(ids)[1], ref_ids)


# ---------------------------------------------------------------------------
# Engine integration: semantic_backend="ivf" through the full sharded funnel
# ---------------------------------------------------------------------------


def _engine_fixture(cfg):
    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.corpus import CorpusStore

    topics = [
        "payment invoice billing settlement",
        "contract termination clause notice",
        "fox wildlife forest habitat",
        "password reset security portal",
    ]
    corpus = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    for i in range(16):
        t = topics[i % 4]
        text = f"# Doc {i}\n\n" + " ".join(
            f"Sentence {j} about {t} item {j}." for j in range(8)
        )
        p, c = chunker.chunk_document(text, hashlib.sha256(f"d{i}".encode()).hexdigest())
        corpus.add_chunks(p, c)
    return corpus


def test_ivf_engine_full_probes_matches_exact(small_config):
    """semantic_backend=ivf with probes covering every block == exact backend,
    end-to-end through the sharded funnel (fusion, rerank, gate included)."""
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    base = small_config.replace(
        graph_enabled=False, embedding_dtype="float32",
        safety_threshold=0.0, capacity_round=8,
    )
    corpus = _engine_fixture(base)
    queries = ["payment invoice settlement", "where do foxes live",
               "password reset portal", "contract termination notice"]
    outs = {}
    for backend, extra in (
        ("exact", {}),
        ("ivf", dict(semantic_backend="ivf", ivf_block_rows=8, ivf_probes=64)),
    ):
        c = base.replace(**extra)
        eng = ShardedEngine(Retriever(corpus, c), corpus_mesh())
        assert eng.ivf_mode == (backend == "ivf")
        outs[backend] = eng.retrieve_batch(queries)
    for re_, ri in zip(outs["exact"], outs["ivf"]):
        assert [x.chunk_id for x in re_.results] == [x.chunk_id for x in ri.results]
        for a, b in zip(re_.results, ri.results):
            assert abs(a.final_score - b.final_score) < 1e-4


def test_ivf_engine_partial_probes_smoke(small_config):
    """Partial probing still answers (approximate but sane): the target doc's
    own sentence retrieves its chunk."""
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    c = small_config.replace(
        graph_enabled=False, lexical_enabled=False, rerank_enabled=False,
        embedding_dtype="float32", safety_threshold=0.0, capacity_round=8,
        semantic_backend="ivf", ivf_block_rows=8, ivf_probes=2,
    )
    corpus = _engine_fixture(c)
    eng = ShardedEngine(Retriever(corpus, c), corpus_mesh())
    r = eng.retrieve("payment invoice billing settlement")
    assert r.results and "payment" in r.results[0].text.lower()


def test_ivf_engine_int8_and_collections(small_config):
    """int8 rows reorder with their scales; collection masks filter via perm."""
    from triple_hybrid_rag_tpu.facade import RAG

    c = small_config.replace(
        graph_enabled=False, embedding_dtype="int8", safety_threshold=0.0,
        denoise_enabled=False, capacity_round=8,
        semantic_backend="ivf", ivf_block_rows=8, ivf_probes=64,
    )
    rag = RAG(config=c, use_sharded_engine=True)
    rag.ingest_text("Payment invoices settle in thirty days at Tenant A.",
                    name="a.md", collection="ta")
    rag.ingest_text("Payment invoices settle in ninety days at Tenant B.",
                    name="b.md", collection="tb")
    ra = rag.query("payment invoices settle", collection="ta")
    rb = rag.query("payment invoices settle", collection="tb")
    assert ra.results and all("Tenant A" in x.text for x in ra.results)
    assert rb.results and all("Tenant B" in x.text for x in rb.results)
    assert rag.stats()["engine_semantic_backend"] == "ivf"


def test_int4_rows_roundtrip(rng):
    """Packed int4 rows: windows unpack on the fly, scores match the dequantized
    oracle exactly (f32 window scoring, not int8 MXU approximation)."""
    from triple_hybrid_rag_tpu.index.dense_index import quantize_rows_int4

    rows = _unit_rows(rng, 64, 32)
    packed, scales = quantize_rows_int4(rows)
    valid = np.ones(64, bool)
    rows_r, scales_r, perm, cent = ivf_build_local(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(valid), block_rows=8
    )
    assert rows_r.dtype == jnp.uint8 and cent.shape == (8, 32)
    q = _unit_rows(rng, 2, 32)
    ids, vals = ivf_topk_local(
        rows_r, scales_r, perm, cent, jnp.asarray(q), probes=8, top_k=5
    )
    lo = (packed & 0xF).astype(np.int8)
    hi = ((packed >> 4) & 0xF).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    deq = np.concatenate([lo, hi], axis=1).astype(np.float32) * scales[:, None]
    for b in range(2):
        ref_ids, ref_vals = _brute_topk(deq, valid, q[b], 5)
        np.testing.assert_array_equal(np.asarray(ids)[b], ref_ids)
        np.testing.assert_allclose(np.asarray(vals)[b], ref_vals, rtol=1e-4)


def test_ivf_engine_int4_smoke(small_config):
    """int4 + ivf through the engine: retrieves its own topic."""
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    c = small_config.replace(
        graph_enabled=False, lexical_enabled=False, rerank_enabled=False,
        embedding_dtype="int4", safety_threshold=0.0, capacity_round=8,
        semantic_backend="ivf", ivf_block_rows=8, ivf_probes=64,
    )
    corpus = _engine_fixture(c)
    eng = ShardedEngine(Retriever(corpus, c), corpus_mesh())
    assert eng.ivf_mode
    r = eng.retrieve("fox wildlife forest habitat")
    assert r.results and "fox" in r.results[0].text.lower()
