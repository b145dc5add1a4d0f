"""Checkpoint/restore, RAG facade, and CLI tests."""

import json

import numpy as np
import pytest

from triple_hybrid_rag_tpu.cli import main as cli_main
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.facade import RAG
from triple_hybrid_rag_tpu.index.checkpoint import (
    CheckpointError,
    load_checkpoint,
    load_ingestor,
    save_ingestor,
)
from triple_hybrid_rag_tpu.ingest import Ingestor


@pytest.fixture
def cfg(small_config):
    return small_config.replace(
        graph_enabled=True, embedding_dtype="float32", safety_threshold=0.2
    )


@pytest.fixture
def docs_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "pay.md").write_text(
        "# Payments\n\nAcme Corp settles invoices within thirty days of billing."
    )
    (d / "wild.md").write_text("# Wildlife\n\nRed foxes inhabit the northern forest.")
    return d


def test_checkpoint_roundtrip(cfg, docs_dir, tmp_path):
    ing = Ingestor(config=cfg)
    ing.ingest_directory(docs_dir)
    ckpt = tmp_path / "ckpt"
    save_ingestor(ing, ckpt)
    assert (ckpt / "manifest.json").exists()

    ing2 = load_ingestor(ckpt)
    assert ing2.corpus.stats() == ing.corpus.stats()
    assert ing2.entity_store.stats() == ing.entity_store.stats()
    # embeddings restored bit-exact
    cid = ing.corpus.children[0].chunk_id
    np.testing.assert_array_equal(ing2.embeddings[cid], ing.embeddings[cid])
    # restored state queries identically
    r1 = ing.make_retriever().retrieve("invoice settlement")
    r2 = ing2.make_retriever().retrieve("invoice settlement")
    assert [x.chunk_id for x in r1.results] == [x.chunk_id for x in r2.results]


def test_checkpoint_corruption_detected(cfg, docs_dir, tmp_path):
    ing = Ingestor(config=cfg)
    ing.ingest_directory(docs_dir)
    ckpt = tmp_path / "ckpt"
    save_ingestor(ing, ckpt)
    (ckpt / "corpus.json").write_bytes(b"corrupted")
    with pytest.raises(CheckpointError, match="hash mismatch"):
        load_checkpoint(ckpt)


def test_checkpoint_missing(tmp_path):
    with pytest.raises(CheckpointError, match="no checkpoint"):
        load_checkpoint(tmp_path / "nothing")


def test_checkpoint_config_migration(cfg, docs_dir, tmp_path):
    """Restoring under a different embedding_dim re-truncates from full-dim vectors
    (the backfill_rag2.py migration analogue)."""
    ing = Ingestor(config=cfg)
    ing.ingest_directory(docs_dir)
    ckpt = tmp_path / "ckpt"
    save_ingestor(ing, ckpt)
    smaller = cfg.replace(embedding_dim=16)
    ing2 = load_ingestor(ckpt, config=smaller)
    ret = ing2.make_retriever()
    assert ret.dense_index.dim == 16
    assert not ret.retrieve("invoice settlement").refused


def test_facade_ingest_query_save_load(cfg, docs_dir, tmp_path):
    rag = RAG(config=cfg)
    results = rag.ingest_directory(docs_dir)
    assert all(r.status.value == "completed" for r in results)
    out = rag.query("fox in the forest", top_k=2)
    assert not out.refused
    assert "fox" in out.results[0].text.lower()

    # corpus mutation invalidates the cached retriever
    rag.ingest_text("Quantum computing hardware overview.", name="q.md")
    out2 = rag.query("quantum computing")
    assert any("quantum" in r.text.lower() for r in out2.results)

    ckpt = tmp_path / "rag_ckpt"
    rag.save(ckpt)
    rag2 = RAG.load(ckpt)
    assert rag2.stats()["children"] == rag.stats()["children"]
    out3 = rag2.query("fox in the forest", top_k=2)
    assert [r.chunk_id for r in out3.results] == [r.chunk_id for r in out.results]


def test_cli_ingest_query_stats(cfg, docs_dir, tmp_path, capsys, monkeypatch):
    # CLI uses get_settings(); pin the small test config
    import triple_hybrid_rag_tpu.config as config_mod

    monkeypatch.setattr(config_mod, "_SETTINGS", cfg)
    index = str(tmp_path / "cli_index")

    rc = cli_main(["ingest", str(docs_dir), "--index", index])
    out = capsys.readouterr().out
    assert rc == 0
    assert "[COMPLETED]" in out and "ingested 2 file(s)" in out

    rc = cli_main(["query", "invoice", "settlement", "--index", index, "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    payload = json.loads(out)
    assert payload["refused"] is False
    assert payload["results"][0]["text"]

    rc = cli_main(["stats", "--index", index, "--json"])
    stats = json.loads(capsys.readouterr().out)
    assert stats["documents"] == 2

    rc = cli_main(["metrics"])
    assert "# TYPE" in capsys.readouterr().out


def test_cli_reingest_skips(cfg, docs_dir, tmp_path, capsys, monkeypatch):
    import triple_hybrid_rag_tpu.config as config_mod

    monkeypatch.setattr(config_mod, "_SETTINGS", cfg)
    index = str(tmp_path / "cli_index2")
    cli_main(["ingest", str(docs_dir), "--index", index])
    capsys.readouterr()
    cli_main(["ingest", str(docs_dir), "--index", index])
    assert "[SKIP]" in capsys.readouterr().out


def test_facade_engine_mode_with_mutation(cfg, docs_dir):
    """use_sharded_engine=True: engine rebuilds when the corpus mutates."""
    rag = RAG(config=cfg.replace(graph_enabled=False), use_sharded_engine=True)
    rag.ingest_directory(docs_dir)
    r1 = rag.query("invoice settlement", top_k=2)
    assert not r1.refused and "invoices" in r1.results[0].text.lower()
    # mutation invalidates the compiled engine snapshot
    rag.ingest_text("Quantum processors keep qubits coherent.", name="q.md")
    r2 = rag.query("quantum qubits coherent")
    assert any("Quantum" in x.text for x in r2.results)
    # batched + scoped still works in engine mode
    rag.ingest_text("Tenant X special payment rules.", name="x.md", collection="x")
    out = rag.query_batch(["payment rules", "payment rules"], collections=["x", None])
    assert all("Tenant X" in r.text for r in out[0].results)


def test_cli_migrate_retruncate_and_reembed(cfg, docs_dir, tmp_path, capsys, monkeypatch):
    """thr migrate: backfill analogue (reference scripts/backfill_rag2.py)."""
    import triple_hybrid_rag_tpu.config as config_mod

    monkeypatch.setattr(config_mod, "_SETTINGS", cfg)
    src = str(tmp_path / "mig_src")
    dst = str(tmp_path / "mig_dst")
    cli_main(["ingest", str(docs_dir), "--index", src])
    capsys.readouterr()

    new_dim = cfg.embedding_dim // 2
    rc = cli_main(["migrate", src, dst, "--dim", str(new_dim), "--json"])
    summary = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert summary["embedding_dim"] == new_dim and summary["children"] > 0
    assert not summary["reembedded"]

    # migrated checkpoint loads under the new config and still answers queries
    mig = load_ingestor(dst)
    assert mig.config.embedding_dim == new_dim
    result = mig.make_retriever().retrieve("invoice settlement", top_k=2)
    assert result.results and not result.refused

    # full re-embed path (new dtype too) stays query-equivalent for hash embedders
    dst2 = str(tmp_path / "mig_dst2")
    rc = cli_main(["migrate", src, dst2, "--dtype", "int8", "--reembed", "--json"])
    summary2 = json.loads(capsys.readouterr().out)
    assert rc == 0 and summary2["reembedded"] and summary2["embedding_dtype"] == "int8"
    mig2 = load_ingestor(dst2)
    r2 = mig2.make_retriever().retrieve("invoice settlement", top_k=2)
    assert r2.results and r2.results[0].chunk_id == result.results[0].chunk_id


def test_checkpoint_never_persists_api_key_and_strips_network_fields(cfg, tmp_path):
    """Secrets must not land in the portable artifact, and an untrusted checkpoint
    must not be able to redirect model traffic (SSRF/exfil) via its embedded
    config — network fields are stripped on load unless trust_config=True."""
    import json

    from triple_hybrid_rag_tpu.facade import RAG
    from triple_hybrid_rag_tpu.index.checkpoint import load_checkpoint

    c = cfg.replace(
        api_key="sk-SECRET", embed_api_base="http://evil.example:1/v1",
        llm_api_base="http://evil.example:2/v1",
    )
    rag = RAG(config=c)
    rag.ingest_text("Invoices settle in thirty days.", name="p.md")
    d = tmp_path / "ckpt"
    rag.save(d)
    manifest = json.loads((d / "manifest.json").read_text())
    assert "sk-SECRET" not in json.dumps(manifest)

    _, _, _, loaded_cfg = load_checkpoint(d)
    assert loaded_cfg.embed_api_base == "" and loaded_cfg.llm_api_base == ""
    assert loaded_cfg.api_key == ""
    trusted = load_checkpoint(d, trust_config=True)[3]
    assert trusted.embed_api_base == "http://evil.example:1/v1"


def test_checkpoint_save_failure_preserves_previous(cfg, tmp_path):
    """A save that dies mid-write must leave the PREVIOUS checkpoint loadable
    (temp-then-rename per artifact; manifest written last)."""
    from triple_hybrid_rag_tpu.facade import RAG
    from triple_hybrid_rag_tpu.index.checkpoint import load_checkpoint, save_checkpoint

    rag = RAG(config=cfg)
    rag.ingest_text("Invoices settle in thirty days.", name="p.md")
    d = tmp_path / "ckpt"
    rag.save(d)

    # second save crashes during corpus serialization (un-JSONable metadata)
    rag.ingest_text("Foxes live in the forest.", name="f.md")
    rag.ingestor.corpus.children[0].metadata["bad"] = object()
    with pytest.raises(TypeError):
        save_checkpoint(d, rag.ingestor.corpus, rag.ingestor.entity_store,
                        rag.ingestor.embeddings, cfg)
    # the original checkpoint still verifies and loads
    corpus, _, _, _ = load_checkpoint(d)
    assert len(corpus.children) >= 1


def test_checkpoint_numpy_metadata_roundtrips(cfg, tmp_path):
    """numpy scalars in user metadata serialize (v1 pickle accepted them)."""
    import numpy as np

    from triple_hybrid_rag_tpu.facade import RAG
    from triple_hybrid_rag_tpu.index.checkpoint import load_checkpoint

    rag = RAG(config=cfg)
    rag.ingest_text("Invoices settle in thirty days.", name="p.md")
    rag.ingestor.corpus.children[0].metadata["score"] = np.float32(0.5)
    d = tmp_path / "ckpt2"
    rag.save(d)
    corpus, _, _, _ = load_checkpoint(d)
    assert abs(corpus.children[0].metadata["score"] - 0.5) < 1e-6
