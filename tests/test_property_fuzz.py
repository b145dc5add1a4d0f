"""Property fuzz for the host text pipeline: arbitrary unicode must never crash.

The reference ingests user-supplied files straight into the chunker/tokenizer
(rag2/ingest.py); this is the robustness tier its mock-based tests skip. Pure
host code — no device work, so hundreds of random documents stay cheap.
"""

import hashlib
import random

import pytest

from triple_hybrid_rag_tpu.analyzer import Analyzer
from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
from triple_hybrid_rag_tpu.config import RAGConfig

# unicode planes that historically break naive tokenizers: combining marks,
# RTL, surrogue-adjacent emoji, CJK, zero-width, control chars, markdown syntax
_POOLS = [
    "abcdefghijklmnop qrstuvwxyz ",
    "ÁÉÍÓÚâêîôûãõç ÀÈÌÒÙ äëïöü ",
    "ßÆæØøÞþĐđŁłŊŋ ",
    "абвгдежз ійї ",
    "ابتثجحخ يکگ ",
    "中文文本检索系统 日本語のテキスト ",
    "😀🤖🔥🎉 👍🏽 🇧🇷 ",
    "​‌‍﻿",  # zero-width
    "̧́̈",  # combining marks
    "\t\r\n\x00\x0b\x1b",  # controls
    "|#-*_`>[]()!{}.,;:'\"$%&/\\=+~^<>@ ",
    "0123456789 ²³¼½ Ⅷ ",
]


def _random_text(rng: random.Random, max_len: int = 4000) -> str:
    parts = []
    for _ in range(rng.randint(1, 60)):
        pool = rng.choice(_POOLS)
        k = rng.randint(1, 40)
        parts.append("".join(rng.choice(pool) for _ in range(k)))
        if rng.random() < 0.2:
            parts.append("\n\n")
        if rng.random() < 0.1:
            parts.append("\n# " + "".join(rng.choice(pool) for _ in range(8)) + "\n")
        if rng.random() < 0.05:
            parts.append("\n| a | b |\n|---|---|\n| 1 | 2 |\n")
    return "".join(parts)[:max_len]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_analyzer_never_crashes_and_is_deterministic(seed, small_config):
    rng = random.Random(seed)
    an = Analyzer(small_config)
    for _ in range(120):
        text = _random_text(rng)
        toks = an.tokenize(text)
        assert isinstance(toks, list)
        assert all(isinstance(t, str) and t for t in toks)
        assert toks == an.tokenize(text)  # deterministic


@pytest.mark.parametrize("seed", [3, 4])
def test_chunker_invariants_on_random_unicode(seed, small_config):
    rng = random.Random(seed)
    chunker = HierarchicalChunker(small_config)
    for i in range(40):
        text = _random_text(rng)
        doc_id = hashlib.sha256(f"{seed}-{i}".encode()).hexdigest()
        parents, children = chunker.chunk_document(text, doc_id)
        # stable-id format and parent linkage hold for every chunk
        pids = {p.parent_id for p in parents}
        assert len(pids) == len(parents)
        for c in children:
            assert c.parent_id in pids
            assert c.chunk_id.startswith(doc_id[:16]) or doc_id[:8] in c.chunk_id
        # re-chunking is bit-stable (stable IDs contract)
        parents2, children2 = chunker.chunk_document(text, doc_id)
        assert [p.parent_id for p in parents2] == [p.parent_id for p in parents]
        assert [c.chunk_id for c in children2] == [c.chunk_id for c in children]


def test_ingest_random_unicode_end_to_end(small_config):
    """Random unicode documents survive the whole host ingest path and remain
    queryable (no device engine needed: staged retriever on CPU)."""
    from triple_hybrid_rag_tpu.facade import RAG

    rng = random.Random(7)
    cfg = small_config.replace(
        graph_enabled=False, embedding_dtype="float32", safety_threshold=0.0
    )
    rag = RAG(config=cfg)
    for i in range(6):
        rag.ingest_text(_random_text(rng, max_len=1500), name=f"fuzz{i}.md")
    rag.ingest_text("Payment invoices settle within thirty days.", name="real.md")
    r = rag.query("payment invoices settle")
    assert r.results and "invoice" in r.results[0].text.lower()


@pytest.mark.parametrize("ext", ["pdf", "docx", "xlsx", "csv", "html", "txt"])
def test_garbage_files_fail_soft(ext, small_config, tmp_path):
    """Random bytes with a document extension must produce a clean failure (or an
    empty-but-completed ingest), never a crash — the reference's loader ladder
    contract (ingestion/loader.py error paths)."""
    from triple_hybrid_rag_tpu.facade import RAG

    rng = random.Random(11)
    cfg = small_config.replace(graph_enabled=False, embedding_dtype="float32")
    rag = RAG(config=cfg)
    p = tmp_path / f"garbage.{ext}"
    p.write_bytes(bytes(rng.getrandbits(8) for _ in range(4096)))
    res = rag.ingest(str(p))
    assert res.status.value in ("completed", "failed")
    # a second ingest of the same garbage is idempotent, not a crash
    res2 = rag.ingest(str(p))
    assert res2.status.value in ("completed", "failed") or res2.skipped
