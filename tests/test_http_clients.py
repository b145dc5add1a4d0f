"""HTTP model adapters against an in-process stub model server.

The stub speaks the exact wire shapes of the reference's serving boundary:
OpenAI-compatible /v1/embeddings (rag2/embedder.py:31-120), vLLM /rerank +
chat-logprob fallback (retrieval/reranker.py:287-353,154-285), JSON-chat planning/NER
(rag2/query_planner.py:97-190, rag2/entity_extraction.py:208-310), and a vision OCR
chat call (ingestion/ocr.py:223-340). Fault injection checks every degradation rung.
"""

from __future__ import annotations

import hashlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.models.http_clients import (
    HTTPChatJSON,
    HTTPEmbedder,
    HTTPRerankerFn,
    HTTPStatusError,
    HTTPVisionOCR,
    make_extractor_fn,
    make_planner_fn,
    post_json,
    wire_http_models,
)

DIM = 64


def _stub_vec(text: str, dim: int = DIM) -> list:
    """Deterministic hash-seeded embedding (the reference's own E2E mock strategy)."""
    seed = int.from_bytes(hashlib.sha256(text.encode()).digest()[:8], "little")
    v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return (v / np.linalg.norm(v)).tolist()


class StubModelServer:
    """In-process OpenAI-compatible model server with scriptable fault injection."""

    def __init__(self) -> None:
        self.requests: list = []  # (path, payload) log
        self.fail_next = 0  # respond 500 to this many requests
        self.fail_status = 500
        self.native_rerank = True  # False -> /rerank answers 404
        self.embed_dim = DIM
        self.drop_embed_indices: set = set()  # omit these rows from /embeddings
        self.chat_text_mode = False  # chat answers plain yes/no without logprobs
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                outer.requests.append((self.path, payload))
                if outer.fail_next > 0:
                    outer.fail_next -= 1
                    self._send(outer.fail_status, {"error": "injected failure"})
                    return
                if self.path.endswith("/embeddings"):
                    self._send(200, outer._embeddings(payload))
                elif self.path == "/rerank":
                    if not outer.native_rerank:
                        self._send(404, {"error": "no pooling runner"})
                    else:
                        self._send(200, outer._rerank(payload))
                elif self.path.endswith("/chat/completions"):
                    self._send(200, outer._chat(payload))
                else:
                    self._send(404, {"error": "not found"})

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()
        self.base = f"http://127.0.0.1:{self.httpd.server_address[1]}/v1"

    def close(self) -> None:
        self.httpd.shutdown()

    # -- endpoint behaviors --

    def _embeddings(self, payload: dict) -> dict:
        inputs = payload["input"]
        if isinstance(inputs, str):
            inputs = [inputs]
        data = []
        for i, item in enumerate(inputs):
            if i in self.drop_embed_indices:
                continue  # some servers omit rows that failed (over-long inputs)
            key = item if isinstance(item, str) else json.dumps(item, sort_keys=True)
            data.append(
                {"index": i, "embedding": _stub_vec(key, self.embed_dim), "object": "embedding"}
            )
        return {"object": "list", "data": data, "model": payload.get("model", "")}

    def _rerank(self, payload: dict) -> dict:
        q_terms = set(payload["query"].lower().split())
        results = []
        for i, doc in enumerate(payload["documents"]):
            overlap = len(q_terms & set(doc.lower().split())) / max(1, len(q_terms))
            results.append({"index": i, "relevance_score": round(overlap, 4)})
        return {"results": results}

    def _chat(self, payload: dict) -> dict:
        system = payload["messages"][0]["content"]
        user = payload["messages"][-1]["content"]
        if isinstance(user, list):  # vision OCR request
            content = "INVOICE 2041\ntotal due: $14,900\n| item | qty |\n| widget | 12 |"
            return self._chat_wrap(content)
        if "query planner" in system.lower():
            plan = {
                "keywords": ["stub", "keywords"],
                "semantic_query_text": "stub rephrase: " + user[-40:],
                "intent": "entity_lookup",
                "requires_graph": True,
                "graph_entities": ["ACME Corp"],
                "graph_query": {"op": "related", "entity": "ACME Corp"},
                "weights": {"lexical": 0.5, "semantic": 0.9, "graph": 1.0},
            }
            return self._chat_wrap(json.dumps(plan))
        if "entities and relations" in system.lower():
            ext = {
                "entities": [
                    {"name": "ACME Corp", "type": "organization", "description": "vendor"},
                    {"name": "Zenith", "type": "project", "description": "the project"},
                ],
                "relations": [
                    {"subject": "ACME Corp", "relation_type": "part_of", "object": "Zenith"}
                ],
            }
            return self._chat_wrap(json.dumps(ext))
        # rerank chat scoring: answer from term overlap, with logprobs
        relevant = "relevant-marker" in user
        if self.chat_text_mode:
            return self._chat_wrap("Yes, it is." if relevant else "No.")
        lp = [
            {
                "token": "yes" if relevant else "no",
                "logprob": -0.1,
                "top_logprobs": [
                    {"token": "yes", "logprob": -0.1 if relevant else -3.2},
                    {"token": "no", "logprob": -3.2 if relevant else -0.1},
                ],
            }
        ]
        return {
            "choices": [
                {
                    "message": {"content": "yes" if relevant else "no"},
                    "logprobs": {"content": lp},
                }
            ]
        }

    @staticmethod
    def _chat_wrap(content: str) -> dict:
        return {"choices": [{"message": {"content": content}}]}


@pytest.fixture(scope="module")
def stub():
    s = StubModelServer()
    yield s
    s.close()


@pytest.fixture(autouse=True)
def _reset(stub):
    stub.requests.clear()
    stub.fail_next = 0
    stub.fail_status = 500
    stub.native_rerank = True
    stub.embed_dim = DIM
    stub.chat_text_mode = False


# ---------------------------------------------------------------------------
# post_json retry ladder
# ---------------------------------------------------------------------------


def test_retry_on_5xx_then_success(stub):
    stub.fail_next = 2
    out = post_json(
        stub.base + "/embeddings",
        {"model": "m", "input": ["hello"]},
        retries=2,
        backoff_s=0.0,
    )
    assert len(out["data"]) == 1
    assert len(stub.requests) == 3  # two failures + success


def test_no_retry_on_4xx(stub):
    stub.fail_next = 1
    stub.fail_status = 400
    with pytest.raises(HTTPStatusError) as ei:
        post_json(stub.base + "/embeddings", {}, retries=3, backoff_s=0.0)
    assert ei.value.status == 400
    assert len(stub.requests) == 1  # immediate failure, no retries


def test_retries_exhausted_raises(stub):
    stub.fail_next = 10
    with pytest.raises(HTTPStatusError):
        post_json(stub.base + "/embeddings", {}, retries=2, backoff_s=0.0)
    assert len(stub.requests) == 3


# ---------------------------------------------------------------------------
# HTTPEmbedder
# ---------------------------------------------------------------------------


def test_embedder_batching_and_values(stub):
    emb = HTTPEmbedder(stub.base, model="m", dim=DIM, batch_size=4, retries=0)
    texts = [f"text number {i}" for i in range(10)]
    out = emb.embed_texts(texts)
    assert out.shape == (10, DIM)
    # 10 texts / batch 4 -> 3 requests (reference batches of 20, embedder.py:103)
    assert len(stub.requests) == 3
    np.testing.assert_allclose(out[3], np.asarray(_stub_vec("text number 3")), rtol=1e-6)
    # embed_query matches the bulk path
    np.testing.assert_allclose(emb.embed_query("text number 3"), out[3], rtol=1e-6)


def test_embedder_zero_vectors_on_failed_batch(stub):
    emb = HTTPEmbedder(stub.base, model="m", dim=DIM, batch_size=2, retries=0)
    stub.fail_next = 1  # first batch dies
    out = emb.embed_texts(["a doc", "b doc", "c doc", "d doc"])
    assert np.allclose(out[:2], 0.0)  # failed batch -> zeros (fail-soft)
    assert np.linalg.norm(out[2]) > 0.5  # second batch intact


def test_embed_query_raises_on_failure(stub):
    emb = HTTPEmbedder(stub.base, model="m", dim=DIM, retries=0)
    stub.fail_next = 1
    with pytest.raises(ValueError):
        emb.embed_query("q")


def test_embedder_dim_mismatch_adapts(stub):
    emb = HTTPEmbedder(stub.base, model="m", dim=DIM, retries=0)
    stub.embed_dim = DIM // 2  # server returns shorter vectors
    out = emb.embed_texts(["short dim"])
    assert out.shape == (1, DIM)
    assert np.allclose(out[0, DIM // 2 :], 0.0) and np.linalg.norm(out[0]) > 0


def test_embedder_images_data_url(stub):
    emb = HTTPEmbedder(stub.base, model="m", dim=DIM, retries=0)
    png = b"\x89PNG\r\n\x1a\n" + b"fakepng"
    out = emb.embed_images([png])
    assert out.shape == (1, DIM) and np.linalg.norm(out[0]) > 0.5
    sent = stub.requests[-1][1]["input"][0]
    assert sent["type"] == "image_url"
    assert sent["image_url"]["url"].startswith("data:image/png;base64,")


# ---------------------------------------------------------------------------
# HTTPRerankerFn: native -> chat -> raise ladder
# ---------------------------------------------------------------------------


def test_rerank_native_path(stub):
    fn = HTTPRerankerFn(stub.base, model="r", retries=0)
    scores = fn("alpha beta", ["alpha beta gamma", "delta epsilon"])
    assert scores[0] > scores[1]
    assert stub.requests[-1][0] == "/rerank"  # /v1 stripped (reranker.py:307-312)


def test_rerank_404_falls_back_to_chat_logprobs(stub):
    stub.native_rerank = False
    fn = HTTPRerankerFn(stub.base, model="r", retries=0)
    scores = fn("q", ["relevant-marker document", "irrelevant document"])
    assert scores[0] > 0.9 and scores[1] < 0.1  # logprob softmax separation
    # sticky: second call skips /rerank entirely
    stub.requests.clear()
    fn("q", ["relevant-marker again"])
    assert all(p != "/rerank" for p, _ in stub.requests)


def test_rerank_chat_text_parse_fallback(stub):
    stub.native_rerank = False
    stub.chat_text_mode = True  # no logprobs in response
    fn = HTTPRerankerFn(stub.base, model="r", retries=0)
    scores = fn("q", ["relevant-marker document", "other document"])
    assert scores[0] == pytest.approx(0.9) and scores[1] == pytest.approx(0.1)


def test_rerank_total_failure_raises(stub):
    stub.fail_next = 100
    fn = HTTPRerankerFn(stub.base, model="r", retries=0)
    with pytest.raises(Exception):
        fn("q", ["doc a", "doc b"])
    stub.fail_next = 0


# ---------------------------------------------------------------------------
# JSON chat: planner + NER
# ---------------------------------------------------------------------------


def test_planner_fn_roundtrip(stub):
    fn = make_planner_fn(stub.base, model="p", retries=0)
    plan = fn("how is ACME related to Zenith?")
    assert plan["requires_graph"] is True
    assert plan["graph_entities"] == ["ACME Corp"]
    assert plan["graph_query"]["op"] == "related"
    sent = stub.requests[-1][1]
    assert sent["response_format"] == {"type": "json_object"}


def test_callable_planner_integration_and_fallback(stub):
    from triple_hybrid_rag_tpu.models.planner import CallablePlanner

    cfg = RAGConfig()
    planner = CallablePlanner(make_planner_fn(stub.base, model="p", retries=0), cfg)
    plan = planner.plan("how is ACME related to Zenith?")
    assert plan.keywords == ["stub", "keywords"]
    assert plan.requires_graph and plan.graph_entities == ["ACME Corp"]
    assert plan.weights["semantic"] == pytest.approx(0.9)
    # fault injection -> rule-based fallback plan (query_planner.py:180-190)
    stub.fail_next = 10
    plan = planner.plan("payment deadline for invoices")
    assert plan.keywords  # rule-extracted
    assert "payment" in plan.keywords
    stub.fail_next = 0


def test_extractor_fn_and_callable_extractor(stub):
    from triple_hybrid_rag_tpu.models.entity_extractor import CallableExtractor
    from triple_hybrid_rag_tpu.types import ParentChunk

    cfg = RAGConfig()
    ext = CallableExtractor(make_extractor_fn(stub.base, model="n", retries=0), cfg)
    parent = ParentChunk(
        parent_id="p:0", doc_id="d" * 64, parent_idx=0,
        text="ACME Corp participates in the Zenith project.",
    )
    res = ext.extract(parent, [])
    names = {e.canonical_name for e in res.entities}
    assert names == {"ACME Corp", "Zenith"}
    assert len(res.relations) == 1
    assert res.relations[0].relation_type.value == "part_of"


def test_chat_json_tolerates_fenced_output():
    raw = '```json\n{"keywords": ["a"]}\n```'
    assert HTTPChatJSON.parse_json_content(raw) == {"keywords": ["a"]}
    assert HTTPChatJSON.parse_json_content('noise {"k": 1} trailing') == {"k": 1}
    with pytest.raises(Exception):
        HTTPChatJSON.parse_json_content("no json here")


# ---------------------------------------------------------------------------
# Vision OCR
# ---------------------------------------------------------------------------


def test_vision_ocr_fn(stub):
    fn = HTTPVisionOCR(stub.base, model="v", retries=0)
    text = fn(b"\xff\xd8\xff" + b"fakejpeg", "base")
    assert "INVOICE 2041" in text
    sent = stub.requests[-1][1]
    parts = sent["messages"][-1]["content"]
    assert parts[0]["image_url"]["url"].startswith("data:image/jpeg;base64,")
    assert sent["max_tokens"] == 2048  # "base" mode token budget


def test_vision_ocr_through_processor(stub):
    from triple_hybrid_rag_tpu.ocr import OCRProcessor

    proc = OCRProcessor(HTTPVisionOCR(stub.base, model="v", retries=0))
    res = proc.process_image(b"\x89PNG\r\n\x1a\nfake")
    assert "INVOICE 2041" in res.text


# ---------------------------------------------------------------------------
# Config wiring + facade E2E (ingest -> query through the stub server)
# ---------------------------------------------------------------------------


def test_wire_http_models_selects_configured(stub):
    cfg = RAGConfig(embed_api_base=stub.base, llm_api_base=stub.base)
    wired = wire_http_models(cfg)
    assert set(wired) == {"embedder", "planner_fn", "extractor_fn"}
    cfg2 = RAGConfig()
    assert wire_http_models(cfg2) == {}


def test_rag_facade_end_to_end_through_stub(stub, small_config):
    from triple_hybrid_rag_tpu.facade import RAG

    cfg = small_config.replace(
        embed_api_base=stub.base,
        embed_api_model="emb",
        llm_api_base=stub.base,
        llm_api_model="llm",
        rerank_api_base=stub.base,
        rerank_api_model="rr",
        embedding_dim_full=DIM,
        embedding_dim=DIM // 2,
        embedding_dtype="float32",
        api_retries=0,
        safety_threshold=0.0,
        rerank_backend="dot",
    )
    rag = RAG(config=cfg)
    res = rag.ingest_text(
        "# Contracts\n\nACME Corp signed the Zenith project contract. "
        "Invoices settle within thirty days.",
        name="contract.md",
    )
    assert res.n_children >= 1
    # HTTP NER populated the entity store through CallableExtractor
    assert rag.ingestor.entity_store.stats()["entities"] >= 2
    out = rag.query("ACME Zenith contract")
    assert not out.refused and out.results
    paths = {p for p, _ in stub.requests}
    assert any(p.endswith("/embeddings") for p in paths)  # HTTP embedder used
    assert any(p.endswith("/chat/completions") for p in paths)  # planner/NER used
    assert "/rerank" in paths  # HTTP reranker rung used


def test_rag_facade_survives_dead_model_server(small_config):
    """Every HTTP rung degrades: embeddings -> zeros/skip channel, planner -> rules,
    NER -> rule extractor, rerank -> device fallback. The query still answers via
    the lexical channel (the reference's channel-isolation contract)."""
    from triple_hybrid_rag_tpu.facade import RAG

    dead = "http://127.0.0.1:9"  # discard port: connection refused instantly
    cfg = small_config.replace(
        embed_api_base=dead,
        llm_api_base=dead,
        rerank_api_base=dead,
        embedding_dim_full=DIM,
        embedding_dim=DIM // 2,
        embedding_dtype="float32",
        api_retries=0,
        api_timeout_s=0.5,
        safety_threshold=0.0,
        rerank_backend="dot",
    )
    rag = RAG(config=cfg)
    res = rag.ingest_text(
        "# Payments\n\nInvoices settle within thirty days of billing.", name="pay.md"
    )
    assert res.n_children >= 1  # ingestion completed despite dead embedder/NER
    out = rag.query("invoice settlement deadline")
    assert not out.refused and out.results
    assert "Invoices" in out.results[0].text


def test_embedder_aligns_by_protocol_index(stub):
    """A server that OMITS a failed row must not shift later embeddings onto the
    wrong inputs — rows align by their own 'index' key, the hole stays zero."""
    from triple_hybrid_rag_tpu.models.http_clients import HTTPEmbedder

    emb = HTTPEmbedder(stub.base, dim=DIM, retries=0)
    stub.drop_embed_indices = {1}
    out = emb.embed_texts(["alpha", "beta", "gamma"])
    stub.drop_embed_indices = set()
    np.testing.assert_allclose(out[0], _stub_vec("alpha"), rtol=1e-6)
    np.testing.assert_allclose(out[2], _stub_vec("gamma"), rtol=1e-6)  # NOT beta's
    assert not np.any(out[1])  # the dropped row stays a zero vector
