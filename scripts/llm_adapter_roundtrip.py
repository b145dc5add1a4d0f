"""Real semantics through the planner / NER / reranker HTTP adapters (r3 task #8).

Round 3 proved the *embedder* adapter with real model semantics end-to-end
(``eval_results/http_adapter_roundtrip.json``, recall delta 0.0); the planner, NER,
and reranker adapters were still wire-shape/stub-tested only. No external pretrained
LLM exists in-image (zero egress), so — exactly like the embedder round trip — this
serves the framework's OWN semantic models behind a stdlib OpenAI-compatible server
and drives every adapter rung with semantics checked, not just shapes:

- planner:   ``make_planner_fn`` -> POST /v1/chat/completions -> RuleBasedPlanner
             server-side, JSON wire shape of the reference's GPT planner
             (``/root/reference/src/voice_agent/rag2/query_planner.py:97-190``).
             Check: CallablePlanner's parsed plan == the in-process rule plan,
             field by field, over EN+PT factual/relational/entity/procedural queries.
- NER:       ``make_extractor_fn`` -> chat JSON -> RuleBasedExtractor server-side
             (reference ``rag2/entity_extraction.py:208-310``). Check: the
             (subject, relation_type, object) triple set and (name, type) entity
             set survive the JSON round trip exactly, per parent chunk.
- reranker:  ``HTTPRerankerFn`` both rungs. Native ``POST /rerank`` (vLLM shape,
             reference ``retrieval/reranker.py:287-353``) serves encoder cosine
             scores; the chat+logprob fallback serves the SAME scores as yes/no
             ``top_logprobs`` (yes_lp=log(s), no_lp=log(1-s)), so the adapter's
             softmax must reconstruct s exactly (reranker.py:231-256). Check:
             full-funnel retrieval parity (per-query result IDs + recall@10)
             between the in-process callable and both HTTP rungs.

Runs on CPU by default (the encoder is small; no chip contention with eval jobs).

    python scripts/llm_adapter_roundtrip.py [--docs 300] [--queries 80] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import pathlib
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

if os.environ.get("THR_ROUNDTRIP_CHIP", "") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


# ---------------------------------------------------------------------------
# the server: one stdlib process exposing the three model boundaries
# ---------------------------------------------------------------------------


def start_server(planner, extractor, score_fn, native_rerank: bool):
    """OpenAI-compatible chat + vLLM /rerank server around the in-process models.

    ``score_fn(query, text) -> [0,1]`` backs both rerank rungs; the chat rung
    encodes the score losslessly in yes/no logprobs so the adapter's softmax
    (http_clients.py:343-356) reconstructs it bit-close.
    """

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            path = self.path.rstrip("/")
            if path.endswith("/rerank"):
                if not native_rerank:
                    self.send_error(404)  # force the chat+logprob rung
                    return
                q = str(req.get("query", ""))
                docs = [str(d) for d in req.get("documents", [])]
                self._send(200, {
                    "results": [
                        {"index": i, "relevance_score": score_fn(q, d)}
                        for i, d in enumerate(docs)
                    ]
                })
                return
            if not path.endswith("/chat/completions"):
                self.send_error(404)
                return
            system = ""
            user = ""
            for m in req.get("messages", []):
                if m.get("role") == "system":
                    system = str(m.get("content", ""))
                elif m.get("role") == "user":
                    user = str(m.get("content", ""))
            if "query planner" in system:
                content = json.dumps(plan_to_wire(planner, user))
                self._send(200, _chat_body(content))
            elif "entities and relations" in system:
                content = json.dumps(extract_to_wire(extractor, user))
                self._send(200, _chat_body(content))
            elif req.get("logprobs"):
                # rerank chat rung: score the (query, document) pair and encode
                # the score in yes/no top_logprobs — softmax-recoverable
                qpart, _, dpart = user.partition("\n\nDocument:\n")
                q = qpart.replace("Query: ", "", 1).strip()
                d = dpart.rsplit("\n\nIs this document relevant", 1)[0]
                s = min(max(score_fn(q, d), 1e-6), 1.0 - 1e-6)
                content = "yes" if s >= 0.5 else "no"
                self._send(200, _chat_body(content, logprobs={
                    "content": [{
                        "token": content,
                        "top_logprobs": [
                            {"token": "yes", "logprob": math.log(s)},
                            {"token": "no", "logprob": math.log(1.0 - s)},
                        ],
                    }]
                }))
            else:
                self.send_error(400)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}/v1"


def _chat_body(content: str, logprobs=None) -> dict:
    choice = {"message": {"role": "assistant", "content": content}}
    if logprobs is not None:
        choice["logprobs"] = logprobs
    return {"choices": [choice], "usage": {"total_tokens": 0}}


def plan_to_wire(planner, user: str) -> dict:
    """Serialize the rule plan to the planner prompt's JSON wire shape."""
    query = user.replace("Query: ", "", 1)
    p = planner.plan(query)
    return {
        "keywords": list(p.keywords),
        "semantic_query_text": p.semantic_query_text,
        "intent": p.intent,
        "requires_graph": bool(p.requires_graph),
        "graph_entities": list(p.graph_entities),
        "graph_query": p.graph_query,
        "weights": dict(p.weights),
    }


def extract_to_wire(extractor, user: str) -> dict:
    """Run the rule extractor over the prompt's text; NER JSON wire shape."""
    from triple_hybrid_rag_tpu.types import ChildChunk, ParentChunk

    text = user.split("Extract entities and relations from this text:\n\n", 1)[-1]
    parent = ParentChunk(parent_id="rt-parent", doc_id="rt-doc",
                         parent_idx=0, text=text)
    child = ChildChunk(chunk_id="rt-child", parent_id="rt-parent", doc_id="rt-doc",
                       parent_idx=0, child_idx=0, text=text)
    res = extractor.extract(parent, [child])
    by_id = {e.entity_id: e for e in res.entities}
    return {
        "entities": [
            {"name": e.canonical_name, "type": e.entity_type.value,
             "description": e.description}
            for e in res.entities
        ],
        "relations": [
            {"subject": by_id[r.subject_id].canonical_name,
             "relation_type": r.relation_type.value,
             "object": by_id[r.object_id].canonical_name}
            for r in res.relations
            if r.subject_id in by_id and r.object_id in by_id
        ],
    }


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------

PLAN_QUERIES = [
    "how do I configure the retry backoff for failed uploads?",
    "qual o prazo de pagamento das faturas?",
    "how is ACME Corp related to the Zenith project?",
    "who signed the master service agreement with Initech?",
    "compare the latency of the batch and streaming ingestion paths",
    "what is the difference between a parent chunk and a child chunk?",
    "list every clause that mentions termination penalties",
    "quem trabalha para a empresa Vertex Analytics?",
    "steps to rotate the API credentials for the billing service",
    "where is the Meridian data center located?",
    "what does the CacheManager class depend on?",
    "the module heapq provides which functions?",
]


def check_planner(base_url: str, cfg) -> dict:
    from triple_hybrid_rag_tpu.models.http_clients import make_planner_fn
    from triple_hybrid_rag_tpu.models.planner import CallablePlanner, RuleBasedPlanner

    rule = RuleBasedPlanner(cfg)
    http = CallablePlanner(make_planner_fn(base_url), cfg)
    fields = ("keywords", "semantic_query_text", "intent", "requires_graph",
              "graph_entities", "graph_query", "weights")
    mismatches = []
    for q in PLAN_QUERIES:
        a, b = rule.plan(q), http.plan(q)
        for f in fields:
            if getattr(a, f) != getattr(b, f):
                mismatches.append({"query": q, "field": f,
                                   "rule": repr(getattr(a, f)),
                                   "http": repr(getattr(b, f))})
    return {"queries": len(PLAN_QUERIES), "fields_compared": len(fields),
            "mismatches": mismatches, "parity": not mismatches}


def check_ner(base_url: str, cfg, parents) -> dict:
    from triple_hybrid_rag_tpu.models.entity_extractor import (
        CallableExtractor, RuleBasedExtractor,
    )
    from triple_hybrid_rag_tpu.models.http_clients import make_extractor_fn

    rule = RuleBasedExtractor(cfg)
    http = CallableExtractor(make_extractor_fn(base_url), cfg)
    ent_mis = rel_mis = 0
    n_ents = n_rels = 0
    examples = []
    for parent, children in parents:
        a = rule.extract(parent, children)
        b = http.extract(parent, children)

        def keyset(res):
            by_id = {e.entity_id: e for e in res.entities}
            ents = {(e.canonical_name, e.entity_type.value) for e in res.entities}
            rels = {
                (by_id[r.subject_id].canonical_name, r.relation_type.value,
                 by_id[r.object_id].canonical_name)
                for r in res.relations
                if r.subject_id in by_id and r.object_id in by_id
            }
            return ents, rels

        ea, ra = keyset(a)
        eb, rb = keyset(b)
        n_ents += len(ea)
        n_rels += len(ra)
        if ea != eb:
            ent_mis += 1
            if len(examples) < 3:
                examples.append({"chunk": parent.parent_id,
                                 "only_rule": sorted(map(str, ea - eb))[:5],
                                 "only_http": sorted(map(str, eb - ea))[:5]})
        if ra != rb:
            rel_mis += 1
    return {"parents": len(parents), "entities": n_ents, "relations": n_rels,
            "entity_set_mismatch_parents": ent_mis,
            "relation_set_mismatch_parents": rel_mis,
            "examples": examples, "parity": ent_mis == 0 and rel_mis == 0}


def check_reranker(cfg, data, score_fn, k: int = 10) -> dict:
    """Full-funnel retrieval parity: in-process callable vs both HTTP rungs."""
    from triple_hybrid_rag_tpu.eval import evaluate
    from triple_hybrid_rag_tpu.models.http_clients import HTTPRerankerFn
    from triple_hybrid_rag_tpu.retrieval import Retriever

    def run(llm_fn):
        r = Retriever(data.corpus, cfg, rerank_llm_fn=llm_fn)
        ranked = {}
        for i, q in enumerate(data.queries):
            out = r.retrieve(q.text, top_k=k)
            ranked[i] = [res.chunk_id for res in out.results]
        metrics = evaluate(
            lambda q: r.retrieve(q, top_k=k), data.queries, k=k)
        return ranked, metrics

    local_fn = lambda q, texts: [score_fn(q, t) for t in texts]  # noqa: E731
    ranked_local, m_local = run(local_fn)

    # rung 1: native /rerank
    srv1, url1 = start_server(None, None, score_fn, native_rerank=True)
    try:
        ranked_native, m_native = run(HTTPRerankerFn(url1))
    finally:
        srv1.shutdown()
    # rung 2: chat+logprob fallback (native 404s once, then sticky-off)
    srv2, url2 = start_server(None, None, score_fn, native_rerank=False)
    try:
        ranked_chat, m_chat = run(HTTPRerankerFn(url2, max_concurrency=8))
    finally:
        srv2.shutdown()

    def iddelta(a, b):
        return sum(1 for i in a if a[i] != b[i])

    return {
        "n_queries": len(data.queries),
        "recall@10": {"in_process": m_local[f"recall@{k}"],
                      "http_native": m_native[f"recall@{k}"],
                      "http_chat_logprob": m_chat[f"recall@{k}"]},
        "queries_with_id_delta": {
            "native_vs_local": iddelta(ranked_local, ranked_native),
            "chat_vs_local": iddelta(ranked_local, ranked_chat)},
        "parity": (ranked_local == ranked_native == ranked_chat),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300)
    ap.add_argument("--queries", type=int, default=80)
    ap.add_argument("--ner-parents", type=int, default=40)
    ap.add_argument("--out", default="eval_results/llm_adapter_roundtrip.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import make_stdlib_eval
    from triple_hybrid_rag_tpu.models.entity_extractor import RuleBasedExtractor
    from triple_hybrid_rag_tpu.models.planner import RuleBasedPlanner
    from triple_hybrid_rag_tpu.models.pretrain import load_default_encoder

    cfg = RAGConfig(
        capacity_round=64,
        embedding_dtype="float32",
        safety_threshold=0.0,
        denoise_alpha=0.0,
        graph_enabled=False,
        final_top_k=10,
        rerank_top_k=20,
    )
    t0 = time.time()
    enc = load_default_encoder(cfg)
    assert enc is not None, "packaged encoder required"

    _emb_cache: dict = {}

    def embed1(text: str):
        if text not in _emb_cache:
            _emb_cache[text] = enc.embed_texts([text])[0]
        return _emb_cache[text]

    def score_fn(q: str, d: str) -> float:
        import numpy as np

        a, b = embed1(q), embed1(d)
        return float((1.0 + float(np.dot(a, b))) / 2.0)

    print("corpus ...", flush=True)
    data = make_stdlib_eval(cfg, n_docs=args.docs, n_queries=args.queries,
                            sources=("stdlib",))

    srv, base_url = start_server(
        RuleBasedPlanner(cfg), RuleBasedExtractor(cfg), score_fn,
        native_rerank=True)
    try:
        print("planner round trip ...", flush=True)
        planner_res = check_planner(base_url, cfg)
        print(f"  parity={planner_res['parity']} "
              f"({len(planner_res['mismatches'])} mismatches)", flush=True)

        print("NER round trip ...", flush=True)
        parents = []
        for parent in data.corpus.parents[: args.ner_parents]:
            children = [c for c in data.corpus.children
                        if c.parent_id == parent.parent_id]
            parents.append((parent, children))
        ner_res = check_ner(base_url, cfg, parents)
        print(f"  parity={ner_res['parity']} over {ner_res['entities']} entities / "
              f"{ner_res['relations']} relations", flush=True)
    finally:
        srv.shutdown()

    print("reranker round trip (both rungs, full funnel) ...", flush=True)
    rr_res = check_reranker(cfg, data, score_fn)
    print(f"  parity={rr_res['parity']} recall={rr_res['recall@10']}", flush=True)

    payload = {
        "setup": "framework's own rule planner / rule extractor / encoder-cosine "
                 "scorer served behind a stdlib OpenAI-compatible server; adapters "
                 "must reproduce in-process semantics exactly",
        "elapsed_s": round(time.time() - t0, 1),
        "planner": planner_res,
        "ner": ner_res,
        "reranker": rr_res,
        "all_parity": planner_res["parity"] and ner_res["parity"] and rr_res["parity"],
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(f"-> {out}", flush=True)
    return 0 if payload["all_parity"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
