"""Real semantics through the HTTP model adapters (verdict missing #5).

Round 2 stub-tested the OpenAI-compatible wire shapes but no real embedding
model ever flowed through ``HTTPEmbedder``. No external pretrained model exists
in-image (zero egress), so this serves the framework's OWN packaged trained
encoder — a real model with measured paraphrase semantics — behind a stdlib
OpenAI-compatible ``/v1/embeddings`` server (the reference's model boundary,
rag2/embedder.py:31-120), then runs the independent docstring eval through the
adapter and demands metric parity with the in-process path:

    in-process encoder  ==  HTTPEmbedder -> HTTP server -> same encoder

Any adapter bug (row misalignment, truncation, renormalization, batching) shows
up as a recall delta. Run: ``python scripts/http_adapter_roundtrip.py``.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def serve_encoder(enc, host: str = "127.0.0.1") -> tuple:
    """Start an OpenAI-compatible /v1/embeddings server around ``enc``."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_POST(self):
            if self.path.rstrip("/") != "/v1/embeddings":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n))
            inputs = req["input"]
            if isinstance(inputs, str):
                inputs = [inputs]
            vecs = enc.embed_texts([str(t) for t in inputs])
            body = json.dumps({
                "object": "list",
                "model": req.get("model", "thr-encoder"),
                "data": [
                    {"object": "embedding", "index": i, "embedding": v.tolist()}
                    for i, v in enumerate(vecs)
                ],
                "usage": {"prompt_tokens": 0, "total_tokens": 0},
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer((host, 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://{host}:{srv.server_address[1]}/v1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=300)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="eval_results/http_adapter_roundtrip.json")
    args = ap.parse_args()

    from triple_hybrid_rag_tpu.config import RAGConfig
    from triple_hybrid_rag_tpu.eval import evaluate, make_stdlib_eval
    from triple_hybrid_rag_tpu.models.http_clients import HTTPEmbedder
    from triple_hybrid_rag_tpu.models.pretrain import load_default_encoder
    from triple_hybrid_rag_tpu.retrieval import Retriever

    base = RAGConfig(
        capacity_round=64, embedding_dtype="float32", safety_threshold=0.0,
        final_top_k=max(args.k, 10), rerank_top_k=max(2 * args.k, 20),
        denoise_alpha=0.0, graph_enabled=False,
    )
    enc = load_default_encoder(base)
    assert enc is not None, "packaged encoder weights missing"
    srv, base_url = serve_encoder(enc)
    http_emb = HTTPEmbedder(base_url, model="thr-encoder", dim=enc.dim, config=base)

    t0 = time.time()
    data = make_stdlib_eval(base, n_docs=args.docs, n_queries=args.queries)
    results: dict = {}
    # strict-parity row: no rerank (the in-process path's MaxSim token index has
    # no wire analogue — the reference reranker is a separate /rerank service)
    hybrid = base.replace(rerank_enabled=False)
    for name, (cfg, emb) in {
        "hybrid_inprocess": (hybrid, enc),
        "hybrid_http": (hybrid, http_emb),
        "full_inprocess": (base, enc),
        "full_http": (base, http_emb),
    }.items():
        r = Retriever(data.corpus, cfg, embedder=emb)
        results[name] = evaluate(lambda q: r.retrieve(q, top_k=args.k), data.queries, k=args.k)
        print(name, round(results[name][f"recall@{args.k}"], 4), flush=True)
    srv.shutdown()

    key = f"recall@{args.k}"
    parity = abs(results["hybrid_inprocess"][key] - results["hybrid_http"][key])
    payload = {
        "corpus": "docstrings:stdlib",
        "n_docs": args.docs,
        "k": args.k,
        "hybrid_recall_parity_abs_delta": parity,
        "elapsed_s": round(time.time() - t0, 1),
        "results": results,
        "note": "packaged trained encoder served over a stdlib OpenAI-compatible "
                "/v1/embeddings server; HTTPEmbedder drives the full funnel",
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload, indent=1))
    assert parity < 1e-6, f"adapter changed retrieval quality: delta={parity}"
    print("HTTP ADAPTER PARITY OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
