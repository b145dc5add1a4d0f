"""Production serving walkthrough: sharded engine, batched queries, multi-tenancy,
the HTTP surface (/query /rerank), and checkpoint migration.

The reference's production story is "FastAPI app over Postgres + PuppyGraph + vLLM
workers" (reference src/voice_agent/app.py:47-140, scripts/backfill_rag2.py). The
TPU-native story is one process: device-resident indexes, a batched one-dispatch SPMD
engine over a mesh, and a stdlib HTTP host in front of it.

Run:  python examples/production_serving.py
(Offline: deterministic hash embedders; runs on CPU/TPU alike, shards over whatever
``jax.devices()`` shows.)
"""

import json
import sys
import threading
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from triple_hybrid_rag_tpu import RAG, RAGConfig


def main() -> None:
    config = RAGConfig(graph_enabled=True, safety_threshold=0.35)

    # --- ingest two tenants' corpora into separate collections ---------------
    rag = RAG(config=config, use_sharded_engine=True)
    rag.ingest_text(
        "# Billing policy\n\nInvoices must be settled within thirty days; the billing "
        "cycle is quarterly and late settlement incurs a penalty fee.",
        name="billing.md", collection="tenant_a",
    )
    rag.ingest_text(
        "# Shipping\n\nFreight shipments clear customs before warehouse intake. "
        "Delivery windows are confirmed forty-eight hours ahead.",
        name="shipping.md", collection="tenant_b",
    )

    # --- batched serving through the sharded engine --------------------------
    # One compiled program dispatches the whole batch: every query's lexical +
    # dense + graph channels, fusion, expansion, rerank, and safety gate.
    results = rag.query_batch(
        ["invoice settlement penalty", "customs delivery window"],
        collections=["tenant_a", "tenant_b"],
        top_k=2,
    )
    for q, r in zip(["invoice...", "customs..."], results):
        top = r.results[0].text.splitlines()[0] if r.results else "(refused)"
        print(f"batched [{q}] -> {top}")

    # --- tenancy isolation: tenant_a's question against tenant_b's collection
    leak = rag.query("invoice settlement penalty", collection="tenant_b")
    print(f"cross-tenant query refused={leak.refused} results={len(leak.results)}")

    # --- the HTTP surface -----------------------------------------------------
    from triple_hybrid_rag_tpu.server import serve

    httpd = serve(host="127.0.0.1", port=0, rag=rag)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read().decode())

    body = post("/query", {"query": "billing cycle penalty", "collection": "tenant_a"})
    print(f"HTTP /query -> {len(body['results'])} results, "
          f"total {body['timings_ms']['total_ms']:.1f} ms")

    # standalone rerank microservice (vLLM /rerank response-shape parity)
    body = post("/rerank", {
        "query": "invoice settlement",
        "documents": [
            "Parking assignments and stationery reorders.",
            "Invoices must be settled within thirty days.",
        ],
    })
    print(f"HTTP /rerank -> winner index {body['results'][0]['index']} "
          f"({body['scorer']}, score {body['results'][0]['relevance_score']:.2f})")
    httpd.shutdown()

    # --- checkpoint + migration (the backfill path) ---------------------------
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        src, dst = Path(d) / "src", Path(d) / "int8"
        rag.save(src)
        # re-derive the device indexes under int8 storage (thr migrate SRC DST --dtype int8)
        from triple_hybrid_rag_tpu.index.checkpoint import load_ingestor, save_ingestor

        ing = load_ingestor(src, config=config.replace(embedding_dtype="int8"))
        save_ingestor(ing, dst)
        moved = RAG.load(dst)
        r = moved.query("invoice settlement penalty", collection="tenant_a", top_k=1)
        print(f"migrated int8 checkpoint answers: refused={r.refused}, "
              f"top='{r.results[0].text.splitlines()[0] if r.results else ''}'")


if __name__ == "__main__":
    main()
