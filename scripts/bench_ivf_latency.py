"""IVF on-chip latency at small batch vs the exact scan (verdict weak #4).

The blocked-IVF backend's two claims — small-batch latency and
clustered-geometry recall — were both structural until now. This measures them
on the real chip with CLUSTERED embeddings (Gaussian-mixture geometry, the
trained/production embedding-space case the backend exists for; the packaged
anchored-BoW embedder's deliberately diffuse geometry is the adversarial case
and is reported separately in eval_results/ivf_recall.json).

    python scripts/bench_ivf_latency.py [--n 1000000] [--dim 1024] [--k 10]

Writes eval_results/ivf_latency_chip.json: exact vs probed device latency at
B in {1,2,4,8} and overlap@k vs the exact ranking at each probe count.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--clusters", type=int, default=2000, help="true generative clusters")
    ap.add_argument("--block-rows", type=int, default=512)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--probes", default="8,16,64")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="eval_results/ivf_latency_chip.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.index.ivf import ivf_build_local, ivf_topk_local

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    n = (args.n // args.block_rows) * args.block_rows  # build needs n % w == 0
    d = args.dim

    # ---- clustered corpus, generated ON DEVICE (no 4 GB host upload) ----
    @jax.jit
    def gen_rows(key):
        kc, ka, kn = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (args.clusters, d), jnp.float32)
        centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)
        assign = jax.random.randint(ka, (n,), 0, args.clusters)
        # noise scaled by 1/sqrt(d): per-coordinate sigma*sqrt(d) is the TOTAL
        # displacement norm, so an unscaled 0.35 at d=1024 would swamp the unit
        # centers 11x over and the "clusters" would be isotropic noise
        rows = centers[assign] + (0.35 / np.sqrt(d)) * jax.random.normal(
            kn, (n, d), jnp.float32
        )
        rows = rows / jnp.linalg.norm(rows, axis=1, keepdims=True)
        return rows.astype(jnp.bfloat16)

    t0 = time.time()
    rows = jax.block_until_ready(gen_rows(jax.random.PRNGKey(0)))
    print(f"corpus generated in {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    valid = jnp.ones((n,), bool)
    rows_r, scales_r, perm, cent = jax.block_until_ready(
        ivf_build_local(rows, None, valid, block_rows=args.block_rows)
    )
    build_s = time.time() - t0
    wn = int(cent.shape[0])
    print(f"ivf built in {build_s:.1f}s ({wn} blocks of {args.block_rows})", flush=True)

    # queries: perturbed corpus rows -> known-neighborhood geometry
    rng = np.random.default_rng(1)
    qidx = rng.integers(0, n, size=64)
    qs = np.asarray(rows[jnp.asarray(qidx)], np.float32)
    qs = qs + (0.1 / np.sqrt(d)) * rng.standard_normal(qs.shape).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    qs_dev = jax.device_put(jnp.asarray(qs))

    from triple_hybrid_rag_tpu.ops.topk import sort_topk_desc

    # big arrays are ARGUMENTS, not closure captures: a captured 2 GB corpus
    # becomes a compiled-in constant and ships through the remote compiler
    @jax.jit
    def exact_topk_impl(rows_a, perm_a, q_batch):
        def one(q):
            s = (rows_a.astype(jnp.bfloat16) @ q.astype(jnp.bfloat16)).astype(jnp.float32)
            ids = jnp.where(perm_a < n, perm_a, jnp.int32(2**30))
            return sort_topk_desc(jnp.where(perm_a < n, s, -jnp.inf), ids, args.k)
        return jax.lax.map(one, q_batch)

    def exact_topk(q_batch):
        return exact_topk_impl(rows_r, perm, q_batch)

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def probed_impl(rows_a, perm_a, cent_a, p, q_batch):
        return ivf_topk_local(
            rows_a, scales_r, perm_a, cent_a, q_batch, probes=p, top_k=args.k
        )

    def probed_fn(p):
        return lambda q_batch: probed_impl(rows_r, perm, cent, p, q_batch)

    def time_fn(fn, q_batch, iters):
        """E2E per-dispatch wall time: submit + fetch the tiny [B,k] id block.
        block_until_ready does not reliably synchronize on the tunneled backend
        (an exact 1M scan 'completed' in 0.06 ms); fetching the ids is the same
        sync discipline the engine benches use, and the fetch itself is <1 KB."""
        ids, _ = fn(q_batch)  # compile + warm
        np.asarray(ids)
        ts, out = [], None
        for _ in range(iters):
            t = time.perf_counter()
            ids, vals = fn(q_batch)
            out = np.asarray(ids)
            ts.append((time.perf_counter() - t) * 1e3)
        return float(np.percentile(ts, 50)), float(np.percentile(ts, 95)), out

    probes = [int(p) for p in args.probes.split(",")]
    batches = [int(b) for b in args.batches.split(",")]
    table: dict = {}
    for b in batches:
        qb = qs_dev[:b]
        p50_e, p95_e, ids_e = time_fn(exact_topk, qb, args.iters)
        row = {"exact_ms": {"p50": round(p50_e, 3), "p95": round(p95_e, 3)}}
        for p in probes:
            p50_p, p95_p, ids_p = time_fn(probed_fn(p), qb, args.iters)
            overlap = float(np.mean([
                len(set(ids_e[i]) & set(ids_p[i])) / args.k for i in range(b)
            ]))
            row[f"probes_{p}"] = {
                "p50": round(p50_p, 3), "p95": round(p95_p, 3),
                "speedup_p50": round(p50_e / max(p50_p, 1e-9), 2),
                f"overlap@{args.k}_vs_exact": round(overlap, 4),
                "rows_scanned_frac": round(min(p, wn) * args.block_rows / n, 4),
            }
            print(f"B={b} probes={p}: {p50_p:.2f}ms vs exact {p50_e:.2f}ms "
                  f"({p50_e/max(p50_p,1e-9):.1f}x), overlap {overlap:.3f}", flush=True)
        table[f"B{b}"] = row

    payload = {
        "n": n, "dim": d, "dtype": "bfloat16", "block_rows": args.block_rows,
        "n_blocks": wn, "true_clusters": args.clusters, "build_s": round(build_s, 1),
        "k": args.k, "device": str(dev), "results": table,
        "note": "e2e per-dispatch wall time incl. the ~25ms tunneled dispatch "
                "floor (submit + fetch of the [B,k] ids; block_until_ready does "
                "not reliably sync on this backend). The floor applies equally "
                "to both paths; the probed path's advantage grows with corpus "
                "size as the exact scan's HBM read time rises above the floor.",
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload["results"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
