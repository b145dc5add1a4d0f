"""Real-chip measurement: fused matmul+top-k Pallas kernel vs the XLA dense path.

Measures the serving-shape dense channel (SURVEY.md §7 hard part (b)) on the
attached accelerator:

  XLA    : one jit program — (B, D) x (D, N) int8 matmul -> f32[B, N] scores in
           HBM -> vmapped masked_top_k (the engine's dense-section shape)
  fused  : fused_dense_topk — Pallas matmul + in-VMEM bucket max (writes only
           f32[B, N/8]) -> bucket top-k -> member rescore
  matmul : the bare scoring matmul with a jnp.max() consumer (roofline floor)

Corpora are generated on-device in blocks (the dev tunnel is too slow to upload
gigabytes). Run: python scripts/bench_fused_topk.py [N_million ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")  # NOT via PYTHONPATH: that breaks axon registration

import jax
import jax.numpy as jnp

from triple_hybrid_rag_tpu.index.dense_index import dense_scores_int8_batch
from triple_hybrid_rag_tpu.ops.pallas.fused_topk import fused_dense_topk
from triple_hybrid_rag_tpu.ops.topk import masked_top_k

B, D, K = 64, 1024, 32
GEN_BS = 262_144


def make_corpus(n_rows: int):
    """int8 unit-ish rows + scales, generated on device in blocks."""
    assert n_rows % GEN_BS == 0

    @jax.jit
    def gen(k):
        v = jax.random.normal(k, (GEN_BS, D), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        absmax = jnp.maximum(jnp.max(jnp.abs(v), axis=1), 1e-12)
        scale = absmax / 127.0
        q = jnp.clip(jnp.round(v / scale[:, None]), -127, 127).astype(jnp.int8)
        return q, scale

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("i",))
    def write_vals(buf, block, i):
        return jax.lax.dynamic_update_slice(buf, block, (i, 0))

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("i",))
    def write_scales(buf, block, i):
        return jax.lax.dynamic_update_slice(buf, block, (i,))

    # donated in-place writes: peak memory = corpus + ONE generation block
    # (a concatenate of blocks transiently doubles the corpus and OOMs at 6M+)
    values = jnp.zeros((n_rows, D), jnp.int8)
    scales = jnp.zeros((n_rows,), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), n_rows // GEN_BS)
    for j, k in enumerate(keys):
        v, s = gen(k)
        values = write_vals(values, v, j * GEN_BS)
        scales = write_scales(scales, s, j * GEN_BS)
        del v, s
    jax.block_until_ready(values)
    return values, scales


def xla_path(values, scales, valid, q, k):
    scores = dense_scores_int8_batch(values, scales, q)
    return jax.vmap(lambda s: masked_top_k(s, k, valid=valid, invalid_score_floor=-2.0))(
        scores
    )


def xla_bucketed_path(values, scales, valid, q, k):
    """Materialized scores + hierarchical bucket top-k (ops/topk.py) — the
    post-bucketed-topk XLA contender: pays the f32[B, N] HBM write/read but
    not the length-N sort."""
    from triple_hybrid_rag_tpu.ops.topk import bucketed_masked_top_k_batch

    scores = dense_scores_int8_batch(values, scales, q)
    return bucketed_masked_top_k_batch(
        scores, k, valid=valid, invalid_score_floor=-2.0
    )


def matmul_only(values, scales, q):
    return jnp.max(dense_scores_int8_batch(values, scales, q), axis=1)


def time_call(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3, out


def run(n_rows: int):
    print(f"\n=== N={n_rows:,} D={D} B={B} K={K} int8 ===", flush=True)
    values, scales = make_corpus(n_rows)
    valid = jnp.ones((n_rows,), bool)
    q = jax.random.normal(jax.random.PRNGKey(9), (B, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    jax.block_until_ready(q)
    res = {"n": n_rows}

    try:
        ms, _ = time_call(jax.jit(matmul_only), values, scales, q)
        gbps = n_rows * D / ms * 1e3 / 2**30
        print(f"matmul-only : {ms:8.3f} ms   ({gbps:6.1f} GiB/s corpus read)")
        res["matmul_ms"] = ms
    except Exception as e:  # noqa: BLE001
        print(f"matmul-only : FAILED ({type(e).__name__})")

    try:
        xla = jax.jit(xla_path, static_argnames=("k",))
        ms_xla, (xla_ids, _) = time_call(xla, values, scales, valid, q, K)
        print(f"XLA path    : {ms_xla:8.3f} ms")
        res["xla_ms"] = ms_xla
    except Exception as e:  # noqa: BLE001
        print(f"XLA path    : FAILED ({type(e).__name__}: {str(e)[:120]})")
        xla_ids = None

    try:
        xlab = jax.jit(xla_bucketed_path, static_argnames=("k",))
        ms_xlab, (xlab_ids, _) = time_call(xlab, values, scales, valid, q, K)
        line = f"XLA bucketed: {ms_xlab:8.3f} ms"
        if xla_ids is not None:
            line += f"   ids identical: {bool(jnp.all(xla_ids == xlab_ids))}"
        print(line)
        res["xla_bucketed_ms"] = ms_xlab
    except Exception as e:  # noqa: BLE001
        print(f"XLA bucketed: FAILED ({type(e).__name__}: {str(e)[:120]})")

    for bucket in (8, 16, 32, 64):
        try:
            ms_fused, (fused_ids, _) = time_call(
                lambda v, s, va, qq, bk=bucket: fused_dense_topk(
                    v, va, qq, K, scales=s, bucket=bk),
                values, scales, valid, q,
            )
            res[f"fused_b{bucket}_ms"] = ms_fused
            line = f"fused b={bucket:<3}: {ms_fused:8.3f} ms"
            if xla_ids is not None:
                same = bool(jnp.all(xla_ids == fused_ids))
                res[f"ids_equal_b{bucket}"] = same
                line += f"   ids identical: {same}   speedup vs XLA: {res['xla_ms'] / ms_fused:.2f}x"
            print(line)
        except Exception as e:  # noqa: BLE001
            print(f"fused b={bucket:<3}: FAILED ({type(e).__name__}: {str(e)[:120]})")

    del values, scales
    return res


if __name__ == "__main__":
    sizes = [int(float(a) * 1e6) // GEN_BS * GEN_BS for a in sys.argv[1:]] or [1_048_576]
    print(f"devices: {jax.devices()}")
    results = [run(n) for n in sizes]
    print("\nsummary:", results)
