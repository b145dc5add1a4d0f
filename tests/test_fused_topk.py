"""Fused matmul+top-k Pallas kernel vs the XLA dense channel (interpret mode).

The acceptance bar (SURVEY.md §7 hard part (b)): *bit-parity* with the XLA path
(``dense_scores_*_batch`` + ``masked_top_k``). Measured parity: returned ids are
bit-identical (including deliberate ties, within- and across buckets); scores on
the int8 path agree to <= 2 ulp — the int32 accumulations are exact in both
paths, but XLA freely reassociates the two dequant multiplies
(acc * row_scale * q_scale) across differently-fused programs, so the last bit
of the f32 product is not contractually stable. We assert ids exactly and
scores to 4 ulp.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from triple_hybrid_rag_tpu.index.dense_index import (
    dense_scores_batch,
    dense_scores_int8_batch,
    quantize_rows_int8,
)
from triple_hybrid_rag_tpu.ops.pallas.fused_topk import BUCKET, fused_dense_topk
from triple_hybrid_rag_tpu.ops.topk import masked_top_k


def _unit_rows(rng, n, d):
    m = rng.standard_normal((n, d)).astype(np.float32)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _assert_scores_ulp(ref_vals, got_vals, max_ulp=4):
    rv, gv = np.asarray(ref_vals), np.asarray(got_vals)
    finite = np.isfinite(rv)
    np.testing.assert_array_equal(finite, np.isfinite(gv))
    ulp = np.abs(rv.view(np.int32) - gv.view(np.int32))[finite]
    assert ulp.size == 0 or ulp.max() <= max_ulp, ulp.max()


def _xla_reference(scores, valid, k, row_masks=None):
    def one(s, i):
        v = jnp.asarray(valid)
        if row_masks is not None:
            v = v & jnp.asarray(row_masks)[i]
        return masked_top_k(s, k, valid=v, invalid_score_floor=-2.0)

    return jax.vmap(one)(scores, jnp.arange(scores.shape[0]))


@pytest.mark.parametrize("bucket", [8, 32, 64])
def test_int8_bit_parity(rng, bucket):
    N, D, B, K = 5000, 128, 8, 32
    vals, scales = quantize_rows_int8(_unit_rows(rng, N, D))
    valid = np.ones(N, bool)
    valid[rng.integers(0, N, 50)] = False
    q = _unit_rows(rng, B, D)

    scores = dense_scores_int8_batch(jnp.asarray(vals), jnp.asarray(scales), jnp.asarray(q))
    ref_ids, ref_vals = _xla_reference(scores, valid, K)
    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(vals), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales), block=512, bucket=bucket, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    _assert_scores_ulp(ref_vals, got_vals)


def test_int8_ties_break_by_id(rng):
    # duplicate rows => exactly tied int32 scores; parity requires id-asc ties
    N, D, B, K = 1024, 64, 4, 16
    base = _unit_rows(rng, N // 4, D)
    mat = np.repeat(base, 4, axis=0)  # every score appears 4x, spread across buckets
    vals, scales = quantize_rows_int8(mat)
    valid = np.ones(N, bool)
    q = _unit_rows(rng, B, D)

    scores = dense_scores_int8_batch(jnp.asarray(vals), jnp.asarray(scales), jnp.asarray(q))
    ref_ids, ref_vals = _xla_reference(scores, valid, K)
    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(vals), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales), block=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    _assert_scores_ulp(ref_vals, got_vals)


def test_ties_within_one_bucket(rng):
    # adjacent duplicate rows land in the SAME bucket: the rescore stage must
    # recover both (bucket max alone would surface only one)
    N, D, B, K = 512, 64, 2, 8
    mat = _unit_rows(rng, N, D)
    mat[128:128 + BUCKET] = mat[128]  # a full bucket of identical rows
    vals, scales = quantize_rows_int8(mat)
    valid = np.ones(N, bool)
    q = mat[128:129] @ np.eye(D, dtype=np.float32)  # query == the duplicated row
    q = np.repeat(q, B, axis=0)

    scores = dense_scores_int8_batch(jnp.asarray(vals), jnp.asarray(scales), jnp.asarray(q))
    ref_ids, ref_vals = _xla_reference(scores, valid, K)
    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(vals), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales), block=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    assert set(range(128, 128 + BUCKET)) <= set(np.asarray(got_ids)[0].tolist())


def test_float_paths_match(rng):
    N, D, B, K = 3000, 64, 4, 24  # N not a multiple of the block -> exercises padding
    mat = _unit_rows(rng, N, D)
    valid = np.ones(N, bool)
    valid[:100] = False
    q = _unit_rows(rng, B, D)

    for dtype in (jnp.float32, jnp.bfloat16):
        emb = jnp.asarray(mat, dtype=dtype)
        scores = dense_scores_batch(emb, jnp.asarray(q))
        ref_ids, ref_vals = _xla_reference(scores, valid, K)
        got_ids, got_vals = fused_dense_topk(
            emb, jnp.asarray(valid), jnp.asarray(q), K, block=512, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
        np.testing.assert_allclose(
            np.asarray(ref_vals), np.asarray(got_vals), rtol=1e-5, atol=1e-6
        )


def test_scoped_collections_parity(rng):
    N, D, B, K = 2048, 64, 6, 16
    vals, scales = quantize_rows_int8(_unit_rows(rng, N, D))
    valid = np.ones(N, bool)
    collection_of = rng.integers(0, 3, N).astype(np.int32)
    coll_cid = np.array([-1, 0, 1, 2, -2, 1], np.int32)  # unscoped / scoped / match-nothing
    q = _unit_rows(rng, B, D)

    scores = dense_scores_int8_batch(jnp.asarray(vals), jnp.asarray(scales), jnp.asarray(q))
    row_masks = np.stack([
        np.ones(N, bool) if c == -1 else (collection_of == c) for c in coll_cid
    ])
    ref_ids, ref_vals = _xla_reference(scores, valid, K, row_masks=row_masks)
    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(vals), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales),
        collection_of=jnp.asarray(collection_of), coll_cid=jnp.asarray(coll_cid),
        block=512, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    _assert_scores_ulp(ref_vals, got_vals)
    assert np.all(np.asarray(got_ids)[4] == -1)  # cid -2 matches nothing


def test_small_corpus_k_exceeds_buckets(rng):
    # k > n_buckets and k > n_valid: output must pad with id -1 / -inf
    N, D, B, K = 40, 32, 2, 64
    vals, scales = quantize_rows_int8(_unit_rows(rng, N, D))
    valid = np.zeros(N, bool)
    valid[:10] = True
    q = _unit_rows(rng, B, D)

    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(vals), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales), block=256, interpret=True,
    )
    got_ids = np.asarray(got_ids)
    assert got_ids.shape == (B, K)
    for b in range(B):
        real = got_ids[b][got_ids[b] >= 0]
        assert set(real) <= set(range(10))
        assert len(real) == 10
    assert np.all(np.asarray(got_vals)[got_ids == -1] == -np.inf)


def test_all_invalid(rng):
    N, D, B, K = 512, 32, 2, 8
    vals, scales = quantize_rows_int8(_unit_rows(rng, N, D))
    valid = np.zeros(N, bool)
    q = _unit_rows(rng, B, D)
    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(vals), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales), block=256, interpret=True,
    )
    assert np.all(np.asarray(got_ids) == -1)
    assert np.all(np.asarray(got_vals) == -np.inf)


# ---------------------------------------------------------------------------
# int4 packed-nibble path
# ---------------------------------------------------------------------------


def test_int4_quantize_unpack_roundtrip(rng):
    from triple_hybrid_rag_tpu.index.dense_index import quantize_rows_int4, unpack_int4

    mat = _unit_rows(rng, 64, 32)
    packed, scale = quantize_rows_int4(mat)
    assert packed.dtype == np.uint8 and packed.shape == (64, 16)
    low, high = unpack_int4(jnp.asarray(packed))
    codes = np.concatenate([np.asarray(low), np.asarray(high)], axis=1)
    assert codes.min() >= -7 and codes.max() <= 7
    recon = codes.astype(np.float32) * scale[:, None]
    # int4 keeps the geometry to ~1/7 absmax resolution per row
    err = np.abs(recon - mat).max(axis=1) / np.abs(mat).max(axis=1)
    assert err.max() <= (0.5 / 7.0) + 1e-6


def test_int4_cosine_accuracy(rng):
    """int4 scores track f32 cosine closely enough to preserve top ranks."""
    from triple_hybrid_rag_tpu.index.dense_index import (
        dense_scores_int4_batch,
        quantize_rows_int4,
    )

    N, D, B = 2000, 256, 8
    mat = _unit_rows(rng, N, D)
    q = _unit_rows(rng, B, D)
    packed, scale = quantize_rows_int4(mat)
    exact = np.asarray(q @ mat.T)
    got = np.asarray(
        dense_scores_int4_batch(jnp.asarray(packed), jnp.asarray(scale), jnp.asarray(q))
    )
    assert np.abs(got - exact).max() < 0.05  # |cos| <= 1; int4 noise ~2-3%
    # rank preservation: the exact argmax stays in the int4 top-5
    for b in range(B):
        assert int(exact[b].argmax()) in np.argsort(-got[b])[:5]


@pytest.mark.parametrize("bucket", [8, 32])
def test_int4_fused_bit_parity(rng, bucket):
    """fused int4 kernel ids/scores == unpack-full XLA reference, bit-exact ids."""
    from triple_hybrid_rag_tpu.index.dense_index import (
        dense_scores_int4_batch,
        quantize_rows_int4,
    )

    N, D, B, K = 5000, 128, 8, 32
    packed, scales = quantize_rows_int4(_unit_rows(rng, N, D))
    valid = np.ones(N, bool)
    valid[rng.integers(0, N, 50)] = False
    q = _unit_rows(rng, B, D)

    scores = dense_scores_int4_batch(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(q)
    )
    ref_ids, ref_vals = _xla_reference(scores, valid, K)
    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(packed), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales), block=512, bucket=bucket, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    _assert_scores_ulp(ref_vals, got_vals)


def test_int4_fused_scoped_parity(rng):
    from triple_hybrid_rag_tpu.index.dense_index import (
        dense_scores_int4_batch,
        quantize_rows_int4,
    )

    N, D, B, K = 2048, 64, 6, 16
    packed, scales = quantize_rows_int4(_unit_rows(rng, N, D))
    valid = np.ones(N, bool)
    collection_of = rng.integers(0, 3, N).astype(np.int32)
    coll_cid = np.array([-1, 0, 1, 2, -2, 1], np.int32)
    q = _unit_rows(rng, B, D)

    scores = dense_scores_int4_batch(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(q)
    )
    row_masks = np.stack([
        np.ones(N, bool) if c == -1 else (collection_of == c) for c in coll_cid
    ])
    ref_ids, ref_vals = _xla_reference(scores, valid, K, row_masks=row_masks)
    got_ids, got_vals = fused_dense_topk(
        jnp.asarray(packed), jnp.asarray(valid), jnp.asarray(q), K,
        scales=jnp.asarray(scales),
        collection_of=jnp.asarray(collection_of), coll_cid=jnp.asarray(coll_cid),
        block=256, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    _assert_scores_ulp(ref_vals, got_vals)


# ---------------------------------------------------------------------------
# bucketed_masked_top_k_batch (pure-XLA hierarchical top-k, ops/topk.py)
# ---------------------------------------------------------------------------


def _ref_masked_topk_batch(scores, k, valid=None, floor=0.0):
    import jax

    def one(s, v):
        return masked_top_k(s, k, valid=v, invalid_score_floor=floor)

    if valid is None:
        return jax.vmap(lambda s: masked_top_k(s, k, invalid_score_floor=floor))(scores)
    if valid.ndim == 1:
        valid = jnp.broadcast_to(valid, scores.shape)
    return jax.vmap(one)(scores, valid)


@pytest.mark.parametrize("n,bucket", [(5000, 16), (4097, 8), (300, 16), (7, 16)])
def test_bucketed_topk_parity(rng, n, bucket):
    from triple_hybrid_rag_tpu.ops.topk import bucketed_masked_top_k_batch

    B, K = 6, 24
    scores = rng.standard_normal((B, n)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[rng.integers(0, n, max(1, n // 50))] = False
    ref_ids, ref_vals = _ref_masked_topk_batch(
        jnp.asarray(scores), K, jnp.asarray(valid), floor=-2.0
    )
    got_ids, got_vals = bucketed_masked_top_k_batch(
        jnp.asarray(scores), K, valid=jnp.asarray(valid),
        invalid_score_floor=-2.0, bucket=bucket,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    np.testing.assert_array_equal(np.asarray(ref_vals), np.asarray(got_vals))


def test_bucketed_topk_ties_and_floor(rng):
    from triple_hybrid_rag_tpu.ops.topk import bucketed_masked_top_k_batch

    B, N, K = 3, 8192, 16
    scores = np.zeros((B, N), np.float32)
    scores[:, 100:100 + 40] = 1.0  # 40 exactly-tied hits spanning buckets
    scores[:, 7000] = 2.0
    ref_ids, ref_vals = _ref_masked_topk_batch(jnp.asarray(scores), K, floor=0.0)
    got_ids, got_vals = bucketed_masked_top_k_batch(
        jnp.asarray(scores), K, invalid_score_floor=0.0
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    # floor: zero scores never surface
    assert np.all(np.asarray(got_vals)[np.asarray(got_ids) >= 0] > 0.0)


def test_bucketed_topk_per_query_valid(rng):
    from triple_hybrid_rag_tpu.ops.topk import bucketed_masked_top_k_batch

    B, N, K = 4, 6000, 12
    scores = rng.random((B, N), dtype=np.float32)
    valid = rng.random((B, N)) > 0.3  # per-query masks (collection scoping)
    ref_ids, ref_vals = _ref_masked_topk_batch(
        jnp.asarray(scores), K, jnp.asarray(valid), floor=0.0
    )
    got_ids, got_vals = bucketed_masked_top_k_batch(
        jnp.asarray(scores), K, valid=jnp.asarray(valid)
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    np.testing.assert_array_equal(np.asarray(ref_vals), np.asarray(got_vals))
