"""Top-k selection with validity masking, and k-way merge of sharded top-k lists.

Replaces the reference's per-channel SQL ``ORDER BY ... LIMIT k``
(``/root/reference/database/migrations/20260114_rag2_schema.sql:341-497``). On TPU the
candidate-count dynamism of the reference's recall->precision funnel becomes *static max-k with
validity masks* (SURVEY.md §7 hard part (e)): every op returns fixed-width (ids, scores) pairs
where invalid slots carry id = -1 and score = -inf.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def sort_topk_desc(
    scores: jax.Array, ids: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """THE canonical (score desc, id asc) top-k tie-break, shared by every op.

    Operates on the trailing axis (any leading batch dims). ``scores`` must
    already carry NEG_INF in invalid slots; ``ids`` are the candidate ids.
    Returns (ids i32[..., k], scores f32[..., k]) with -1 / -inf invalid slots,
    padding when k exceeds the candidate width.

    Every exactness proof in this codebase (shard merge == single device,
    bucketed == plain top-k, sparse graph == dense scan, full-probe IVF ==
    exact scan) reduces to all paths sharing THIS ordering — keep it in one
    place so the contract cannot silently desynchronize.
    """
    sort_ids = jnp.where(scores > NEG_INF, ids, jnp.iinfo(jnp.int32).max)
    _, sorted_ids, sorted_vals = jax.lax.sort(
        (-scores, sort_ids, scores), dimension=-1, num_keys=2
    )
    kk = min(k, scores.shape[-1])
    top_ids, top_vals = sorted_ids[..., :kk], sorted_vals[..., :kk]
    if kk < k:
        pad = [(0, 0)] * (scores.ndim - 1) + [(0, k - kk)]
        top_ids = jnp.pad(top_ids, pad, constant_values=jnp.iinfo(jnp.int32).max)
        top_vals = jnp.pad(top_vals, pad, constant_values=NEG_INF)
    ok = top_vals > NEG_INF
    return (
        jnp.where(ok, top_ids, -1).astype(jnp.int32),
        jnp.where(ok, top_vals, NEG_INF),
    )


def masked_top_k(
    scores: jax.Array,
    k: int,
    valid: jax.Array | None = None,
    invalid_score_floor: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over a score vector with an optional validity mask.

    Args:
        scores: f32[N] raw scores (higher is better).
        k: static number of results.
        valid: optional bool[N]; False entries can never be selected.
        invalid_score_floor: additionally treat scores <= floor as invalid (BM25/graph
            zero-score docs simply did not match; they must not surface as results).

    Returns:
        (ids i32[k], scores f32[k]) — invalid slots have id -1 and score -inf.
    """
    masked = scores.astype(jnp.float32)
    invalid = masked <= invalid_score_floor
    if valid is not None:
        invalid = invalid | ~valid
    masked = jnp.where(invalid, NEG_INF, masked)
    kk = min(k, masked.shape[-1])  # k may exceed a tiny corpus; pad the tail instead
    vals, idx = jax.lax.top_k(masked, kk)
    if kk < k:
        vals = jnp.concatenate([vals, jnp.full((k - kk,), NEG_INF, vals.dtype)])
        idx = jnp.concatenate([idx, jnp.zeros((k - kk,), idx.dtype)])
    ok = vals > NEG_INF
    return jnp.where(ok, idx, -1).astype(jnp.int32), jnp.where(ok, vals, NEG_INF)


def merge_topk(
    ids: jax.Array,
    scores: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard top-k lists into a global top-k.

    Args:
        ids: i32[S, k_local] global doc ids from S shards (-1 = invalid).
        scores: f32[S, k_local] matching scores (-inf = invalid).
        k: static output width.

    The all-gather+merge that replaces the reference's "scale API workers" story
    (SURVEY.md §2.6): each shard computes local top-k over its slice of the corpus, the
    (ids, scores) pairs ride ICI via all_gather, and this op selects the global winners.
    """
    flat_scores = scores.reshape(-1)
    flat_ids = ids.reshape(-1).astype(jnp.int32)
    masked = jnp.where(flat_ids < 0, NEG_INF, flat_scores)
    # lexicographic (score desc, id asc) so ties break identically on any mesh
    # size — the merged result is bit-identical to a single-device top-k
    return sort_topk_desc(masked, flat_ids, k)


def bucketed_masked_top_k_batch(
    scores: jax.Array,
    k: int,
    valid: jax.Array | None = None,
    invalid_score_floor: float = 0.0,
    bucket: int = 16,
) -> Tuple[jax.Array, jax.Array]:
    """Batched masked_top_k via hierarchical bucket maxima — exact, no full sort.

    ``jax.lax.top_k`` over f32[B, N] lowers to a length-N sort per query: at
    N=1M, B=64 that sort dominates any channel that materializes a dense score
    matrix (measured ~31-41 ms/batch per channel on v5e — see
    eval_results/channels_1000000.json). This computes per-bucket maxima
    (a bandwidth-bound reduce), top-k over the N/bucket maxima (a bucket-x
    smaller sort), then rescores the members of the winning buckets — the same
    exactness construction as ops/pallas/fused_topk.py stages 2-3, in pure XLA:
    any bucket holding a top-k element has a maximum >= the k-th value, so it is
    among the k highest-max buckets; the final (score desc, id asc) sort over
    k*bucket members reproduces masked_top_k's lowest-index tie-break.

    Args/returns match ``masked_top_k`` with a leading batch axis:
    scores f32[B, N], valid bool[N] or bool[B, N] -> (ids i32[B, k], f32[B, k]).
    """
    b, n = scores.shape
    masked = scores.astype(jnp.float32)
    invalid = masked <= invalid_score_floor
    if valid is not None:
        invalid = invalid | ~(valid if valid.ndim == 2 else valid[None, :])
    masked = jnp.where(invalid, NEG_INF, masked)

    if n <= max(bucket * k, 4096):  # small corpora: the plain path is cheaper
        def one(s):
            vals, idx = jax.lax.top_k(s, min(k, n))
            ok = vals > NEG_INF
            return jnp.where(ok, idx, -1).astype(jnp.int32), jnp.where(ok, vals, NEG_INF)

        ids, vals = jax.vmap(one)(masked)
        if n < k:
            ids = jnp.pad(ids, ((0, 0), (0, k - n)), constant_values=-1)
            vals = jnp.pad(vals, ((0, 0), (0, k - n)), constant_values=NEG_INF)
        return ids, vals

    n_pad = ((n + bucket - 1) // bucket) * bucket
    if n_pad != n:
        masked = jnp.pad(masked, ((0, 0), (0, n_pad - n)), constant_values=NEG_INF)
    nb = n_pad // bucket
    bmax = jnp.max(masked.reshape(b, nb, bucket), axis=2)  # [B, nb]
    kk = min(k, nb)
    _, bucket_ids = jax.lax.top_k(bmax, kk)  # ties -> lowest bucket id
    member = (
        bucket_ids[:, :, None] * bucket
        + jnp.arange(bucket, dtype=bucket_ids.dtype)[None, None, :]
    ).reshape(b, kk * bucket)
    cand = jnp.take_along_axis(masked, member, axis=1)  # [B, kk*bucket]
    return sort_topk_desc(cand, member, k)
