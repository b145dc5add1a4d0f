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
    # lexicographic sort (score desc, id asc) so ties break identically on any mesh
    # size — the merged result is bit-identical to a single-device top-k
    neg_scores = -masked
    sort_ids = jnp.where(flat_ids < 0, jnp.iinfo(jnp.int32).max, flat_ids)
    _, sorted_ids, sorted_scores = jax.lax.sort(
        (neg_scores, sort_ids, masked), dimension=-1, num_keys=2
    )
    kk = min(k, flat_ids.shape[0])
    top_ids, top_scores = sorted_ids[:kk], sorted_scores[:kk]
    if kk < k:
        top_ids = jnp.concatenate([top_ids, jnp.full((k - kk,), -1, jnp.int32)])
        top_scores = jnp.concatenate([top_scores, jnp.full((k - kk,), NEG_INF)])
    ok = top_scores > NEG_INF
    return (
        jnp.where(ok, top_ids, -1).astype(jnp.int32),
        jnp.where(ok, top_scores, NEG_INF),
    )
